"""Source coverage: Jaeger-JSON converter (S2), YAML config (S5),
synthetic determinism."""

import json

import pyarrow as pa

from asserts_otel_processor_ray.config import PipelineConfig
from asserts_otel_processor_ray.sources.jaeger import jaeger_json_to_table
from asserts_otel_processor_ray.sources.synthetic import (
    generate_transcripts,
)

JAEGER_DOC = {
    "data": [{
        "traceID": "abc123",
        "processes": {
            "p1": {"serviceName": "api-server"},
            "p2": {"serviceName": "DynamoDb"},
        },
        "spans": [
            {"spanID": "s2", "processID": "p2", "startTime": 2_000,
             "operationName": "GetItem",
             "tags": [{"key": "span.kind", "value": "client"},
                      {"key": "db.operation", "value": "GetItem"},
                      {"key": "aws.table.name", "value": "orders"}]},
            {"spanID": "s1", "processID": "p1", "startTime": 1_000,
             "operationName": "POST /order",
             "tags": [{"key": "span.kind", "value": "server"},
                      {"key": "http.url",
                       "value": "https://x.com/api/order"},
                      {"key": "http.status_code", "value": 500}]},
        ],
    }],
}


def test_jaeger_conversion():
    t = jaeger_json_to_table(JAEGER_DOC)
    d = t.to_pydict()
    # spans ordered by startTime → turn_idx
    assert d["turn_idx"] == [0, 1]
    assert d["role"] == ["user", "tool"]        # server → user (root)
    assert d["tool"] == ["api-server", "DynamoDb"]
    assert "url=https://x.com/api/order" in d["text"][0]
    assert "status=500" in d["text"][0]         # AsString coercion of int
    assert "db.op=GetItem" in d["text"][1]
    assert "table=orders" in d["text"][1]
    assert d["conv_id"] == ["abc123", "abc123"]


def test_jaeger_feeds_parse():
    from asserts_otel_processor_ray.config import default_config
    from asserts_otel_processor_ray.stages.parse import parse_batch
    p = parse_batch(jaeger_json_to_table(JAEGER_DOC), default_config())
    d = p.to_pydict()
    assert d["kind"] == ["Server", "Client"]
    assert d["attr_status"] == ["500", None]
    assert d["has_error"] == [True, False]


def test_yaml_config(tmp_path):
    path = tmp_path / "cfg.yaml"
    path.write_text("""
env: prod
site: eu-1
ignore_client_errors: true
trace_rate_limit_per_service: 42
custom_attributes:
  asserts.error.type:
    default:
      - regex: "5.."
        source_attributes: [attr_status]
        value_expr: server_errors
""")
    cfg = PipelineConfig.from_yaml(str(path))
    assert cfg.env == "prod" and cfg.site == "eu-1"
    assert cfg.ignore_client_errors is True
    assert cfg.limit_per_service == 42
    rules = cfg.compiled_rules()
    assert rules["asserts.error.type"]["default"][0].regex == "5.."


def test_synthetic_deterministic():
    a = generate_transcripts(3000)
    b = generate_transcripts(3000)
    assert a.equals(b)
    # timestamps strictly ordered within conversations (sort invariant)
    import pandas as pd
    df = a.select(["conv_id", "turn_idx", "ts"]).to_pandas()
    df = df.sort_values(["conv_id", "turn_idx"])
    diffs = df.groupby("conv_id")["ts"].diff().dropna()
    assert (diffs.dt.total_seconds() > 0).all()


def test_jaeger_oracle_matches_converter():
    """t_jaeger: the DuckDB re-expression of the Jaeger conversion
    (oracle_sql.jaeger_oracle_sql) matches sources/jaeger.py byte for
    byte on the reference fixtures (90 spans across 2 traces)."""
    import duckdb
    import pandas as pd
    import pytest

    from asserts_otel_processor_ray.pipelines.oracle_sql import (
        jaeger_oracle_sql)
    from asserts_otel_processor_ray.pipelines.queries import (
        jaeger_fixture_paths, q_jaeger)
    if not jaeger_fixture_paths():
        pytest.skip("reference fixtures unavailable")
    want = q_jaeger("unused").to_pandas()
    got = duckdb.connect().execute(
        jaeger_oracle_sql()).fetch_arrow_table().to_pandas()
    cols = list(want.columns)
    key = ["conv_id", "turn_idx"]
    want = want.sort_values(key).reset_index(drop=True)
    got = got[cols].sort_values(key).reset_index(drop=True)
    assert len(want) == 90
    pd.testing.assert_frame_equal(want, got)
