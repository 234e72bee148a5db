"""End-to-end: the Ray pipeline vs the generated DuckDB oracle on a
small deterministic transcript table (FIXTURES.md F4 — routed-row
equality and per-sink aggregate counts)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from asserts_otel_processor_ray.config import default_config
from asserts_otel_processor_ray.pipelines.oracle_sql import (
    build_oracle_queries,
)
from asserts_otel_processor_ray.sources.synthetic import ensure_transcripts

# a tiny sf the driver doesn't use: ~1800 turns, generated on demand
SF_DIR = "/tmp/graft_sf/sf0.0003"


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype("string")
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
        if df[c].dtype == np.float64:
            df[c] = df[c].round(9)
        if str(df[c].dtype) in ("int32", "int8", "uint32"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "boolean" or df[c].dtype == bool:
            df[c] = df[c].astype("boolean")
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def oracle():
    path = ensure_transcripts(SF_DIR)
    cfg = default_config()
    return build_oracle_queries(cfg, f"read_parquet('{path}/*.parquet')")


@pytest.fixture(scope="module")
def queries(ray_session):
    from asserts_otel_processor_ray.pipelines.queries import CORE_QUERIES
    return CORE_QUERIES


# the full correctness gate, one test per stage family so failures
# localize; every query in CORE_QUERIES is covered
NAMES = [
    "t_parse", "t_enrich", "t_latency", "t_assemble", "t_allowed",
    "t_trace_decisions", "t_normal_winners", "t_winners",
    "t_routed_error", "t_routed_slow", "t_routed_normal",
    "t_agg_trace_count", "t_agg_span_count", "t_agg_sampled_count",
    "t_agg_span_sampled", "t_agg_latency_hist", "t_windowed_winners",
    "t_latency_quantiles", "t_tool_transitions", "t_conv_sizes",
    "t_error_taxonomy",
]


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, oracle, queries):
    ray_df = queries[name](SF_DIR).to_pandas()
    sql_df = duckdb.sql(oracle[name]).df()
    a, b = normalize(ray_df), normalize(sql_df)
    assert set(a.columns) == set(b.columns)
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_run_pipeline_aggregates_match_query_path(ray_session):
    """run_pipeline's FOLDED aggregate outputs (collector-actor partials
    + winner-scan histogram) must equal the standalone query-path
    computations the oracle validates — regression for the folded
    histogram seeing only trace rows."""
    from asserts_otel_processor_ray.pipelines.pipeline import run_pipeline
    from asserts_otel_processor_ray.pipelines.queries import CORE_QUERIES
    path = ensure_transcripts(SF_DIR)
    cfg = default_config()
    res = run_pipeline(path, cfg)
    for agg_name, qname in [("latency_hist", "t_agg_latency_hist"),
                            ("trace_count", "t_agg_trace_count"),
                            ("span_count", "t_agg_span_count"),
                            ("trace_sampled_count", "t_agg_sampled_count"),
                            ("span_sampled_count", "t_agg_span_sampled")]:
        a = normalize(res.aggregates[agg_name].to_pandas())
        b = normalize(CORE_QUERIES[qname](SF_DIR).to_pandas())
        assert len(a) == len(b), f"{agg_name}: rows {len(a)} vs {len(b)}"
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_enrich_actor_pool_path(ray_session):
    """The enrich stage as an actor pool (concurrency) must produce the
    same result as the task path."""
    import ray.data
    from asserts_otel_processor_ray.config import default_config
    from asserts_otel_processor_ray.pipelines.pipeline import (
        build_enriched, read_transcripts)
    from asserts_otel_processor_ray.sources.synthetic import (
        ensure_transcripts)
    path = ensure_transcripts(SF_DIR)
    cfg = default_config()
    a = build_enriched(read_transcripts(path), cfg)
    b = build_enriched(read_transcripts(path), cfg,
                       enrich_concurrency=(1, 2))
    ta = a.to_pandas().sort_values(["conv_id", "turn_idx"],
                                   ignore_index=True)
    tb = b.to_pandas().sort_values(["conv_id", "turn_idx"],
                                   ignore_index=True)
    assert ta.equals(tb)


def test_route_filter_pushdown_matches_unfiltered(ray_session,
                                                  monkeypatch):
    """The conv_id-IN-winners reader filter is pushed adaptively (only
    below ROUTE_PUSHDOWN_MAX_SHARE winner-row share); routed output
    must be identical with the filter forced ON, forced OFF, and with
    a Dataset input (never filterable)."""
    import asserts_otel_processor_ray.pipelines.pipeline as P
    path = ensure_transcripts(SF_DIR)
    cfg = default_config()
    monkeypatch.setattr(P, "ROUTE_PUSHDOWN_MAX_SHARE", 1.0)
    a = P.run_pipeline(path, cfg).routed.to_pandas()
    monkeypatch.setattr(P, "ROUTE_PUSHDOWN_MAX_SHARE", -1.0)
    b = P.run_pipeline(path, cfg).routed.to_pandas()
    c = P.run_pipeline(P.read_transcripts(path), cfg).routed.to_pandas()
    key = ["conv_id", "turn_idx"]
    a = a.sort_values(key, ignore_index=True)
    b = b.sort_values(key, ignore_index=True)
    c = c.sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)


def test_tool_pairs_block_pre_reduce():
    """Pairs never cross conversations; counts pre-reduce per block."""
    from asserts_otel_processor_ray.pipelines.queries import (
        _tool_pairs_block)
    t = pa.table({
        "conv_id": ["a", "a", "a", "b", "b"],
        "turn_idx": pa.array([2, 0, 1, 0, 1], pa.int32()),
        "tool": ["x", "y", "x", "x", "x"],
    })
    out = _tool_pairs_block(t).to_pandas().sort_values(
        ["tool", "next_tool"], ignore_index=True)
    # conv a ordered: y->x->x ; conv b: x->x  => (x,x): 2, (y,x): 1
    assert out.to_dict("records") == [
        {"tool": "x", "next_tool": "x", "n_pairs": 2},
        {"tool": "y", "next_tool": "x", "n_pairs": 1}]


def test_conv_sizes_mass(ray_session, oracle, queries):
    """Σ(conv_turns × n_convs) must equal the total turn count."""
    out = queries["t_conv_sizes"](SF_DIR).to_pandas()
    path = ensure_transcripts(SF_DIR)
    raw = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{path}/*.parquet')"
    ).fetchone()[0]
    assert int((out["conv_turns"] * out["n_convs"]).sum()) == int(raw)
