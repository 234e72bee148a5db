"""Rule-engine golden vectors, ported from
assertsprocessor/span_enrichment_test.go."""

import pyarrow as pa

from asserts_otel_processor_ray.config import (
    CustomAttributeRule,
    PipelineConfig,
)
from asserts_otel_processor_ray.stages.enrich import EnrichStage


def make_batch(rows: list[dict], attr_cols: list[str]) -> pa.Table:
    cols = {
        "kind": [], "is_root": [], "namespace": [], "service": [],
        "span_name": [],
    }
    for c in attr_cols:
        cols[c] = []
    for r in rows:
        cols["kind"].append(r.get("kind", "Server"))
        cols["is_root"].append(r.get("is_root", False))
        cols["namespace"].append(r.get("namespace", ""))
        cols["service"].append(r.get("service", "svc"))
        cols["span_name"].append(r.get("span_name", "span-name"))
        for c in attr_cols:
            cols[c].append(r.get(c))
    arrays = {}
    for k, v in cols.items():
        if k == "is_root":
            arrays[k] = pa.array(v, pa.bool_())
        else:
            arrays[k] = pa.array(v, pa.string())
    return pa.table(arrays)


def ref_test_config() -> PipelineConfig:
    """The exact rule set of span_enrichment_test.go:129-158 with text
    attrs renamed to columns (http.url → http_url etc.)."""
    return PipelineConfig(custom_attributes={
        "asserts.request.context": {
            "default": [CustomAttributeRule(
                regex=r"https?://.+?((/[^/?]+){1,2}).*",
                source_attributes=("http_url",), value_expr="$1")],
            "asserts#api-server": [CustomAttributeRule(
                regex=r"https?://.+?((/[^/?]+){1,3}).*",
                source_attributes=("http_url",), value_expr="$1")],
        },
        "asserts.error.type": {
            "default": [
                CustomAttributeRule(regex="4..",
                                    source_attributes=("http_status_code",),
                                    value_expr="client_errors"),
                CustomAttributeRule(regex="5..",
                                    source_attributes=("http_status_code",),
                                    value_expr="server_errors"),
            ],
        },
    })


ATTRS = ["http_url", "http_status_code"]
URL = "https://some.domain.com/foo/bar/baz?a=b"


def enrich(rows, cfg=None):
    cfg = cfg or ref_test_config()
    return EnrichStage(cfg)(make_batch(rows, ATTRS)).to_pydict()


def test_request_type_tagging():
    # span_enrichment_test.go:99-126 (M3)
    out = enrich([
        {"kind": "Client"}, {"kind": "Server"},
        {"kind": "Internal", "is_root": True},
        {"kind": "Producer"}, {"kind": "Consumer"},
    ])
    assert out["asserts_request_type"] == [
        "outbound", "inbound", "internal", "outbound", "inbound"]


def test_three_segment_rule_for_matching_service():
    # golden: /foo/bar/baz for asserts#api-server
    # (span_enrichment_test.go:170-173)
    out = enrich([{"namespace": "asserts", "service": "api-server",
                   "http_url": URL}])
    assert out["asserts_request_context"] == ["/foo/bar/baz"]


def test_two_segment_default_rule():
    # golden: /foo/bar for tsdb#vminsert (falls back to default,
    # span_enrichment_test.go:176-179)
    out = enrich([{"namespace": "tsdb", "service": "vminsert",
                   "http_url": URL}])
    assert out["asserts_request_context"] == ["/foo/bar"]


def test_error_type_mapping():
    # 404 → client_errors, "504" → server_errors; int attrs behave like
    # their AsString digits (span_enrichment_test.go:166-196)
    out = enrich([
        {"http_status_code": "404"},
        {"http_status_code": "504"},
        {"http_status_code": "200"},
    ])
    assert out["asserts_error_type"] == [
        "client_errors", "server_errors", None]


def test_span_name_fallback():
    # span_enrichment_test.go:198-203 (M6)
    out = enrich([{"http_url": "will-not-match"}])
    assert out["asserts_request_context"] == ["span-name"]


def test_internal_span_not_enriched():
    out = enrich([{"kind": "Internal", "http_url": URL}])
    assert out["asserts_request_context"] == [None]
    assert out["asserts_request_type"] == [None]


def test_internal_root_is_enriched():
    # a root span counts as non-internal (trace.go:22-35)
    out = enrich([{"kind": "Internal", "is_root": True, "http_url": URL}])
    assert out["asserts_request_type"] == ["internal"]
    # kind Internal matches no rule (default span_kinds=["Server"]) →
    # span-name fallback
    assert out["asserts_request_context"] == ["span-name"]


def test_kind_gate():
    # default span_kinds = ["Server"]; Client span gets no context rule
    out = enrich([{"kind": "Client", "http_url": URL}])
    assert out["asserts_request_context"] == ["span-name"]


def test_all_sources_required():
    cfg = PipelineConfig(custom_attributes={
        "target": {"default": [CustomAttributeRule(
            regex=r"^(a);(b)$", source_attributes=("x", "y"),
            value_expr="$1-$2")]},
    })
    out = EnrichStage(cfg)(make_batch(
        [{"x": "a", "y": "b"}, {"x": "a", "y": None}], ["x", "y"]))
    assert out.to_pydict()["target"] == ["a-b", None]


def test_first_matching_rule_wins():
    cfg = PipelineConfig(custom_attributes={
        "t": {"default": [
            CustomAttributeRule(regex="a(x)?", source_attributes=("s",),
                                value_expr="first"),
            CustomAttributeRule(regex="a", source_attributes=("s",),
                                value_expr="second"),
        ]},
    })
    out = EnrichStage(cfg)(make_batch([{"s": "a"}], ["s"]))
    assert out.to_pydict()["t"] == ["first"]


def test_empty_replacement_falls_through():
    # Go: getCustomAttribute returning "" means "no value" → next rule /
    # default applies (span_enrichment.go:203-218)
    cfg = PipelineConfig(custom_attributes={
        "t": {"default": [
            CustomAttributeRule(regex="a(x)?", source_attributes=("s",),
                                value_expr="$1"),   # matches, group empty
            CustomAttributeRule(regex="a", source_attributes=("s",),
                                value_expr="fallback"),
        ]},
    })
    out = EnrichStage(cfg)(make_batch([{"s": "a"}], ["s"]))
    assert out.to_pydict()["t"] == ["fallback"]


def test_service_key_resolution_chain():
    # span_enrichment.go:231-241: ns#svc → ns → svc
    def cfg_with(key):
        return PipelineConfig(custom_attributes={
            "t": {key: [CustomAttributeRule(
                regex="(v)", source_attributes=("s",))]},
        })
    row = [{"namespace": "ns", "service": "svc", "s": "v"}]
    for key in ("ns#svc", "ns", "svc"):
        out = EnrichStage(cfg_with(key))(make_batch(row, ["s"]))
        assert out.to_pydict()["t"] == ["v"], key
    out = EnrichStage(cfg_with("other"))(make_batch(row, ["s"]))
    assert out.to_pydict()["t"] == [None]


def test_threshold_lookup_chain():
    from asserts_otel_processor_ray.functions.keys import entity_key_string
    cfg = ref_test_config()
    cfg.sampling_latency_threshold_seconds = 3.0
    ek = entity_key_string("dev", "us-west-2", "asserts", "api-server")
    cfg.latency_thresholds = {(ek, "/foo/bar/baz"): 1.25, (ek, ""): 0.75}
    out = enrich([
        {"namespace": "asserts", "service": "api-server",
         "http_url": URL},                     # ctx /foo/bar/baz → 1.25
        {"namespace": "asserts", "service": "api-server"},  # default 0.75
        {"namespace": "x", "service": "y"},                 # config 3.0
    ], cfg)
    assert out["latency_threshold_s"] == [1.25, 0.75, 3.0]
