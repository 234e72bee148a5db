"""Config model + validation (assertsprocessor/config_test.go,
custom_attribute_test.go ports)."""

import pytest

from asserts_otel_processor_ray.config import (
    CustomAttributeRule,
    PipelineConfig,
    ValidationError,
    default_config,
)


def test_missing_regex_rejected():
    cfg = PipelineConfig(custom_attributes={
        "t": {"default": [CustomAttributeRule(
            regex="", source_attributes=("a",))]}})
    with pytest.raises(ValidationError):
        cfg.validate()


def test_missing_sources_rejected():
    cfg = PipelineConfig(custom_attributes={
        "t": {"default": [CustomAttributeRule(
            regex="x", source_attributes=())]}})
    with pytest.raises(ValidationError):
        cfg.validate()


def test_empty_source_rejected():
    cfg = PipelineConfig(custom_attributes={
        "t": {"default": [CustomAttributeRule(
            regex="x", source_attributes=("a", ""))]}})
    with pytest.raises(ValidationError):
        cfg.validate()


def test_invalid_regex_rejected():
    cfg = PipelineConfig(custom_attributes={
        "t": {"default": [CustomAttributeRule(
            regex="(unclosed", source_attributes=("a",))]}})
    with pytest.raises(ValidationError):
        cfg.validate()


def test_env_required():
    cfg = PipelineConfig(env="")
    with pytest.raises(ValidationError):
        cfg.validate()


def test_limit_ordering():
    # config.go:41-77: LimitPerService >= LimitPerRequestPerService
    cfg = PipelineConfig(limit_per_service=2,
                         limit_per_request_per_service=3)
    with pytest.raises(ValidationError):
        cfg.validate()


def test_compile_defaults():
    # custom_attribute.go:56-62: kinds → ["Server"], value_expr → "$1"
    r = CustomAttributeRule(regex="(x)", source_attributes=("a",))
    c = r.compiled()
    assert c.span_kinds == ("Server",)
    assert c.replacement_re2 == "\\1"


def test_topk_hard_cap_five():
    # service_queue.go:58: min(5, configured)
    cfg = PipelineConfig(limit_per_request_per_service=9)
    assert cfg.per_request_topk == 5
    cfg = PipelineConfig(limit_per_request_per_service=2)
    assert cfg.per_request_topk == 2


def test_from_dict_span_attributes_shape():
    # span_enrichment.go:80-116: namespace+service key building
    cfg = PipelineConfig.from_dict({
        "env": "dev",
        "span_attributes": [{
            "attr_name": "asserts.request.context",
            "attr_configs": [
                {"rules": [{"regex": "x", "source_attributes": ["a"]}]},
                {"namespace": "asserts", "service": "api-server",
                 "rules": [{"regex": "y", "source_attributes": ["b"]}]},
                {"service": "cart",
                 "rules": [{"regex": "z", "source_attributes": ["c"]}]},
            ],
        }],
    })
    by_key = cfg.custom_attributes["asserts.request.context"]
    assert set(by_key) == {"default", "asserts#api-server", "cart"}


def test_from_dict_custom_attributes_shape():
    cfg = PipelineConfig.from_dict({
        "env": "dev",
        "custom_attributes": {
            "t": {"svc": [{"regex": "x", "source_attributes": ["a"],
                           "value_expr": "$1"}]},
        },
        "trace_rate_limit_per_service": 7,
        "trace_rate_limit_per_service_per_request": 4,
    })
    assert cfg.limit_per_service == 7
    assert cfg.per_request_topk == 4
    assert cfg.custom_attributes["t"]["svc"][0].regex == "x"


def test_default_buckets_match_reference():
    # assertsprocessor/factory.go:38 — pinned verbatim
    from asserts_otel_processor_ray.config import DEFAULT_LATENCY_BUCKETS
    assert DEFAULT_LATENCY_BUCKETS == [
        0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1, 2.5,
        5, 10, 30, 60, 90, 120]


def test_from_dict_reference_mapstructure_aliases():
    # config.go:20-34 key names load into the same fields
    cfg = PipelineConfig.from_dict({
        "asserts_env": "prod",
        "asserts_site": "eu-1",
        "normal_trace_sampling_rate_minutes": 9,
    })
    assert cfg.env == "prod"
    assert cfg.site == "eu-1"
    assert cfg.normal_sampling_rate_minutes == 9


def test_default_config_valid_and_hashable():
    cfg = default_config()
    cfg.validate()
    h1 = cfg.config_hash()
    assert len(h1) == 16
    cfg.ignore_client_errors = True
    assert cfg.config_hash() != h1
