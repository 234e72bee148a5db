"""Pipeline configuration — the user-facing "query language".

Mirrors the reference config model (assertsprocessor/config.go:18-37,
assertsprocessor/custom_attribute.go:10-15, defaults from
assertsprocessor/factory.go:38-45) re-expressed for the batch transcript
pipeline.  There is no other DSL: rule tables per target attribute per
service key are the entire enrichment surface.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass, field
from typing import Any

from asserts_otel_processor_ray.functions.keys import (
    ATTR_ERROR_TYPE,
    ATTR_REQUEST_CONTEXT,
    KIND_CLIENT,
    KIND_INTERNAL,
    KIND_SERVER,
)
from asserts_otel_processor_ray.functions.regex import (
    go_replacement_to_re2,
    validate_re2_pattern,
)

# Default latency histogram buckets (assertsprocessor/factory.go:38).
DEFAULT_LATENCY_BUCKETS = [
    0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5,
    5.0, 10.0, 30.0, 60.0, 90.0, 120.0,
]


class ValidationError(ValueError):
    pass


@dataclass(frozen=True)
class CustomAttributeRule:
    """One enrichment rule (assertsprocessor/custom_attribute.go:10-15).

    Defaults on compile: empty span_kinds → ["Server"], empty value_expr →
    "$1" (assertsprocessor/custom_attribute.go:56-62).
    """

    regex: str
    source_attributes: tuple[str, ...]
    span_kinds: tuple[str, ...] = ()
    value_expr: str = ""

    def validate(self, target_attr: str, service_key: str) -> None:
        # assertsprocessor/custom_attribute.go:17-51
        if not self.regex:
            raise ValidationError(
                f"rule for {target_attr}/{service_key}: regex not specified")
        if not self.source_attributes:
            raise ValidationError(
                f"rule for {target_attr}/{service_key}: "
                "source_attributes not specified")
        for s in self.source_attributes:
            if not s:
                raise ValidationError(
                    f"rule for {target_attr}/{service_key}: "
                    "empty attribute in source_attributes")
        try:
            validate_re2_pattern(self.regex)
        except ValueError as exc:
            raise ValidationError(
                f"rule for {target_attr}/{service_key}: {exc}") from exc

    def compiled(self) -> "CompiledRule":
        kinds = self.span_kinds or (KIND_SERVER,)
        value_expr = self.value_expr or "$1"
        return CompiledRule(
            regex=self.regex,
            source_attributes=self.source_attributes,
            span_kinds=tuple(kinds),
            replacement_re2=go_replacement_to_re2(value_expr),
        )


@dataclass(frozen=True)
class CompiledRule:
    """A rule ready for vectorized RE2 execution via pyarrow.compute."""

    regex: str
    source_attributes: tuple[str, ...]
    span_kinds: tuple[str, ...]
    replacement_re2: str


# target attr → service key → ordered rules
RuleTable = dict[str, dict[str, list[CompiledRule]]]


@dataclass
class PipelineConfig:
    """Whole-pipeline configuration (assertsprocessor/config.go:18-37)."""

    env: str = "dev"
    site: str = "us-west-2"

    # target attr → service key → [rule]  (the legacy `custom_attributes`
    # shape, config.go:24; the `span_attributes` shape collapses to this
    # same structure at compile time, span_enrichment.go:80-110).
    custom_attributes: dict[str, dict[str, list[CustomAttributeRule]]] = field(
        default_factory=dict)

    # extra span attrs promoted to histogram labels (config.go:26)
    attributes_as_metric_labels: list[str] = field(default_factory=list)

    sampling_latency_threshold_seconds: float = 3.0   # factory.go:40
    latency_histogram_buckets: list[float] = field(
        default_factory=lambda: list(DEFAULT_LATENCY_BUCKETS))  # factory.go:38
    ignore_client_errors: bool = False                # config.go:29
    capture_metrics: bool = True                      # processor.go capture gate
    sample_traces: bool = True                        # config.go:30
    limit_per_service: int = 100                      # factory.go:41
    limit_per_request_per_service: int = 3            # factory.go:42 (≤5)
    request_context_cache_ttl_minutes: int = 60       # factory.go:43
    normal_sampling_rate_minutes: int = 5             # factory.go:44
    trace_flush_frequency_seconds: int = 30           # factory.go:45

    # Transcript-specific: role → span kind dictionary (SURVEY.md §1.6).
    role_kind_map: dict[str, str] = field(default_factory=lambda: {
        "user": KIND_SERVER,
        "assistant": KIND_INTERNAL,
        "tool": KIND_CLIENT,
        "function": KIND_CLIENT,
        "system": KIND_INTERNAL,
    })

    # Static (entity_key, request_context) → latency upper bound (seconds).
    # Replaces the remote threshold API (assertsprocessor/thresholds.go):
    # request "" = service-level default row.
    latency_thresholds: dict[tuple[str, str], float] = field(
        default_factory=dict)

    def validate(self) -> None:
        # assertsprocessor/config.go:41-77
        if not self.env:
            raise ValidationError("env is required")
        if self.limit_per_service < self.limit_per_request_per_service:
            raise ValidationError(
                "trace_rate_limit_per_service must be >= "
                "trace_rate_limit_per_service_per_request")
        for target, by_service in self.custom_attributes.items():
            for skey, rules in by_service.items():
                for rule in rules:
                    rule.validate(target, skey)

    def compiled_rules(self) -> RuleTable:
        self.validate()
        out: RuleTable = {}
        for target in sorted(self.custom_attributes):
            out[target] = {}
            for skey, rules in self.custom_attributes[target].items():
                out[target][skey] = [r.compiled() for r in rules]
        return out

    @property
    def per_request_topk(self) -> int:
        # min(5, LimitPerRequestPerService) — service_queue.go:58
        return min(5, self.limit_per_request_per_service)

    def config_hash(self) -> str:
        """Stable hash for lineage manifests / resume."""
        d = dataclasses.asdict(self)
        d["latency_thresholds"] = sorted(
            (k[0], k[1], v) for k, v in self.latency_thresholds.items())
        blob = json.dumps(d, sort_keys=True, default=str).encode()
        return hashlib.sha256(blob).hexdigest()[:16]

    @staticmethod
    def from_yaml(path: str) -> "PipelineConfig":
        """Load from a YAML file (the S5 config source; the remote
        config API of the reference becomes a local file in a batch
        run)."""
        import yaml
        with open(path) as f:
            return PipelineConfig.from_dict(yaml.safe_load(f) or {})

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "PipelineConfig":
        """Build from a plain dict (YAML/JSON-loaded).  Accepts both the
        legacy ``custom_attributes`` shape and the ``span_attributes``
        shape (span_attributes takes precedence when non-empty,
        span_enrichment.go:43-49)."""
        cfg = PipelineConfig()
        # Reference mapstructure key aliases (config.go:20-34) so a
        # collector-style YAML loads with its values honored rather than
        # silently falling back to defaults.
        aliases = {
            "asserts_env": "env",
            "asserts_site": "site",
            "normal_trace_sampling_rate_minutes": "normal_sampling_rate_minutes",
        }
        # A YAML carrying both an alias and its canonical key would
        # otherwise resolve by dict iteration order with no warning —
        # refuse instead of silently picking one.
        collisions = [k for k in aliases if k in d and aliases[k] in d]
        if collisions:
            raise ValueError(
                "config contains both alias and canonical key for: "
                + ", ".join(f"{k}/{aliases[k]}" for k in sorted(collisions)))
        d = {aliases.get(k, k): v for k, v in d.items()}
        simple = [
            "env", "site", "attributes_as_metric_labels",
            "sampling_latency_threshold_seconds", "latency_histogram_buckets",
            "ignore_client_errors", "capture_metrics", "sample_traces",
            "request_context_cache_ttl_minutes",
            "normal_sampling_rate_minutes", "trace_flush_frequency_seconds",
            "role_kind_map",
        ]
        for k in simple:
            if k in d:
                setattr(cfg, k, d[k])
        if "trace_rate_limit_per_service" in d:
            cfg.limit_per_service = d["trace_rate_limit_per_service"]
        if "trace_rate_limit_per_service_per_request" in d:
            cfg.limit_per_request_per_service = (
                d["trace_rate_limit_per_service_per_request"])

        def to_rule(rd: dict[str, Any]) -> CustomAttributeRule:
            return CustomAttributeRule(
                regex=rd.get("regex", ""),
                source_attributes=tuple(rd.get("source_attributes", ())),
                span_kinds=tuple(rd.get("span_kinds", ()) or ()),
                value_expr=rd.get("value_expr", ""),
            )

        span_attributes = d.get("span_attributes") or []
        if span_attributes:
            # span_enrichment.go:80-116: key = "#".join(non-empty of
            # [namespace, service]) or "default".
            for sa in span_attributes:
                target = sa["attr_name"]
                by_key = cfg.custom_attributes.setdefault(target, {})
                for ac in sa.get("attr_configs", []):
                    parts = [p for p in
                             [ac.get("namespace", ""), ac.get("service", "")]
                             if p]
                    skey = "#".join(parts) or "default"
                    by_key.setdefault(skey, []).extend(
                        to_rule(r) for r in ac.get("rules", []))
        else:
            for target, by_service in (d.get("custom_attributes") or {}).items():
                cfg.custom_attributes[target] = {
                    skey: [to_rule(r) for r in rules]
                    for skey, rules in by_service.items()
                }

        for row in d.get("latency_thresholds", []):
            cfg.latency_thresholds[
                (row["entity_key"], row.get("request_context", ""))
            ] = float(row["latency_upper_bound"])
        return cfg


def default_config() -> PipelineConfig:
    """The F2 rule fixture (FIXTURES.md): the sample-collector-config rule
    set translated to text-sourced attributes, plus the unit-test rules of
    assertsprocessor/span_enrichment_test.go:12-39, with defaulting cases
    (missing value_expr ⇒ $1, missing span_kinds ⇒ ["Server"]).
    """
    cfg = PipelineConfig(
        env="dev",
        site="us-west-2",
        sampling_latency_threshold_seconds=0.5,  # sample config README.md:42
        # extra label columns of the parsed table promoted to histogram
        # labels (≙ attributes_as_metric_labels, config.go:26)
        attributes_as_metric_labels=["attr_db_op", "attr_table"],
    )
    cfg.custom_attributes = {
        ATTR_REQUEST_CONTEXT: {
            # 3-segment rule for one service, 2-segment for another —
            # the golden pair of span_enrichment_test.go:165-179.
            "platform#api-server": [
                CustomAttributeRule(
                    regex=r"^https?://[^/\s]+((/[^/?\s]+){1,3}).*",
                    source_attributes=("attr_url",),
                    span_kinds=(KIND_SERVER, KIND_CLIENT),
                    value_expr="$1",
                ),
            ],
            "chat#assistant": [
                CustomAttributeRule(
                    regex=r"^https?://[^/\s]+((/[^/?\s]+){1,2}).*",
                    source_attributes=("attr_url",),
                    span_kinds=(KIND_SERVER, KIND_CLIENT),
                    # value_expr omitted → "$1"
                ),
            ],
            # aws-sdk style multi-source ;-join rule
            # (sample-collector-config.yaml:57-64 shape).
            "default": [
                CustomAttributeRule(
                    regex=r"^(GetItem|PutItem|Query|Scan);(\S+)$",
                    source_attributes=("attr_db_op", "attr_table"),
                    span_kinds=(KIND_CLIENT, KIND_SERVER),
                    value_expr="$1 $2",
                ),
                CustomAttributeRule(
                    regex=r"^(/api/[^\s/]+).*",
                    source_attributes=("attr_route",),
                    span_kinds=(KIND_SERVER, KIND_CLIENT, KIND_INTERNAL),
                ),
            ],
        },
        ATTR_ERROR_TYPE: {
            # 4xx → client_errors, 5xx → server_errors
            # (span_enrichment_test.go:144-156 golden mapping).
            "default": [
                CustomAttributeRule(
                    regex=r"^4..$",
                    source_attributes=("attr_status",),
                    span_kinds=(KIND_SERVER, KIND_CLIENT),
                    value_expr="client_errors",
                ),
                CustomAttributeRule(
                    regex=r"^5..$",
                    source_attributes=("attr_status",),
                    span_kinds=(KIND_SERVER, KIND_CLIENT),
                    value_expr="server_errors",
                ),
            ],
        },
        # a pure-custom target exercising multi-source presence gating
        "peer.endpoint": {
            "default": [
                CustomAttributeRule(
                    regex=r"^([^;\s]+);(\d+)$",
                    source_attributes=("attr_peer",),
                    span_kinds=(KIND_CLIENT,),
                    value_expr="$1:$2",
                ),
            ],
        },
    }
    # F3 thresholds fixture: a couple of request-level overrides + one
    # service default row; config default covers the rest.
    from asserts_otel_processor_ray.functions.keys import entity_key_string
    ek_chat = entity_key_string(cfg.env, cfg.site, "chat", "assistant")
    ek_pay = entity_key_string(cfg.env, cfg.site, "payments", "api")
    cfg.latency_thresholds = {
        (ek_chat, "/api/chat"): 1.5,
        (ek_chat, ""): 0.8,
        (ek_pay, ""): 0.25,
    }
    return cfg
