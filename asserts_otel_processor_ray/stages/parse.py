"""Stage 1 — vectorized parse of transcript rows into span-like columns.

Covers reference operators M1 (service extraction + filter,
assertsprocessor/utils.go:41-53), M2 (span classification,
utils.go:79-87,128-138), M8 (error predicate, utils.go:31-33) and the
attribute-map flattening of §1.1: every extractable marker in ``text``
becomes a flat string column (Value.AsString coercion — ints render as
their digit strings, so regexes see "404" exactly like Go's AsString).

Pure function over a ``pyarrow.Table`` batch — used directly in
``map_batches(batch_format="pyarrow")``; no per-row Python in the hot
path (RE2 kernels via pyarrow.compute).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from asserts_otel_processor_ray.config import PipelineConfig
from asserts_otel_processor_ray.schema import PARSED_SCHEMA

# marker → (column, RE2 pattern with one named group v)
_ATTR_PATTERNS = [
    ("attr_url", r"url=(?P<v>\S+)"),
    ("attr_status", r"status=(?P<v>\d{3})"),
    ("attr_route", r"route=(?P<v>\S+)"),
    ("attr_db_op", r"db\.op=(?P<v>\S+)"),
    ("attr_table", r"table=(?P<v>\S+)"),
    ("attr_peer", r"peer=(?P<v>\S+)"),
]


def _extract(text: pa.ChunkedArray | pa.Array, pattern: str) -> pa.Array:
    """First-match extract; null where no match (Go: attribute absent)."""
    structs = pc.extract_regex(text, pattern)
    return pc.struct_field(structs, "v")


def parse_batch(batch: pa.Table, config: PipelineConfig) -> pa.Table:
    """Parse + filter one Arrow batch; returns PARSED_SCHEMA columns."""
    role = batch.column("role")
    tool = batch.column("tool")

    # role → span kind via dictionary lookup (vectorized index_in + take).
    roles = list(config.role_kind_map.keys())
    kinds_for_roles = pa.array(
        [config.role_kind_map[r] for r in roles] + ["Internal"], pa.string())
    idx = pc.index_in(role, pa.array(roles, pa.string()))
    idx = pc.fill_null(idx, len(roles))  # unknown role → Internal
    kind = pc.take(kinds_for_roles, idx)

    # tool "ns#svc" | "svc" | "" → (namespace, service)
    has_ns = pc.match_substring(tool, "#")
    namespace = pc.if_else(
        has_ns, pc.replace_substring_regex(tool, r"^([^#]*)#.*$", r"\1"), "")
    service = pc.if_else(
        has_ns, pc.replace_substring_regex(tool, r"^[^#]*#(.*)$", r"\1"), tool)

    # M1: service.name is required — drop rows without it (utils.go:41-45).
    keep = pc.and_(pc.is_valid(service), pc.not_equal(service, ""))

    text = batch.column("text")
    attrs = {col: _extract(text, pat) for col, pat in _ATTR_PATTERNS}

    # Error predicate analog of Status.Code == ERROR (utils.go:31-33):
    # a turn is an error iff its status marker is 4xx/5xx.
    status = attrs["attr_status"]
    is_err = pc.fill_null(pc.match_substring_regex(status, r"^[45]"), False)
    status_code = pc.if_else(is_err, "ERROR", "OK")

    span_name = pc.binary_join_element_wise(role, service, ":")
    is_root = pc.equal(batch.column("turn_idx"), pa.scalar(0, pa.int32()))

    out = pa.table({
        "conv_id": batch.column("conv_id"),
        "turn_idx": batch.column("turn_idx"),
        "role": role,
        "text": text,
        "tool": tool,
        "ts": batch.column("ts"),
        "kind": kind,
        "namespace": namespace,
        "service": service,
        "span_name": span_name,
        "is_root": is_root,
        "status_code": status_code,
        "has_error": is_err,
        **attrs,
    }, schema=PARSED_SCHEMA)
    return out.filter(keep)


class ParseStage:
    """Callable wrapper so map_batches can also run this as an actor
    (the function itself is stateless; tasks are fine too)."""

    def __init__(self, config: PipelineConfig):
        self.config = config

    def __call__(self, batch: pa.Table) -> pa.Table:
        return parse_batch(batch, self.config)
