"""Fixed pyarrow schemas at every stage boundary.

The reference's data model is schema-dynamic (span attribute maps); the
Ray engine promotes everything to flat, typed Arrow columns (SURVEY.md
§1.6) with a declared schema per stage so blocks stay zero-copy.
"""

from __future__ import annotations

import pyarrow as pa

# Input (BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

# Columns added by the parse stage (stages/parse.py).
PARSE_ADDED = [
    ("kind", pa.string()),          # role → span kind (utils.go:128-134)
    ("namespace", pa.string()),     # from tool "ns#svc" | ""
    ("service", pa.string()),       # required; rows without it are dropped
    ("span_name", pa.string()),     # role:service — span.Name() analog
    ("is_root", pa.bool_()),        # turn_idx == 0 (utils.go:136-138)
    ("status_code", pa.string()),   # OK | ERROR (utils.go:31-33 analog)
    ("has_error", pa.bool_()),
    # extracted attributes (all string — Value.AsString coercion, §1.1)
    ("attr_url", pa.string()),
    ("attr_status", pa.string()),
    ("attr_route", pa.string()),
    ("attr_db_op", pa.string()),
    ("attr_table", pa.string()),
    ("attr_peer", pa.string()),
]

PARSED_SCHEMA = pa.schema(list(TRANSCRIPT_SCHEMA) + [
    pa.field(n, t) for n, t in PARSE_ADDED
])


def parsed_schema_with_targets(target_columns: list[str]) -> pa.schema:
    """Enriched schema = parsed + one string column per enrichment target
    + threshold/entity columns."""
    fields = list(PARSED_SCHEMA)
    for col in target_columns:
        fields.append(pa.field(col, pa.string()))
    fields.append(pa.field("entity_key", pa.string()))
    fields.append(pa.field("latency_threshold_s", pa.float64()))
    return pa.schema(fields)
