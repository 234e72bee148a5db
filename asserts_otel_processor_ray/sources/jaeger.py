"""Jaeger-JSON → transcript-table converter (reference operator S2).

The reference collector also ingests Jaeger traces
(sample-builder-config.yaml:12; fixture shape:
assertsprocessor/testdata/sample-trace-*.json).  This reader converts
that JSON shape into the engine's transcript schema so Jaeger dumps can
run through the same pipeline:

* ``traceID`` → ``conv_id``
* spans ordered by (startTime, spanID) → ``turn_idx``
* span.kind tag → ``role`` via the inverse of the config's
  role→kind map (server→user, client/producer→tool, else assistant)
* ``process.serviceName`` → ``tool``
* tags flattened into ``text`` as the pipeline's ``key=value`` markers
  (http.url → url=..., http.status_code → status=...)
"""

from __future__ import annotations

import json

import pyarrow as pa

from asserts_otel_processor_ray.schema import TRANSCRIPT_SCHEMA

_TAG_MARKERS = {
    "http.url": "url",
    "http.status_code": "status",
    "http.route": "route",
    "db.operation": "db.op",
    "aws.table.name": "table",
    "peer.address": "peer",
}

_KIND_ROLE = {"server": "user", "client": "tool", "producer": "tool",
              "consumer": "user"}


def _tags_dict(span: dict) -> dict[str, str]:
    return {t["key"]: str(t.get("value", ""))
            for t in span.get("tags", [])}


def jaeger_json_to_table(doc: dict) -> pa.Table:
    """Convert one Jaeger JSON document ({"data": [trace, ...]})."""
    conv, turn, role, text, tool, ts = [], [], [], [], [], []
    for trace in doc.get("data", []):
        procs = trace.get("processes", {})
        spans = sorted(trace.get("spans", []),
                       key=lambda s: (s.get("startTime", 0),
                                      s.get("spanID", "")))
        for i, span in enumerate(spans):
            tags = _tags_dict(span)
            kind = tags.get("span.kind", "")
            svc = procs.get(span.get("processID", ""), {}).get(
                "serviceName", "")
            parts = [span.get("operationName", "")]
            for tag_key, marker in _TAG_MARKERS.items():
                if tag_key in tags:
                    parts.append(f"{marker}={tags[tag_key]}")
            conv.append(trace.get("traceID", ""))
            turn.append(i)
            role.append(_KIND_ROLE.get(kind, "assistant"))
            text.append(" ".join(p for p in parts if p))
            tool.append(svc)
            ts.append(int(span.get("startTime", 0)))  # Jaeger µs epoch
    return pa.table({
        "conv_id": pa.array(conv, pa.string()),
        "turn_idx": pa.array(turn, pa.int32()),
        "role": pa.array(role, pa.string()),
        "text": pa.array(text, pa.string()),
        "tool": pa.array(tool, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    }, schema=TRANSCRIPT_SCHEMA)


def read_jaeger_json(paths: list[str]) -> "pa.Table":
    """Read one or more Jaeger JSON files into a transcript table."""
    tables = []
    for p in paths:
        with open(p) as f:
            tables.append(jaeger_json_to_table(json.load(f)))
    return pa.concat_tables(tables) if tables else jaeger_json_to_table(
        {"data": []})
