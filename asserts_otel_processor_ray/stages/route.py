"""Stage 5 — routed-trace fan-out (S3/M13/K4).

The reference's flush drains retained traces to the next consumer
(sampler.go:215-276), rebuilding each trace with non-internal spans
first then internal, per segment (utils.go:109-126).  A batch run has
one logical flush: turns of winner conversations are kept, stamped with
the final ``asserts.sample.type`` attrs, and written to one Parquet
sink per class (error / slow / normal).

Shuffle discipline: the heavy source columns (``text`` and friends)
never ride the pipeline's sort — decisions are made on slim columns,
and this stage re-attaches the source columns by scanning the ORIGINAL
input and merging the broadcast winner-conversation rows (bounded:
winners ≤ services × limit × K conversations) on (conv_id, turn_idx).

Rows carry ``(conv_id, seg_order, class_order, turn_idx, scan_rank)``
so the routed emit order (scan order) is reconstructible after any
shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

ROUTED_COLUMNS = [
    "conv_id", "turn_idx", "role", "text", "tool", "ts",
    "kind", "namespace", "service", "span_name", "status_code",
    "asserts_request_type", "asserts_request_context", "asserts_error_type",
    "asserts_sample_type", "sample_type", "entity_key", "latency_s",
    "seg_order", "class_order", "scan_rank",
]

# decided-side columns the join contributes
_DECIDED_COLS = [
    "conv_id", "turn_idx", "kind", "namespace", "service", "span_name",
    "status_code", "asserts_request_type", "asserts_request_context",
    "asserts_error_type", "entity_key", "latency_s", "seg_order",
    "class_order", "scan_rank", "turn_sample_type", "is_ncand_main",
]


def winner_rows_table(decided_batch: pa.Table,
                      winner_convs: pa.Array) -> pa.Table:
    """Per-batch filter: decided rows of winner conversations (the
    broadcast side of the route join)."""
    keep = pc.is_in(decided_batch.column("conv_id"),
                    value_set=winner_convs)
    return decided_batch.filter(keep).select(_DECIDED_COLS)


class RouteJoinStage:
    """map_batches stage over the ORIGINAL transcript input: keep winner
    conversations, merge the broadcast decided rows, stamp sample-type
    attrs (span-level marks survive; a normal winner's main turn gets
    "normal" — sampler.go:89,102,166-170)."""

    def __init__(self, decided_rows: pa.Table,
                 winner_map: dict[str, str]):
        # one-time derivation of the stamped columns (pandas is fine
        # here: the broadcast side is top-K-bounded by construction)
        df = decided_rows.to_pandas()
        df["sample_type"] = df["conv_id"].map(winner_map)
        is_normal = df["sample_type"] == "normal"
        df["asserts_sample_type"] = np.where(
            df["is_ncand_main"].to_numpy(dtype=bool) & is_normal,
            "normal", df["turn_sample_type"])
        df = df.drop(columns=["turn_sample_type", "is_ncand_main"])
        df = df.sort_values(["conv_id", "turn_idx"], ignore_index=True)
        self.tbl = pa.Table.from_pandas(df, preserve_index=False)
        # sorted conv ids of the broadcast side: each batch joins only
        # the slice covering its own conv range (clustered batches span
        # few convs, so the per-task hash-join build shrinks ~|tasks|×;
        # an unclustered batch degrades to the full table — still exact)
        self._conv_np = df["conv_id"].to_numpy()
        self.winner_convs = pa.array(sorted(winner_map), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("conv_id"),
                        value_set=self.winner_convs)
        batch = batch.filter(keep)
        if batch.num_rows == 0:
            return _empty_routed()
        src = batch.select(["conv_id", "turn_idx", "role", "text",
                            "tool", "ts"])
        mm = pc.min_max(src.column("conv_id")).values()
        lo_c, hi_c = (v.as_py() for v in mm)
        lo = int(np.searchsorted(self._conv_np, lo_c, "left"))
        hi = int(np.searchsorted(self._conv_np, hi_c, "right"))
        right = self.tbl.slice(lo, hi - lo)
        # Acero join requires exactly-matching key types
        if (right.schema.field("turn_idx").type
                != src.schema.field("turn_idx").type):
            idx = right.schema.get_field_index("turn_idx")
            right = right.set_column(
                idx, "turn_idx",
                right.column("turn_idx").cast(
                    src.schema.field("turn_idx").type))
        merged = src.join(right, keys=["conv_id", "turn_idx"],
                          join_type="inner")
        # hash joins return arbitrary row order; restore scan order so
        # block contents stay deterministic across runs
        merged = merged.sort_by([("conv_id", "ascending"),
                                 ("turn_idx", "ascending")])
        out = merged.select(ROUTED_COLUMNS)
        return out.cast(_routed_schema(out.schema))


def _routed_schema(schema: pa.Schema) -> pa.Schema:
    fields = []
    for f in schema:
        if f.name in ("seg_order",):
            fields.append(pa.field(f.name, pa.int32()))
        elif f.name in ("class_order",):
            fields.append(pa.field(f.name, pa.int8()))
        elif f.name in ("scan_rank",):
            fields.append(pa.field(f.name, pa.int32()))
        else:
            fields.append(f)
    return pa.schema(fields)


def _empty_routed() -> pa.Table:
    cols: dict[str, pa.Array] = {}
    for name in ROUTED_COLUMNS:
        if name == "turn_idx":
            cols[name] = pa.nulls(0, pa.int32())
        elif name == "ts":
            cols[name] = pa.nulls(0, pa.timestamp("us"))
        elif name == "latency_s":
            cols[name] = pa.nulls(0, pa.float64())
        elif name == "seg_order":
            cols[name] = pa.nulls(0, pa.int32())
        elif name == "class_order":
            cols[name] = pa.nulls(0, pa.int8())
        elif name == "scan_rank":
            cols[name] = pa.nulls(0, pa.int32())
        else:
            cols[name] = pa.nulls(0, pa.string())
    return pa.table(cols)
