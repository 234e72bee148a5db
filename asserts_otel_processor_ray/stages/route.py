"""Stage 5 — routed-trace fan-out (S3/M13/K4).

The reference's flush drains retained traces to the next consumer
(sampler.go:215-276), rebuilding each trace with non-internal spans
first then internal, per segment (utils.go:109-126).  Here a batch run
has one logical flush: turns of winner conversations are kept, stamped
with the final ``asserts.sample.type`` attrs, and written to one Parquet
sink per class (error / slow / normal) plus an optional pass-through
sink of everything (processor.go:70-74 when sample_traces=false).

Rows carry ``(conv_id, seg_order, class_order, turn_idx, scan_rank)``
so the routed emit order (scan order) is reconstructible after any
shuffle; blocks are already emitted in scan order by assemble.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

ROUTE_ADDED = [
    ("asserts_sample_type", pa.string()),   # span-level attr
    ("sample_type", pa.string()),           # trace-level routed class
]


class RouteStage:
    """map_batches stage: keep winner conversations, stamp attrs.

    winner_map: conv_id → trace-level sample type (error/slow/normal)
    normal_convs: conv_ids sampled as normal (their ncand main turn gets
    the span-level "normal" attr — sampler.go:166-170).
    """

    def __init__(self, winner_map: dict[str, str]):
        self.winner_map = winner_map
        self.normal_convs = {c for c, t in winner_map.items()
                             if t == "normal"}

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            out = batch
            for name, typ in ROUTE_ADDED:
                out = out.append_column(name, pa.nulls(0, typ))
            return out
        conv = batch.column("conv_id").to_numpy(zero_copy_only=False)
        sample = pd.Series(conv).map(self.winner_map)
        keep = sample.notna().to_numpy()
        batch = batch.filter(pa.array(keep))
        if batch.num_rows == 0:
            out = batch
            for name, typ in ROUTE_ADDED:
                out = out.append_column(name, pa.nulls(0, typ))
            return out
        conv = conv[keep]
        sample = sample[keep].to_numpy()

        turn_attr = batch.column("turn_sample_type").to_numpy(
            zero_copy_only=False)
        is_ncand_main = batch.column("is_ncand_main").to_numpy(
            zero_copy_only=False)
        is_normal = pd.Series(conv).isin(self.normal_convs).to_numpy()
        attr = np.where(is_ncand_main & is_normal, "normal", turn_attr)

        out = batch.append_column("asserts_sample_type",
                                  pa.array(attr, pa.string()))
        out = out.append_column("sample_type", pa.array(sample, pa.string()))
        return out


ROUTED_COLUMNS = [
    "conv_id", "turn_idx", "role", "text", "tool", "ts",
    "kind", "namespace", "service", "span_name", "status_code",
    "asserts_request_type", "asserts_request_context", "asserts_error_type",
    "asserts_sample_type", "sample_type", "entity_key", "latency_s",
    "seg_order", "class_order", "scan_rank",
]
