"""Distributed selection: cardinality caps, periodic-normal sampling and
per-(entity, request) top-K — the batch re-expression of the reference's
mutable queue/cache state (T3-T5):

* cap: first ``LimitPerService`` distinct request contexts per entity by
  first-seen arrival (service_queue.go:49-66; ttlcache admission order)
* periodic normal sample: one trace per (entity, request) per N-minute
  event-time bucket, first-arrival wins (periodic_sampler.go:13-31)
* top-K per (entity, request, queue): K = min(5, limit); bounded heap
  whose eviction keeps the highest-latency K and, on latency ties,
  prefers the LATER arrival (the incoming item replaces the popped
  incumbent when ``pop.latency > item.latency`` is false —
  priority_queue.go:44-58), hence the (latency desc, arrival desc)
  deterministic order.

All of these are groupby/map_groups over *candidate-filtered* datasets
(tiny next to the turn table), so the only full-data shuffle in the
pipeline stays the one conv_id repartition.
"""

from __future__ import annotations

import pandas as pd

import ray.data

# NB: not "\x00" — numpy fixed-width unicode strips trailing NULs, which
# silently deletes a NUL separator inside np.char.add.
PAIR_SEP = "\x1f"


def compute_allowed_pairs(seg_rows: "ray.data.Dataset",
                          entity_col: str, request_col: str,
                          first_seen_col: str,
                          limit: int) -> frozenset[str]:
    """First `limit` distinct request contexts per entity by first-seen.

    `seg_rows` must have one row per (entity, request) *occurrence*;
    reduction happens here.  Returns packed "entity\\x00request" keys.
    The per-entity result is bounded (≤ limit), so take_all() is small.
    """
    firsts = seg_rows.groupby([entity_col, request_col]).min(first_seen_col)
    min_col = f"min({first_seen_col})"

    def head_limit(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(min_col, kind="mergesort")
        return df.head(limit)

    capped = firsts.groupby(entity_col).map_groups(
        head_limit, batch_format="pandas")
    rows = capped.take_all()
    return frozenset(r[entity_col] + PAIR_SEP + r[request_col] for r in rows)


def periodic_normal_winners(ncands: "ray.data.Dataset") -> list[dict]:
    """One winner per (entity, request, bucket): min arrival.

    Input rows need: ncand_entity, ncand_request, ncand_bucket,
    ncand_latency, arrival_key, conv_id.
    """
    def head1(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("arrival_key", kind="mergesort").head(1)

    winners = ncands.groupby(
        ["ncand_entity", "ncand_request", "ncand_bucket"]).map_groups(
        head1, batch_format="pandas")
    return winners.take_all()


def topk_items(items: "ray.data.Dataset", k: int) -> list[dict]:
    """Top-K per (entity, request, qtype) by (latency desc, arrival desc).

    Input rows: entity, request, qtype, sample_type, latency, arrival_key,
    conv_id.  Ties prefer later arrival (heap replace-on-tie semantics,
    priority_queue.go:49-57).
    """
    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["latency", "arrival_key"],
                            ascending=[False, False], kind="mergesort")
        return df.head(k)

    winners = items.groupby(["entity", "request", "qtype"]).map_groups(
        topk, batch_format="pandas")
    return winners.take_all()
