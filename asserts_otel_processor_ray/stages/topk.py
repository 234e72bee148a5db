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

All three are semilattice reductions, so they run **two-phase**: a
vectorized per-batch partial reduce inside ``map_batches`` (map-side
combine — this is also the skew mitigation: a hot (entity, request)
pair is reduced to ≤K rows per block before anything moves), then a
driver-side merge of the partials.  The partials are bounded by the
caps (≤ limit contexts per service, ≤K per pair, one winner per
bucket), so no shuffle of the full data ever happens and the driver
merge stays small.  This beats a Ray groupby here because each
all-to-all operator carries seconds of fixed cost that dwarfs these
kilobyte-sized reductions.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray
import ray.data

# NB: not "\x00" — numpy fixed-width unicode strips trailing NULs, which
# silently deletes a NUL separator inside np.char.add.
PAIR_SEP = "\x1f"


def default_shuffle_blocks(floor: int = 8) -> int:
    """Hash-repartition width derived from cluster CPUs (1× CPUs, with
    a small-cluster floor).  The extras' shuffle stages take this as
    their default so a wider cluster automatically gets wider
    exchanges — a fixed width is a per-block memory ceiling at scale
    (each partition is processed as ONE block by the block kernels)."""
    try:
        ncpus = int(ray.cluster_resources().get("CPU", floor))
    except Exception:
        ncpus = floor
    return max(floor, ncpus)


# don't over-partition tiny inputs (each extra partition pays fixed
# exchange/aggregator cost — measured 2x on 100k-row inputs at width
# 32 vs 8) ...
_MIN_ROWS_PER_PARTITION = 16_384
# ... and don't let one partition-block outgrow worker memory at scale
# (keyed partitions are processed as ONE block by the block kernels)
_MAX_ROWS_PER_PARTITION = 4_000_000


def shuffle_width(n_rows: int | None = None, floor: int = 8) -> int:
    """Data-aware hash-repartition width: CPU-scaled like
    default_shuffle_blocks, but clamped so partitions hold at least
    ~_MIN_ROWS_PER_PARTITION rows (tiny inputs don't pay a wide
    exchange's fixed costs) and at most ~_MAX_ROWS_PER_PARTITION rows
    (the block-memory ceiling — this bound may EXCEED cluster CPUs,
    which is correct: excess partitions just queue).  Pass the
    (cheaply known, e.g. parquet-metadata) input row count; with
    ``n_rows=None`` behaves exactly like default_shuffle_blocks."""
    w = default_shuffle_blocks(floor)
    if n_rows is not None:
        w = min(w, max(floor, -(-int(n_rows) // _MIN_ROWS_PER_PARTITION)))
        w = max(w, -(-int(n_rows) // _MAX_ROWS_PER_PARTITION))
    return w


def use_hash_shuffle(ds: "ray.data.Dataset", nparts: int) -> None:
    """Route this dataset's key-based repartitions / joins / groupbys
    through the hash-shuffle backend, with the aggregator pool scaled
    to the shuffle width (one aggregator per ~4 partitions, floor 8 —
    the single sizing policy for every keyed exchange in the repo)."""
    from ray.data.context import ShuffleStrategy
    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ds.context.max_hash_shuffle_aggregators = max(8, nparts // 4)


def collect_df(ds: "ray.data.Dataset") -> pd.DataFrame:
    """Materialize a (small, pre-reduced) dataset to a driver DataFrame."""
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows > 0]
    if not tables:
        return pd.DataFrame()
    return pa.concat_tables(tables,
                            promote_options="permissive").to_pandas()


def allowed_pairs_from_df(df: pd.DataFrame, entity_col: str,
                          request_col: str, first_seen_col: str,
                          limit: int) -> frozenset[str]:
    """Driver-side final of the cap: min first-seen per pair, then the
    first `limit` request contexts per entity."""
    if df.empty:
        return frozenset()
    idx = df.groupby([entity_col, request_col])[first_seen_col].idxmin()
    firsts = df.loc[idx].sort_values(first_seen_col, kind="mergesort")
    capped = firsts.groupby(entity_col, sort=False).head(limit)
    return frozenset(
        (capped[entity_col] + PAIR_SEP + capped[request_col]).tolist())


def compute_allowed_pairs(seg_rows: "ray.data.Dataset",
                          entity_col: str, request_col: str,
                          first_seen_col: str,
                          limit: int) -> frozenset[str]:
    """First `limit` distinct request contexts per entity by first-seen.

    `seg_rows` must already be partially reduced per batch (one row per
    (entity, request) per block); the final reduce + per-entity rank
    happens on the driver and is bounded by distinct pairs.
    """
    return allowed_pairs_from_df(collect_df(seg_rows), entity_col,
                                 request_col, first_seen_col, limit)


_NC_KEYS = ["ncand_entity", "ncand_request", "ncand_bucket"]


def periodic_normal_winners(ncands: "ray.data.Dataset") -> list[dict]:
    """One winner per (entity, request, bucket): min arrival.

    Two-phase: per-batch idxmin partial, driver-side final idxmin.
    Input rows need: ncand_entity, ncand_request, ncand_bucket,
    ncand_latency, arrival_key, conv_id.
    """
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        idx = df.groupby(_NC_KEYS, sort=False)["arrival_key"].idxmin()
        return df.loc[idx]

    df = collect_df(ncands.map_batches(partial, batch_format="pandas"))
    if df.empty:
        return []
    idx = df.groupby(_NC_KEYS, sort=False)["arrival_key"].idxmin()
    return df.loc[idx].to_dict("records")


_ITEM_KEYS = ["entity", "request", "qtype"]


def topk_df(df: pd.DataFrame, k: int,
            keys: list[str] = _ITEM_KEYS) -> pd.DataFrame:
    """Vectorized per-group top-K by (latency desc, arrival desc)."""
    df = df.sort_values(keys + ["latency", "arrival_key"],
                        ascending=[True] * len(keys) + [False, False],
                        kind="mergesort")
    rank = df.groupby(keys, sort=False).cumcount()
    return df[rank < k]


def topk_items(items: "ray.data.Dataset", k: int) -> list[dict]:
    """Top-K per (entity, request, qtype): per-batch partial top-K then
    driver-side final top-K (top-K is a semilattice, so two-phase is
    exact).  Ties prefer later arrival (heap replace-on-tie semantics,
    priority_queue.go:49-57)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return topk_df(df, k)

    df = collect_df(items.map_batches(partial, batch_format="pandas"))
    if df.empty:
        return []
    return topk_df(df, k).to_dict("records")


def topk_order(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """The deterministic top-K rule for one (entity, request, qtype)
    group: latency desc, later arrival wins ties (unit-testable form)."""
    df = df.sort_values(["latency", "arrival_key"],
                        ascending=[False, False], kind="mergesort")
    return df.head(k)
