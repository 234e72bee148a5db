"""The composed Ray Data plan: parse → enrich → assemble → decide →
route → aggregate (SURVEY.md §3 E1 re-expression).

Physical shape (designed for a multi-node cluster; tested local):

* AT MOST one full-data exchange: conversation-clustered input (the
  common case for transcript logs, PROVEN from parquet row-group
  statistics at plan time) needs NO exchange at all — read blocks
  already co-locate conversations up to block-boundary straddles;
  unclustered input falls back to ONE range sort on
  (conv_h, conv_id, turn_idx).  Either way boundary conversations
  (≤2 per block) get an exact side pass, so every per-conversation
  step is a vectorized ``map_batches`` over whole-conversation blocks
  (no per-group Python calls).  See build_decided_ex's ``shuffle``
  docstring for the measured plan comparison (none/sort/hash).
* the enrich stage is an actor pool (regex tables + threshold store
  compiled once per actor in ``__init__``)
* caps / periodic sampling / top-K / aggregates are two-phase: a
  per-batch partial reduce (map-side combine — also the skew story:
  hot keys collapse to ≤K rows per block before anything moves) and a
  bounded driver merge; nothing else shuffles
* winner sets are bounded (≤ services × limit × K) and broadcast back
  into the route stage as plain dicts
* exactly FOUR Ray executions per run: read→parse→enrich→slim→sort→
  assemble (the sort stays lazy; assemble is its only consumer),
  decide (whose map also emits the winner/histogram partials through
  the collector), winner-row extraction, and route; the two
  materialize() points (assembled, decided) exist because a later
  stage needs the earlier one complete — at 100 TB they become
  partitioned Parquet checkpoints via state/checkpoint.py instead of
  object-store caching
* per-block partials (edge rows, admission/metric caps, A1-A4 counts,
  winner top-K + histogram) ride zero-CPU collector actors SHARDED by
  a deterministic hash of the block's (conv, turn) range key — no
  single actor funnels every block's push — see state/collector.py
  for the delivery/dedup/deep-copy contract.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.context import ShuffleStrategy

from asserts_otel_processor_ray.config import PipelineConfig
from asserts_otel_processor_ray.schema import TRANSCRIPT_SCHEMA
from asserts_otel_processor_ray.stages.aggregate import (
    latency_histogram,
    sampled_trace_counts,
    span_counts,
)
from asserts_otel_processor_ray.stages.classify import (
    AssembleStage,
    DecideStage,
)
from asserts_otel_processor_ray.stages.enrich import EnrichStage
from asserts_otel_processor_ray.stages.parse import ParseStage
from asserts_otel_processor_ray.stages.route import (
    ROUTED_COLUMNS,
    RouteJoinStage,
    winner_rows_table,
)
from asserts_otel_processor_ray.stages.topk import PAIR_SEP

SINKS = ("error", "slow", "normal")


def _heavy_scan_cpus() -> int:
    """String-heavy scans hit allocator/bandwidth contention beyond ~16
    concurrent tasks on one node; give them 2 CPUs per task on big
    clusters (measured 3x on 32 CPUs, no effect at 8)."""
    import ray as _ray
    try:
        ncpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpus = 8
    return 2 if ncpus >= 16 else 1


def _filter_col(ds: "ray.data.Dataset", col: str) -> "ray.data.Dataset":
    """Vectorized boolean-column filter (avoids per-row Dataset.filter)."""
    return ds.map_batches(lambda t, c=col: t.filter(t.column(c)),
                          batch_format="pyarrow")


@dataclass
class PipelineResult:
    routed: "ray.data.Dataset"
    winners: list[dict]
    winner_map: dict[str, str]
    aggregates: dict[str, Any] = field(default_factory=dict)
    decided: "ray.data.Dataset | None" = None
    sink_paths: dict[str, str] = field(default_factory=dict)


def read_transcripts(path: str,
                     num_blocks: int | None = None) -> "ray.data.Dataset":
    """Column-pruned parquet read of the transcript table.

    ``num_blocks`` caps read fragmentation: without it the read splits
    per row-group (~32k rows), every downstream op pays per-task
    overhead × blocks, and the per-block partial reductions multiply
    (measured: the sf1 sort phase halves at 2×CPU blocks)."""
    kwargs = {}
    if num_blocks is not None:
        kwargs["override_num_blocks"] = num_blocks
    return ray.data.read_parquet(path, columns=TRANSCRIPT_SCHEMA.names,
                                 **kwargs)


# On-disk parquet bytes per read block.  The block-count floor
# (2×CPU, for pipelining) must not turn a huge input into huge
# blocks: 100 TB at a fixed 64-block count would be 1.5 TB blocks.
# ~256 MB of parquet ≈ 0.5-1 GB in-memory Arrow — comfortably inside
# a worker heap at batch_size=None.
TARGET_READ_BLOCK_BYTES = 256 * 1024 * 1024


def default_read_blocks(input_path, ncpus: int) -> int:
    """Block count for a read: at least 2×CPU (pipelining floor), and
    at least enough that a block stays under TARGET_READ_BLOCK_BYTES
    of on-disk parquet (memory ceiling — the scale constraint)."""
    base = max(32, ncpus * 2)
    if not isinstance(input_path, str):
        return base
    import glob as _glob
    import math as _math
    import os as _os
    try:
        files = ([input_path] if _os.path.isfile(input_path)
                 else _glob.glob(_os.path.join(input_path, "*.parquet")))
        total = sum(_os.path.getsize(f) for f in files)
    except OSError:
        return base
    return max(base, _math.ceil(total / TARGET_READ_BLOCK_BYTES))


def build_enriched(ds: "ray.data.Dataset", config: PipelineConfig, *,
                   enrich_concurrency=None) -> "ray.data.Dataset":
    # batch_size=None: one whole block per call — the arrow kernels
    # want the biggest batches the blocks allow
    parse = ParseStage(config)
    parsed = ds.map_batches(parse, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
    kwargs = {}
    if enrich_concurrency is not None:
        kwargs["concurrency"] = enrich_concurrency
        enriched = parsed.map_batches(
            EnrichStage, fn_constructor_args=(config,),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None, **kwargs)
    else:
        # task-based fallback: EnrichStage built per task via closure
        stage = EnrichStage(config)
        enriched = parsed.map_batches(stage, batch_format="pyarrow",
                                      zero_copy_batch=True,
                                      batch_size=None)
    return enriched


def slim_columns(names: list[str], config: PipelineConfig) -> list[str]:
    """Columns that ride the sort: everything except the heavy source
    text/role/tool, the extracted attrs not promoted to metric labels,
    and the two enrich outputs that are pure functions of columns that
    ride anyway — ``entity_key`` (f(namespace, service, config), ~30% of
    the measured slim bytes: a ~60 B templated string per row) and
    ``latency_threshold_s`` (f(entity_key, request context, config)).
    The sort is the pipeline's only all-to-all exchange, so dropping
    them cuts the exchanged bytes ~34%; the assemble scan re-derives
    them (stages/enrich.py:EntityThresholdDeriver — a distinct-triple
    lookup, bitwise-equal to the enrich computation) before any kernel
    sees the rows.  Routed output re-attaches the dropped source
    columns via the winner-row broadcast join (stages/route.py).

    [Measured alternative, rejected: per-block `pc.dictionary_encode`
    of the wide string columns shrinks bytes 2.5× but Ray's sort-reduce
    degrades badly on dictionary blocks — sf2/32cpu wall went 34.5 s →
    63.8 s; plain strings + column dropping wins.]"""
    keep = []
    for c in names:
        if c in ("text", "role", "tool", "entity_key",
                 "latency_threshold_s"):
            continue
        if c.startswith("attr_") and \
                c not in config.attributes_as_metric_labels:
            continue
        keep.append(c)
    return keep


def parquet_conv_clustered(path: str, column: str = "conv_id") -> bool:
    """True iff the parquet dataset's row-group statistics PROVE the
    table is clustered by ``column``: in lexical file order, every row
    group's [min, max] chain is monotone non-overlapping (equality
    allowed — a conversation may straddle row-group/file boundaries).

    Used by the shuffle="auto" plan: transcript logs are typically
    written conversation-clustered (per-session appends), and a
    clustered input needs NO exchange at all — the read blocks already
    co-locate conversations up to block-boundary straddles, which the
    existing edge-repair machinery handles.  The proof is sound for any
    writer that emits rows in order (the stats chain pins cross-row-
    group order; the per-block run-contiguity guard in the assemble
    scan catches within-row-group interleaving at run time).

    Cost: one parquet-footer metadata read per file on the driver —
    O(files), no data bytes.  At very large file counts shard this
    across Ray tasks; the check is embarrassingly parallel."""
    import glob
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    elif os.path.isfile(path):
        files = [path]
    else:
        return False
    if not files:
        return False
    prev_max = None
    for f in files:
        try:
            md = pq.read_metadata(f)
        except Exception:
            return False
        names = md.schema.names
        if column not in names:
            return False
        ci = names.index(column)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                return False
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                mn, mx = mn.decode(), mx.decode()
            if prev_max is not None and mn < prev_max:
                return False
            prev_max = mx
    return True


def _slim_with_sort_hash(t: pa.Table, config: PipelineConfig) -> pa.Table:
    """Slim projection + the ``conv_h`` sort-accelerator column: a
    deterministic (process-independent: pandas siphash with its fixed
    key, not PYTHONHASHSEED) 64-bit hash of conv_id, computed over the
    block's DISTINCT conv values and scattered back.  See the sort-key
    comment in build_decided_ex for why an integer-led key matters; the
    assemble scan drops the column before any kernel sees the rows."""
    t = t.select(slim_columns(t.schema.names, config))
    if t.num_rows == 0:
        return t.append_column("conv_h", pa.nulls(0, pa.uint64()))
    conv_np = t.column("conv_id").to_numpy(zero_copy_only=False)
    codes, uniq = pd.factorize(conv_np)
    hu = pd.util.hash_array(np.asarray(uniq, dtype=object))
    return t.append_column("conv_h", pa.array(hu[codes], pa.uint64()))


@dataclass
class DecidedBuild:
    """Output of build_decided_ex: the decided (or, with
    with_decide=False, assembled) turn table plus the small partial
    reductions drained from the assemble/decide passes' collector."""
    decided: "ray.data.Dataset"
    allowed: frozenset[str]
    counts_df: "pd.DataFrame | None" = None   # kind-tagged tcount/scount
    mseen_df: "pd.DataFrame | None" = None    # metric-cap first-seen pairs
    metric_allowed: frozenset[str] = frozenset()
    winhist_tbls: "list[pa.Table] | None" = None  # winner(+hist) partials
    winhist_coverage: int = 0   # Σ input rows covered by winhist_tbls


def _seg_cap_partial(t: pa.Table, limit: int) -> pa.Table:
    """Per-block partial for the admission cap (T3/T5): min first-seen
    per (entity, request), then per-entity first `limit` by first-seen.
    The pre-cap is exact: a globally-admitted pair attains its global
    min first-seen in some block, and in that block fewer than `limit`
    pairs can precede it, so it survives that block's local cap — the
    driver merge is bounded by blocks × entities × limit."""
    t = t.filter(t.column("is_seg_main"))
    t = t.select(["entity_key", "seg_request", "seg_first_seen"])
    if t.num_rows == 0:
        return t
    gb = t.group_by(["entity_key", "seg_request"]).aggregate(
        [("seg_first_seen", "min")])
    gb = gb.rename_columns(
        ["entity_key", "seg_request", "seg_first_seen"])
    df = gb.to_pandas().sort_values("seg_first_seen", kind="mergesort")
    df = df.groupby("entity_key", sort=False).head(limit)
    return pa.Table.from_pandas(df, preserve_index=False)


def _count_partials_tbl(t: pa.Table) -> pa.Table:
    """A1/A3 partials from an assembled block: trace count (rows with
    scan_rank 0 ≡ one per conversation) and per-(ns, svc) span counts."""
    import pyarrow.compute as pc
    n_traces = pc.sum(pc.equal(t.column("scan_rank"), 0)).as_py() or 0
    sc = t.select(["namespace", "service"]).group_by(
        ["namespace", "service"]).aggregate([([], "count_all")])
    sdf = sc.rename_columns(
        ["namespace", "service", "partial_count"]).to_pandas()
    sdf.insert(0, "kind", "scount")
    tdf = pd.DataFrame({"kind": ["tcount"], "namespace": [""],
                        "service": [""], "partial_count": [n_traces]})
    return pa.Table.from_pandas(pd.concat([tdf, sdf], ignore_index=True),
                                preserve_index=False)


def _tbls_to_df(tbls: list[pa.Table]) -> pd.DataFrame:
    tbls = [t for t in tbls if t.num_rows > 0]
    if not tbls:
        return pd.DataFrame()
    return pa.concat_tables(tbls,
                            promote_options="permissive").to_pandas()


# Above this many drained partial rows, the driver-side final merges
# pre-reduce through a DISTRIBUTED groupby first (the q_window_dedup
# recipe) so the driver frame is bounded by distinct groups, not
# blocks × groups.  ~10⁴ blocks of bounded partials stay comfortably
# under it; 10⁵+ blocks at 100 TB trip the distributed path.  Module
# level so tests can force the distributed path with a tiny value.
DRIVER_PARTIAL_ROW_BUDGET = 2_000_000


def _cap_partials_df(tbls: list[pa.Table]) -> pd.DataFrame:
    """seg/mseen cap partials → driver frame for allowed_pairs_from_df.

    Beyond DRIVER_PARTIAL_ROW_BUDGET rows the min-first-seen reduce runs
    as a distributed groupby (min is the semilattice these partials
    already use), so the driver only ranks one row per distinct
    (entity, request) pair."""
    tbls = [t for t in tbls if t.num_rows > 0]
    total = sum(t.num_rows for t in tbls)
    if total <= DRIVER_PARTIAL_ROW_BUDGET:
        return _tbls_to_df(tbls)
    import ray as _ray
    from ray.data.aggregate import Min
    red = (ray.data.from_arrow(tbls)
           .groupby(["entity_key", "seg_request"])
           .aggregate(Min("seg_first_seen")))
    df = _tbls_to_df(list(_ray.get(red.to_arrow_refs())))
    return df.rename(columns={"min(seg_first_seen)": "seg_first_seen"})


def _normalize_to_schema(tbls: list[pa.Table]) -> list[pa.Table]:
    """Give every table the unified column set (null-filled) so Ray can
    treat them as one dataset; cheap — touches schemas, not data."""
    schema = pa.unify_schemas([t.schema for t in tbls],
                              promote_options="permissive")
    out = []
    for t in tbls:
        for f in schema:
            if t.schema.get_field_index(f.name) < 0:
                t = t.append_column(f.name, pa.nulls(t.num_rows, f.type))
        out.append(t.select([f.name for f in schema]).cast(schema))
    return out


def _reduce_winhist(tbls: list[pa.Table], config: PipelineConfig,
                    capture_hist: bool, window: bool
                    ) -> "tuple[pa.Table | None, pa.Table | None]":
    """kind-tagged winner(+hist) partials → (win_tbl, hist_tbl).

    Driver Arrow path below DRIVER_PARTIAL_ROW_BUDGET rows (group_by +
    filter, multithreaded).  Beyond it, each kind pre-reduces
    DISTRIBUTED first — item → per-key top-K (a total order: arrival
    keys are unique, so two-phase is exact), ncand → min-arrival row
    per bucket, hist → label×le sums — and the driver only sees one row
    per distinct group (VERDICT r3 item 5)."""
    import pyarrow.compute as pc
    tbls = [t for t in tbls if t.num_rows > 0]
    if not tbls:
        return None, None
    win_cols = ["kind", "conv_id", "entity", "request", "qtype",
                "sample_type", "latency", "arrival_key", "bucket"]
    base_keys: list[str] = []
    if window:
        win_cols.append("window")
        base_keys = ["window"]
    nc_keys = base_keys + ["entity", "request", "bucket"]
    total = sum(t.num_rows for t in tbls)

    if total <= DRIVER_PARTIAL_ROW_BUDGET:
        tbl = pa.concat_tables(tbls, promote_options="permissive")
        kind = tbl.column("kind")
        nc_tbl = tbl.filter(pc.equal(kind, "ncand"))
        if nc_tbl.num_rows:
            # arrival_key embeds conv_id so the min selects whole rows
            mins = nc_tbl.group_by(nc_keys).aggregate(
                [("arrival_key", "min")])
            nc_tbl = nc_tbl.filter(pc.is_in(
                nc_tbl.column("arrival_key"),
                value_set=mins.column("arrival_key_min")))
        it_tbl = tbl.filter(pc.equal(kind, "item"))
        win_tbl = pa.concat_tables([it_tbl.select(win_cols),
                                    nc_tbl.select(win_cols)])
        hist_tbl = (tbl.filter(pc.equal(kind, "hist"))
                    if capture_hist else None)
        return win_tbl, hist_tbl

    # ---- distributed pre-reduce ------------------------------------
    import ray as _ray
    from asserts_otel_processor_ray.stages.aggregate import (
        histogram_label_columns)
    from asserts_otel_processor_ray.stages.topk import topk_df
    k = config.per_request_topk
    item_keys = base_keys + ["entity", "request", "qtype"]
    ds = ray.data.from_arrow(_normalize_to_schema(tbls))

    def _sel(t: pa.Table, kind_val: str) -> pa.Table:
        return t.filter(pc.equal(t.column("kind"), kind_val))

    def _item_red(df: pd.DataFrame) -> pd.DataFrame:
        return topk_df(df, k, keys=item_keys)[win_cols]

    def _nc_red(df: pd.DataFrame) -> pd.DataFrame:
        idx = df.groupby(nc_keys, sort=False)["arrival_key"].idxmin()
        return df.loc[idx][win_cols]

    def _collect(d: "ray.data.Dataset") -> "pa.Table | None":
        parts = [t for t in _ray.get(d.to_arrow_refs()) if t.num_rows]
        return (pa.concat_tables(parts, promote_options="permissive")
                if parts else None)

    items = _collect(
        ds.map_batches(lambda t: _sel(t, "item"), batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(item_keys).map_groups(_item_red, batch_format="pandas"))
    ncs = _collect(
        ds.map_batches(lambda t: _sel(t, "ncand"), batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(nc_keys).map_groups(_nc_red, batch_format="pandas"))
    parts = [t.select(win_cols) for t in (items, ncs) if t is not None]
    win_tbl = (pa.concat_tables(parts, promote_options="permissive")
               if parts else None)

    hist_tbl = None
    if capture_hist:
        from ray.data.aggregate import Sum
        hkeys = ["namespace", "service", "span_kind", "status_code",
                 *histogram_label_columns(config), "le"]
        hvals = ["bucket_count", "latency_sum_us", "latency_count"]
        red = (ds.map_batches(
                   lambda t, hk=hkeys, hv=hvals:
                   _sel(t, "hist").select(hk + hv),
                   batch_format="pyarrow", zero_copy_batch=True)
               .groupby(hkeys)
               .aggregate(*[Sum(v) for v in hvals]))
        hist_tbl = _collect(red)
        if hist_tbl is not None:
            hist_tbl = hist_tbl.rename_columns(
                [c[4:-1] if c.startswith("sum(") else c
                 for c in hist_tbl.schema.names])
    return win_tbl, hist_tbl


def build_decided_ex(ds: "ray.data.Dataset", config: PipelineConfig, *,
                     num_partitions: int | None = None,
                     enrich_concurrency=None,
                     drop_intermediate: bool = False,
                     with_decide: bool = True,
                     collect_agg: bool = False,
                     already_enriched: bool = False,
                     boundary_mode: str = "driver",
                     winner_scan: bool = False,
                     capture_hist: bool = False,
                     window_us: int | None = None,
                     source_path: str | None = None,
                     shuffle: str = "auto") -> DecidedBuild:
    """Everything up to per-trace decisions.

    Partitioning (``shuffle``): all per-conversation kernels need is
    whole conversations co-located per block (assemble_batch sorts its
    own block by (conv_id, turn_idx)).  Four plans:

    * "none" — NO exchange.  Valid when the input is already
      conversation-clustered (each conv one contiguous run in global
      row order — how transcript logs are written in practice): the
      read blocks then co-locate conversations up to block-boundary
      straddles, which the edge-repair machinery reassembles exactly
      as it does for range-sorted blocks.  A per-block run-contiguity
      guard raises if the precondition is violated.  Zero bytes
      exchanged — the scale winner whenever it applies (measured at
      sf1/32cpu: the sort operator alone was 11.5 s wall for 6.6 s
      CPU — pure barrier + quantile overhead).
    * "sort" — global range sort on (conv_h, conv_id, turn_idx); the
      fallback for unclustered input.  Range partitioning also gives
      stable global order, but only per-conversation order is ever
      consumed.
    * "hash" — hash-shuffle repartition on conv_h + per-block sort
      inside assemble; no boundary repair needed (co-location is
      exact).  Measured at sf1/32cpu: wall parity with "sort"
      (14–18 s vs 13–16 s interleaved) but ~9× the shuffle CPU
      (59 s vs 6.6 s — Ray's hash-shuffle splits every block into
      num_partitions string-gather slices); kept as an explicit
      option for skewed-key inputs where range boundaries misbalance.
    * "auto" — "none" when ``source_path`` is given and
      parquet_conv_clustered proves the clustering from row-group
      statistics alone (O(files) footer reads, no data); else "sort".

    Pass discipline (the scaling story): the assemble scan is the ONLY
    read of the sorted table and the decide scan the ONLY read of the
    assembled table.  A sorted block's first/last conversations are
    exactly the boundary-straddling conversations it contains, so each
    block splits itself: edge rows and the kilobyte-size partial
    reductions (admission cap, metric cap, A1/A3 counts) ride a
    side-channel collector actor instead of their own full-table scans.

    ``boundary_mode``: how the boundary conversations reassemble.
    "driver" (default, right for ≤ thousands of blocks): edge rows ride
    the collector and assemble in one driver call.  "distributed" (the
    100× path): each block spills its edge rows to scratch parquet, and
    a groupby(conv_id).map_groups assembles them — no single process
    ever holds an entire hot conversation; bitwise-equal output
    (tests/test_boundary_modes.py).
    """
    import ray as _ray

    from asserts_otel_processor_ray.stages.aggregate import (
        metric_first_seen_fn)
    from asserts_otel_processor_ray.state.collector import (
        add_many_sharded, block_key, drain_tables_sharded,
        get_collectors)
    from asserts_otel_processor_ray.stages.topk import (
        allowed_pairs_from_df)

    ncpus = int(_ray.cluster_resources().get("CPU", 8))
    if num_partitions is None:
        # size-aware when the source layout is known: 2×CPU pipelining
        # floor, TARGET_READ_BLOCK_BYTES memory ceiling
        num_partitions = default_read_blocks(source_path, ncpus)
    # default min_parallelism (200) fragments the sort into hundreds of
    # small blocks; every later scan then pays per-task overhead × blocks
    for attr in ("min_parallelism", "read_op_min_num_blocks"):
        try:
            setattr(ds.context, attr, num_partitions)
        except AttributeError:
            pass
    if already_enriched:
        enriched = ds
    else:
        enriched = build_enriched(ds, config,
                                  enrich_concurrency=enrich_concurrency)
    if shuffle == "auto":
        shuffle = ("none" if (source_path is not None
                              and parquet_conv_clustered(source_path))
                   else "sort")
    if shuffle not in ("none", "sort", "hash"):
        raise ValueError(f"unknown shuffle mode {shuffle!r}")
    split_edges = shuffle != "hash"   # hash co-locates exactly
    if shuffle == "none":
        # no exchange: keep the derived columns (nothing to slim for)
        # and skip conv_h; the projection still drops the heavy text
        # payload so the materialized decided table stays small
        def _proj(t: pa.Table, cfg=config) -> pa.Table:
            return t.select(slim_columns(t.schema.names, cfg)
                            + ["entity_key", "latency_threshold_s"])
        parted = enriched.map_batches(
            _proj, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None)
    else:
        # only slim columns ride the exchange — the text payload stays
        # out entirely (route re-attaches it from the source) and the
        # derivable entity/threshold columns are recomputed after
        slim = enriched.map_batches(
            lambda t, cfg=config: _slim_with_sort_hash(t, cfg),
            batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        if shuffle == "sort":
            # the assemble scan is the sort's only consumer — leave the
            # sort lazy so sort-reduce and assemble run in ONE streamed
            # execution.  conv_h (64-bit hash of conv_id) leads the
            # key: Ray's range partitioner binary-searches each
            # boundary tuple column by column and converts the WHOLE
            # column to numpy per boundary — an object-array conversion
            # for strings (~25 ms × boundaries × blocks ≈ 100 s of the
            # sf2 sort-map CPU, measured).  An integer first key
            # empties the search range before the string column is
            # ever touched (except in the one block holding the
            # boundary's exact hash), and conv_id stays second so a
            # hash collision cannot interleave two conversations.
            parted = slim.sort(["conv_h", "conv_id", "turn_idx"])
        else:
            slim.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
            slim.context.max_hash_shuffle_aggregators = ncpus
            parted = slim.repartition(num_blocks=num_partitions,
                                      keys=["conv_h"])

    # sharded by block key so no single actor funnels every block's
    # push round-trip (or, in driver-boundary mode, all edge rows).
    # The pool is process-cached (actor startup per run costs more than
    # the pushes at bench scale); a per-run nonce isolates this run's
    # partials and the try/finally below clears it on EVERY exit path,
    # including exceptions, so no run can strand entries in the cached
    # pool.
    collectors = get_collectors(max(1, ncpus // 4))
    import uuid as _uuid
    nonce = _uuid.uuid4().hex[:8] + "/"

    def _drain(kind: str) -> list:
        return drain_tables_sharded(collectors, nonce + kind)

    def _cleanup() -> None:
        for c in collectors:
            c.clear_prefix.remote(nonce)
    try:
        stage = AssembleStage(config)
        limit = config.limit_per_service
        mseen_fn = metric_first_seen_fn(limit) if collect_agg else None
        edge_scratch = None
        if boundary_mode == "distributed" and split_edges:
            import tempfile as _tf
            edge_scratch = _tf.mkdtemp(prefix="edge-rows-")

        # re-derives the two columns dropped from the sort payload
        # (slim_columns) — single shared implementation with EnrichStage
        from asserts_otel_processor_ray.stages.enrich import (
            EntityThresholdDeriver)
        deriver = EntityThresholdDeriver(config)

        def assemble_and_push(t: pa.Table, _mode=shuffle) -> pa.Table:
            if _mode != "none":
                t = deriver.attach(t.drop_columns(["conv_h"]))
            if t.num_rows == 0:
                return stage(t)
            key = block_key(t)
            if split_edges:
                conv = t.column("conv_id")
                if _mode == "none":
                    # run-contiguity guard: the no-exchange plan is only
                    # valid when each conv is one contiguous run; the
                    # stats proof covers cross-row-group order, this
                    # catches within-row-group interleaving
                    conv_np = conv.to_numpy(zero_copy_only=False)
                    runs = 1 + int(np.sum(conv_np[1:] != conv_np[:-1]))
                    if runs != len(pd.unique(conv_np)):
                        raise ValueError(
                            "shuffle='none' requires conversation-clustered "
                            "input, but a block has non-contiguous conv_id "
                            "runs; rerun with shuffle='sort'")
                    # mark edge rows by VALUE, not position: the row-group
                    # stats chain proves any conv straddling two blocks
                    # equals one block's max and the other's min conv
                    # VALUE — which can sit positionally interior (block
                    # rows [A, M, B] with A < B < M: M is the max value
                    # but B holds the last row).  For conv-sorted blocks
                    # this coincides with first/last-row marking.
                    mm = pa.compute.min_max(conv)
                    em = pa.compute.or_(
                        pa.compute.equal(conv, mm["min"]),
                        pa.compute.equal(conv, mm["max"]))
                else:
                    # range-sorted blocks are ordered by (conv_h, conv_id,
                    # turn_idx), so the boundary-straddling convs are
                    # exactly the first/last ROWS' convs (conv_id values
                    # are NOT sorted within a block — value-based min/max
                    # would mark the wrong rows here)
                    em = pa.compute.or_(
                        pa.compute.equal(conv, conv[0]),
                        pa.compute.equal(conv, conv[t.num_rows - 1]))
                edge = t.filter(em)
                out = stage(t.filter(pa.compute.invert(em)))
            else:
                edge = None
                out = stage(t)
            items = [(nonce + "seg", key, _seg_cap_partial(out, limit))]
            if edge is not None:
                if edge_scratch is None:
                    items.append((nonce + "edge", key, edge))
                else:
                    # spill edge rows to scratch parquet keyed by block —
                    # no single process ever holds all boundary convs
                    import hashlib as _h
                    import os as _os
                    import pyarrow.parquet as _pq
                    fname = _h.sha256(repr(key).encode()).hexdigest()[:16]
                    _pq.write_table(edge, _os.path.join(
                        edge_scratch, f"edge-{fname}.parquet"))
            if collect_agg:
                items.append((nonce + "mseen", key, mseen_fn(out)))
                items.append((nonce + "counts", key,
                              _count_partials_tbl(out)))
            # blocking get: the task completes only after its partials land
            _ray.get(add_many_sharded(collectors, items))
            return out

        # NB: no repartition after this — a row-balancing repartition could
        # split a conversation across blocks and break the per-batch passes.
        interior = parted.map_batches(
            assemble_and_push, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
            num_cpus=_heavy_scan_cpus()).materialize()

        seg_tbls = _drain("seg")
        mseen_tbls = _drain("mseen") if collect_agg else []
        counts_tbls = _drain("counts") if collect_agg else []

        boundary_ds = None
        assembled_boundary = None
        if edge_scratch is not None:
            # distributed repair: group the spilled edge rows by conv and
            # assemble each conversation where its rows land
            import glob as _glob
            if _glob.glob(edge_scratch + "/*.parquet"):
                edges_ds = ray.data.read_parquet(edge_scratch)
                boundary_ds = edges_ds.groupby("conv_id").map_groups(
                    lambda g: stage(g), batch_format="pyarrow")
                part_fns = [(nonce + "seg",
                             lambda t: _seg_cap_partial(t, limit))]
                if collect_agg:
                    part_fns += [(nonce + "mseen", mseen_fn),
                                 (nonce + "counts", _count_partials_tbl)]

                def boundary_push(t: pa.Table) -> pa.Table:
                    items = [(kind, ("boundary",) + block_key(t), f(t))
                             for kind, f in part_fns]
                    _ray.get(add_many_sharded(collectors, items))
                    return t

                boundary_ds = boundary_ds.map_batches(
                    boundary_push, batch_format="pyarrow",
                    batch_size=None).materialize()
                seg_tbls = _drain("seg")
                if collect_agg:
                    mseen_tbls = _drain("mseen")
                    counts_tbls = _drain("counts")
            import shutil as _sh
            _sh.rmtree(edge_scratch, ignore_errors=True)
            assembled = (interior.union(boundary_ds)
                         if boundary_ds is not None else interior)
        else:
            # driver repair (bounded: ≤ 2 convs × blocks)
            edge_tbls = [t for t in _drain("edge") if t.num_rows > 0]
            if edge_tbls:
                assembled_boundary = stage(pa.concat_tables(edge_tbls))
                seg_tbls.append(_seg_cap_partial(assembled_boundary, limit))
                if collect_agg:
                    mseen_tbls.append(mseen_fn(assembled_boundary))
                    counts_tbls.append(
                        _count_partials_tbl(assembled_boundary))
                assembled = interior.union(
                    ray.data.from_arrow(assembled_boundary))
            else:
                assembled = interior

        allowed = allowed_pairs_from_df(
            _cap_partials_df(seg_tbls), "entity_key", "seg_request",
            "seg_first_seen", limit)
        counts_df = _tbls_to_df(counts_tbls) if collect_agg else None
        mseen_df = _cap_partials_df(mseen_tbls) if collect_agg else None
        metric_allowed: frozenset[str] = frozenset()
        if collect_agg and mseen_df is not None:
            metric_allowed = allowed_pairs_from_df(
                mseen_df, "entity_key", "seg_request", "seg_first_seen",
                limit)

        if not with_decide:
            return DecidedBuild(decided=assembled, allowed=allowed,
                                counts_df=counts_df, mseen_df=mseen_df,
                                metric_allowed=metric_allowed)

        # the flush partials fold into the decide pass: metric_allowed is
        # known BEFORE decide launches, so the winner top-K partials and
        # the A4 histogram partials ride the collector — no extra scan of
        # the decided table exists anywhere in the pipeline
        win_fn = None
        if winner_scan:
            from asserts_otel_processor_ray.stages.aggregate import (
                histogram_partial_fn)
            hist_fn = (histogram_partial_fn(config, metric_allowed)
                       if capture_hist else None)
            win_fn = _winner_partials_fn(config.per_request_topk, hist_fn,
                                         window_us=window_us)

        stage_d = DecideStage(config, allowed)

        def decide_fn(t: pa.Table) -> pa.Table:
            out = stage_d(t)
            if win_fn is not None:
                # payload carries the input block's row count so the drain
                # can PROVE full coverage (Σ rows == decided.count()); any
                # lost or key-collided partial fails the check and the
                # caller falls back to an explicit scan
                _ray.get(add_many_sharded(collectors, [
                    (nonce + "winhist", ("d",) + block_key(t),
                     (t.num_rows, win_fn(out)))]))
            if drop_intermediate:
                keep = [c for c in out.schema.names
                        if c not in _INTERMEDIATE_COLS]
                out = out.select(keep)
            return out

        decided = assembled.map_batches(
            decide_fn, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None, num_cpus=_heavy_scan_cpus()).materialize()
        winhist_tbls = None
        winhist_coverage = 0
        if winner_scan:
            pairs = _drain("winhist")
            winhist_tbls = [t for _, t in pairs]
            winhist_coverage = sum(n for n, _ in pairs)
        return DecidedBuild(decided=decided, allowed=allowed,
                            counts_df=counts_df, mseen_df=mseen_df,
                            metric_allowed=metric_allowed,
                            winhist_tbls=winhist_tbls,
                            winhist_coverage=winhist_coverage)
    finally:
        # exception-safe: a run that raises must not strand
        # its nonce's entries in the cached collector pool
        _cleanup()


def build_decided(ds: "ray.data.Dataset", config: PipelineConfig, *,
                  num_partitions: int | None = None,
                  enrich_concurrency=None,
                  drop_intermediate: bool = False,
                  source_path: str | None = None,
                  shuffle: str = "auto",
                  ) -> tuple["ray.data.Dataset", frozenset[str]]:
    """Compatibility wrapper: (decided, allowed)."""
    b = build_decided_ex(ds, config, num_partitions=num_partitions,
                         enrich_concurrency=enrich_concurrency,
                         drop_intermediate=drop_intermediate,
                         source_path=source_path, shuffle=shuffle)
    return b.decided, b.allowed


# assembly/decide intermediates that no downstream consumer reads —
# dropped from the materialized decided table on the perf path (the
# correctness-query path keeps them for the oracle comparisons)
_INTERMEDIATE_COLS = frozenset({
    "is_root", "has_error", "latency_threshold_s", "seg_has_main",
    "is_seg_main", "seg_request", "seg_latency", "is_error_turn",
    "is_slow_turn", "turn_cand", "conv_arrival_us", "seg_first_seen",
})


def _winner_partials_fn(k: int, hist_fn=None, window_us: int | None = None):
    """ONE scan over the decided turn table emitting the per-block
    partial reductions the flush needs: local top-K of error/slow items
    per (entity, request, qtype) and local first-arrival normal
    candidates per (entity, request, bucket) — distinguished by `kind`.
    Both are semilattice partials, so the driver merge is exact.  With
    `hist_fn` (a histogram partial combiner), the same scan also emits
    kind="hist" A4 rows — the histogram costs no extra pass.  With
    `window_us`, partials carry the conversation's event-time flush
    window (derived from arrival_key) and reduce per window — the K4
    incremental-flush mode (reference cadence: sampler.go:215-276)."""
    import pyarrow.compute as pc

    def _window_of(arrival_col) -> np.ndarray:
        """Flush window from the arrival key's 20-digit µs prefix —
        vectorized Arrow slice + cast (no per-row int())."""
        if len(arrival_col) == 0:
            return np.array([], np.int64)
        us = pc.cast(pc.utf8_slice_codeunits(arrival_col, 0, 20),
                     pa.int64())
        return (us.to_numpy(zero_copy_only=False) // window_us)

    def fn(t: pa.Table) -> pa.Table:
        full = t                       # hist partial needs EVERY turn
        t = t.filter(t.column("is_trace_row"))
        es = t.filter(pc.is_valid(t.column("trace_sample_type")))
        st = es.column("trace_sample_type")
        es_df = pd.DataFrame({
            "kind": "item",
            "conv_id": es.column("conv_id").to_numpy(zero_copy_only=False),
            "entity": es.column("trace_entity").to_numpy(
                zero_copy_only=False),
            "request": es.column("trace_request").to_numpy(
                zero_copy_only=False),
            "qtype": pc.if_else(pc.equal(st, "error"), "error",
                                "slow").to_numpy(zero_copy_only=False),
            "sample_type": st.to_numpy(zero_copy_only=False),
            "latency": es.column("trace_latency").to_numpy(),
            "arrival_key": es.column("arrival_key").to_numpy(
                zero_copy_only=False),
            "bucket": np.int64(-1),
        })
        from asserts_otel_processor_ray.stages.topk import (
            _ITEM_KEYS, topk_df)
        if window_us is not None:
            es_df["window"] = _window_of(es.column("arrival_key"))
            es_df = topk_df(es_df, k, keys=["window", *_ITEM_KEYS])
        else:
            es_df = topk_df(es_df, k)

        nc = t.filter(t.column("is_ncand"))
        nc_df = pd.DataFrame({
            "kind": "ncand",
            "conv_id": nc.column("conv_id").to_numpy(zero_copy_only=False),
            "entity": nc.column("ncand_entity").to_numpy(
                zero_copy_only=False),
            "request": nc.column("ncand_request").to_numpy(
                zero_copy_only=False),
            "qtype": "slow",
            "sample_type": "normal",
            "latency": nc.column("ncand_latency").to_numpy(),
            "arrival_key": nc.column("arrival_key").to_numpy(
                zero_copy_only=False),
            "bucket": nc.column("ncand_bucket").to_numpy(),
        })
        if window_us is not None:
            nc_df["window"] = _window_of(nc.column("arrival_key"))
        if not nc_df.empty:
            nc_keys = ["entity", "request", "bucket"]
            if window_us is not None:
                nc_keys = ["window", *nc_keys]
            idx = nc_df.groupby(nc_keys,
                                sort=False)["arrival_key"].idxmin()
            nc_df = nc_df.loc[idx]
        out = pd.concat([es_df, nc_df], ignore_index=True)
        out_tbl = pa.Table.from_pandas(out, preserve_index=False)
        if hist_fn is not None:
            h = hist_fn(full)
            if h.num_rows:
                h = h.append_column(
                    "kind", pa.array(["hist"] * h.num_rows, pa.string()))
                out_tbl = pa.concat_tables(
                    [out_tbl, h], promote_options="permissive")
        return out_tbl
    return fn


def _finish_winners(df: pd.DataFrame, config: PipelineConfig,
                    return_normal: bool = False):
    """Driver-side final of the flush set from kind-tagged partials."""
    from asserts_otel_processor_ray.stages.topk import topk_df
    k = config.per_request_topk
    if df.empty:
        return ([], []) if return_normal else []
    nc = df[df["kind"] == "ncand"]
    normal_rows: list[dict] = []
    if not nc.empty:
        idx = nc.groupby(["entity", "request", "bucket"],
                         sort=False)["arrival_key"].idxmin()
        nc_final = nc.loc[idx]
        normal_rows = [
            {"conv_id": r.conv_id, "ncand_entity": r.entity,
             "ncand_request": r.request, "ncand_bucket": r.bucket,
             "ncand_latency": r.latency, "arrival_key": r.arrival_key}
            for r in nc_final.itertuples()]
        items = pd.concat([df[df["kind"] == "item"], nc_final],
                          ignore_index=True)
    else:
        items = df[df["kind"] == "item"]
    winners_df = topk_df(items, k)
    winners = winners_df[["conv_id", "entity", "request", "qtype",
                          "sample_type", "latency",
                          "arrival_key"]].to_dict("records")
    if return_normal:
        return winners, normal_rows
    return winners


def select_winners(decided: "ray.data.Dataset",
                   config: PipelineConfig,
                   return_normal: bool = False):
    """Error/slow queue items + periodic normal winners → top-K flush
    set.  One scan of the turn table, bounded driver merge."""
    from asserts_otel_processor_ray.stages.topk import collect_df
    df = collect_df(decided.map_batches(
        _winner_partials_fn(config.per_request_topk),
        batch_format="pyarrow", batch_size=None,
        num_cpus=_heavy_scan_cpus()))
    return _finish_winners(df, config, return_normal)


# The route scan's reader-side `conv_id IN winners` filter pays off by
# keeping non-winner rows out of the object store and the join stage
# (plus row-group pruning when the layout allows) — but its per-row
# isin evaluation costs more than it saves once winners are a sizable
# fraction of the input.  Measured at sf1/32cpu: 0.6% winner rows →
# filter 2.4× faster; 5.8% (the windowed flush, every window electing
# its own top-K) → filter 1.4× SLOWER.  Threshold between them:
ROUTE_PUSHDOWN_MAX_SHARE = 0.02


def build_routed_ex(source: "ray.data.Dataset",
                    decided: "ray.data.Dataset",
                    winner_map: dict[str, str], *,
                    source_path: str | None = None,
                    num_blocks: int | None = None
                    ) -> tuple["ray.data.Dataset", "pa.Table | None"]:
    """Routed turn table: scan the ORIGINAL input, keep winner convs,
    merge the broadcast decided rows (bounded by the top-K caps).
    Returns (routed, winner-rows table).

    With ``source_path`` and a SPARSE winner set (winner rows ≤
    ROUTE_PUSHDOWN_MAX_SHARE of the input, computed exactly from the
    winner-rows table), the route scan re-reads the parquet with a
    ``conv_id IN winners`` filter pushed into the read: non-winner
    rows never enter the object store or the join stage, and row
    groups whose conv_id statistics exclude every winner are pruned
    outright.  Dense winner sets skip the filter — the reader-side
    isin evaluation would cost more than it saves (the in-stage
    ``is_in`` still filters exactly)."""
    import ray as _ray

    if not winner_map:
        return ray.data.from_arrow(
            __import__("asserts_otel_processor_ray.stages.route",
                       fromlist=["_empty_routed"])._empty_routed()), None
    winner_convs = pa.array(sorted(winner_map), pa.string())
    wtbls = [t for t in _ray.get(
        decided.map_batches(
            lambda t, wc=winner_convs: winner_rows_table(t, wc),
            batch_format="pyarrow", batch_size=None).to_arrow_refs())
        if t.num_rows > 0]
    wtbl = pa.concat_tables(wtbls)
    if source_path is not None:
        try:
            share = wtbl.num_rows / max(1, decided.count())
        except Exception:
            share = 1.0
        if share > ROUTE_PUSHDOWN_MAX_SHARE:
            source_path = None
    if source_path is not None:
        try:
            flt = pa.compute.field("conv_id").isin(sorted(winner_map))
            kwargs = {"filter": flt}
            if num_blocks is not None:
                kwargs["override_num_blocks"] = num_blocks
            source = ray.data.read_parquet(
                source_path, columns=TRANSCRIPT_SCHEMA.names, **kwargs)
        except (TypeError, ValueError, pa.ArrowInvalid,
                pa.ArrowNotImplementedError) as ex:
            # fall back to the caller's unfiltered scan — but say so:
            # a silently-disabled pushdown re-reads EVERY byte of the
            # input on the route pass.  (Ray's read is lazy, so a
            # filter rejected at scan time still surfaces at
            # materialize; this guards plan construction only.)
            import logging
            logging.getLogger(__name__).warning(
                "route-scan filter pushdown disabled (%s: %s); "
                "falling back to the unfiltered source scan",
                type(ex).__name__, ex)
    stage = RouteJoinStage(wtbl, winner_map)
    return source.map_batches(stage, batch_format="pyarrow",
                              zero_copy_batch=True), wtbl


def build_routed(source: "ray.data.Dataset",
                 decided: "ray.data.Dataset",
                 winner_map: dict[str, str]) -> "ray.data.Dataset":
    return build_routed_ex(source, decided, winner_map)[0]


def _build_aggregates(config: PipelineConfig, counts_df: pd.DataFrame,
                      winners: list[dict], wtbl: "pa.Table | None",
                      hist_tbl: "pa.Table | None",
                      routed: "ray.data.Dataset") -> dict[str, Any]:
    """A1-A4 final tables from the decide pass's drained partials
    (shared by the single-flush and windowed runners)."""
    from asserts_otel_processor_ray.stages.aggregate import (
        latency_histogram_final_tbl)
    aggs: dict[str, Any] = {}
    if counts_df is None or counts_df.empty:
        counts_df = pd.DataFrame(
            {"kind": pd.Series([], dtype=str),
             "namespace": pd.Series([], dtype=str),
             "service": pd.Series([], dtype=str),
             "partial_count": pd.Series([], dtype="int64")})
    tc = int(counts_df.loc[counts_df["kind"] == "tcount",
                           "partial_count"].sum())
    aggs["trace_count"] = pa.table({
        "asserts_env": pa.array([config.env]),
        "asserts_site": pa.array([config.site]),
        "trace_count_total": pa.array([tc], pa.int64())})
    sc = (counts_df[counts_df["kind"] == "scount"]
          .groupby(["namespace", "service"], sort=False)
          ["partial_count"].sum().astype("int64").reset_index(
              name="span_count_total"))
    sc.insert(0, "asserts_site", config.site)
    sc.insert(0, "asserts_env", config.env)
    aggs["span_count"] = pa.Table.from_pandas(
        sc, preserve_index=False)
    aggs["trace_sampled_count"] = sampled_trace_counts(
        winners, config)
    # span_sampled derives from the winner-rows broadcast table:
    # routed = source ⋈ wtbl on (conv, turn) keeps exactly wtbl's
    # rows, so counting wtbl == counting routed, without a scan
    if wtbl is not None and wtbl.num_rows:
        ssc = (wtbl.select(["namespace", "service"])
               .group_by(["namespace", "service"])
               .aggregate([([], "count_all")])
               .rename_columns(["namespace", "service",
                                "span_sampled_count_total"]))
        ssc = ssc.add_column(0, "asserts_site", pa.array(
            [config.site] * ssc.num_rows, pa.string()))
        ssc = ssc.add_column(0, "asserts_env", pa.array(
            [config.env] * ssc.num_rows, pa.string()))
        aggs["span_sampled_count"] = ssc
    else:
        aggs["span_sampled_count"] = span_counts(
            routed, config, "span_sampled_count_total")
    if config.capture_metrics:
        aggs["latency_hist"] = (
            latency_histogram_final_tbl(hist_tbl, config))
    return aggs


def run_pipeline(input_path: "str | ray.data.Dataset",
                 config: PipelineConfig, *,
                 out_dir: str | None = None,
                 num_partitions: int | None = None,
                 enrich_concurrency=None,
                 with_aggregates: bool = True,
                 checkpoint_dir: str | None = None) -> PipelineResult:
    """End-to-end single-flush batch run (E1, SURVEY.md §3).

    With ``checkpoint_dir``, the decided turn table is checkpointed as
    partitioned Parquet with per-file lineage; a rerun with the same
    config hash resumes from it (state/checkpoint.py)."""
    from asserts_otel_processor_ray.stages.aggregate import (
        combined_partials_fn, histogram_partial_fn,
        latency_histogram_final_tbl)
    from asserts_otel_processor_ray.stages.topk import (
        allowed_pairs_from_df, collect_df)

    import ray as _ray
    ncpus = int(_ray.cluster_resources().get("CPU", 8))
    n_read = num_partitions if num_partitions is not None \
        else default_read_blocks(input_path, ncpus)
    source = (read_transcripts(input_path, num_blocks=n_read)
              if isinstance(input_path, str) else input_path)
    # lineage key = config hash + input identity: a rerun with the same
    # config against different data must not serve stale checkpoints.
    # In-memory Dataset inputs have only a weak (schema+count) identity,
    # so restore is refused for them (write-side lineage still works).
    from asserts_otel_processor_ray.state.checkpoint import (
        input_fingerprint, is_weak_fingerprint)
    fp = input_fingerprint(input_path)
    cfg_hash = config.config_hash() + "-" + fp
    allow_restore = not is_weak_fingerprint(fp)

    if not config.sample_traces:
        # pass-through mode (processor.go:70-74): enriched turns are
        # forwarded unchanged, no sampling, no routed classes; the
        # latency histogram is still captured when enabled.  The input
        # is read (and parsed/enriched) exactly ONCE: the histogram
        # derives from the same materialized enriched dataset that is
        # forwarded, via slim→sort→assemble (no decide pass).
        passthrough = build_enriched(source, config,
                                     enrich_concurrency=enrich_concurrency)
        if with_aggregates and config.capture_metrics:
            passthrough = passthrough.materialize()
        result = PipelineResult(routed=passthrough, winners=[],
                                winner_map={})
        if with_aggregates and config.capture_metrics:
            b = build_decided_ex(
                passthrough, config, num_partitions=num_partitions,
                with_decide=False, collect_agg=True,
                already_enriched=True,
                source_path=(input_path if isinstance(input_path, str)
                             else None))
            metric_allowed = allowed_pairs_from_df(
                b.mseen_df, "entity_key", "seg_request",
                "seg_first_seen", config.limit_per_service)
            result.aggregates["latency_hist"] = latency_histogram(
                b.decided, config, metric_allowed)
        if out_dir is not None:
            import os
            path = os.path.join(out_dir, "passthrough")
            os.makedirs(path, exist_ok=True)
            passthrough.write_parquet(path)
            result.sink_paths["passthrough"] = path
        return result

    decided = None
    b = None
    if checkpoint_dir is not None:
        from asserts_otel_processor_ray.state.checkpoint import (
            checkpoint_dataset, restore_dataset)
        import os as _os
        _os.makedirs(checkpoint_dir, exist_ok=True)
        if allow_restore:
            restored = restore_dataset(checkpoint_dir, "decided",
                                       cfg_hash)
            if restored is not None:
                decided = restored.materialize()
    winhist_tbls = None
    if decided is None:
        b = build_decided_ex(
            source, config, num_partitions=num_partitions,
            enrich_concurrency=enrich_concurrency,
            drop_intermediate=True, collect_agg=with_aggregates,
            winner_scan=True,
            capture_hist=with_aggregates and config.capture_metrics,
            source_path=(input_path if isinstance(input_path, str)
                         else None))
        decided = b.decided
        winhist_tbls = b.winhist_tbls
        if checkpoint_dir is not None:
            checkpoint_dataset(decided, checkpoint_dir, "decided",
                               cfg_hash)

    # aggregate partials: drained from the assemble/decide passes'
    # collector; on checkpoint-restore (no collector ran) the partials
    # recompute with one scan each
    counts_df = mseen_df = None
    metric_allowed: frozenset[str] = frozenset()
    hist_fn = None
    if with_aggregates:
        if b is not None:
            counts_df, mseen_df = b.counts_df, b.mseen_df
            metric_allowed = b.metric_allowed
        else:
            agg_df = collect_df(decided.map_batches(
                combined_partials_fn(config), batch_format="pyarrow",
                batch_size=None, num_cpus=_heavy_scan_cpus()))
            counts_df = agg_df[agg_df["kind"].isin(["tcount", "scount"])]
            mseen_df = agg_df[agg_df["kind"] == "mseen"]
            metric_allowed = allowed_pairs_from_df(
                mseen_df, "entity_key", "seg_request", "seg_first_seen",
                config.limit_per_service)
        if config.capture_metrics:
            hist_fn = histogram_partial_fn(config, metric_allowed)
    if (winhist_tbls is not None and b is not None
            and b.winhist_coverage != decided.count()):
        # a collected partial went missing (defense in depth; the known
        # cause — block-key collision on hot-conversation middle blocks
        # — is fixed at the key level) — recompute with an explicit scan
        winhist_tbls = None
    if winhist_tbls is None:
        # checkpoint-restore / coverage-mismatch fallback: one scan of
        # the materialized decided table
        scan = decided.map_batches(
            _winner_partials_fn(config.per_request_topk, hist_fn),
            batch_format="pyarrow", batch_size=None,
            num_cpus=_heavy_scan_cpus())
        winhist_tbls = list(_ray.get(scan.to_arrow_refs()))

    # driver merge of the kind-tagged partials — Arrow end-to-end below
    # the row budget (a pandas multi-string-key groupby over blocks ×
    # label-space rows was the driver bottleneck at high block counts),
    # distributed groupby pre-reduce above it
    win_tbl, hist_tbl = _reduce_winhist(
        winhist_tbls, config, capture_hist=hist_fn is not None,
        window=False)
    winners = (_finish_winners(win_tbl.to_pandas(), config)
               if win_tbl is not None else [])
    winner_map = {r["conv_id"]: r["sample_type"] for r in winners}

    routed, wtbl = build_routed_ex(
        source, decided, winner_map,
        source_path=(input_path if isinstance(input_path, str) else None),
        num_blocks=n_read)
    if out_dir is not None:
        # materialize once: sink writes and any caller count() all
        # read these (bounded, winner-convs-only) blocks
        routed = routed.materialize()

    result = PipelineResult(routed=routed, winners=winners,
                            winner_map=winner_map, decided=decided)

    if with_aggregates:
        result.aggregates = _build_aggregates(
            config, counts_df, winners, wtbl, hist_tbl, routed)

    if out_dir is not None:
        import os

        from asserts_otel_processor_ray.state.checkpoint import (
            Lineage, checkpoint_dataset, checkpoint_table,
            stage_dir)
        os.makedirs(out_dir, exist_ok=True)
        lineage = Lineage(out_dir)
        for sink in SINKS:
            stage = sink
            if allow_restore and lineage.stage_complete(stage, cfg_hash):
                result.sink_paths[sink] = stage_dir(out_dir, stage)
                continue
            sub = routed.map_batches(
                lambda t, s=sink: t.filter(
                    pa.compute.equal(t.column("sample_type"), s)),
                batch_format="pyarrow")
            result.sink_paths[sink] = checkpoint_dataset(
                sub, out_dir, stage, cfg_hash, lineage)
        for name, agg in result.aggregates.items():
            stage = f"metrics-{name}"
            if allow_restore and lineage.stage_complete(stage, cfg_hash):
                result.aggregates[name] = stage_dir(out_dir, stage)
                continue
            if isinstance(agg, pa.Table):
                result.aggregates[name] = checkpoint_table(
                    agg, out_dir, stage, cfg_hash, lineage)
            else:
                result.aggregates[name] = checkpoint_dataset(
                    agg, out_dir, stage, cfg_hash, lineage)
    return result


def run_pipeline_windowed(input_path: "str | ray.data.Dataset",
                          config: PipelineConfig, *,
                          out_dir: str,
                          window_seconds: float | None = None,
                          num_partitions: int | None = None,
                          with_aggregates: bool = False) -> dict:
    """K4 incremental flush: the reference drains its trace queues every
    ``trace_flush_frequency_seconds`` (assertsprocessor/sampler.go:
    215-276); the batch analog assigns each conversation to the
    event-time window of its arrival and flushes winners per window.

    Physical shape: ONE sort/assemble/decide over the whole input (the
    admission cap stays global, matching the reference's cross-flush
    TTL cache) whose decide pass also emits the window-tagged winner
    partials (and, with aggregates, the A1-A4 partials) through the
    collector, ONE route pass, and ONE write pass that splits every
    batch across its (window, sink) groups — W windows cost the same
    scans as one.  Each (window, sink) keeps its own lineage
    completeness marker, so a resumed run skips every finished window
    and recomputes only the missing ones.

    ``with_aggregates``: also build the A1-A4 aggregate tables (global
    across windows — the reference's Prom registry is one cumulative
    registry regardless of flush cadence, sampler.go:215-276 vs
    metric_helper.go) and checkpoint them under ``metrics-*`` stages.
    """
    import glob
    import os
    import shutil
    import uuid

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray as _ray

    from asserts_otel_processor_ray.stages.aggregate import (
        histogram_partial_fn)
    from asserts_otel_processor_ray.state.checkpoint import (
        Lineage, checkpoint_table, input_fingerprint,
        is_weak_fingerprint, stage_dir)

    window_seconds = (window_seconds
                      or config.trace_flush_frequency_seconds)
    window_us = int(window_seconds * 1_000_000)
    ncpus = int(_ray.cluster_resources().get("CPU", 8))
    n_read = num_partitions if num_partitions is not None \
        else default_read_blocks(input_path, ncpus)
    source = (read_transcripts(input_path, num_blocks=n_read)
              if isinstance(input_path, str) else input_path)
    fp = input_fingerprint(input_path)
    # a weak (in-memory) input identity must not skip windows written
    # by a DIFFERENT in-memory input with the same schema/count; make
    # the lineage key unique per call so in-run lineage still records
    # but cross-run resume is refused
    if is_weak_fingerprint(fp):
        fp = fp + "-" + uuid.uuid4().hex[:8]
    cfg_hash = config.config_hash() + "-" + fp + f"-w{window_us}"

    import time as _time
    timings: dict[str, float] = {}
    _t0 = _time.time()
    capture_hist = with_aggregates and config.capture_metrics
    b = build_decided_ex(source, config, num_partitions=num_partitions,
                         drop_intermediate=True,
                         collect_agg=with_aggregates,
                         winner_scan=True, capture_hist=capture_hist,
                         window_us=window_us,
                         source_path=(input_path
                                      if isinstance(input_path, str)
                                      else None))
    decided = b.decided
    winhist_tbls = b.winhist_tbls
    if b.winhist_coverage != decided.count():
        # a collected partial went missing — recompute explicitly
        hist_fn = (histogram_partial_fn(config, b.metric_allowed)
                   if capture_hist else None)
        scan = decided.map_batches(
            _winner_partials_fn(config.per_request_topk, hist_fn,
                                window_us=window_us),
            batch_format="pyarrow", batch_size=None,
            num_cpus=_heavy_scan_cpus())
        winhist_tbls = list(_ray.get(scan.to_arrow_refs()))

    timings["decide"] = _time.time() - _t0
    _t0 = _time.time()
    winners_by_window: dict[int, list[dict]] = {}
    winner_map_all: dict[str, str] = {}
    window_of_conv: dict[str, int] = {}
    all_winners: list[dict] = []
    win_tbl, hist_tbl = _reduce_winhist(
        winhist_tbls or [], config, capture_hist=capture_hist,
        window=True)
    if win_tbl is not None:
        df = win_tbl.to_pandas()
        for w, wdf in df.groupby("window", sort=True):
            winners = _finish_winners(wdf, config)
            winners_by_window[int(w)] = winners
            all_winners.extend(winners)
            for r in winners:
                winner_map_all[r["conv_id"]] = r["sample_type"]
                window_of_conv[r["conv_id"]] = int(w)

    timings["merge"] = _time.time() - _t0
    _t0 = _time.time()
    routed, wtbl = build_routed_ex(
        source, decided, winner_map_all,
        source_path=(input_path if isinstance(input_path, str) else None),
        num_blocks=n_read)
    routed = routed.materialize()
    timings["route"] = _time.time() - _t0
    _t0 = _time.time()

    os.makedirs(out_dir, exist_ok=True)
    lineage = Lineage(out_dir)
    sink_paths: dict[str, str] = {}
    skipped: list[str] = []
    todo: list[tuple[int, str]] = []
    for w in sorted(winners_by_window):
        for sink in SINKS:
            stage = f"window={w:06d}/{sink}"
            if lineage.stage_complete(stage, cfg_hash):
                sink_paths[stage] = stage_dir(out_dir, stage)
                skipped.append(stage)
            else:
                todo.append((w, sink))

    if todo:
        # one write pass over routed: each batch splits itself across
        # its (window, sink) groups and appends a part file per group
        # directly into the stage dir (out_dir is shared storage on a
        # real cluster, exactly like write_parquet's contract); lineage
        # is recorded by the driver AFTER the pass, so a crash leaves
        # incomplete stages unmarked and a rerun replaces them
        for w, sink in todo:
            d = stage_dir(out_dir, f"window={w:06d}/{sink}")
            if os.path.isdir(d):      # incomplete remnant of a crash
                shutil.rmtree(d)
            os.makedirs(d, exist_ok=True)
        convs = sorted(window_of_conv)
        conv_np = np.array(convs)
        win_np = np.array([window_of_conv[c] for c in convs], np.int64)
        sink_pos = {s: i for i, s in enumerate(sorted(SINKS))}
        todo_keys = frozenset(w * len(SINKS) + sink_pos[s]
                              for w, s in todo)
        bcast = _ray.put((conv_np, win_np))

        def write_groups(t: pa.Table) -> pa.Table:
            cnp, wnp = _ray.get(bcast)
            cv = t.column("conv_id").to_numpy(zero_copy_only=False)
            # routed contains only winner conversations → always found
            w_of = wnp[np.searchsorted(cnp, cv)]
            ss = np.array(sorted(SINKS))
            st = t.column("sample_type").to_numpy(zero_copy_only=False)
            s_of = np.searchsorted(ss, st)
            key = w_of * len(SINKS) + s_of
            for kv in np.unique(key):
                if int(kv) not in todo_keys:
                    continue
                w, si = divmod(int(kv), len(SINKS))
                d = stage_dir(out_dir, f"window={w:06d}/{ss[si]}")
                part = t.filter(pa.array(key == kv))
                pq.write_table(
                    part, os.path.join(
                        d, f"part-{uuid.uuid4().hex[:12]}.parquet"))
            return t.slice(0, 0)

        routed.map_batches(write_groups, batch_format="pyarrow",
                           batch_size=None).materialize()
        for w, sink in todo:
            stage = f"window={w:06d}/{sink}"
            d = stage_dir(out_dir, stage)
            total = 0
            for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
                md = pq.read_metadata(f)
                total += md.num_rows
                lineage.record_partition(stage, cfg_hash, f,
                                         md.num_rows,
                                         os.path.getsize(f))
            lineage.mark_complete(stage, cfg_hash, total)
            sink_paths[stage] = d

    timings["write"] = _time.time() - _t0
    result = {"winners_by_window": winners_by_window,
              "sink_paths": sink_paths, "routed": routed,
              "skipped": skipped, "timings": timings}
    if with_aggregates:
        counts_df = (b.counts_df if b.counts_df is not None
                     else pd.DataFrame())
        aggs = _build_aggregates(config, counts_df, all_winners, wtbl,
                                 hist_tbl, routed)
        for name, agg in aggs.items():
            stage = f"metrics-{name}"
            if lineage.stage_complete(stage, cfg_hash):
                aggs[name] = stage_dir(out_dir, stage)
                continue
            if isinstance(agg, pa.Table):
                aggs[name] = checkpoint_table(
                    agg, out_dir, stage, cfg_hash, lineage)
            else:
                from asserts_otel_processor_ray.state.checkpoint import (
                    checkpoint_dataset)
                aggs[name] = checkpoint_dataset(
                    agg, out_dir, stage, cfg_hash, lineage)
        result["aggregates"] = aggs
    return result
