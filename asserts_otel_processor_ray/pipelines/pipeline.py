"""The composed Ray Data plan: parse → enrich → assemble → decide →
route → aggregate (SURVEY.md §3 E1 re-expression).

Physical shape (designed for a multi-node cluster; tested local):

* the only full-data exchange is ONE sort on (conv_id, turn_idx) —
  range partitioning that also provides the north rule's stable turn
  ordering; boundary conversations (≤2 per block) get an exact side
  pass, so every per-conversation step is a vectorized ``map_batches``
  over whole-conversation blocks (no per-group Python calls)
* the enrich stage is an actor pool (regex tables + threshold store
  compiled once per actor in ``__init__``)
* caps / periodic sampling / top-K / aggregates are two-phase: a
  per-batch partial reduce (map-side combine — also the skew story:
  hot keys collapse to ≤K rows per block before anything moves) and a
  bounded driver merge; nothing else shuffles
* winner sets are bounded (≤ services × limit × K) and broadcast back
  into the route stage as plain dicts
* two materialize() checkpoints (sorted, decided) because multiple
  branches consume them; at 100 TB these become partitioned Parquet
  checkpoints via state/checkpoint.py instead of object-store caching.
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
    metric_first_seen_fn,
    sampled_trace_counts,
    span_counts,
    trace_counts,
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
from asserts_otel_processor_ray.stages.topk import (
    PAIR_SEP,
    compute_allowed_pairs,
    periodic_normal_winners,
    topk_items,
)

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


def read_transcripts(path: str) -> "ray.data.Dataset":
    """Column-pruned parquet read of the transcript table."""
    return ray.data.read_parquet(path, columns=TRANSCRIPT_SCHEMA.names)


def build_enriched(ds: "ray.data.Dataset", config: PipelineConfig, *,
                   enrich_concurrency=None) -> "ray.data.Dataset":
    parse = ParseStage(config)
    parsed = ds.map_batches(parse, batch_format="pyarrow",
                            zero_copy_batch=True)
    kwargs = {}
    if enrich_concurrency is not None:
        kwargs["concurrency"] = enrich_concurrency
        enriched = parsed.map_batches(
            EnrichStage, fn_constructor_args=(config,),
            batch_format="pyarrow", zero_copy_batch=True, **kwargs)
    else:
        # task-based fallback: EnrichStage built per task via closure
        stage = EnrichStage(config)
        enriched = parsed.map_batches(stage, batch_format="pyarrow",
                                      zero_copy_batch=True)
    return enriched


def slim_columns(names: list[str], config: PipelineConfig) -> list[str]:
    """Columns that ride the sort: everything except the heavy source
    text/role/tool and the extracted attrs not promoted to metric
    labels.  Routed output re-attaches the dropped columns via the
    winner-row broadcast join (stages/route.py)."""
    keep = []
    for c in names:
        if c in ("text", "role", "tool"):
            continue
        if c.startswith("attr_") and \
                c not in config.attributes_as_metric_labels:
            continue
        keep.append(c)
    return keep


def _edge_rows(t: pa.Table) -> pa.Table:
    """Rows of a sorted block's first and last conversation — the only
    conversations that can straddle a block boundary."""
    if t.num_rows == 0:
        return t
    conv = t.column("conv_id")
    first, last = conv[0], conv[t.num_rows - 1]
    mask = pa.compute.or_(pa.compute.equal(conv, first),
                          pa.compute.equal(conv, last))
    return t.filter(mask)


def build_decided(ds: "ray.data.Dataset", config: PipelineConfig, *,
                  num_partitions: int | None = None,
                  enrich_concurrency=None,
                  drop_intermediate: bool = False,
                  ) -> tuple["ray.data.Dataset", frozenset[str]]:
    """Everything up to per-trace decisions; returns (decided, allowed).

    Partitioning: the only full-data exchange is a sort on
    (conv_id, turn_idx) — Ray's range-partitioning sort is several times
    cheaper than its hash-shuffle repartition on this payload, and the
    north rule wants the stable turn ordering anyway.  A sorted block
    holds whole conversations except its first/last conv, which may
    straddle the boundary; those boundary conversations (≤ 2 per block)
    are assembled in a single side pass, so per-conversation semantics
    stay exact without any hash shuffle.
    """
    import ray as _ray
    ncpus = int(_ray.cluster_resources().get("CPU", 8))
    if num_partitions is None:
        num_partitions = max(8, ncpus * 2)
    # default min_parallelism (200) fragments the sort into hundreds of
    # small blocks; every later scan then pays per-task overhead × blocks
    for attr in ("min_parallelism", "read_op_min_num_blocks"):
        try:
            setattr(ds.context, attr, num_partitions)
        except AttributeError:
            pass
    enriched = build_enriched(ds, config,
                              enrich_concurrency=enrich_concurrency)
    # only slim columns ride the sort — the text payload stays out of
    # the exchange entirely (route re-attaches it from the source)
    slim = enriched.map_batches(
        lambda t, cfg=config: t.select(slim_columns(t.schema.names, cfg)),
        batch_format="pyarrow", zero_copy_batch=True)
    sorted_mat = slim.sort(["conv_id", "turn_idx"]).materialize()

    # side pass: boundary conversations, assembled once, driver-side
    # (bounded: 2 convs × blocks; at cluster scale this becomes a
    # segmented pass pairing adjacent blocks)
    edge_tbls = [t for t in _ray.get(
        sorted_mat.map_batches(_edge_rows, batch_format="pyarrow",
                               batch_size=None).to_arrow_refs())
        if t.num_rows > 0]
    stage = AssembleStage(config)
    if edge_tbls:
        boundary_tbl = pa.concat_tables(edge_tbls)
        bconvs = pa.compute.unique(boundary_tbl.column("conv_id"))
        assembled_boundary = stage(boundary_tbl)
    else:
        bconvs = pa.array([], pa.string())
        assembled_boundary = None

    def assemble_interior(t: pa.Table, convs=bconvs) -> pa.Table:
        keep = pa.compute.invert(
            pa.compute.is_in(t.column("conv_id"), value_set=convs))
        return stage(t.filter(keep))

    interior = sorted_mat.map_batches(
        assemble_interior, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)
    if assembled_boundary is not None and assembled_boundary.num_rows:
        interior = interior.union(
            ray.data.from_arrow(assembled_boundary))
    # NB: no repartition here — a row-balancing repartition could split
    # a conversation across blocks and break the per-batch decide pass.
    assembled = interior.materialize()
    del interior, sorted_mat  # release the sorted blocks' store refs

    # cardinality cap (T3/T5 admission): pre-reduced per batch
    def seg_partial(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("is_seg_main"))
        t = t.select(["entity_key", "seg_request", "seg_first_seen"])
        if t.num_rows == 0:
            return t
        gb = t.group_by(["entity_key", "seg_request"]).aggregate(
            [("seg_first_seen", "min")])
        return gb.rename_columns(
            ["entity_key", "seg_request", "seg_first_seen"])

    seg_rows = assembled.map_batches(seg_partial, batch_format="pyarrow",
                                 batch_size=None)
    allowed = compute_allowed_pairs(
        seg_rows, "entity_key", "seg_request", "seg_first_seen",
        config.limit_per_service)

    stage_d = DecideStage(config, allowed)
    if drop_intermediate:
        def decide_fn(t: pa.Table) -> pa.Table:
            out = stage_d(t)
            keep = [c for c in out.schema.names
                    if c not in _INTERMEDIATE_COLS]
            return out.select(keep)
    else:
        decide_fn = stage_d
    decided = assembled.map_batches(
        decide_fn, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None, num_cpus=_heavy_scan_cpus()).materialize()
    return decided, allowed


# assembly/decide intermediates that no downstream consumer reads —
# dropped from the materialized decided table on the perf path (the
# correctness-query path keeps them for the oracle comparisons)
_INTERMEDIATE_COLS = frozenset({
    "is_root", "has_error", "latency_threshold_s", "seg_has_main",
    "is_seg_main", "seg_request", "seg_latency", "is_error_turn",
    "is_slow_turn", "turn_cand", "conv_arrival_us", "seg_first_seen",
})


def _winner_partials_fn(k: int):
    """ONE scan over the decided turn table emitting both per-block
    partial reductions the flush needs: local top-K of error/slow items
    per (entity, request, qtype) and local first-arrival normal
    candidates per (entity, request, bucket) — distinguished by `kind`.
    Both are semilattice partials, so the driver merge is exact."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
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
        from asserts_otel_processor_ray.stages.topk import topk_df
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
        if not nc_df.empty:
            idx = nc_df.groupby(["entity", "request", "bucket"],
                                sort=False)["arrival_key"].idxmin()
            nc_df = nc_df.loc[idx]
        out = pd.concat([es_df, nc_df], ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)
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


def build_routed(source: "ray.data.Dataset",
                 decided: "ray.data.Dataset",
                 winner_map: dict[str, str]) -> "ray.data.Dataset":
    """Routed turn table: scan the ORIGINAL input, keep winner convs,
    merge the broadcast decided rows (bounded by the top-K caps)."""
    import ray as _ray
    from asserts_otel_processor_ray.stages.topk import collect_df

    if not winner_map:
        return ray.data.from_arrow(
            __import__("asserts_otel_processor_ray.stages.route",
                       fromlist=["_empty_routed"])._empty_routed())
    winner_convs = pa.array(sorted(winner_map), pa.string())
    wtbls = [t for t in _ray.get(
        decided.map_batches(
            lambda t, wc=winner_convs: winner_rows_table(t, wc),
            batch_format="pyarrow", batch_size=None).to_arrow_refs())
        if t.num_rows > 0]
    wtbl = pa.concat_tables(wtbls)
    stage = RouteJoinStage(wtbl, winner_map)
    return source.map_batches(stage, batch_format="pyarrow",
                              zero_copy_batch=True)


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
    from concurrent.futures import ThreadPoolExecutor

    from asserts_otel_processor_ray.stages.aggregate import (
        combined_partials_fn)
    from asserts_otel_processor_ray.stages.topk import (
        allowed_pairs_from_df, collect_df)

    source = (read_transcripts(input_path)
              if isinstance(input_path, str) else input_path)
    # lineage key = config hash + input identity: a rerun with the same
    # config against different data must not serve stale checkpoints
    from asserts_otel_processor_ray.state.checkpoint import (
        input_fingerprint)
    cfg_hash = (config.config_hash() + "-"
                + input_fingerprint(input_path))

    if not config.sample_traces:
        # pass-through mode (processor.go:70-74): enriched turns are
        # forwarded unchanged, no sampling, no routed classes; the
        # latency histogram is still captured when enabled
        passthrough = build_enriched(source, config,
                                     enrich_concurrency=enrich_concurrency)
        result = PipelineResult(routed=passthrough, winners=[],
                                winner_map={})
        if with_aggregates and config.capture_metrics:
            decided_lite, _ = build_decided(
                source, config, num_partitions=num_partitions,
                enrich_concurrency=enrich_concurrency)
            from asserts_otel_processor_ray.stages.topk import (
                allowed_pairs_from_df as _apf, collect_df as _cdf)
            ms = _cdf(decided_lite.map_batches(
                metric_first_seen_fn(), batch_format="pyarrow",
                batch_size=None))
            metric_allowed = _apf(ms, "entity_key", "seg_request",
                                  "seg_first_seen",
                                  config.limit_per_service)
            result.aggregates["latency_hist"] = latency_histogram(
                decided_lite, config, metric_allowed)
        if out_dir is not None:
            import os
            path = os.path.join(out_dir, "passthrough")
            os.makedirs(path, exist_ok=True)
            passthrough.write_parquet(path)
            result.sink_paths["passthrough"] = path
        return result

    decided = None
    if checkpoint_dir is not None:
        from asserts_otel_processor_ray.state.checkpoint import (
            checkpoint_dataset, restore_dataset)
        import os as _os
        _os.makedirs(checkpoint_dir, exist_ok=True)
        restored = restore_dataset(checkpoint_dir, "decided", cfg_hash)
        if restored is not None:
            decided = restored.materialize()
    if decided is None:
        decided, _allowed = build_decided(
            source, config, num_partitions=num_partitions,
            enrich_concurrency=enrich_concurrency,
            drop_intermediate=True)
        if checkpoint_dir is not None:
            checkpoint_dataset(decided, checkpoint_dir, "decided",
                               cfg_hash)

    # the winner scan and the (combined) aggregate-partials scan are
    # independent passes over the materialized turn table — overlap them
    def agg_scan():
        return collect_df(decided.map_batches(
            combined_partials_fn(config), batch_format="pyarrow",
            batch_size=None, num_cpus=_heavy_scan_cpus()))

    if with_aggregates:
        with ThreadPoolExecutor(2) as ex:
            f_win = ex.submit(select_winners, decided, config)
            f_agg = ex.submit(agg_scan)
            winners = f_win.result()
            agg_df = f_agg.result()
    else:
        winners = select_winners(decided, config)
        agg_df = None
    winner_map = {r["conv_id"]: r["sample_type"] for r in winners}

    routed = build_routed(source, decided, winner_map)

    result = PipelineResult(routed=routed, winners=winners,
                            winner_map=winner_map, decided=decided)

    if with_aggregates:
        tc = int(agg_df.loc[agg_df["kind"] == "tcount",
                            "partial_count"].sum())
        result.aggregates["trace_count"] = pa.table({
            "asserts_env": pa.array([config.env]),
            "asserts_site": pa.array([config.site]),
            "trace_count_total": pa.array([tc], pa.int64())})
        sc = (agg_df[agg_df["kind"] == "scount"]
              .groupby(["namespace", "service"], sort=False)
              ["partial_count"].sum().reset_index(
                  name="span_count_total"))
        sc.insert(0, "asserts_site", config.site)
        sc.insert(0, "asserts_env", config.env)
        result.aggregates["span_count"] = pa.Table.from_pandas(
            sc, preserve_index=False)
        result.aggregates["trace_sampled_count"] = sampled_trace_counts(
            winners, config)
        metric_allowed = allowed_pairs_from_df(
            agg_df[agg_df["kind"] == "mseen"], "entity_key",
            "seg_request", "seg_first_seen", config.limit_per_service)
        # span_sampled (scan of routed) and the histogram (scan of
        # decided) are independent — overlap them too
        with ThreadPoolExecutor(2) as ex:
            f_ss = ex.submit(span_counts, routed, config,
                             "span_sampled_count_total")
            if config.capture_metrics:
                f_h = ex.submit(latency_histogram, decided, config,
                                metric_allowed)
                result.aggregates["latency_hist"] = f_h.result()
            result.aggregates["span_sampled_count"] = f_ss.result()

    if out_dir is not None:
        import os

        from asserts_otel_processor_ray.state.checkpoint import (
            Lineage, checkpoint_dataset, checkpoint_table, restore_dataset,
            stage_dir)
        os.makedirs(out_dir, exist_ok=True)
        lineage = Lineage(out_dir)
        routed = routed.materialize()
        result.routed = routed
        for sink in SINKS:
            stage = sink
            if lineage.stage_complete(stage, cfg_hash):
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
            if lineage.stage_complete(stage, cfg_hash):
                result.aggregates[name] = stage_dir(out_dir, stage)
                continue
            if isinstance(agg, pa.Table):
                result.aggregates[name] = checkpoint_table(
                    agg, out_dir, stage, cfg_hash, lineage)
            else:
                result.aggregates[name] = checkpoint_dataset(
                    agg, out_dir, stage, cfg_hash, lineage)
    return result
