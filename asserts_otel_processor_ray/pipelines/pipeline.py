"""The composed Ray Data plan: parse → enrich → assemble → decide →
route → aggregate (SURVEY.md §3 E1 re-expression).

Physical shape (designed for a multi-node cluster; tested local):

* one hash shuffle of the full turn table — ``repartition(keys=
  ["conv_id"])`` — so every later per-conversation step is a vectorized
  ``map_batches`` over whole-conversation blocks (no per-group Python,
  no global sort: per-conversation order is all the semantics need,
  SURVEY.md §7 hard-part 7)
* the enrich stage is an actor pool (regex tables + threshold store
  compiled once per actor in ``__init__``)
* caps / periodic sampling / top-K are groupby's over candidate-filtered
  datasets that are pre-reduced per batch, so those shuffles move
  kilobytes, not the table
* winner sets are bounded (≤ services × limit × K) and broadcast back
  into the route stage as plain dicts
* two materialize() checkpoints (assembled, decided) because multiple
  branches consume them; at 100 TB these become partitioned Parquet
  checkpoints via state/checkpoint.py instead of object-store caching.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

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
from asserts_otel_processor_ray.stages.route import ROUTED_COLUMNS, RouteStage
from asserts_otel_processor_ray.stages.topk import (
    PAIR_SEP,
    compute_allowed_pairs,
    periodic_normal_winners,
    topk_items,
)

SINKS = ("error", "slow", "normal")


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


def build_decided(ds: "ray.data.Dataset", config: PipelineConfig, *,
                  num_partitions: int | None = None,
                  enrich_concurrency=None,
                  ) -> tuple["ray.data.Dataset", frozenset[str]]:
    """Everything up to per-trace decisions; returns (decided, allowed)."""
    # The one full-data shuffle is the conv_id hash repartition; scope
    # the HASH_SHUFFLE strategy to this dataset's context only, with a
    # deliberately small aggregator pool: each aggregator is an actor
    # whose startup is pure fixed cost (64 defaults → ~30s on one node;
    # 8-16 → ~5s).  On a real multi-node cluster this scales with nodes.
    import ray as _ray
    ncpus = int(_ray.cluster_resources().get("CPU", 8))
    if num_partitions is None:
        num_partitions = max(8, ncpus)
    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ds.context.default_hash_shuffle_parallelism = num_partitions
    ds.context.max_hash_shuffle_aggregators = max(2, min(16, ncpus // 2))
    enriched = build_enriched(ds, config,
                              enrich_concurrency=enrich_concurrency)
    parted = enriched.repartition(num_blocks=num_partitions,
                                  keys=["conv_id"])
    assembled = parted.map_batches(
        AssembleStage(config), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None).materialize()
    assembled.context.shuffle_strategy = (
        ShuffleStrategy.SORT_SHUFFLE_PULL_BASED)

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

    seg_rows = assembled.map_batches(seg_partial, batch_format="pyarrow")
    allowed = compute_allowed_pairs(
        seg_rows, "entity_key", "seg_request", "seg_first_seen",
        config.limit_per_service)

    decided = assembled.map_batches(
        DecideStage(config, allowed), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None).materialize()
    return decided, allowed


def select_winners(decided: "ray.data.Dataset",
                   config: PipelineConfig,
                   return_normal: bool = False):
    """Error/slow queue items + periodic normal winners → top-K flush set."""
    traces = _filter_col(decided, "is_trace_row")

    def es_project(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.is_valid(t.column("trace_sample_type")))
        st = t.column("trace_sample_type")
        qtype = pa.compute.if_else(
            pa.compute.equal(st, "error"), "error", "slow")
        return pa.table({
            "conv_id": t.column("conv_id"),
            "entity": t.column("trace_entity"),
            "request": t.column("trace_request"),
            "qtype": qtype,
            "sample_type": st,
            "latency": t.column("trace_latency"),
            "arrival_key": t.column("arrival_key"),
        })

    es_items = traces.map_batches(es_project, batch_format="pyarrow")

    def nc_project(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("is_ncand"))
        return pa.table({
            "conv_id": t.column("conv_id"),
            "ncand_entity": t.column("ncand_entity"),
            "ncand_request": t.column("ncand_request"),
            "ncand_bucket": t.column("ncand_bucket"),
            "ncand_latency": t.column("ncand_latency"),
            "arrival_key": t.column("arrival_key"),
        })

    ncands = traces.map_batches(nc_project, batch_format="pyarrow")
    normal_rows = periodic_normal_winners(ncands)
    items = es_items
    if normal_rows:
        tbl = pa.table({
            "conv_id": pa.array([r["conv_id"] for r in normal_rows]),
            "entity": pa.array([r["ncand_entity"] for r in normal_rows]),
            "request": pa.array([r["ncand_request"] for r in normal_rows]),
            "qtype": pa.array(["slow"] * len(normal_rows)),
            "sample_type": pa.array(["normal"] * len(normal_rows)),
            "latency": pa.array(
                [r["ncand_latency"] for r in normal_rows], pa.float64()),
            "arrival_key": pa.array(
                [r["arrival_key"] for r in normal_rows]),
        })
        items = items.union(ray.data.from_arrow(tbl))
    winners = topk_items(items, config.per_request_topk)
    if return_normal:
        return winners, normal_rows
    return winners


def run_pipeline(input_path: "str | ray.data.Dataset",
                 config: PipelineConfig, *,
                 out_dir: str | None = None,
                 num_partitions: int | None = None,
                 enrich_concurrency=None,
                 with_aggregates: bool = True) -> PipelineResult:
    """End-to-end single-flush batch run (E1, SURVEY.md §3)."""
    ds = (read_transcripts(input_path)
          if isinstance(input_path, str) else input_path)
    decided, _allowed = build_decided(
        ds, config, num_partitions=num_partitions,
        enrich_concurrency=enrich_concurrency)

    winners = select_winners(decided, config)
    winner_map = {r["conv_id"]: r["sample_type"] for r in winners}

    routed = decided.map_batches(
        RouteStage(winner_map), batch_format="pyarrow",
        zero_copy_batch=True)
    routed = routed.map_batches(lambda t: t.select(ROUTED_COLUMNS),
                                batch_format="pyarrow")

    result = PipelineResult(routed=routed, winners=winners,
                            winner_map=winner_map, decided=decided)

    if with_aggregates:
        result.aggregates["trace_count"] = trace_counts(decided, config)
        result.aggregates["span_count"] = span_counts(decided, config)
        result.aggregates["trace_sampled_count"] = sampled_trace_counts(
            winners, config)
        result.aggregates["span_sampled_count"] = span_counts(
            routed, config, out_name="span_sampled_count_total")
        metric_seen = decided.map_batches(metric_first_seen_fn(),
                                          batch_format="pyarrow")
        metric_allowed = compute_allowed_pairs(
            metric_seen, "entity_key", "seg_request", "seg_first_seen",
            config.limit_per_service)
        if config.capture_metrics:
            result.aggregates["latency_hist"] = latency_histogram(
                decided, config, metric_allowed)

    if out_dir is not None:
        import os
        routed = routed.materialize()
        result.routed = routed
        for sink in SINKS:
            path = os.path.join(out_dir, sink)
            os.makedirs(path, exist_ok=True)
            sub = routed.map_batches(
                lambda t, s=sink: t.filter(
                    pa.compute.equal(t.column("sample_type"), s)),
                batch_format="pyarrow")
            sub.write_parquet(path)
            result.sink_paths[sink] = path
        for name, agg in result.aggregates.items():
            path = os.path.join(out_dir, "metrics", name)
            os.makedirs(path, exist_ok=True)
            if isinstance(agg, pa.Table):
                import pyarrow.parquet as pq
                pq.write_table(agg, os.path.join(path, "part-0.parquet"))
            else:
                agg.write_parquet(path)
            result.aggregates[name] = path
    return result
