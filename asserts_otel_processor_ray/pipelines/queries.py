"""Ray-side query callables matching the oracle SQL (oracle_sql.py).

Each query runs the real Ray pipeline over the transcripts of `sf_dir`
and projects the stage the oracle checks.  The heavy artifacts (decided
turn table, winner set) are computed once per sf_dir and cached in the
driver process, so the driver's per-query loop doesn't re-run the
pipeline sixteen times.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from asserts_otel_processor_ray.config import PipelineConfig, default_config
from asserts_otel_processor_ray.pipelines.pipeline import (
    _filter_col,
    build_decided,
    build_enriched,
    build_routed,
    read_transcripts,
    select_winners,
)
from asserts_otel_processor_ray.pipelines.oracle_sql import PARSED_COLS
from asserts_otel_processor_ray.sources.synthetic import ensure_transcripts
from asserts_otel_processor_ray.stages.aggregate import (
    latency_histogram,
    metric_first_seen_fn,
    span_counts,
    trace_counts,
)
from asserts_otel_processor_ray.stages.route import ROUTED_COLUMNS
from asserts_otel_processor_ray.stages.topk import (
    PAIR_SEP,
    compute_allowed_pairs,
)

_CACHE: dict[str, dict] = {}


def _ds_to_table(ds: "ray.data.Dataset") -> pa.Table:
    refs = ds.to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows > 0]
    if not tables:
        return ray.get(refs[0]) if refs else pa.table({})
    return pa.concat_tables(tables, promote_options="permissive")


def artifacts(sf_dir: str, config: PipelineConfig | None = None) -> dict:
    key = sf_dir
    if key in _CACHE:
        return _CACHE[key]
    config = config or default_config()
    path = ensure_transcripts(sf_dir)
    source = read_transcripts(path)
    decided, allowed = build_decided(source, config, num_partitions=16,
                                     source_path=path)
    winners, normal_rows = select_winners(decided, config,
                                          return_normal=True)
    winner_map = {r["conv_id"]: r["sample_type"] for r in winners}
    routed = build_routed(source, decided, winner_map).materialize()
    # full-width enriched table (incl. text/attr cols that the slim
    # sort path drops) for the parse/enrich oracle checks
    enriched_tbl = _ds_to_table(build_enriched(source, config))
    art = {
        "config": config,
        "decided": decided,
        "decided_tbl": _ds_to_table(decided),
        "enriched_tbl": enriched_tbl,
        "allowed": allowed,
        "winners": winners,
        "normal_rows": normal_rows,
        "winner_map": winner_map,
        "routed": routed,
        "routed_tbl": _ds_to_table(routed),
    }
    _CACHE[key] = art
    return art


def _winner_table(winners: list[dict]) -> pa.Table:
    return pa.table({
        "conv_id": pa.array([r["conv_id"] for r in winners], pa.string()),
        "entity": pa.array([r["entity"] for r in winners], pa.string()),
        "request": pa.array([r["request"] for r in winners], pa.string()),
        "qtype": pa.array([r["qtype"] for r in winners], pa.string()),
        "sample_type": pa.array([r["sample_type"] for r in winners],
                                pa.string()),
        "latency": pa.array([r["latency"] for r in winners], pa.float64()),
    })


# ---- individual queries --------------------------------------------------

def q_parse(sf_dir: str) -> pa.Table:
    t = artifacts(sf_dir)["enriched_tbl"]
    return t.select(PARSED_COLS.replace(" ", "").split(","))


def q_enrich(sf_dir: str) -> pa.Table:
    art = artifacts(sf_dir)
    t = art["enriched_tbl"]
    from asserts_otel_processor_ray.functions.keys import (
        ATTR_ERROR_TYPE, ATTR_REQUEST_CONTEXT, attr_column)
    rules = art["config"].compiled_rules()
    target_cols = sorted({attr_column(x) for x in rules}
                         | {attr_column(ATTR_REQUEST_CONTEXT),
                            attr_column(ATTR_ERROR_TYPE)})
    cols = (PARSED_COLS.replace(" ", "").split(",")
            + ["asserts_request_type"] + target_cols
            + ["entity_key", "latency_threshold_s"])
    return t.select(cols)


def q_latency(sf_dir: str) -> pa.Table:
    t = artifacts(sf_dir)["decided_tbl"]
    return t.select(["conv_id", "turn_idx", "latency_s", "class_order",
                     "conv_arrival_us"])


def q_assemble(sf_dir: str) -> pa.Table:
    t = artifacts(sf_dir)["decided_tbl"]
    return t.select(["conv_id", "turn_idx", "seg_order", "scan_rank",
                     "is_seg_main", "seg_has_main", "seg_request",
                     "seg_latency", "is_error_turn", "is_slow_turn",
                     "turn_cand", "arrival_key"])


def q_allowed(sf_dir: str) -> pa.Table:
    allowed = sorted(artifacts(sf_dir)["allowed"])
    ents, reqs = [], []
    for pair in allowed:
        e, _, r = pair.partition(PAIR_SEP)
        ents.append(e)
        reqs.append(r)
    return pa.table({"entity_key": pa.array(ents, pa.string()),
                     "request_context": pa.array(reqs, pa.string())})


def q_trace_decisions(sf_dir: str) -> pa.Table:
    t = artifacts(sf_dir)["decided_tbl"]
    t = t.filter(pc.and_(t.column("is_trace_row"),
                         pc.is_valid(t.column("trace_sample_type"))))
    return t.select(["conv_id", "trace_sample_type", "trace_entity",
                     "trace_request", "trace_latency"])


def q_normal_winners(sf_dir: str) -> pa.Table:
    rows = artifacts(sf_dir)["normal_rows"]
    return pa.table({
        "conv_id": pa.array([r["conv_id"] for r in rows], pa.string()),
        "entity": pa.array([r["ncand_entity"] for r in rows], pa.string()),
        "request": pa.array([r["ncand_request"] for r in rows],
                            pa.string()),
        "latency": pa.array([r["ncand_latency"] for r in rows],
                            pa.float64()),
    })


def q_winners(sf_dir: str) -> pa.Table:
    return _winner_table(artifacts(sf_dir)["winners"])


def _q_routed(sf_dir: str, sample_type: str) -> pa.Table:
    t = artifacts(sf_dir)["routed_tbl"]
    if t.num_rows == 0:
        return t
    return t.filter(pc.equal(t.column("sample_type"), sample_type))


def q_routed_error(sf_dir: str) -> pa.Table:
    return _q_routed(sf_dir, "error")


def q_routed_slow(sf_dir: str) -> pa.Table:
    return _q_routed(sf_dir, "slow")


def q_routed_normal(sf_dir: str) -> pa.Table:
    return _q_routed(sf_dir, "normal")


def q_agg_trace_count(sf_dir: str) -> pa.Table:
    art = artifacts(sf_dir)
    return trace_counts(art["decided"], art["config"])


def q_agg_span_count(sf_dir: str) -> pa.Table:
    art = artifacts(sf_dir)
    return span_counts(art["decided"], art["config"])


def q_agg_sampled_count(sf_dir: str) -> pa.Table:
    from asserts_otel_processor_ray.stages.aggregate import (
        sampled_trace_counts)
    art = artifacts(sf_dir)
    return sampled_trace_counts(art["winners"], art["config"])


def q_agg_span_sampled(sf_dir: str) -> pa.Table:
    art = artifacts(sf_dir)
    return span_counts(art["routed"], art["config"],
                       out_name="span_sampled_count_total")


def q_agg_latency_hist(sf_dir: str) -> pa.Table:
    art = artifacts(sf_dir)
    config = art["config"]
    metric_seen = art["decided"].map_batches(metric_first_seen_fn(),
                                             batch_format="pyarrow",
                                             batch_size=None)
    metric_allowed = compute_allowed_pairs(
        metric_seen, "entity_key", "seg_request", "seg_first_seen",
        config.limit_per_service)
    return latency_histogram(art["decided"], config, metric_allowed)


# S2 correctness input: the reference's own Jaeger fixtures
# (assertsprocessor/testdata/sample-trace-{1,2}.json — 4 + 86 spans,
# incl. the DynamoDb error call); the oracle re-expresses the
# conversion in DuckDB SQL over read_json of the same files
JAEGER_FIXTURES = [
    "/root/reference/assertsprocessor/testdata/sample-trace-1.json",
    "/root/reference/assertsprocessor/testdata/sample-trace-2.json",
]


def jaeger_fixture_paths() -> list[str]:
    import os
    return [p for p in JAEGER_FIXTURES if os.path.exists(p)]


def q_jaeger(sf_dir: str) -> pa.Table:
    """S2: Jaeger-JSON ingest of the reference fixtures → transcript
    schema (span_enrichment semantics of sources/jaeger.py).  The input
    is the fixture pair, not sf_dir — the conversion is what's under
    test."""
    from asserts_otel_processor_ray.sources.jaeger import read_jaeger_json
    return read_jaeger_json(jaeger_fixture_paths())


# flush-window width for the windowed-winners correctness query (K4
# incremental mode); mirrored in oracle_sql.build_oracle_queries
WINDOWED_QUERY_SECONDS = 600


def q_windowed_winners(sf_dir: str) -> pa.Table:
    """K4 windowed flush: top-K winners per event-time flush window
    (the per-window analog of t_winners)."""
    from asserts_otel_processor_ray.pipelines.pipeline import (
        _finish_winners, _winner_partials_fn)
    from asserts_otel_processor_ray.stages.topk import collect_df
    art = artifacts(sf_dir)
    config = art["config"]
    window_us = WINDOWED_QUERY_SECONDS * 1_000_000
    df = collect_df(art["decided"].map_batches(
        _winner_partials_fn(config.per_request_topk,
                            window_us=window_us),
        batch_format="pyarrow", batch_size=None))
    rows: list[tuple] = []
    if not df.empty:
        for w, wdf in df.groupby("window", sort=True):
            for r in _finish_winners(wdf, config):
                rows.append((int(w), r["conv_id"], r["entity"],
                             r["request"], r["qtype"], r["sample_type"],
                             r["latency"]))
    return pa.table({
        "flush_window": pa.array([r[0] for r in rows], pa.int64()),
        "conv_id": pa.array([r[1] for r in rows], pa.string()),
        "entity": pa.array([r[2] for r in rows], pa.string()),
        "request": pa.array([r[3] for r in rows], pa.string()),
        "qtype": pa.array([r[4] for r in rows], pa.string()),
        "sample_type": pa.array([r[5] for r in rows], pa.string()),
        "latency": pa.array([r[6] for r in rows], pa.float64()),
    })


LAT_QUANTILE_PCTS = (50, 90, 99)


def _lat_count_partial(t: pa.Table) -> pa.Table:
    """Per-batch partial: turn count per (namespace, service, exact
    integer-µs latency).  latency_s is k/1e6 by construction (µs
    timestamp diffs), so rint(lat·1e6) recovers k exactly."""
    lat_us = np.rint(
        t.column("latency_s").to_numpy() * 1e6).astype(np.int64)
    tt = pa.table({
        "namespace": t.column("namespace"),
        "service": t.column("service"),
        "lat_us": pa.array(lat_us, pa.int64()),
    })
    gb = tt.group_by(["namespace", "service", "lat_us"]).aggregate(
        [([], "count_all")])
    return gb.rename_columns(["namespace", "service", "lat_us",
                              "partial_n"])


def _lat_quantile_final(df: pd.DataFrame) -> pd.DataFrame:
    """map_groups body: one (namespace, service)'s (lat_us, n)
    histogram → a single row of exact discrete percentiles (1-based
    rank ceil(p·n/100), integer arithmetic — the g_quantiles
    convention)."""
    d = df.sort_values("lat_us")
    vals = d["lat_us"].to_numpy(np.int64)
    cum = np.cumsum(d["n"].to_numpy().astype(np.int64))
    n = int(cum[-1])
    out = {"namespace": [df["namespace"].iloc[0]],
           "service": [df["service"].iloc[0]],
           "n_turns": [np.int64(n)]}
    for p in LAT_QUANTILE_PCTS:
        rank = (p * n + 99) // 100
        idx = int(np.searchsorted(cum, rank, side="left"))
        out[f"p{p}_us"] = [np.int64(vals[idx])]
    return pd.DataFrame(out)


def q_latency_quantiles(sf_dir: str) -> pa.Table:
    """Per-(namespace, service) exact discrete latency percentiles in
    integer microseconds over every decided turn — the SLO summary the
    reference's latency histogram (metric_helper.go) approximates from
    bucket edges, computed exactly.  Shape: per-batch
    (ns, svc, lat_us) count partials → ONE distributed groupby-sum
    (|distinct (svc, latency)| rows, bounded by timestamp resolution ×
    service cardinality) → per-service rank-selection final.  No
    global sort, no full-column materialization."""
    from ray.data.aggregate import Sum
    from asserts_otel_processor_ray.stages.topk import collect_df
    art = artifacts(sf_dir)
    part = art["decided"].map_batches(_lat_count_partial,
                                      batch_format="pyarrow")
    agg = part.groupby(["namespace", "service", "lat_us"]).aggregate(
        Sum("partial_n"))
    agg = agg.map_batches(
        lambda t: (t.rename_columns(
            ["namespace", "service", "lat_us", "n"])
            if t.num_columns == 4 else t),
        batch_format="pyarrow")
    out = agg.groupby(["namespace", "service"]).map_groups(
        _lat_quantile_final, batch_format="pandas")
    df = collect_df(out).sort_values(["namespace", "service"],
                                     ignore_index=True)
    for c in ["n_turns"] + [f"p{p}_us" for p in LAT_QUANTILE_PCTS]:
        df[c] = df[c].astype(np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


def _tool_pairs_block(t: pa.Table) -> pa.Table:
    """Block kernel (blocks hash-partitioned by conv_id): sort each
    conversation by turn_idx, emit (tool, next_tool) adjacent pairs,
    pre-reduced to counts before leaving the block."""
    if t.num_rows == 0:
        return pa.table({"tool": pa.array([], pa.string()),
                         "next_tool": pa.array([], pa.string()),
                         "n_pairs": pa.array([], pa.int64())})
    idx = pc.sort_indices(t, sort_keys=[("conv_id", "ascending"),
                                        ("turn_idx", "ascending")])
    t = t.take(idx)
    conv = t.column("conv_id").to_numpy(zero_copy_only=False)
    tool = t.column("tool").to_numpy(zero_copy_only=False)
    same = conv[1:] == conv[:-1]
    df = pd.DataFrame({"tool": tool[:-1][same],
                       "next_tool": tool[1:][same]})
    out = df.groupby(["tool", "next_tool"], sort=False) \
        .size().reset_index(name="n_pairs")
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def q_tool_transitions(sf_dir: str) -> pa.Table:
    """Tool→next-tool bigram counts within each conversation over the
    raw transcript table — the Markov structure of agent tool usage
    (the transcripts sibling of g_transitions).  Shape: ONE hash
    exchange by conv_id (correct under any input layout) → per-block
    sort + shifted-pair pre-reduce → bounded driver merge (≤ |tools|²
    rows cross the driver, never turns)."""
    from asserts_otel_processor_ray.stages.topk import (
        collect_df, shuffle_width, use_hash_shuffle)
    path = ensure_transcripts(sf_dir)
    ds = ray.data.read_parquet(path,
                               columns=["conv_id", "turn_idx", "tool"])
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)
    parted = ds.repartition(num_blocks=nparts, keys=["conv_id"])
    blk = parted.map_batches(_tool_pairs_block, batch_format="pyarrow",
                             batch_size=None)
    df = collect_df(blk)
    if df.empty:
        return pa.table({"tool": pa.array([], pa.string()),
                         "next_tool": pa.array([], pa.string()),
                         "n_pairs": pa.array([], pa.int64())})
    out = df.groupby(["tool", "next_tool"], sort=True, as_index=False) \
        ["n_pairs"].sum()
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def q_conv_sizes(sf_dir: str) -> pa.Table:
    """Conversation-length distribution over the raw transcript table
    (turns per conversation → how many conversations have that
    length) — the fan-out/skew profile of the pipeline's own
    partitioning key.  Shape: per-batch (conv_id, n) pre-reduce (near
    final on conversation-clustered input) → ONE distributed
    groupby(conv_id).sum → per-batch count-of-counts partials →
    bounded driver merge (≤ |distinct lengths| × blocks rows)."""
    from ray.data.aggregate import Sum
    from asserts_otel_processor_ray.stages.topk import collect_df
    path = ensure_transcripts(sf_dir)
    ds = ray.data.read_parquet(path, columns=["conv_id"])

    def _pre(t: pa.Table) -> pa.Table:
        gb = t.group_by(["conv_id"]).aggregate([([], "count_all")])
        return gb.rename_columns(["conv_id", "partial_n"])

    agg = ds.map_batches(_pre, batch_format="pyarrow") \
        .groupby("conv_id").aggregate(Sum("partial_n"))

    def _size_counts(t: pa.Table) -> pa.Table:
        if t.num_columns != 2 or t.num_rows == 0:
            return pa.table({"conv_turns": pa.array([], pa.int64()),
                             "n_convs": pa.array([], pa.int64())})
        n = t.column(1).to_numpy().astype(np.int64)
        sizes, counts = np.unique(n, return_counts=True)
        return pa.table({
            "conv_turns": pa.array(sizes, pa.int64()),
            "n_convs": pa.array(counts.astype(np.int64), pa.int64())})

    df = collect_df(agg.map_batches(_size_counts,
                                    batch_format="pyarrow"))
    if df.empty:
        return pa.table({"conv_turns": pa.array([], pa.int64()),
                         "n_convs": pa.array([], pa.int64())})
    out = df.groupby("conv_turns", sort=True, as_index=False) \
        ["n_convs"].sum()
    out["n_convs"] = out["n_convs"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def q_error_taxonomy(sf_dir: str) -> pa.Table:
    """Error-turn breakdown per (namespace, service, error type) with
    the service's error share — the table the reference's error
    assertion (assertsprocessor error predicate + error-type attr
    extraction) would feed an alerting rule.  Shape: per-batch integer
    partials over the decided stream (error counts per taxonomy key +
    turn totals per service) → two tiny distributed groupby-sums →
    one driver join of bounded aggregates; the only float is the final
    share division."""
    from ray.data.aggregate import Sum
    from asserts_otel_processor_ray.stages.topk import collect_df
    art = artifacts(sf_dir)

    def _part(t: pa.Table) -> pa.Table:
        err = t.column("is_error_turn").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "namespace": t.column("namespace").to_numpy(
                zero_copy_only=False),
            "service": t.column("service").to_numpy(
                zero_copy_only=False),
            "asserts_error_type": pd.Series(
                t.column("asserts_error_type").to_numpy(
                    zero_copy_only=False)).fillna(""),
            "is_err": err.astype(np.int64),
        })
        g = df.groupby(["namespace", "service", "asserts_error_type"],
                       sort=False).agg(
            n_errors=("is_err", "sum"),
            n_turns=("is_err", "size")).reset_index()
        g["n_errors"] = g["n_errors"].astype(np.int64)
        g["n_turns"] = g["n_turns"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    part = art["decided"].map_batches(_part, batch_format="pyarrow") \
        .materialize()   # two bounded aggregates read it, one map pass
    agg = part.groupby(["namespace", "service",
                        "asserts_error_type"]).aggregate(
        Sum("n_errors"), Sum("n_turns"))
    df = collect_df(agg)
    if df.empty:
        return pa.table({
            "namespace": pa.array([], pa.string()),
            "service": pa.array([], pa.string()),
            "asserts_error_type": pa.array([], pa.string()),
            "n_errors": pa.array([], pa.int64()),
            "svc_turns": pa.array([], pa.int64()),
            "error_share": pa.array([], pa.float64())})
    df.columns = ["namespace", "service", "asserts_error_type",
                  "n_errors", "n_turns"]
    df = df[df["n_errors"] > 0].copy()
    # svc_turns counts ALL turns of the service (not only error rows):
    # a second bounded aggregate over the same partials
    full = collect_df(part.groupby(["namespace", "service"]).aggregate(
        Sum("n_turns")))
    full.columns = ["namespace", "service", "svc_turns"]
    out = df.merge(full, on=["namespace", "service"], how="left")
    out["error_share"] = (out["n_errors"].to_numpy(np.int64)
                          / out["svc_turns"].to_numpy(np.int64)
                          .astype(np.float64))
    out = out.drop(columns=["n_turns"]).sort_values(
        ["namespace", "service", "asserts_error_type"],
        ignore_index=True)
    for c in ("n_errors", "svc_turns"):
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


CORE_QUERIES = {
    "t_parse": q_parse,
    "t_enrich": q_enrich,
    "t_latency": q_latency,
    "t_assemble": q_assemble,
    "t_allowed": q_allowed,
    "t_trace_decisions": q_trace_decisions,
    "t_normal_winners": q_normal_winners,
    "t_winners": q_winners,
    "t_routed_error": q_routed_error,
    "t_routed_slow": q_routed_slow,
    "t_routed_normal": q_routed_normal,
    "t_agg_trace_count": q_agg_trace_count,
    "t_agg_span_count": q_agg_span_count,
    "t_agg_sampled_count": q_agg_sampled_count,
    "t_agg_span_sampled": q_agg_span_sampled,
    "t_agg_latency_hist": q_agg_latency_hist,
    "t_windowed_winners": q_windowed_winners,
    "t_latency_quantiles": q_latency_quantiles,
    "t_tool_transitions": q_tool_transitions,
    "t_conv_sizes": q_conv_sizes,
    "t_error_taxonomy": q_error_taxonomy,
}

if jaeger_fixture_paths():
    CORE_QUERIES["t_jaeger"] = q_jaeger
