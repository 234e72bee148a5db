"""Stage 6 — metric aggregation tables (A1-A5).

The reference exposes Prometheus counter/histogram families
(assertsprocessor/metrics.go:24-184); the batch engine emits the same
information as Parquet/Arrow aggregate tables:

* A1 ``trace_count_total`` (env, site)              — metrics.go:148-154
* A2 ``trace_sampled_count_total`` (+ sample_type)  — metrics.go:156-163
* A3 ``span_count_total`` (namespace, service)      — metrics.go:165-184
* A4 ``otel_span_latency_seconds`` histogram over labels env, site,
  namespace, service, span_kind, status_code + sanitized configured
  attributes (metric_helper.go:143-183; buckets factory.go:38)
* A5 cardinality cap: histogram series only for the first
  ``LimitPerService`` distinct request contexts per service key
  (metric_helper.go:91-141)

Every aggregation is partial-then-final: a per-batch Arrow group_by
inside ``map_batches`` (map-side combine) followed by a small Ray
groupby-sum over the partials — the full turn table is never shuffled
for metrics.  This is also the skew story: hot label combinations are
pre-reduced per block before the exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from asserts_otel_processor_ray.config import PipelineConfig
from asserts_otel_processor_ray.functions.keys import apply_prom_conventions

US = 1_000_000


# ---------- generic partial+final count ----------------------------------

def partial_count_fn(keys: list[str], consts: dict[str, str] | None = None,
                     filter_col: str | None = None):
    """Per-batch combiner: group by `keys` and count rows."""
    consts = consts or {}

    def fn(batch: pa.Table) -> pa.Table:
        if filter_col is not None:
            batch = batch.filter(batch.column(filter_col))
        if batch.num_rows == 0:
            cols = {k: pa.nulls(0, pa.string()) for k in list(consts) + keys}
            cols["partial_count"] = pa.nulls(0, pa.int64())
            return pa.table(cols)
        for k in keys:
            if batch.column(k).null_count:
                batch = batch.set_column(
                    batch.schema.get_field_index(k), k,
                    pc.fill_null(batch.column(k), ""))
        gb = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
        out = gb.rename_columns(keys + ["partial_count"])
        for name, val in reversed(list(consts.items())):
            out = out.add_column(0, name, pa.array(
                [val] * out.num_rows, pa.string()))
        return out
    return fn


def final_count(ds: "ray.data.Dataset", keys: list[str],
                out_name: str) -> pa.Table:
    """Driver-side final merge of the per-batch partial counts — the
    partials are pre-reduced per block so this is tiny (no shuffle)."""
    from asserts_otel_processor_ray.stages.topk import collect_df
    df = collect_df(ds)
    if df.empty:
        cols = {k: pa.array([], pa.string()) for k in keys}
        cols[out_name] = pa.array([], pa.int64())
        return pa.table(cols)
    out = (df.groupby(keys, sort=False, dropna=False)["partial_count"]
           .sum().reset_index(name=out_name))
    return pa.Table.from_pandas(out, preserve_index=False)


# ---------- A1/A2/A3 ------------------------------------------------------

def trace_counts(decided: "ray.data.Dataset",
                 config: PipelineConfig) -> pa.Table:
    """A1: one count per (env, site) of traces seen."""
    part = decided.map_batches(
        partial_count_fn([], consts={"asserts_env": config.env,
                                     "asserts_site": config.site},
                         filter_col="is_trace_row"),
        batch_format="pyarrow")
    return final_count(part, ["asserts_env", "asserts_site"],
                       "trace_count_total")


def span_counts(ds: "ray.data.Dataset", config: PipelineConfig,
                out_name: str = "span_count_total") -> pa.Table:
    """A3: per-(namespace, service) span counts (all turns of a segment —
    root+entry+exit+internal, trace.go:46-52)."""
    part = ds.map_batches(
        partial_count_fn(["namespace", "service"],
                         consts={"asserts_env": config.env,
                                 "asserts_site": config.site}),
        batch_format="pyarrow")
    return final_count(
        part, ["asserts_env", "asserts_site", "namespace", "service"],
        out_name)


def sampled_trace_counts(winner_rows: list[dict],
                         config: PipelineConfig) -> pa.Table:
    """A2: flushed-trace counts by sample type (driver-side; the winner
    set is bounded by services × limit × K)."""
    df = pd.DataFrame(winner_rows)
    if df.empty:
        return pa.table({"asserts_env": pa.array([], pa.string()),
                         "asserts_site": pa.array([], pa.string()),
                         "sample_type": pa.array([], pa.string()),
                         "trace_sampled_count_total":
                             pa.array([], pa.int64())})
    g = (df.groupby("sample_type").size().reset_index(name="n")
         .sort_values("sample_type"))
    n = len(g)
    return pa.table({
        "asserts_env": pa.array([config.env] * n),
        "asserts_site": pa.array([config.site] * n),
        "sample_type": pa.array(g["sample_type"].tolist()),
        "trace_sampled_count_total": pa.array(g["n"].tolist(), pa.int64()),
    })


# ---------- A4/A5: latency histogram with cardinality cap ----------------

def service_key_expr(batch: pa.Table):
    """Vectorized ``ns#svc`` | bare svc (utils.go:9-15), arrow kernels."""
    ns = batch.column("namespace")
    svc = batch.column("service")
    return pc.if_else(pc.not_equal(ns, ""),
                      pc.binary_join_element_wise(ns, svc, "#"), svc)


def metric_first_seen_fn(limit: int | None = None):
    """Per-batch partial: min first-seen key per (service_key,
    request_context) over non-internal spans — input to the metric-side
    cardinality cap (metric_helper.go:91-141).  Pure Arrow kernels.
    With `limit`, additionally pre-caps to the first `limit` contexts
    per service key inside the block (exact — see _seg_cap_partial),
    bounding the driver merge."""
    def fn(batch: pa.Table) -> pa.Table:
        mask = pc.less(batch.column("class_order"), 3)
        batch = batch.filter(mask)
        if batch.num_rows == 0:
            return pa.table({"entity_key": pa.nulls(0, pa.string()),
                             "seg_request": pa.nulls(0, pa.string()),
                             "seg_first_seen": pa.nulls(0, pa.string())})
        skey = service_key_expr(batch)
        ctx = pc.fill_null(batch.column("asserts_request_context"), "")
        ts_s = pc.utf8_lpad(pc.cast(batch.column("ts").cast(pa.int64()),
                                    pa.string()), 20, "0")
        turn_s = pc.utf8_lpad(pc.cast(batch.column("turn_idx"),
                                      pa.string()), 10, "0")
        first = pc.binary_join_element_wise(
            ts_s, batch.column("conv_id"), turn_s, "|")
        t = pa.table({"entity_key": skey, "seg_request": ctx,
                      "seg_first_seen": first})
        gb = t.group_by(["entity_key", "seg_request"]).aggregate(
            [("seg_first_seen", "min")])
        gb = gb.rename_columns(
            ["entity_key", "seg_request", "seg_first_seen"])
        if limit is not None and gb.num_rows:
            df = gb.to_pandas().sort_values("seg_first_seen",
                                            kind="mergesort")
            df = df.groupby("entity_key", sort=False).head(limit)
            gb = pa.Table.from_pandas(df, preserve_index=False)
        return gb
    return fn


def combined_partials_fn(config: PipelineConfig):
    """ONE scan over the decided table emitting three partial
    reductions, marked by `kind`: trace counts (A1), span counts (A3)
    and the metric first-seen pairs feeding the A5 cap.  Collapsing the
    scans removes two full passes over the turn table."""
    mseen = metric_first_seen_fn()

    def fn(batch: pa.Table) -> pa.Table:
        frames = []
        n_traces = pc.sum(batch.column("is_trace_row")).as_py() or 0
        frames.append(pd.DataFrame({
            "kind": ["tcount"], "namespace": [""], "service": [""],
            "entity_key": [""], "seg_request": [""],
            "seg_first_seen": [""], "partial_count": [n_traces]}))
        sc = batch.select(["namespace", "service"]).group_by(
            ["namespace", "service"]).aggregate([([], "count_all")])
        sdf = sc.rename_columns(
            ["namespace", "service", "partial_count"]).to_pandas()
        sdf.insert(0, "kind", "scount")
        sdf["entity_key"] = ""
        sdf["seg_request"] = ""
        sdf["seg_first_seen"] = ""
        frames.append(sdf)
        ms = mseen(batch).to_pandas()
        ms.insert(0, "kind", "mseen")
        ms["namespace"] = ""
        ms["service"] = ""
        ms["partial_count"] = 0
        frames.append(ms)
        out = pd.concat(frames, ignore_index=True)
        cols = ["kind", "namespace", "service", "entity_key",
                "seg_request", "seg_first_seen", "partial_count"]
        return pa.Table.from_pandas(out[cols], preserve_index=False)
    return fn


def histogram_label_columns(config: PipelineConfig) -> list[str]:
    """Sanitized extra label names in sorted order (metrics.go:84-88)."""
    extra = list(config.attributes_as_metric_labels)
    extra += ["asserts.request.type", "asserts.request.context",
              "asserts.error.type"]
    return sorted(apply_prom_conventions(a) for a in extra)


_SOURCE_BY_LABEL_SUFFIX = {
    "asserts_request_type": "asserts_request_type",
    "asserts_request_context": "asserts_request_context",
    "asserts_error_type": "asserts_error_type",
}


def histogram_partial_fn(config: PipelineConfig,
                         metric_allowed: frozenset[str]):
    """Per-batch combiner for the latency histogram + sum/count.

    Vectorized end-to-end: each label column factorizes to integer
    codes, codes pack into one int64 series id, and per-(series, le)
    count/sum reduce via np.bincount — an order of magnitude faster per
    block than a 13-string-key hash aggregation (measured 13.8s → ~2s
    for the sf4 scan at 32 CPUs)."""
    edges = np.asarray(config.latency_histogram_buckets, dtype=np.float64)
    extra_sources = {apply_prom_conventions(a): a
                     for a in config.attributes_as_metric_labels}
    label_cols = histogram_label_columns(config)

    from asserts_otel_processor_ray.stages.topk import PAIR_SEP
    allowed_set = pa.array(sorted(metric_allowed), pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        mask = pc.less(batch.column("class_order"), 3)
        batch = batch.filter(mask)
        n = batch.num_rows
        if n:
            skey = service_key_expr(batch)
            ctx_a = pc.fill_null(
                batch.column("asserts_request_context"), "")
            pairkey = pc.binary_join_element_wise(skey, ctx_a, PAIR_SEP)
            keep = pc.is_in(pairkey, value_set=allowed_set)
            batch = batch.filter(keep)
            n = batch.num_rows
        keys = ["namespace", "service", "span_kind", "status_code",
                *label_cols]
        if n == 0:
            empty = {c: pa.nulls(0, pa.string()) for c in keys}
            empty["le"] = pa.nulls(0, pa.float64())
            empty["bucket_count"] = pa.nulls(0, pa.int64())
            empty["latency_sum_us"] = pa.nulls(0, pa.int64())
            empty["latency_count"] = pa.nulls(0, pa.int64())
            return pa.table(empty)

        # fill_null on the base keys too: pd.factorize maps nulls to -1,
        # which would alias adjacent packed series ids (code a with null
        # next-key collides with code a-1 with last key) — parse
        # guarantees non-null today, but a null must not silently merge
        # distinct series
        src_arrays = {
            "namespace": pc.fill_null(batch.column("namespace"), ""),
            "service": pc.fill_null(batch.column("service"), ""),
            "span_kind": pc.fill_null(batch.column("kind"), ""),
            "status_code": pc.fill_null(batch.column("status_code"), ""),
        }
        for lc in label_cols:
            src = _SOURCE_BY_LABEL_SUFFIX.get(lc) or extra_sources[lc]
            src_arrays[lc] = pc.fill_null(batch.column(src), "")

        # pack label codes → one int64 series id (vocab sizes are the
        # block's actual cardinalities; overflow falls back to tuples)
        combined = np.zeros(n, dtype=np.int64)
        codes_by_col = {}
        overflow = False
        for name in keys:
            c, u = pd.factorize(
                src_arrays[name].to_numpy(zero_copy_only=False))
            codes_by_col[name] = c.astype(np.int64)
            width = max(len(u), 1)
            if combined.max(initial=0) > (
                    np.iinfo(np.int64).max // width) - width:
                overflow = True
                break
            combined = combined * width + codes_by_col[name]
        if overflow:
            sid, _u = pd.factorize(pd.MultiIndex.from_arrays(
                [pd.factorize(
                    src_arrays[k].to_numpy(zero_copy_only=False))[0]
                 for k in keys]))
        else:
            sid, _u = pd.factorize(combined)
        sid = sid.astype(np.int64)
        S = len(_u)
        # first occurrence row per series (for label reconstruction)
        first_rows = np.full(S, n, np.int64)
        np.minimum.at(first_rows, sid, np.arange(n, dtype=np.int64))

        lat = batch.column("latency_s").to_numpy()
        bidx = np.searchsorted(edges, lat, side="left")  # 0..len(edges)
        nb = len(edges) + 1
        key = sid * nb + bidx
        counts = np.bincount(key, minlength=S * nb)
        # sum in EXACT integer microseconds: latency_s is k/1e6 by
        # construction (µs timestamp diffs), so rint(lat*1e6) recovers k
        # bit-exactly and integer partial sums are order-independent —
        # the final float latency_sum no longer depends on which block a
        # turn was assembled in (or on DuckDB's aggregation order)
        lat_us = np.rint(lat * 1e6)
        sums = np.bincount(key, weights=lat_us, minlength=S * nb)
        nz = np.flatnonzero(counts)
        out_sid = nz // nb
        out_bidx = nz % nb
        le = np.where(out_bidx < len(edges),
                      edges[np.minimum(out_bidx, len(edges) - 1)],
                      np.inf)
        take_idx = pa.array(first_rows[out_sid])
        cols = {}
        for name in keys:
            arr = src_arrays[name]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            cols[name] = arr.take(take_idx)
        cols["le"] = pa.array(le, pa.float64())
        cols["bucket_count"] = pa.array(counts[nz], pa.int64())
        cols["latency_sum_us"] = pa.array(
            np.rint(sums[nz]).astype(np.int64), pa.int64())
        cols["latency_count"] = pa.array(counts[nz], pa.int64())
        return pa.table(cols)
    return fn


def latency_histogram(ds: "ray.data.Dataset", config: PipelineConfig,
                      metric_allowed: frozenset[str]) -> pa.Table:
    """A4: final histogram table — per-label-set per-bucket counts plus
    sum/count.  The label space is bounded by the A5 cap (≤ limit
    request contexts per service × buckets), so after the per-batch
    partial the final sum is a small driver-side merge."""
    import ray as _ray
    part = ds.map_batches(histogram_partial_fn(config, metric_allowed),
                          batch_format="pyarrow", batch_size=None)
    tbls = [t for t in _ray.get(part.to_arrow_refs()) if t.num_rows > 0]
    merged = (pa.concat_tables(tbls, promote_options="permissive")
              if tbls else None)
    return latency_histogram_final_tbl(merged, config)


def latency_histogram_final_tbl(tbl: "pa.Table | None",
                                config: PipelineConfig) -> pa.Table:
    """Driver-side final merge of histogram partials — pure Arrow
    (multithreaded group_by; a pandas multi-string-key groupby here was
    the driver bottleneck at high block counts).  Also consumed by the
    folded winner+histogram scan in pipelines/pipeline.py."""
    label_cols = histogram_label_columns(config)
    keys = ["namespace", "service", "span_kind", "status_code",
            *label_cols, "le"]
    if tbl is None or tbl.num_rows == 0:
        cols = {"asserts_env": pa.array([], pa.string()),
                "asserts_site": pa.array([], pa.string())}
        cols.update({k: pa.array([], pa.string()) for k in keys[:-1]})
        cols["le"] = pa.array([], pa.float64())
        cols["bucket_count"] = pa.array([], pa.int64())
        cols["latency_sum"] = pa.array([], pa.float64())
        cols["latency_count"] = pa.array([], pa.int64())
        return pa.table(cols)
    tbl = tbl.select(keys + ["bucket_count", "latency_sum_us",
                             "latency_count"])
    gb = tbl.group_by(keys).aggregate(
        [("bucket_count", "sum"), ("latency_sum_us", "sum"),
         ("latency_count", "sum")])
    gb = gb.rename_columns(keys + ["bucket_count", "latency_sum_us",
                                   "latency_count"])
    gb = gb.set_column(gb.schema.get_field_index("bucket_count"),
                       "bucket_count",
                       gb.column("bucket_count").cast(pa.int64()))
    gb = gb.set_column(gb.schema.get_field_index("latency_count"),
                       "latency_count",
                       gb.column("latency_count").cast(pa.int64()))
    # partials summed in exact integer µs; divide ONCE here so the
    # float result is identical regardless of block/merge order
    us_idx = gb.schema.get_field_index("latency_sum_us")
    gb = gb.set_column(
        us_idx, "latency_sum",
        pa.compute.divide(gb.column("latency_sum_us").cast(pa.float64()),
                          1_000_000.0))
    # every histogram series carries the env/site labels like the other
    # aggregate tables (metric_helper.go buildLabels: envLabel/siteLabel)
    n = gb.num_rows
    gb = gb.add_column(0, "asserts_site",
                       pa.array([config.site] * n, pa.string()))
    gb = gb.add_column(0, "asserts_env",
                       pa.array([config.env] * n, pa.string()))
    return gb
