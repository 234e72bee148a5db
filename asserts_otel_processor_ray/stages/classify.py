"""Stages 3-4 — conversation (trace) assembly and sampling decisions.

Replicates, as deterministic batch semantics, the reference sampler's
per-trace walk (assertsprocessor/sampler.go:56-117):

* traces = conversations; trace segments = (conv, namespace, service)
  groups (assertsprocessor/utils.go:35-98)
* segment spans classified root/entry/exit/internal (utils.go:79-87,
  128-138); ``getNonInternalSpans`` = [root] + entry + exit and the main
  span is the first of those (assertsprocessor/trace.go:22-44)
* per-turn latency = ts(next turn in conv) − ts(turn) (M7; the
  transcript analog of utils.go:27-29), segment latency = main-span
  latency (sampler.go:184-193)
* per non-internal span, in scan order: error (unless client errors
  ignored) else slow; the FIRST hit samples the trace into that
  segment's (entity, request) queue with the segment latency
  (sampler.go:81-110); span-level ``asserts.sample.type`` attrs are set
  on every hit even when the trace is already sampled
* segments whose request context is outside the per-service cardinality
  cap cannot create queues (service_queue.go:49-66).  (The reference
  aborts the whole consume call in that case — sampler.go:70-75; our
  deterministic batch spec skips just that segment.)

Everything here is vectorized numpy/pandas over blocks that contain
whole conversations (the pipeline hash-partitions by conv_id first);
there is no per-conversation Python call.

Scan order — the deterministic total order of a conversation's turns as
the reference walks them (and the order routed traces are emitted in,
utils.go:109-126): sort by (segment first-appearance, span class
root<entry<exit<internal, turn_idx).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from asserts_otel_processor_ray.config import PipelineConfig

US = 1_000_000

# columns added by assemble_batch
ASSEMBLE_ADDED = [
    ("latency_s", pa.float64()),
    ("class_order", pa.int8()),
    ("seg_order", pa.int32()),
    ("scan_rank", pa.int32()),
    ("seg_has_main", pa.bool_()),
    ("is_seg_main", pa.bool_()),
    ("seg_request", pa.string()),
    ("seg_latency", pa.float64()),
    ("is_error_turn", pa.bool_()),
    ("is_slow_turn", pa.bool_()),
    ("turn_cand", pa.string()),
    ("conv_arrival_us", pa.int64()),
    ("arrival_key", pa.string()),
    ("seg_first_seen", pa.string()),
]

DECIDE_ADDED = [
    ("turn_sample_type", pa.string()),
    ("is_trace_row", pa.bool_()),
    ("trace_sample_type", pa.string()),
    ("trace_entity", pa.string()),
    ("trace_request", pa.string()),
    ("trace_latency", pa.float64()),
    ("is_ncand", pa.bool_()),
    ("is_ncand_main", pa.bool_()),
    ("ncand_entity", pa.string()),
    ("ncand_request", pa.string()),
    ("ncand_latency", pa.float64()),
    ("ncand_bucket", pa.int64()),
]


def assemble_batch(batch: pa.Table, config: PipelineConfig) -> pa.Table:
    """Per-conversation assembly over a block of whole conversations."""
    if batch.num_rows == 0:
        out = batch
        for name, typ in ASSEMBLE_ADDED:
            out = out.append_column(name, pa.nulls(0, typ))
        return out

    idx = pc.sort_indices(batch, sort_keys=[("conv_id", "ascending"),
                                            ("turn_idx", "ascending")])
    batch = batch.take(idx)
    n = batch.num_rows

    conv = batch.column("conv_id").to_numpy(zero_copy_only=False)
    turn = batch.column("turn_idx").to_numpy()
    ts_us = batch.column("ts").cast(pa.int64()).to_numpy()
    kind = batch.column("kind").to_numpy(zero_copy_only=False)
    is_root = batch.column("is_root").to_numpy(zero_copy_only=False)
    has_error = batch.column("has_error").to_numpy(zero_copy_only=False)
    thr = batch.column("latency_threshold_s").to_numpy()
    err_type = batch.column("asserts_error_type").to_numpy(
        zero_copy_only=False)
    req_ctx = batch.column("asserts_request_context").to_numpy(
        zero_copy_only=False)

    INT_MAX = np.iinfo(np.int64).max

    # conversations are contiguous in the (conv_id, turn_idx)-sorted
    # batch → integer group index per row, no hashing on strings
    changed = np.r_[True, conv[1:] != conv[:-1]]
    gidx = (np.cumsum(changed) - 1).astype(np.int64)
    starts = np.flatnonzero(changed)
    lengths = np.diff(np.r_[starts, n])

    # M7 latency: next turn's ts − this turn's ts, seconds; last turn → 0
    last_of_conv = np.r_[changed[1:], True]
    nxt = np.r_[ts_us[1:], 0]
    latency = np.where(last_of_conv, 0.0, (nxt - ts_us) / US)

    # span class: root < entry < exit < internal (trace.go:22-35)
    class_order = np.select(
        [is_root,
         np.isin(kind, ("Server", "Consumer")),
         np.isin(kind, ("Client", "Producer"))],
        [0, 1, 2], 3).astype(np.int8)

    # segments keyed by (conv, ns, svc) as INTEGER codes (service vocab
    # is tiny; string keys were the memory hotspot at scale)
    ns = batch.column("namespace").to_numpy(zero_copy_only=False)
    svc = batch.column("service").to_numpy(zero_copy_only=False)
    ns_codes, ns_uniq = pd.factorize(ns)
    svc_codes, svc_uniq = pd.factorize(svc)
    ns_codes = ns_codes.astype(np.int64)
    svc_codes = svc_codes.astype(np.int64)
    # multipliers sized to the block's actual vocab (no fixed 100k
    # assumption); fall back to tuple factorize on int64 overflow risk
    pair_mult = max(len(svc_uniq), 1)
    seg_mult = max(len(ns_uniq), 1) * pair_mult
    if int(gidx[-1]) + 1 < INT_MAX // max(seg_mult, 1) - 1:
        pair = ns_codes * pair_mult + svc_codes
        seg_codes, _uniq = pd.factorize(gidx * seg_mult + pair)
    else:
        seg_codes, _uniq = pd.factorize(
            pd.MultiIndex.from_arrays([gidx, ns_codes, svc_codes]))
    seg_codes = seg_codes.astype(np.int64)
    S = len(_uniq)

    seg_first_arr = np.full(S, INT_MAX, np.int64)
    np.minimum.at(seg_first_arr, seg_codes, turn.astype(np.int64))
    seg_conv = np.zeros(S, np.int64)
    seg_conv[seg_codes] = gidx

    # seg_order: dense rank of first-appearance turn within conv
    o = np.lexsort((seg_first_arr, seg_conv))
    sc = seg_conv[o]
    st = np.r_[0, np.flatnonzero(sc[1:] != sc[:-1]) + 1]
    pos = np.arange(S, dtype=np.int64)
    within_seg = pos - np.repeat(pos[st], np.diff(np.r_[st, S]))
    rank = np.empty(S, np.int64)
    rank[o] = within_seg
    seg_order = rank[seg_codes].astype(np.int32)

    # segment main span: first of [root]+entry+exit by (class, turn);
    # multiplier sized to the block's max turn_idx (no fixed 10M cap)
    ni_mask = class_order < 3
    t_mult = int(turn.max()) + 1
    mr = np.where(ni_mask,
                  class_order.astype(np.int64) * t_mult + turn,
                  INT_MAX)
    seg_min = np.full(S, INT_MAX, np.int64)
    np.minimum.at(seg_min, seg_codes, mr)
    seg_has_main = seg_min[seg_codes] != INT_MAX
    is_seg_main = (mr == seg_min[seg_codes]) & ni_mask

    # segment latency / request from the main span (sampler.go:184-193)
    main_rows = np.flatnonzero(is_seg_main)
    req_filled = np.where(pd.isna(req_ctx), "", req_ctx)
    seg_req_arr = np.full(S, "", dtype=object)
    seg_req_arr[seg_codes[main_rows]] = req_filled[main_rows]
    seg_lat_arr = np.zeros(S, np.float64)
    seg_lat_arr[seg_codes[main_rows]] = latency[main_rows]
    seg_request = seg_req_arr[seg_codes]
    seg_latency = seg_lat_arr[seg_codes]

    # per-turn predicates (sampler.go:81-110); only non-internal spans
    # are examined
    ignore_client = config.ignore_client_errors
    err_eff = has_error & ~(
        ignore_client & (np.where(pd.isna(err_type), "", err_type)
                         == "client_errors"))
    is_error_turn = err_eff & ni_mask
    is_slow_turn = (latency > thr) & ni_mask
    turn_cand = np.where(is_error_turn, "error",
                         np.where(is_slow_turn & ~is_error_turn, "slow",
                                  None))

    conv_min = np.minimum.reduceat(ts_us, starts)
    conv_arrival = np.repeat(conv_min, lengths)

    # packed keys via Arrow kernels (np.char costs µs/element)
    arr_key_a = pc.binary_join_element_wise(
        pc.utf8_lpad(pc.cast(pa.array(conv_arrival), pa.string()),
                     20, "0"),
        batch.column("conv_id").combine_chunks()
        if isinstance(batch.column("conv_id"), pa.ChunkedArray)
        else batch.column("conv_id"),
        "|")
    sfs_a = pc.if_else(
        pa.array(is_seg_main),
        pc.binary_join_element_wise(
            arr_key_a,
            pc.utf8_lpad(pc.cast(pa.array(seg_order.astype(np.int64)),
                                 pa.string()), 5, "0"),
            "|"),
        "")

    # scan order: (conv, seg_order, class_order, turn) — also the routed
    # emit order (non-internal then internal per segment, utils.go:109-126)
    order = np.lexsort((turn, class_order, seg_order, gidx))
    scan_rank = np.empty(n, dtype=np.int32)
    scan_pos = np.arange(n, dtype=np.int64)
    gs = gidx[order]
    g_starts = np.r_[0, np.flatnonzero(gs[1:] != gs[:-1]) + 1]
    within = scan_pos - np.repeat(scan_pos[g_starts],
                                  np.diff(np.r_[g_starts, n]))
    scan_rank[order] = within.astype(np.int32)
    arrival_key = arr_key_a
    seg_first_seen = sfs_a

    out = batch
    for name, arr, typ in [
        ("latency_s", latency, pa.float64()),
        ("class_order", class_order, pa.int8()),
        ("seg_order", seg_order, pa.int32()),
        ("scan_rank", scan_rank, pa.int32()),
        ("seg_has_main", seg_has_main, pa.bool_()),
        ("is_seg_main", is_seg_main, pa.bool_()),
        ("seg_request", seg_request, pa.string()),
        ("seg_latency", seg_latency, pa.float64()),
        ("is_error_turn", is_error_turn, pa.bool_()),
        ("is_slow_turn", is_slow_turn, pa.bool_()),
        ("turn_cand", turn_cand, pa.string()),
        ("conv_arrival_us", conv_arrival, pa.int64()),
        ("arrival_key", arrival_key, pa.string()),
        ("seg_first_seen", seg_first_seen, pa.string()),
    ]:
        col = (arr if isinstance(arr, (pa.Array, pa.ChunkedArray))
               else pa.array(arr, typ))
        out = out.append_column(name, col)
    # emit in scan order so downstream blocks are routed-output-ordered
    return out.take(pa.array(order))


class AssembleStage:
    def __init__(self, config: PipelineConfig):
        self.config = config

    def __call__(self, batch: pa.Table) -> pa.Table:
        return assemble_batch(batch, self.config)


def decide_batch(batch: pa.Table, config: PipelineConfig,
                 allowed: frozenset[str],
                 allowed_arr: "pa.Array | None" = None) -> pa.Table:
    """Apply the cardinality cap and pick each trace's sampling decision.

    ``allowed`` = set of "entity_key\\x00request" pairs admitted by the
    per-service cap (first LimitPerService distinct request contexts per
    entity by first-seen arrival — the deterministic analog of
    service_queue.go:49-66 / ttlcache admission order).
    """
    if batch.num_rows == 0:
        out = batch
        for name, typ in DECIDE_ADDED:
            out = out.append_column(name, pa.nulls(0, typ))
        return out

    n = batch.num_rows
    conv = batch.column("conv_id").to_numpy(zero_copy_only=False)
    scan_rank = batch.column("scan_rank").to_numpy()
    entity = batch.column("entity_key").to_numpy(zero_copy_only=False)
    seg_request = batch.column("seg_request").to_numpy(zero_copy_only=False)
    seg_has_main = batch.column("seg_has_main").to_numpy(
        zero_copy_only=False)
    seg_order = batch.column("seg_order").to_numpy()
    seg_latency = batch.column("seg_latency").to_numpy()
    turn_cand = batch.column("turn_cand").to_numpy(zero_copy_only=False)
    is_seg_main = batch.column("is_seg_main").to_numpy(zero_copy_only=False)
    arrival = batch.column("conv_arrival_us").to_numpy()

    from asserts_otel_processor_ray.stages.topk import PAIR_SEP
    pair_a = pc.binary_join_element_wise(batch.column("entity_key"),
                                         batch.column("seg_request"),
                                         PAIR_SEP)
    if allowed_arr is None:
        allowed_arr = pa.array(sorted(allowed), pa.string())
    seg_allowed = pc.is_in(
        pair_a, value_set=allowed_arr
    ).to_numpy(zero_copy_only=False)

    # rows of a conversation are contiguous (assemble emits scan order);
    # group index per row lets winners broadcast without hash maps
    changed = np.r_[True, conv[1:] != conv[:-1]]
    gidx = np.cumsum(changed) - 1
    n_groups = int(gidx[-1]) + 1

    cand_ok = (pd.notna(turn_cand) & seg_has_main & seg_allowed)

    # first qualifying candidate per conv (scan order)
    cand_idx = np.flatnonzero(cand_ok)
    cand_conv = conv[cand_idx]
    first_mask = np.r_[True, cand_conv[1:] != cand_conv[:-1]] \
        if len(cand_idx) else np.array([], dtype=bool)
    win_idx = cand_idx[first_mask]
    win_arr = np.full(n_groups, -1, dtype=np.int64)
    win_arr[gidx[win_idx]] = win_idx
    wi = win_arr[gidx]
    has_winner = wi >= 0
    wi = np.where(has_winner, wi, 0)

    trace_sample_type = np.where(has_winner, turn_cand[wi], None)
    trace_entity = np.where(has_winner, entity[wi], None)
    trace_request = np.where(has_winner, seg_request[wi], None)
    trace_latency = np.where(has_winner, seg_latency[wi], np.nan)

    # normal candidate: first allowed segment with a main span, for
    # traces with no error/slow winner (sampler.go:112-114,119-182)
    ncand_row_ok = is_seg_main & seg_allowed & ~has_winner
    nc_idx = np.flatnonzero(ncand_row_ok)
    nc_conv = conv[nc_idx]
    nc_first = np.r_[True, nc_conv[1:] != nc_conv[:-1]] \
        if len(nc_idx) else np.array([], dtype=bool)
    ncm_idx = nc_idx[nc_first]                     # ncand main rows
    is_ncand_main = np.zeros(n, dtype=bool)
    is_ncand_main[ncm_idx] = True
    ncm_arr = np.full(n_groups, -1, dtype=np.int64)
    ncm_arr[gidx[ncm_idx]] = ncm_idx
    ni = ncm_arr[gidx]
    has_nc = ni >= 0
    ni = np.where(has_nc, ni, 0)
    bucket_us = config.normal_sampling_rate_minutes * 60 * US
    ncand_entity = np.where(has_nc, entity[ni], None)
    ncand_request = np.where(has_nc, seg_request[ni], None)
    ncand_latency = np.where(has_nc, seg_latency[ni], np.nan)
    ncand_bucket = np.where(has_nc, arrival // bucket_us, -1)

    # span-level sample-type attrs: set on every qualifying span of an
    # allowed segment (sampler.go:89,102 — even when already sampled)
    turn_sample_type = np.where(cand_ok, turn_cand, None)

    is_trace_row = scan_rank == 0

    out = batch
    for name, arr, typ in [
        ("turn_sample_type", turn_sample_type, pa.string()),
        ("is_trace_row", is_trace_row, pa.bool_()),
        ("trace_sample_type", trace_sample_type, pa.string()),
        ("trace_entity", trace_entity, pa.string()),
        ("trace_request", trace_request, pa.string()),
        ("trace_latency", trace_latency, pa.float64()),
        ("is_ncand", has_nc & is_trace_row, pa.bool_()),
        ("is_ncand_main", is_ncand_main, pa.bool_()),
        ("ncand_entity", ncand_entity, pa.string()),
        ("ncand_request", ncand_request, pa.string()),
        ("ncand_latency", ncand_latency, pa.float64()),
        ("ncand_bucket", ncand_bucket, pa.int64()),
    ]:
        out = out.append_column(name, pa.array(arr, typ))
    return out


class DecideStage:
    def __init__(self, config: PipelineConfig, allowed: frozenset[str]):
        self.config = config
        self.allowed = allowed
        # per-stage state, not per-batch: the sorted value-set array is
        # bounded (≤ services × limit) but was rebuilt on every call
        self.allowed_arr = pa.array(sorted(allowed), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        return decide_batch(batch, self.config, self.allowed,
                            self.allowed_arr)
