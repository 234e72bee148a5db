"""Generic stream-table operators over the ``events`` table
(event_id, ts, user_id, event_type, value, props): sessionization,
windowed dedup and grouped top-K — the reference's windowing/top-K
semantics (K1, K3) applied to a generic key instead of conv_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

US = 1_000_000


def sessionize_batch(batch: pa.Table, gap_s: float = 1800.0) -> pa.Table:
    """Per-user sessionization: a new session starts when the gap from
    the previous event exceeds `gap_s`.  Requires blocks hash-partitioned
    by user_id (same machinery as the conv_id repartition)."""
    if batch.num_rows == 0:
        return pa.table({
            "user_id": pa.array([], pa.int64()),
            "session_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "first_ts": pa.array([], pa.timestamp("us")),
            "last_ts": pa.array([], pa.timestamp("us")),
        })
    import pyarrow.compute as pc
    idx = pc.sort_indices(batch, sort_keys=[("user_id", "ascending"),
                                            ("ts", "ascending"),
                                            ("event_id", "ascending")])
    batch = batch.take(idx)
    user = batch.column("user_id").to_numpy()
    ts = batch.column("ts").cast(pa.int64()).to_numpy()
    gap_us = int(gap_s * US)
    new_user = np.r_[True, user[1:] != user[:-1]]
    gap = np.r_[True, (ts[1:] - ts[:-1]) > gap_us]
    new_session = new_user | gap
    sess_global = np.cumsum(new_session) - 1
    # session_id within user (0-based)
    user_start = np.where(new_user, sess_global, 0)
    user_start = np.maximum.accumulate(
        np.where(new_user, sess_global, -1))
    session_id = sess_global - user_start
    df = pd.DataFrame({"user_id": user, "session_id": session_id,
                       "ts": ts})
    g = df.groupby(["user_id", "session_id"], sort=False)
    out = g["ts"].agg(["size", "min", "max"]).reset_index()
    return pa.table({
        "user_id": pa.array(out["user_id"].to_numpy(), pa.int64()),
        "session_id": pa.array(out["session_id"].to_numpy(), pa.int64()),
        "n_events": pa.array(out["size"].to_numpy(), pa.int64()),
        "first_ts": pa.array(out["min"].to_numpy().astype(
            "datetime64[us]"), pa.timestamp("us")),
        "last_ts": pa.array(out["max"].to_numpy().astype(
            "datetime64[us]"), pa.timestamp("us")),
    })


def window_dedup_partial(batch: pa.Table,
                         window_s: float = 300.0) -> pa.Table:
    """First event per (user, window bucket): per-batch partial min of
    (ts, event_id) — K3's window dedup on a generic key."""
    if batch.num_rows == 0:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "bucket": pa.array([], pa.int64()),
                         "pick": pa.array([], pa.string())})
    tsa = batch.column("ts").cast(pa.int64())
    ts = tsa.to_numpy()
    user = batch.column("user_id").to_numpy()
    bucket = ts // int(window_s * US)
    # Arrow lpad/join — identical to zfill for non-negative ints,
    # without np.char's per-element Python cost
    import pyarrow.compute as pc
    pick = pc.binary_join_element_wise(
        pc.utf8_lpad(pc.cast(tsa, pa.string()), 20, "0"),
        pc.utf8_lpad(pc.cast(batch.column("event_id"), pa.string()),
                     12, "0"),
        "|").to_numpy(zero_copy_only=False)
    df = pd.DataFrame({"user_id": user, "bucket": bucket, "pick": pick})
    idx = df.groupby(["user_id", "bucket"], sort=False)["pick"].idxmin()
    out = df.loc[idx]
    return pa.table({
        "user_id": pa.array(out["user_id"].to_numpy(), pa.int64()),
        "bucket": pa.array(out["bucket"].to_numpy(), pa.int64()),
        "pick": pa.array(out["pick"].to_numpy(), pa.string()),
    })


def count_topk_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial counts per (event_type, user_id)."""
    gb = batch.select(["event_type", "user_id"]).group_by(
        ["event_type", "user_id"]).aggregate([([], "count_all")])
    return gb.rename_columns(["event_type", "user_id", "partial_count"])


# the integer property every synthetic event carries in its JSON-ish
# props payload; RE2 syntax so Arrow's extract_regex and DuckDB's
# regexp_extract (both RE2) agree byte-for-byte
PROPS_K_PATTERN = '"k":\\s*(?P<k>-?\\d+)'


def props_extract_partial(batch: pa.Table) -> pa.Table:
    """Semi-structured payload extraction + per-type partial: pull the
    integer ``k`` out of the JSON-ish ``props`` string with ONE
    vectorized RE2 extract (no JSON library in the hot path — the
    log-pipeline "parse a payload field, then aggregate" shape), then
    reduce the batch to (event_type, sum_k, max_k, n_events) exact
    int64 partials for the distributed groupby final."""
    import pyarrow.compute as pc
    ext = pc.extract_regex(batch.column("props"), PROPS_K_PATTERN)
    if ext.null_count:
        raise ValueError(
            f"{ext.null_count} props rows without an integer 'k' "
            "property — the oracle's CAST would fail on them too")
    k = pc.struct_field(ext, "k").cast(pa.int64())
    df = pd.DataFrame({
        "event_type": batch.column("event_type").to_numpy(
            zero_copy_only=False),
        "k": k.to_numpy(),
    })
    g = df.groupby("event_type", sort=False)["k"] \
        .agg(sum_k="sum", max_k="max", n_events="size").reset_index()
    return pa.table({
        "event_type": pa.array(g["event_type"].to_numpy(), pa.string()),
        "sum_k": pa.array(g["sum_k"].to_numpy(np.int64), pa.int64()),
        "max_k": pa.array(g["max_k"].to_numpy(np.int64), pa.int64()),
        "n_events": pa.array(g["n_events"].to_numpy(np.int64),
                             pa.int64()),
    })


def distinct_pairs_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial for exact distributed COUNT(DISTINCT user_id)
    per event_type: dedupe (event_type, user_id) within the batch,
    keeping the pair's row count — the distributed
    groupby(pair).sum final yields each distinct pair exactly once, so
    a second (tiny) groupby(event_type) counts distincts exactly.  The
    per-batch dedupe is the pre-aggregation that keeps the pair
    exchange proportional to distinct pairs, not raw rows.  Same
    kernel as count_topk_partial, different output name."""
    return count_topk_partial(batch).rename_columns(
        ["event_type", "user_id", "pair_count"])


# ---- deterministic hash sampling ------------------------------------------
#
# Sampling at 100 TB must be a pure per-batch filter (zero shuffle,
# zero state): keep a row iff an affine hash of its id mod 2^61-1
# lands in the accept window.  Deterministic, reproducible across
# parallelism levels, and exactly expressible in SQL.

SAMPLE_A = 912_382_843_902_107_441   # < 2^61-1, odd
SAMPLE_B = 558_545_864_083_284_007
SAMPLE_MOD = 8                       # keep ≈ 1/8 of rows


def sample_hash_batch(batch: pa.Table,
                      mod: int = SAMPLE_MOD) -> pa.Table:
    """Keep rows where ((event_id·A + B) mod 2^61-1) mod ``mod`` == 0 —
    a deterministic ~1/mod sample, vectorized uint64 end-to-end."""
    from asserts_otel_processor_ray.stages.text_analysis import (
        _MOD, _addmod61, _mulmod61)
    eid = batch.column("event_id").to_numpy()
    em = (eid % np.int64(_MOD)).astype(np.uint64)
    h = _addmod61(_mulmod61(em, SAMPLE_A), SAMPLE_B)
    keep = (h % np.uint64(mod)) == 0
    return batch.filter(pa.array(keep))


# ---- as-of join ------------------------------------------------------------
#
# The custom time-series operator Ray Data lacks natively: for each
# left event, attach the latest right event with ts <= left.ts for the
# same key.  Partitioning assumption (documented per the build brief):
# ONE hash repartition co-locates each user's full history, then the
# join is a per-block vectorized pandas merge_asof — no global sort,
# no cross-block state.

ASOF_LEFT_TYPE = "purchase"
ASOF_RIGHT_TYPE = "view"


def asof_join_block(batch: pa.Table,
                    left_type: str = ASOF_LEFT_TYPE,
                    right_type: str = ASOF_RIGHT_TYPE) -> pa.Table:
    """Per-block body (blocks hash-partitioned by user_id): left rows =
    `left_type` events, right rows = `right_type` events deduped to one
    per (user, ts) by min event_id (so the as-of pick is deterministic
    under ts ties), backward-inclusive merge_asof per user."""
    empty = pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "value": pa.array([], pa.float64()),
        "view_event_id": pa.array([], pa.int64()),
        "view_ts": pa.array([], pa.timestamp("us")),
        "view_value": pa.array([], pa.float64()),
    })
    if batch.num_rows == 0:
        return empty
    df = batch.select(["event_id", "ts", "user_id", "event_type",
                       "value"]).to_pandas()
    left = df[df["event_type"] == left_type]
    right = df[df["event_type"] == right_type]
    if left.empty:
        return empty
    if right.empty:
        out = left.copy()
        out["view_event_id"] = pd.array([pd.NA] * len(out),
                                        dtype="Int64")
        out["view_ts"] = pd.NaT
        out["view_value"] = np.nan
    else:
        right = (right.sort_values(["user_id", "ts", "event_id"],
                                   kind="mergesort")
                 .drop_duplicates(["user_id", "ts"], keep="first")
                 .rename(columns={"event_id": "view_event_id",
                                  "ts": "view_ts",
                                  "value": "view_value"})
                 [["user_id", "view_ts", "view_event_id", "view_value"]])
        left = left.sort_values(["ts", "event_id"], kind="mergesort")
        right = right.sort_values("view_ts", kind="mergesort")
        out = pd.merge_asof(left, right, left_on="ts",
                            right_on="view_ts", by="user_id",
                            direction="backward",
                            allow_exact_matches=True)
        out["view_event_id"] = out["view_event_id"].astype("Int64")
    return pa.table({
        "event_id": pa.array(out["event_id"].to_numpy(), pa.int64()),
        "user_id": pa.array(out["user_id"].to_numpy(), pa.int64()),
        "ts": pa.Array.from_pandas(out["ts"], type=pa.timestamp("us")),
        "value": pa.array(out["value"].to_numpy(), pa.float64()),
        "view_event_id": pa.Array.from_pandas(out["view_event_id"],
                                              type=pa.int64()),
        "view_ts": pa.Array.from_pandas(out["view_ts"],
                                        type=pa.timestamp("us")),
        "view_value": pa.Array.from_pandas(out["view_value"],
                                           type=pa.float64()),
    })


# ---- exact distributed quantiles ------------------------------------------
#
# Exact per-group quantiles without a global sort: per-batch
# (group, value) count partials → ONE distributed groupby-sum (the
# value-count histogram — |distinct values| rows, not |rows|) → a tiny
# per-group final that walks the sorted histogram.  Discrete quantiles
# (an actual data element at rank ceil(p·n/100), integer arithmetic)
# so the SQL oracle is bit-exact with no interpolation-float risk.

QUANTILE_PCTS = (25, 50, 75, 90, 99)


def value_count_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial: row count per (event_type, value)."""
    gb = batch.select(["event_type", "value"]).group_by(
        ["event_type", "value"]).aggregate([([], "count_all")])
    return gb.rename_columns(["event_type", "value", "partial_n"])


def quantiles_from_counts(df: pd.DataFrame) -> pd.DataFrame:
    """map_groups body: one event_type's (value, n) histogram rows →
    a single row of discrete quantiles.  rank_p = ceil(p·n/100) via
    integer arithmetic; the quantile is the first value whose
    cumulative count reaches the rank."""
    d = df.sort_values("value")
    vals = d["value"].to_numpy()
    cum = np.cumsum(d["n"].to_numpy().astype(np.int64))
    n = int(cum[-1])
    out = {"event_type": [df["event_type"].iloc[0]],
           "n_events": [np.int64(n)]}
    for p in QUANTILE_PCTS:
        rank = (p * n + 99) // 100
        idx = int(np.searchsorted(cum, rank, side="left"))
        out[f"p{p}"] = [float(vals[idx])]
    return pd.DataFrame(out)


def rolling_count_block(batch: pa.Table,
                        window_s: float = 1800.0) -> pa.Table:
    """Event-time RANGE-window rolling count: for every event, the
    number of events by the SAME user with ts in
    [ts - window_s, ts] (inclusive both ends — the SQL
    ``RANGE BETWEEN <w> PRECEDING AND CURRENT ROW`` frame, which
    includes ts-peers).  Requires blocks hash-partitioned by user_id;
    fully vectorized via two searchsorted sweeps over the per-user
    sorted timestamp runs (an integer count — order-independent and
    bitwise-stable under any block layout)."""
    if batch.num_rows == 0:
        return pa.table({
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "n_window": pa.array([], pa.int64()),
        })
    import pyarrow.compute as pc
    idx = pc.sort_indices(batch, sort_keys=[("user_id", "ascending"),
                                            ("ts", "ascending")])
    batch = batch.take(idx)
    user = batch.column("user_id").to_numpy()
    ts = batch.column("ts").cast(pa.int64()).to_numpy()
    win_us = int(window_s * US)
    # per-user runs: offset ts by run index * a stride > span so ONE
    # searchsorted respects user boundaries.  run * stride can exceed
    # int64 when a block holds many users over a wide ts span, so the
    # runs are processed in chunks of <= 2^62/stride runs (run index
    # resets per chunk) — each chunk is one vectorized sweep and the
    # row slices are contiguous after the sort.
    new_user = np.r_[True, user[1:] != user[:-1]]
    run = np.cumsum(new_user) - 1
    n_runs = int(run[-1]) + 1
    stride = (int(ts.max()) - int(ts.min()) + win_us + 1) if len(ts) else 1
    rel = ts - int(ts.min())
    runs_per_chunk = max(1, (1 << 62) // stride)
    counts = np.empty(len(ts), np.int64)
    run_starts = np.flatnonzero(new_user)
    for r0 in range(0, n_runs, runs_per_chunk):
        a = run_starts[r0]
        r1 = min(r0 + runs_per_chunk, n_runs)
        b = run_starts[r1] if r1 < n_runs else len(ts)
        key = (run[a:b] - r0) * stride + rel[a:b]
        hi = np.searchsorted(key, key, side="right")
        lo = np.searchsorted(key, key - win_us, side="left")
        counts[a:b] = hi - lo
    return pa.table({
        "event_id": batch.column("event_id"),
        "user_id": batch.column("user_id"),
        "ts": batch.column("ts"),
        "n_window": pa.array(counts, pa.int64()),
    })


FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_block(batch: pa.Table,
                 stages: tuple[str, ...] = FUNNEL_STAGES) -> pa.Table:
    """Ordered-funnel stage per user: stage k is reached when an
    event of type stages[k-1] exists at-or-after the time stage k-1
    was reached (t1 = min ts of stages[0]; t_k = min ts of stages[k-1]
    with ts >= t_{k-1}).  Requires blocks hash-partitioned by user_id;
    vectorized via per-stage np.minimum.at sweeps — no per-user loop."""
    if batch.num_rows == 0:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "stage": pa.array([], pa.int64())})
    user = batch.column("user_id").to_numpy()
    ts = batch.column("ts").cast(pa.int64()).to_numpy()
    etype = batch.column("event_type").to_numpy(zero_copy_only=False)
    users, uidx = np.unique(user, return_inverse=True)
    inf = np.iinfo(np.int64).max
    stage = np.zeros(len(users), np.int64)
    prev_t = np.full(len(users), -inf, np.int64)   # stage 0: no bound
    for k, s in enumerate(stages, start=1):
        m = (etype == s) & (ts >= prev_t[uidx])
        t = np.full(len(users), inf, np.int64)
        np.minimum.at(t, uidx[m], ts[m])
        reached = t < inf
        stage[reached & (stage == k - 1)] = k
        # users that stalled keep prev_t = inf so later stages can't fire
        prev_t = np.where(reached & (stage >= k), t, inf)
    return pa.table({"user_id": pa.array(users, pa.int64()),
                     "stage": pa.array(stage, pa.int64())})


# ---- key-skew profile, out-of-order (watermark) audit ---------------------

def skew_pair_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial for the key-skew profile: row count per
    (event_type, user_id)."""
    gb = batch.select(["event_type", "user_id"]).group_by(
        ["event_type", "user_id"]).aggregate([([], "count_all")])
    return gb.rename_columns(["event_type", "user_id", "partial_n"])


def skew_block_stats(batch: pa.Table) -> pa.Table:
    """Per-block skew partial: merge this block's (event_type, user_id)
    count partials (complete per pair — blocks are hash-partitioned by
    user_id, so a pair never straddles blocks), then reduce to one
    bounded row per event_type: distinct keys, events, max per-key
    count and the exact sum of squared counts (the inverse-Simpson
    numerator).  All int64; the driver adds blocks (users are disjoint
    across blocks) and does the two float divisions at the very end."""
    if batch.num_rows == 0:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "n_keys": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "max_count": pa.array([], pa.int64()),
            "sum_sq": pa.array([], pa.int64())})
    merged = batch.group_by(["event_type", "user_id"]).aggregate(
        [("partial_n", "sum")])
    df = merged.to_pandas()
    df.columns = ["event_type", "user_id", "c"]
    c = df["c"].to_numpy(np.int64)
    out = df.assign(sq=c * c).groupby("event_type", sort=False).agg(
        n_keys=("user_id", "size"), n_events=("c", "sum"),
        max_count=("c", "max"), sum_sq=("sq", "sum")).reset_index()
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_keys": pa.array(out["n_keys"].to_numpy(np.int64), pa.int64()),
        "n_events": pa.array(out["n_events"].to_numpy(np.int64),
                             pa.int64()),
        "max_count": pa.array(out["max_count"].to_numpy(np.int64),
                              pa.int64()),
        "sum_sq": pa.array(out["sum_sq"].to_numpy(np.int64), pa.int64())})


OOO_BUCKET_IDS = 4096          # default event_id-range bucket width


def ooo_bucket_partial(batch: pa.Table, width: int) -> pa.Table:
    """Phase-1 partial for the out-of-order audit: max event ts per
    (event_type, event_id-range bucket).  O(types × buckets) rows —
    the bounded driver prefix table."""
    eid = batch.column("event_id").cast(pa.int64()).to_numpy()
    t = pa.table({
        "event_type": batch.column("event_type"),
        "bucket": pa.array(eid // np.int64(width), pa.int64()),
        "ts": batch.column("ts").cast(pa.int64()),
    })
    gb = t.group_by(["event_type", "bucket"]).aggregate([("ts", "max")])
    return gb.rename_columns(["event_type", "bucket", "max_ts"])


_TS_NEG_INF = np.iinfo(np.int64).min // 4


def ooo_block_audit(batch: pa.Table, width: int,
                    prefix: dict[tuple[str, int], int]) -> pa.Table:
    """Phase-2 block kernel: blocks are hash-partitioned by bucket, so
    every (event_type, bucket) run is block-complete.  Sort the run by
    event_id (the arrival sequence), seed the running max with the
    broadcast prefix max over all EARLIER buckets of that type, and
    count events whose ts lags the watermark (ts < running max of all
    prior arrivals).  The per-run shifted cummax stays in exact int64
    (a short Python loop over the block's bounded set of
    (type, bucket) runs — never over rows).  Emits bounded per-type
    partials: n, n_late, max lateness in µs."""
    if batch.num_rows == 0:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n_events": pa.array([], pa.int64()),
                         "n_late": pa.array([], pa.int64()),
                         "max_late_us": pa.array([], pa.int64())})
    import pyarrow.compute as pc
    if "bucket" not in batch.column_names:
        eid = batch.column("event_id").cast(pa.int64()).to_numpy()
        batch = batch.append_column(
            "bucket", pa.array(eid // np.int64(width), pa.int64()))
    idx = pc.sort_indices(batch, sort_keys=[
        ("event_type", "ascending"), ("bucket", "ascending"),
        ("event_id", "ascending")])
    batch = batch.take(idx)
    etype = batch.column("event_type").to_numpy(zero_copy_only=False)
    bucket = batch.column("bucket").to_numpy()
    ts = batch.column("ts").cast(pa.int64()).to_numpy()

    new_run = np.r_[True, (etype[1:] != etype[:-1])
                    | (bucket[1:] != bucket[:-1])]
    starts = np.flatnonzero(new_run)
    ends = np.r_[starts[1:], len(ts)]
    prevmax = np.empty(len(ts), np.int64)
    for s, e in zip(starts, ends):
        seed = prefix.get((etype[s], int(bucket[s])), _TS_NEG_INF)
        prevmax[s:e] = np.maximum.accumulate(
            np.r_[np.int64(seed), ts[s:e - 1]])
    late = ts < prevmax
    lateness = np.where(late, prevmax - ts, np.int64(0))
    df = pd.DataFrame({"event_type": etype, "late": late,
                       "lateness": lateness})
    out = df.groupby("event_type", sort=False).agg(
        n_events=("late", "size"), n_late=("late", "sum"),
        max_late=("lateness", "max")).reset_index()
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_events": pa.array(out["n_events"].to_numpy(np.int64),
                             pa.int64()),
        "n_late": pa.array(out["n_late"].to_numpy(np.int64), pa.int64()),
        "max_late_us": pa.array(out["max_late"].to_numpy(np.int64),
                                pa.int64())})
