"""Property-based tests (hypothesis) for the pure numeric kernels:
random inputs vs slow-but-obvious Python references.  No Ray needed —
these are the per-block/per-batch kernels the distributed operators
are built from."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

MOD = (1 << 61) - 1

u61 = st.integers(min_value=0, max_value=MOD - 1)


@settings(max_examples=50, deadline=None)
@given(st.lists(u61, min_size=1, max_size=40), u61)
def test_mulmod61_matches_bigint(xs, y):
    from asserts_otel_processor_ray.stages.text_analysis import (
        _addmod61, _mulmod61)
    x = np.array(xs, dtype=np.uint64)
    got_m = _mulmod61(x, np.uint64(y))
    got_a = _addmod61(x, np.uint64(y))
    for xi, gm, ga in zip(xs, got_m.tolist(), got_a.tolist()):
        assert gm == (xi * y) % MOD
        assert ga == (xi + y) % MOD


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(u61, min_size=0, max_size=12),
                min_size=1, max_size=8),
       st.integers(min_value=1, max_value=5))
def test_rolling_poly_matches_reference(docs, w):
    from asserts_otel_processor_ray.stages.text_analysis import (
        _BASE, _rolling_poly)
    h = np.array([v for d in docs for v in d], dtype=np.uint64)
    doc_of = np.array([i for i, d in enumerate(docs) for _ in d],
                      dtype=np.int64)
    lens = np.array([len(d) for d in docs], dtype=np.int64)
    hashes, idx = _rolling_poly(h, doc_of, lens, w)
    got = {}
    for hv, di in zip(hashes.tolist(), idx.tolist()):
        got.setdefault(di, []).append(hv)

    def poly(vals):
        acc = 0
        for v in vals:
            acc = (acc * _BASE + v) % MOD
        return acc

    for i, d in enumerate(docs):
        if not d:
            assert i not in got
        elif len(d) < w:
            assert sorted(got[i]) == [poly(d)]
        else:
            expect = sorted(poly(d[j:j + w])
                            for j in range(len(d) - w + 1))
            assert sorted(got[i]) == expect


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 4),          # user
                          st.integers(0, 5000)),      # ts seconds
                min_size=1, max_size=120),
       st.integers(min_value=1, max_value=600))
def test_rolling_count_matches_bruteforce(rows, win_s):
    from asserts_otel_processor_ray.stages.events import (
        rolling_count_block)
    user = np.array([r[0] for r in rows], np.int64)
    ts = np.array([r[1] for r in rows], np.int64) * 1_000_000
    batch = pa.table({
        "event_id": pa.array(np.arange(len(rows)), pa.int64()),
        "user_id": pa.array(user, pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
    })
    out = rolling_count_block(batch, window_s=float(win_s)) \
        .to_pandas()
    w = win_s * 1_000_000
    for _, r in out.iterrows():
        cur = r["ts"].value // 1000
        uts = ts[user == r["user_id"]]
        assert r["n_window"] == ((uts >= cur - w) & (uts <= cur)).sum()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3),                    # user
                          st.integers(0, 100),                  # ts
                          st.sampled_from(["view", "click",
                                           "purchase", "other"])),
                min_size=1, max_size=80))
def test_funnel_matches_reference(rows):
    from asserts_otel_processor_ray.stages.events import funnel_block
    user = np.array([r[0] for r in rows], np.int64)
    ts = np.array([r[1] for r in rows], np.int64) * 1_000_000
    et = [r[2] for r in rows]
    batch = pa.table({
        "user_id": pa.array(user, pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
        "event_type": pa.array(et, pa.string()),
    })
    out = funnel_block(batch).to_pandas().set_index("user_id")["stage"]

    for u in np.unique(user):
        evs = sorted((t, e) for uu, t, e in
                     zip(user, ts.tolist(), et) if uu == u)
        stage, bound = 0, -1
        for target in ("view", "click", "purchase"):
            cand = [t for t, e in evs if e == target and t >= bound]
            if not cand:
                break
            bound = min(cand)
            stage += 1
        assert out.loc[u] == stage, (u, evs)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["A", "N", "R"]),
                          st.sampled_from(["F", "O"]),
                          st.integers(1, 50),           # qty
                          st.integers(100, 9_999_99),   # price cents
                          st.integers(0, 10),           # disc cents
                          st.integers(0, 8)),           # tax cents
                min_size=1, max_size=200),
       st.integers(min_value=1, max_value=199))
def test_pricing_partial_split_invariance(rows, cut):
    """Integer-cents partials: any batch split merges to identical
    sums (the order-independence claim)."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        _pricing_partial)
    n = len(rows)
    batch = pa.table({
        "l_returnflag": pa.array([r[0] for r in rows]),
        "l_linestatus": pa.array([r[1] for r in rows]),
        "l_shipdate": pa.array(
            np.full(n, np.datetime64("1995-06-01", "us")),
            pa.timestamp("us")),
        "l_quantity": pa.array([float(r[2]) for r in rows]),
        "l_extendedprice": pa.array([r[3] / 100.0 for r in rows]),
        "l_discount": pa.array([r[4] / 100.0 for r in rows]),
        "l_tax": pa.array([r[5] / 100.0 for r in rows]),
    })
    cut = min(cut, n)
    whole = (_pricing_partial(batch).to_pandas()
             .groupby(["l_returnflag", "l_linestatus"]).sum()
             .sort_index())
    parts = pd.concat([_pricing_partial(batch.slice(0, cut)).to_pandas(),
                       _pricing_partial(batch.slice(cut)).to_pandas()])
    split = parts.groupby(["l_returnflag", "l_linestatus"]).sum() \
        .sort_index()
    pd.testing.assert_frame_equal(whole, split)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62),
                min_size=1, max_size=30))
def test_mix_hash61_matches_duckdb_chain(ids):
    """mix_hash61 (affine → xorshift 31 → mulmod → xorshift 29) must
    equal the SQL chain the KMV / Bloom oracles run, bit for bit, on
    arbitrary non-negative ids."""
    import duckdb

    from asserts_otel_processor_ray.pipelines.extra_queries import (
        KMV_A, KMV_A2, KMV_B)
    from asserts_otel_processor_ray.stages.text_analysis import (
        mix_hash61)
    u = np.array(ids, dtype=np.uint64) % np.uint64(MOD)
    got = mix_hash61(u, KMV_A, KMV_B, KMV_A2).tolist()
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS u",
                [[int(v) for v in u.tolist()]])
    want = [r[0] for r in con.execute(f"""
        WITH h1 AS (SELECT rowid, CAST((CAST(u AS HUGEINT) * {KMV_A}
                    + {KMV_B}) % {MOD} AS BIGINT) AS h FROM t),
        h2 AS (SELECT rowid, xor(h, h >> 31) AS h FROM h1),
        h3 AS (SELECT rowid, CAST((CAST(h AS HUGEINT) * {KMV_A2})
                   % {MOD} AS BIGINT) AS h FROM h2)
        SELECT xor(h, h >> 29) FROM h3 ORDER BY rowid""").fetchall()]
    assert got == want
