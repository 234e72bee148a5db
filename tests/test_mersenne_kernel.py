"""The native-uint64 mod-(2^61-1) kernel must be bit-identical to
exact Python bigint arithmetic (the previous np.object_ implementation
and the generated DuckDB HUGEINT oracles both compute in exact
arithmetic)."""

import numpy as np
import pandas as pd

from asserts_otel_processor_ray.stages.dedup import (
    _hash_params,
    minhash_signatures_batch,
)
from asserts_otel_processor_ray.stages.text_analysis import (
    _BASE,
    _MOD,
    _addmod61,
    _mulmod61,
    shingle_hashes,
    token_hashes,
)

P = (1 << 61) - 1


def test_mulmod_addmod_match_bigint():
    rng = np.random.default_rng(99)
    x = rng.integers(0, P, size=20_000, dtype=np.int64).astype(np.uint64)
    y = rng.integers(0, P, size=20_000, dtype=np.int64).astype(np.uint64)
    got = _mulmod61(x, y)
    want = np.array([(int(a) * int(b)) % P for a, b in zip(x, y)],
                    dtype=np.uint64)
    assert np.array_equal(got, want)
    got = _addmod61(x, y)
    want = np.array([(int(a) + int(b)) % P for a, b in zip(x, y)],
                    dtype=np.uint64)
    assert np.array_equal(got, want)


def test_mulmod_edge_values():
    edge = np.array([0, 1, 2, P - 1, P - 2, (1 << 32) - 1, 1 << 32,
                     (1 << 60) + 12345], dtype=np.uint64)
    xs, ys = np.meshgrid(edge, edge)
    xs, ys = xs.ravel(), ys.ravel()
    got = _mulmod61(xs, ys)
    want = np.array([(int(a) * int(b)) % P for a, b in zip(xs, ys)],
                    dtype=np.uint64)
    assert np.array_equal(got, want)


def _shingle_hashes_reference(toks: pd.Series, w: int = 3):
    """The previous object-dtype implementation, kept as the parity
    reference."""
    ex = toks.explode()
    doc_of = ex.index.to_numpy()
    h = token_hashes(ex)
    n = len(h)
    if n == 0:
        return np.array([], np.uint64), np.array([], np.int64)
    acc = np.zeros(max(0, n - w + 1), dtype=np.object_)
    for j in range(w):
        acc = (acc * _BASE + h[j:n - w + 1 + j].astype(object)) % _MOD
    win_doc = doc_of[:n - w + 1]
    ok = win_doc == doc_of[w - 1:]
    hashes = acc[ok].astype(np.uint64)
    docs = win_doc[ok]
    lens = toks.str.len().to_numpy()
    short = np.flatnonzero(lens < w)
    if len(short):
        extra_h, extra_d = [], []
        offsets = np.r_[0, np.cumsum(lens)]
        for d in short:
            seg = h[offsets[d]:offsets[d + 1]].astype(object)
            v = 0
            for x in seg:
                v = (v * _BASE + int(x)) % _MOD
            extra_h.append(v)
            extra_d.append(d)
        hashes = np.r_[hashes, np.asarray(extra_h, np.uint64)]
        docs = np.r_[docs, np.asarray(extra_d, np.int64)]
    return hashes, docs.astype(np.int64)


def _toy_docs(n=200, seed=5):
    rng = np.random.default_rng(seed)
    vocab = [f"tok{i}" for i in range(50)]
    texts = []
    for i in range(n):
        ln = int(rng.integers(0, 12))   # includes 0/1/2-token docs
        texts.append(" ".join(rng.choice(vocab, ln)))
    # mirror _tokens_series: splitting "" yields [""], never []
    return pd.Series([t.split() if t else [""] for t in texts])


def test_shingle_hashes_parity():
    toks = _toy_docs()
    h_new, d_new = shingle_hashes(toks)
    h_ref, d_ref = _shingle_hashes_reference(toks)
    # same multiset per doc (the vectorized short-doc path appends in
    # length-class order, not doc order)
    a = sorted(zip(d_new.tolist(), h_new.tolist()))
    b = sorted(zip(d_ref.tolist(), h_ref.tolist()))
    assert a == b


def test_minhash_signatures_match_bigint():
    import pyarrow as pa
    toks = _toy_docs(50, seed=6)
    texts = [" ".join(t) for t in toks]
    t = pa.table({"doc_id": pa.array(range(50), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    sig = minhash_signatures_batch(t, k=8).to_pandas()
    # bigint reference
    h, d = shingle_hashes(pd.Series(list(toks)))
    a, b = _hash_params(8)
    for i in range(8):
        want = np.full(50, np.iinfo(np.int64).max, dtype=object)
        for hv, dv in zip(h.tolist(), d.tolist()):
            v = (int(a[i]) * hv + int(b[i])) % P
            if v < want[dv]:
                want[dv] = v
        got = sig[f"mh{i:02d}"].to_numpy()
        assert np.array_equal(got.astype(object), want)
