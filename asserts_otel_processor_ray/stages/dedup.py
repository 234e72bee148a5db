"""Near-duplicate detection operators: MinHash+LSH, SimHash and n-gram
Jaccard over the ``documents`` table.

Scale design (SURVEY.md-style shuffle discipline):

* signatures are computed vectorized per batch (``map_batches``);
* candidate generation is a groupby on (band_id, band_hash) — the only
  shuffle, and it moves signatures, not documents;
* verification joins shingle sets for candidate pairs only.

At test scale the bucket → pair → verify steps run on collected
signature tables (bounded: #docs × k ints); the same functions are the
per-group bodies for a ``groupby(band).map_groups`` at cluster scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from asserts_otel_processor_ray.stages.text_analysis import (
    _tokens_series,
    shingle_hashes,
    token_hashes,
)

_MERSENNE = (1 << 61) - 1


def _hash_params(k: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=k, dtype=np.int64).astype(object)
    b = rng.integers(0, _MERSENNE, size=k, dtype=np.int64).astype(object)
    return a, b


def minhash_signatures_batch(batch: pa.Table, k: int = 32,
                             w: int = 3) -> pa.Table:
    """doc_id + k minhash values over w-token shingles (vectorized:
    np.minimum.at segment-min per hash function)."""
    doc_id = batch.column("doc_id").to_numpy()
    toks = _tokens_series(batch.column("text"))
    hashes, docs = shingle_hashes(toks, w)
    n = len(doc_id)
    a, b = _hash_params(k)
    sig = np.full((k, n), np.iinfo(np.int64).max, dtype=np.int64)
    h_obj = hashes.astype(object)
    for i in range(k):
        hv = ((a[i] * h_obj + b[i]) % _MERSENNE).astype(np.int64)
        np.minimum.at(sig[i], docs, hv)
    cols = {"doc_id": pa.array(doc_id, pa.int64())}
    for i in range(k):
        cols[f"mh{i:02d}"] = pa.array(sig[i], pa.int64())
    return pa.table(cols)


def lsh_band_keys(sig_df: pd.DataFrame, bands: int = 8,
                  rows: int = 4) -> pd.DataFrame:
    """(doc_id, band_id, band_hash) long table from a signature frame."""
    out = []
    for b in range(bands):
        cols = [f"mh{b * rows + r:02d}" for r in range(rows)]
        h = np.zeros(len(sig_df), dtype=np.uint64)
        for c in cols:
            h = h * np.uint64(1_000_003) + sig_df[c].to_numpy(
            ).astype(np.uint64)
        out.append(pd.DataFrame({"doc_id": sig_df["doc_id"],
                                 "band_id": b, "band_hash": h}))
    return pd.concat(out, ignore_index=True)


def candidate_pairs(banded: pd.DataFrame) -> pd.DataFrame:
    """Distinct doc pairs sharing any (band_id, band_hash) bucket.
    This is the per-bucket body of the groupby at scale."""
    m = banded.merge(banded, on=["band_id", "band_hash"])
    m = m[m["doc_id_x"] < m["doc_id_y"]]
    return (m[["doc_id_x", "doc_id_y"]]
            .drop_duplicates()
            .rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"})
            .reset_index(drop=True))


def jaccard_verify(pairs: pd.DataFrame,
                   shingles_by_doc: dict[int, frozenset],
                   threshold: float) -> pd.DataFrame:
    """Exact Jaccard on shingle sets for candidate pairs."""
    if pairs.empty:
        return pairs.assign(jaccard=pd.Series(dtype=float))
    jac = []
    for a_id, b_id in zip(pairs["doc_a"], pairs["doc_b"]):
        sa = shingles_by_doc.get(int(a_id), frozenset())
        sb = shingles_by_doc.get(int(b_id), frozenset())
        union = len(sa | sb)
        jac.append(len(sa & sb) / union if union else 0.0)
    out = pairs.assign(jaccard=jac)
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


def shingle_sets(batch: pa.Table, w: int = 3) -> dict[int, frozenset]:
    doc_id = batch.column("doc_id").to_numpy()
    toks = _tokens_series(batch.column("text"))
    hashes, docs = shingle_hashes(toks, w)
    df = pd.DataFrame({"d": docs, "h": hashes})
    grouped = df.groupby("d")["h"].agg(lambda s: frozenset(s.tolist()))
    return {int(doc_id[d]): s for d, s in grouped.items()}


# ---- SimHash -------------------------------------------------------------

def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over token hashes (bit-matrix majority vote,
    vectorized via unpackbits + reduceat)."""
    doc_id = batch.column("doc_id").to_numpy()
    toks = _tokens_series(batch.column("text"))
    ex = toks.explode()
    h = token_hashes(ex)
    lens = toks.str.len().to_numpy().astype(np.int64)
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8),
                         axis=1, bitorder="little")  # (n_tokens, 64)
    offsets = np.r_[0, np.cumsum(lens)[:-1]]
    sums = np.add.reduceat(bits, offsets, axis=0)  # (n_docs, 64)
    maj = (sums * 2 > lens[:, None]).astype(np.uint8)
    packed = np.packbits(maj, axis=1, bitorder="little").view(np.uint64)
    return pa.table({
        "doc_id": pa.array(doc_id, pa.int64()),
        "simhash": pa.array([format(int(x), "016x")
                             for x in packed.ravel()], pa.string()),
    })


def simhash_near_pairs(sim_df: pd.DataFrame,
                       max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by SimHash: band on 4×16-bit chunks (any equal
    chunk → candidate, guaranteed to catch hamming ≤ 3), verify exact
    hamming distance."""
    vals = np.array([int(x, 16) for x in sim_df["simhash"]],
                    dtype=np.uint64)
    doc = sim_df["doc_id"].to_numpy()
    frames = []
    for c in range(4):
        chunk = (vals >> np.uint64(16 * c)) & np.uint64(0xFFFF)
        frames.append(pd.DataFrame({"doc_id": doc, "band_id": c,
                                    "band_hash": chunk}))
    cand = candidate_pairs(pd.concat(frames, ignore_index=True))
    if cand.empty:
        return cand.assign(hamming=pd.Series(dtype=int))
    by_doc = dict(zip(doc, vals))
    ham = [bin(int(by_doc[a]) ^ int(by_doc[b])).count("1")
           for a, b in zip(cand["doc_a"], cand["doc_b"])]
    out = cand.assign(hamming=ham)
    return out[out["hamming"] <= max_hamming].reset_index(drop=True)
