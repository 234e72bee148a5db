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


def shingle_list_column(batch: pa.Table, w: int = 3) -> pa.ListArray:
    """Per-doc DEDUPED shingle-hash lists as an Arrow list column
    aligned with the batch rows (the distributed-verify payload)."""
    n = batch.num_rows
    toks = _tokens_series(batch.column("text"))
    hashes, docs = shingle_hashes(toks, w)
    h64 = hashes.astype(np.int64)
    order = np.lexsort((h64, docs))
    d, h = docs[order], h64[order]
    keep = np.r_[True, (d[1:] != d[:-1]) | (h[1:] != h[:-1])] \
        if len(d) else np.array([], bool)
    d, h = d[keep], h[keep]
    counts = np.bincount(d, minlength=n)
    offsets = np.r_[0, np.cumsum(counts)].astype(np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                    pa.array(h, pa.int64()))


# ---- distributed MinHash-LSH pipeline ------------------------------------

def minhash_band_expand_fn(k: int = 32, bands: int = 8, rows: int = 4,
                           w: int = 3):
    """map_batches fn: documents → (doc_id, band_id, band_hash,
    shingles) long table.  Only signatures + shingle-hash lists leave
    the batch — never the documents — so the groupby that follows
    shuffles a payload ~bands × (8B × shingles) per doc."""
    def fn(batch: pa.Table) -> pa.Table:
        sig = minhash_signatures_batch(batch, k, w).to_pandas()
        sh = shingle_list_column(batch, w)
        banded = lsh_band_keys(sig, bands, rows)
        # repeat each doc's shingle list once per band (positional take)
        pos = np.tile(np.arange(len(sig), dtype=np.int64), bands)
        out = pa.table({
            "doc_id": pa.array(banded["doc_id"].to_numpy(), pa.int64()),
            "band_id": pa.array(banded["band_id"].to_numpy(), pa.int32()),
            "band_hash": pa.array(
                banded["band_hash"].to_numpy().astype(np.int64),
                pa.int64()),
            "shingles": sh.take(pa.array(pos)),
        })
        return out
    return fn


def verify_bucket_df(group: pd.DataFrame,
                     threshold: float) -> pd.DataFrame:
    """Per-bucket body: exact Jaccard over shingle lists for every pair
    sharing this (band_id, band_hash) bucket."""
    empty = pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                          "doc_b": pd.Series(dtype=np.int64),
                          "jaccard": pd.Series(dtype=float)})
    if len(group) < 2:
        return empty
    g = group.drop_duplicates("doc_id").sort_values("doc_id")
    ids = g["doc_id"].to_numpy()
    sets = [frozenset(np.asarray(s).tolist()) for s in g["shingles"]]
    rows_ = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            union = len(sets[i] | sets[j])
            jac = len(sets[i] & sets[j]) / union if union else 0.0
            if jac >= threshold:
                rows_.append((int(ids[i]), int(ids[j]), jac))
    if not rows_:
        return empty
    return pd.DataFrame(rows_, columns=["doc_a", "doc_b", "jaccard"])


def minhash_pairs_distributed(docs, k: int = 32, bands: int = 8,
                              rows: int = 4, w: int = 3,
                              threshold: float = 0.5,
                              max_bucket: int | None = None
                              ) -> pd.DataFrame:
    """MinHash+LSH near-dup pairs as a real shuffle: band-expand per
    batch, ONE groupby((band_id, band_hash)) moving signatures+shingle
    lists (not documents), exact Jaccard verify inside each bucket, and
    a driver dedup of the (bounded: true near-dups only) verified pairs.

    ``max_bucket`` skips degenerate hot buckets (standard LSH guard);
    None verifies everything.
    """
    banded = docs.map_batches(minhash_band_expand_fn(k, bands, rows, w),
                              batch_format="pyarrow")

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        if max_bucket is not None and len(group) > max_bucket:
            return verify_bucket_df(group.iloc[:0], threshold)
        return verify_bucket_df(group, threshold)

    out = banded.groupby(["band_id", "band_hash"]).map_groups(
        verify, batch_format="pandas")
    from asserts_otel_processor_ray.stages.topk import collect_df
    df = collect_df(out)
    if df.empty:
        return pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                             "doc_b": pd.Series(dtype=np.int64),
                             "jaccard": pd.Series(dtype=float)})
    return (df.drop_duplicates(["doc_a", "doc_b"])
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))


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


def simhash_band_expand(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, band_id, band_hash, simhash) long rows: the
    4×16-bit chunk banding (any equal chunk catches hamming ≤ 3)."""
    sim = simhash_batch(batch)
    doc = sim.column("doc_id").to_numpy()
    vals = np.array([int(x, 16) for x in sim.column("simhash").to_pylist()],
                    dtype=np.uint64)
    frames = []
    for c in range(4):
        chunk = (vals >> np.uint64(16 * c)) & np.uint64(0xFFFF)
        frames.append(pd.DataFrame({
            "doc_id": doc, "band_id": np.int32(c),
            "band_hash": chunk.astype(np.int64),
            "simhash": vals.astype(np.int64)}))
    return pa.Table.from_pandas(pd.concat(frames, ignore_index=True),
                                preserve_index=False)


def simhash_verify_bucket(group: pd.DataFrame,
                          max_hamming: int) -> pd.DataFrame:
    empty = pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                          "doc_b": pd.Series(dtype=np.int64),
                          "hamming": pd.Series(dtype=np.int64)})
    if len(group) < 2:
        return empty
    g = group.drop_duplicates("doc_id").sort_values("doc_id")
    ids = g["doc_id"].to_numpy()
    vals = g["simhash"].to_numpy().astype(np.uint64)
    ii, jj = np.triu_indices(len(ids), k=1)
    x = vals[ii] ^ vals[jj]
    ham = np.array([bin(int(v)).count("1") for v in x])
    hit = ham <= max_hamming
    if not hit.any():
        return empty
    return pd.DataFrame({"doc_a": ids[ii[hit]].astype(np.int64),
                         "doc_b": ids[jj[hit]].astype(np.int64),
                         "hamming": ham[hit].astype(np.int64)})


def simhash_pairs_distributed(docs, max_hamming: int = 3) -> pd.DataFrame:
    """SimHash near-dup pairs as a real shuffle: chunk-band expand per
    batch, groupby((band_id, band_hash)) moving 16-byte rows only,
    exact hamming verify per bucket, driver dedup of verified pairs."""
    banded = docs.map_batches(simhash_band_expand, batch_format="pyarrow")
    out = banded.groupby(["band_id", "band_hash"]).map_groups(
        lambda g: simhash_verify_bucket(g, max_hamming),
        batch_format="pandas")
    from asserts_otel_processor_ray.stages.topk import collect_df
    df = collect_df(out)
    if df.empty:
        return pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                             "doc_b": pd.Series(dtype=np.int64),
                             "hamming": pd.Series(dtype=np.int64)})
    return (df.drop_duplicates(["doc_a", "doc_b"])
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))


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
