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
    _hex16,
    _tokens_series,
    char_ngram_hashes,
    shingle_hashes,
    token_hashes,
)

_MERSENNE = (1 << 61) - 1


def _hash_params(k: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    """Seeded permutation constants (uint64 < 2^61-1); the SAME values
    the generated DuckDB oracles embed as HUGEINT literals
    (pipelines/extra_queries.py), so the dtype change from np.object_
    is invisible to the byte-level comparison."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    return a, b


_U64 = np.uint64
_P61 = _U64(_MERSENNE)
_M32 = _U64(0xFFFFFFFF)


def _perm_min_chunked(hashes: np.ndarray, docs: np.ndarray,
                      a: np.ndarray, b: np.ndarray, k: int,
                      n_docs: int, chunk: int = 32768) -> np.ndarray:
    """Per-doc segment-min of ((a[i]*h + b[i]) mod 2^61-1) for all k
    permutations — the MinHash inner loop.

    Unrolled schoolbook 32-bit-limb multiply in preallocated uint64
    scratch buffers (no allocation per permutation), processed in
    L2-resident chunks so the 32-permutation sweep reads each shingle
    hash from DRAM once.  Bit-identical to exact bigint arithmetic
    (tests/test_mersenne_kernel.py); measured ~14x vs the np.object_
    kernel it replaces."""
    n = len(hashes)
    sig = np.full((k, n_docs), np.iinfo(np.int64).max, dtype=np.int64)
    if n == 0:
        return sig
    al, ah = a & _M32, a >> _U64(32)
    c = min(chunk, n)
    ll = np.empty(c, _U64)
    mid = np.empty(c, _U64)
    t1 = np.empty(c, _U64)
    t2 = np.empty(c, _U64)
    hi = np.empty(c, _U64)
    lo = np.empty(c, _U64)
    for s in range(0, n, c):
        e = min(s + c, n)
        m = e - s
        hl_c = hashes[s:e] & _M32
        hh_c = hashes[s:e] >> _U64(32)
        d_c = docs[s:e]
        llv, midv = ll[:m], mid[:m]
        t1v, t2v = t1[:m], t2[:m]
        hiv, lov = hi[:m], lo[:m]
        for i in range(k):
            # 128-bit product a[i]*h from 32-bit limbs: hi·2^64 + lo
            np.multiply(hl_c, al[i], out=llv)
            np.multiply(hl_c, ah[i], out=midv)
            np.multiply(hh_c, al[i], out=t1v)
            midv += t1v                       # xl*yh + xh*yl < 2^62
            np.multiply(hh_c, ah[i], out=hiv)  # xh*yh < 2^58
            np.right_shift(llv, _U64(32), out=t1v)
            np.bitwise_and(midv, _M32, out=t2v)
            t1v += t2v                        # carry column
            np.bitwise_and(llv, _M32, out=lov)
            np.bitwise_and(t1v, _M32, out=t2v)
            t2v <<= _U64(32)
            lov |= t2v
            np.right_shift(midv, _U64(32), out=t2v)
            hiv += t2v
            np.right_shift(t1v, _U64(32), out=t2v)
            hiv += t2v
            # product ≡ 8·hi + lo (mod 2^61-1); add b[i]; fold twice
            np.bitwise_and(lov, _P61, out=t1v)
            np.right_shift(lov, _U64(61), out=t2v)
            t1v += t2v
            hiv <<= _U64(3)
            t1v += hiv
            t1v += b[i]
            np.bitwise_and(t1v, _P61, out=t2v)
            t1v >>= _U64(61)
            t2v += t1v
            np.bitwise_and(t2v, _P61, out=t1v)
            t2v >>= _U64(61)
            t1v += t2v
            mask = t1v >= _P61
            np.subtract(t1v, _P61, out=t1v, where=mask)
            np.minimum.at(sig[i], d_c, t1v.view(np.int64))
    return sig


def minhash_signatures_batch(batch: pa.Table, k: int = 32,
                             w: int = 3,
                             cache: dict | None = None) -> pa.Table:
    """doc_id + k minhash values over w-token shingles (vectorized:
    native uint64 mod-(2^61-1) permutations via _perm_min_chunked —
    no object-dtype bigint arithmetic anywhere)."""
    doc_id = batch.column("doc_id").to_numpy()
    toks = _tokens_series(batch.column("text"))
    hashes, docs = shingle_hashes(toks, w, cache)
    n = len(doc_id)
    a, b = _hash_params(k)
    sig = _perm_min_chunked(hashes, docs, a, b, k, n)
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
    toks = _tokens_series(batch.column("text"))
    hashes, docs = shingle_hashes(toks, w)
    return _shingle_list_from(hashes, docs, batch.num_rows)


def _shingle_list_from(hashes: np.ndarray, docs: np.ndarray,
                       n: int) -> pa.ListArray:
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

class MinHashBandExpand:
    """Actor-pool stage: documents → (doc_id, band_id, band_hash,
    shingles) long table.  Only signatures + shingle-hash lists leave
    the batch — never the documents — so the groupby that follows
    shuffles a payload ~bands × (8B × shingles) per doc.

    Actor state: the md5 token→hash vocabulary cache persists across
    batches, and the shingle hashes are computed ONCE per batch for
    both the signatures and the verify payload (the plain-fn version
    hashed the batch twice)."""

    def __init__(self, k: int = 32, bands: int = 8, rows: int = 4,
                 w: int = 3):
        self.k, self.bands, self.rows, self.w = k, bands, rows, w
        self.a, self.b = _hash_params(k)
        self.cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy()
        n = len(doc_id)
        toks = _tokens_series(batch.column("text"))
        hashes, docs = shingle_hashes(toks, self.w, self.cache)
        sig = _perm_min_chunked(hashes, docs, self.a, self.b, self.k, n)
        sig_df = pd.DataFrame({"doc_id": doc_id})
        for i in range(self.k):
            sig_df[f"mh{i:02d}"] = sig[i]
        sh = _shingle_list_from(hashes, docs, n)
        banded = lsh_band_keys(sig_df, self.bands, self.rows)
        # repeat each doc's shingle list once per band (positional take)
        pos = np.tile(np.arange(n, dtype=np.int64), self.bands)
        return pa.table({
            "doc_id": pa.array(banded["doc_id"].to_numpy(), pa.int64()),
            "band_id": pa.array(banded["band_id"].to_numpy(), pa.int32()),
            "band_hash": pa.array(
                banded["band_hash"].to_numpy().astype(np.int64),
                pa.int64()),
            "shingles": sh.take(pa.array(pos)),
        })


def minhash_band_expand_fn(k: int = 32, bands: int = 8, rows: int = 4,
                           w: int = 3):
    """Plain-fn form of MinHashBandExpand (kept for callers that want a
    stateless task instead of an actor pool)."""
    stage = MinHashBandExpand(k, bands, rows, w)
    stage.cache = None  # no cross-batch state in task form
    return stage.__call__


_EMPTY_PAIRS = {"doc_a": pd.Series(dtype=np.int64),
                "doc_b": pd.Series(dtype=np.int64),
                "jaccard": pd.Series(dtype=float)}

# Hot-bucket guard default (the standard LSH degenerate-bucket cap): a
# bucket with more docs than this is skipped (and counted) instead of
# verified — one boilerplate/empty-doc bucket must not run an
# O(|bucket|²·shingles) verify inside a single map_groups task.
DEFAULT_MAX_BUCKET = 256


def verify_bucket_df(group: pd.DataFrame,
                     threshold: float) -> pd.DataFrame:
    """Per-bucket body: exact Jaccard over shingle lists for every pair
    sharing this (band_id, band_hash) bucket.

    Vectorized: the bucket's (doc, shingle) long table self-merges on
    the shingle hash, so intersection sizes for ALL pairs come from one
    groupby-size — no per-pair Python set ops."""
    empty = pd.DataFrame(_EMPTY_PAIRS)
    if len(group) < 2:
        return empty
    g = (group.drop_duplicates("doc_id").sort_values("doc_id")
         .reset_index(drop=True))
    if len(g) < 2:
        return empty
    ids = g["doc_id"].to_numpy().astype(np.int64)
    sh = [np.asarray(s, dtype=np.int64) for s in g["shingles"]]
    lens = np.array([len(s) for s in sh], dtype=np.int64)
    if lens.sum() == 0:
        return empty
    flat = np.concatenate([s for s in sh if len(s)])
    pos = np.repeat(np.arange(len(g), dtype=np.int64), lens)
    long = pd.DataFrame({"p": pos, "h": flat})
    m = long.merge(long, on="h")
    m = m[m["p_x"] < m["p_y"]]
    if m.empty:
        return empty
    inter = m.groupby(["p_x", "p_y"], sort=False).size()
    pi = inter.index.get_level_values(0).to_numpy()
    pj = inter.index.get_level_values(1).to_numpy()
    iv = inter.to_numpy().astype(np.int64)
    union = lens[pi] + lens[pj] - iv
    jac = iv / union.astype(np.float64)
    keep = jac >= threshold
    if not keep.any():
        return empty
    return pd.DataFrame({"doc_a": ids[pi[keep]], "doc_b": ids[pj[keep]],
                         "jaccard": jac[keep]})


def minhash_pairs_distributed(docs, k: int = 32, bands: int = 8,
                              rows: int = 4, w: int = 3,
                              threshold: float = 0.5,
                              max_bucket: int | None = DEFAULT_MAX_BUCKET,
                              return_stats: bool = False,
                              num_partitions: int | None = None,
                              collect: bool = True):
    """MinHash+LSH near-dup pairs as a real shuffle: band-expand per
    batch, ONE groupby((band_id, band_hash)) moving signatures+shingle
    lists (not documents), exact Jaccard verify inside each bucket, and
    a driver dedup of the (bounded: true near-dups only) verified pairs.

    ``max_bucket`` (default DEFAULT_MAX_BUCKET) skips degenerate hot
    buckets; skipped buckets are counted and logged (never silent).
    Pass None to verify everything.  With ``return_stats`` the result is
    (pairs_df, {"skipped_buckets": n, "max_skipped_size": m}).

    With ``collect=False`` the verified pairs stay a ``ray.data.Dataset``
    (hot-bucket markers stripped and logged per block; band-duplicate
    pairs NOT deduped — downstream union-find / label propagation is
    idempotent under duplicate edges) so consumers like the distributed
    connected-components never pull the pair set to the driver.
    """
    assert collect or not return_stats, \
        "return_stats requires the collected (driver) path"
    banded = docs.map_batches(MinHashBandExpand,
                              fn_constructor_args=(k, bands, rows, w),
                              batch_format="pyarrow",
                              concurrency=(1, 8))

    def verify_block(df: pd.DataFrame) -> pd.DataFrame:
        """Per-block body (blocks hash-partitioned by (band_id,
        band_hash), so every bucket is block-local): prefilter to
        multi-member buckets, then verify each bucket.  (Repartition +
        block kernel instead of groupby().map_groups: Ray's map_groups
        machinery dominates on tens of thousands of tiny buckets —
        measured 11.2 s → 6.7 s at sf0.1, bit-identical pairs.)"""
        empty = pd.DataFrame(_EMPTY_PAIRS)
        if df.empty:
            return empty
        # composite-key prefilter; xor collisions can only RETAIN an
        # extra singleton (harmless), never drop a real bucket — the
        # exact two-column groupby below is authoritative
        key = (df["band_id"].to_numpy().astype(np.int64)
               * np.int64(1 << 48)
               ^ df["band_hash"].to_numpy().astype(np.int64))
        df = df.assign(_k=key)
        vc = df["_k"].value_counts()
        df = df[df["_k"].isin(vc[vc >= 2].index)]
        if df.empty:
            return empty
        out = []
        for _, g in df.groupby(["band_id", "band_hash"], sort=False):
            if max_bucket is not None and len(g) > max_bucket:
                # marker row so the driver can count/log what was dropped
                out.append(pd.DataFrame({"doc_a": [np.int64(-1)],
                                         "doc_b": [np.int64(-1)],
                                         "jaccard": [float(len(g))]}))
            else:
                r = verify_bucket_df(g, threshold)
                if len(r):
                    out.append(r)
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)

    from asserts_otel_processor_ray.stages.topk import (
        collect_df, shuffle_width, use_hash_shuffle)
    if num_partitions is None:
        # banded rows = docs x bands (20-byte rows); clamp the width so
        # tiny corpora don't pay a wide exchange's fixed costs
        num_partitions = shuffle_width(docs.count() * bands)
    use_hash_shuffle(banded, num_partitions)
    parted = banded.repartition(num_blocks=num_partitions,
                                keys=["band_id", "band_hash"])
    out = parted.map_batches(verify_block, batch_format="pandas",
                             batch_size=None)
    if not collect:
        def strip_markers(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return df
            skip = df["doc_a"] < 0
            if skip.any():
                import logging
                logging.getLogger(__name__).warning(
                    "minhash LSH: skipped %d hot bucket(s) over "
                    "max_bucket=%s (largest: %d docs)", int(skip.sum()),
                    max_bucket, int(df.loc[skip, "jaccard"].max()))
                return df[~skip]
            return df
        return out.map_batches(strip_markers, batch_format="pandas")
    df = collect_df(out)
    stats = {"skipped_buckets": 0, "max_skipped_size": 0}
    if not df.empty:
        skip = df["doc_a"] < 0
        if skip.any():
            sizes = df.loc[skip, "jaccard"]
            stats = {"skipped_buckets": int(skip.sum()),
                     "max_skipped_size": int(sizes.max())}
            import logging
            logging.getLogger(__name__).warning(
                "minhash LSH: skipped %d hot bucket(s) over max_bucket="
                "%s (largest: %d docs)", stats["skipped_buckets"],
                max_bucket, stats["max_skipped_size"])
            df = df[~skip]
    if df.empty:
        df = pd.DataFrame(_EMPTY_PAIRS)
    else:
        df = (df.drop_duplicates(["doc_a", "doc_b"])
              .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    if return_stats:
        return df, stats
    return df


# ---- char-n-gram Jaccard (inverted-index exact near-dup) ------------------

NGRAM_W = 5
NGRAM_THRESHOLD = 0.4
NGRAM_MAX_DF = 128


def ngram_long_batch(batch: pa.Table, w: int = NGRAM_W) -> pa.Table:
    """documents → (doc_id, h, sz) long table: DISTINCT char w-gram
    hashes per doc plus the doc's distinct-gram count.  The size rides
    along with every gram row so the downstream pair aggregation never
    joins against a per-doc size table (no O(docs) broadcast/join at
    scale)."""
    doc_id = batch.column("doc_id").to_numpy()
    hashes, docs = char_ngram_hashes(batch.column("text"), w)
    if len(hashes) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "h": pa.array([], pa.int64()),
                         "sz": pa.array([], pa.int64())})
    h64 = hashes.view(np.int64)
    order = np.lexsort((h64, docs))
    d, h = docs[order], h64[order]
    keep = np.r_[True, (d[1:] != d[:-1]) | (h[1:] != h[:-1])]
    d, h = d[keep], h[keep]
    counts = np.bincount(d, minlength=batch.num_rows)
    return pa.table({
        "doc_id": pa.array(doc_id[d], pa.int64()),
        "h": pa.array(h, pa.int64()),
        "sz": pa.array(counts[d], pa.int64()),
    })


_EMPTY_NGRAM_PARTIAL = {
    "doc_a": pd.Series(dtype=np.int64), "doc_b": pd.Series(dtype=np.int64),
    "sa": pd.Series(dtype=np.int64), "sb": pd.Series(dtype=np.int64),
    "inter": pd.Series(dtype=np.int64)}


def ngram_pairs_block(df: pd.DataFrame,
                      max_df: int = NGRAM_MAX_DF) -> pd.DataFrame:
    """Per-block pair partials over a block HASH-PARTITIONED by gram
    hash ``h`` (every posting list is block-local): df-cap the hot
    grams, self-merge on h, count gram co-occurrences per doc pair.

    Grams with df > max_df are skipped (boilerplate n-grams would emit
    O(df²) pairs); skipped grams surface as a (-1, -1) marker row so
    the driver can count and log them — never silent."""
    empty = pd.DataFrame(_EMPTY_NGRAM_PARTIAL)
    if df.empty:
        return empty
    cnt = df["h"].value_counts()
    hot = cnt[cnt > max_df]
    ok_h = cnt[(cnt >= 2) & (cnt <= max_df)].index
    blk = df[df["h"].isin(ok_h)]
    out = []
    if not blk.empty:
        m = blk.merge(blk, on="h")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if not m.empty:
            g = (m.groupby(["doc_id_x", "doc_id_y", "sz_x", "sz_y"],
                           sort=False).size().reset_index(name="inter"))
            g.columns = ["doc_a", "doc_b", "sa", "sb", "inter"]
            out.append(g)
    if len(hot):
        out.append(pd.DataFrame({
            "doc_a": [np.int64(-1)], "doc_b": [np.int64(-1)],
            "sa": [np.int64(0)], "sb": [np.int64(hot.max())],
            "inter": [np.int64(len(hot))]}))
    if not out:
        return empty
    return pd.concat(out, ignore_index=True)


_PK_BASE = np.int64(1 << 31)   # doc ids < 2^31 → pair packs into int64


def _ngram_pack_pk(t: pa.Table) -> pa.Table:
    """(doc_a, doc_b) → one packed int64 pair key (markers stay
    negative), so the pair reduce shuffles on a single integer key."""
    da = t.column("doc_a").to_numpy()
    db = t.column("doc_b").to_numpy()
    # packing precondition (not just a comment): ids >= 2^31 would
    # silently collide pair keys, and doc_b >= 2^31 would break the
    # pk<0 marker convention.  Marker rows are (-1, -1); real rows
    # must be 0 <= id < 2^31.
    real = da >= 0
    if real.any() and (int(da[real].max()) >= _PK_BASE
                       or int(db[real].max()) >= _PK_BASE
                       or int(db[real].min()) < 0):
        raise ValueError(
            "ngram pair packing requires 0 <= doc ids < 2^31; "
            "got ids outside the packable range — widen _PK_BASE "
            "or switch the pair key to a struct")
    return pa.table({
        "pk": pa.array(da * _PK_BASE + db, pa.int64()),
        "sa": t.column("sa"), "sb": t.column("sb"),
        "inter": t.column("inter"),
    })


def _ngram_reduce_block(df: pd.DataFrame, threshold: float,
                        metric: str = "jaccard") -> pd.DataFrame:
    """Per-block (hash-partitioned by pk) final: sum each pair's gram
    co-occurrences, score against the riding sizes — ``jaccard``
    (inter/union) or ``containment`` (inter/min size: the asymmetric
    near-subset/quote signal) — keep near-dups; marker rows (pk < 0)
    fold into one skipped-gram count row."""
    empty = pd.DataFrame({
        "doc_a": pd.Series(dtype=np.int64),
        "doc_b": pd.Series(dtype=np.int64),
        metric: pd.Series(dtype=float),
        "skipped_grams": pd.Series(dtype=np.int64)})
    if df.empty:
        return empty
    marker = df["pk"] < 0
    n_skipped = int(df.loc[marker, "inter"].sum())
    df = df[~marker]
    out = []
    if not df.empty:
        g = (df.groupby("pk", sort=False)
             .agg(sa=("sa", "min"), sb=("sb", "min"),
                  inter=("inter", "sum")).reset_index())
        inter = g["inter"].to_numpy().astype(np.int64)
        if metric == "containment":
            den = np.minimum(g["sa"].to_numpy(),
                             g["sb"].to_numpy()).astype(np.float64)
        else:
            den = (g["sa"].to_numpy() + g["sb"].to_numpy()
                   - inter).astype(np.float64)
        jac = inter / den
        keep = jac >= threshold
        if keep.any():
            pk = g["pk"].to_numpy()[keep]
            out.append(pd.DataFrame({
                "doc_a": pk // _PK_BASE, "doc_b": pk % _PK_BASE,
                metric: jac[keep],
                "skipped_grams": np.zeros(int(keep.sum()), np.int64)}))
    if n_skipped:
        out.append(pd.DataFrame({
            "doc_a": [np.int64(-1)], "doc_b": [np.int64(-1)],
            metric: [0.0], "skipped_grams": [np.int64(n_skipped)]}))
    if not out:
        return empty
    return pd.concat(out, ignore_index=True)


def ngram_jaccard_distributed(docs, w: int = NGRAM_W,
                              threshold: float = NGRAM_THRESHOLD,
                              max_df: int = NGRAM_MAX_DF,
                              num_partitions: int | None = None,
                              metric: str = "jaccard"
                              ) -> pd.DataFrame:
    """Exact char-n-gram Jaccard near-dup pairs via the inverted-index
    shuffle: batch → distinct (doc, gram, size) long rows → hash
    repartition by gram → per-block pair partials (posting lists are
    block-local) → hash repartition by packed pair key → per-block
    sum + jaccard + threshold filter.  Documents never move — only
    24-byte gram rows and bounded pair partials do, and only near-dup
    pairs reach the driver.

    (Two hash repartitions + block-local pandas reduces instead of a
    groupby().aggregate(): measured 6 s vs 41 s packed-key / 309 s
    4-key aggregate at sf0.001 — the aggregator state machine
    dominates on millions of tiny groups.)

    With the df cap, jaccard is computed over non-hot grams in the
    intersection but FULL distinct-gram counts in the union (a
    deterministic lower bound; exact when no gram exceeds the cap —
    the SQL oracle applies the identical rule)."""
    from asserts_otel_processor_ray.stages.topk import (
        collect_df, shuffle_width, use_hash_shuffle)
    if num_partitions is None:
        # gram long rows ~ docs x distinct grams/doc; the x64
        # multiplier only has to be order-of-magnitude right for the
        # width clamp
        num_partitions = shuffle_width(docs.count() * 64)

    long = docs.map_batches(lambda t: ngram_long_batch(t, w),
                            batch_format="pyarrow")
    use_hash_shuffle(long, num_partitions)
    parted = long.repartition(num_blocks=num_partitions, keys=["h"])
    partials = parted.map_batches(
        lambda d: ngram_pairs_block(d, max_df),
        batch_format="pandas", batch_size=None)
    packed = partials.map_batches(_ngram_pack_pk, batch_format="pyarrow")
    by_pair = packed.repartition(num_blocks=max(8, num_partitions // 2),
                                 keys=["pk"])
    reduced = by_pair.map_batches(
        lambda d: _ngram_reduce_block(d, threshold, metric),
        batch_format="pandas", batch_size=None)

    df = collect_df(reduced)
    if not df.empty:
        skip = df["doc_a"] < 0
        n_skipped = int(df.loc[skip, "skipped_grams"].sum())
        if n_skipped:
            import logging
            logging.getLogger(__name__).warning(
                "ngram jaccard: skipped %d hot gram(s) over max_df=%d",
                n_skipped, max_df)
        df = df[~skip]
    df = df.drop(columns=["skipped_grams"], errors="ignore")
    if df.empty:
        e = dict(_EMPTY_PAIRS)
        if metric != "jaccard":
            e[metric] = e.pop("jaccard")
        return pd.DataFrame(e)
    return (df.sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True))


# ---- SimHash -------------------------------------------------------------
# (_hex16 moved to text_analysis.py so fingerprint_batch shares it; the
# import above keeps this module's historical name working.)

def _unhex16(hexes) -> np.ndarray:
    """16-char hex strings → uint64, vectorized."""
    import binascii
    joined = "".join(hexes)
    if not joined:
        return np.array([], dtype=np.uint64)
    return np.frombuffer(binascii.unhexlify(joined), dtype=">u8").astype(
        np.uint64)


def simhash_values_batch(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(doc_id, simhash uint64) — the internal representation; hex
    formatting happens only at output boundaries (_hex16)."""
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
    return doc_id, packed.ravel()


def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over token hashes (bit-matrix majority vote,
    vectorized via unpackbits + reduceat)."""
    doc_id, vals = simhash_values_batch(batch)
    return pa.table({
        "doc_id": pa.array(doc_id, pa.int64()),
        "simhash": pa.array(_hex16(vals), pa.string()),
    })


def simhash_band_expand(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, band_id, band_hash, simhash) long rows: the
    4×16-bit chunk banding (any equal chunk catches hamming ≤ 3).
    Stays uint64 end-to-end — no hex round-trip in the shuffle path."""
    doc, vals = simhash_values_batch(batch)
    frames = []
    for c in range(4):
        chunk = (vals >> np.uint64(16 * c)) & np.uint64(0xFFFF)
        frames.append(pd.DataFrame({
            "doc_id": doc, "band_id": np.int32(c),
            "band_hash": chunk.astype(np.int64),
            "simhash": vals.astype(np.int64)}))
    return pa.Table.from_pandas(pd.concat(frames, ignore_index=True),
                                preserve_index=False)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (unpackbits; no per-row bin())."""
    if len(x) == 0:
        return np.zeros(0, np.int64)
    b = np.unpackbits(np.ascontiguousarray(
        x.astype(np.uint64)).view(np.uint8).reshape(-1, 8), axis=1)
    return b.sum(axis=1).astype(np.int64)


def simhash_verify_bucket(group: pd.DataFrame, max_hamming: int,
                          max_bucket: int | None = None) -> pd.DataFrame:
    empty = pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                          "doc_b": pd.Series(dtype=np.int64),
                          "hamming": pd.Series(dtype=np.int64)})
    if len(group) < 2:
        return empty
    if max_bucket is not None and len(group) > max_bucket:
        # hot-bucket guard (same pattern as verify_block's MinHash cap):
        # a degenerate 16-bit chunk bucket (near-identical/empty docs)
        # must not materialize O(|bucket|²) triu indices inside one
        # map_groups task.  Marker row → counted and logged upstream.
        return pd.DataFrame({"doc_a": [np.int64(-1)],
                             "doc_b": [np.int64(-1)],
                             "hamming": [np.int64(len(group))]})
    g = group.drop_duplicates("doc_id").sort_values("doc_id")
    ids = g["doc_id"].to_numpy()
    vals = g["simhash"].to_numpy().astype(np.uint64)
    ii, jj = np.triu_indices(len(ids), k=1)
    x = vals[ii] ^ vals[jj]
    ham = _popcount64(x)
    hit = ham <= max_hamming
    if not hit.any():
        return empty
    return pd.DataFrame({"doc_a": ids[ii[hit]].astype(np.int64),
                         "doc_b": ids[jj[hit]].astype(np.int64),
                         "hamming": ham[hit].astype(np.int64)})


def simhash_pairs_distributed(docs, max_hamming: int = 3,
                              max_bucket: int | None = DEFAULT_MAX_BUCKET,
                              return_stats: bool = False):
    """SimHash near-dup pairs as a real shuffle: chunk-band expand per
    batch, groupby((band_id, band_hash)) moving 16-byte rows only,
    exact hamming verify per bucket, driver dedup of verified pairs.

    ``max_bucket`` (default DEFAULT_MAX_BUCKET, same guard as the
    MinHash path) skips degenerate hot buckets; skipped buckets are
    counted and logged, never silent.  Pass None to verify everything.
    (Bucket verify stays groupby().map_groups, not repartition+block
    kernel: measured 3.7 s → 5.4 s the other way at ~5k groups — the
    hash-shuffle exchange costs more than map_groups overhead here.)"""
    banded = docs.map_batches(simhash_band_expand, batch_format="pyarrow")
    out = banded.groupby(["band_id", "band_hash"]).map_groups(
        lambda g: simhash_verify_bucket(g, max_hamming, max_bucket),
        batch_format="pandas")
    from asserts_otel_processor_ray.stages.topk import collect_df
    df = collect_df(out)
    stats = {"skipped_buckets": 0, "max_skipped_size": 0}
    if not df.empty:
        skip = df["doc_a"] < 0
        if skip.any():
            sizes = df.loc[skip, "hamming"]
            stats = {"skipped_buckets": int(skip.sum()),
                     "max_skipped_size": int(sizes.max())}
            import logging
            logging.getLogger(__name__).warning(
                "simhash LSH: skipped %d hot bucket(s) over max_bucket="
                "%s (largest: %d docs)", stats["skipped_buckets"],
                max_bucket, stats["max_skipped_size"])
            df = df[~skip]
    if df.empty:
        df = pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                           "doc_b": pd.Series(dtype=np.int64),
                           "hamming": pd.Series(dtype=np.int64)})
    else:
        df = (df.drop_duplicates(["doc_a", "doc_b"])
              .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    if return_stats:
        return df, stats
    return df


def simhash_near_pairs(sim_df: pd.DataFrame,
                       max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by SimHash: band on 4×16-bit chunks (any equal
    chunk → candidate, guaranteed to catch hamming ≤ 3), verify exact
    hamming distance."""
    vals = _unhex16(sim_df["simhash"].tolist())
    doc = sim_df["doc_id"].to_numpy()
    frames = []
    for c in range(4):
        chunk = (vals >> np.uint64(16 * c)) & np.uint64(0xFFFF)
        frames.append(pd.DataFrame({"doc_id": doc, "band_id": c,
                                    "band_hash": chunk}))
    cand = candidate_pairs(pd.concat(frames, ignore_index=True))
    if cand.empty:
        return cand.assign(hamming=pd.Series(dtype=int))
    val_of = pd.Series(vals, index=doc)
    va = val_of[cand["doc_a"].to_numpy()].to_numpy().astype(np.uint64)
    vb = val_of[cand["doc_b"].to_numpy()].to_numpy().astype(np.uint64)
    out = cand.assign(hamming=_popcount64(va ^ vb))
    return out[out["hamming"] <= max_hamming].reset_index(drop=True)


# ---- distributed connected components -------------------------------------

def connected_components_distributed(pairs, num_partitions: int | None
                                     = None, max_iters: int = 50
                                     ) -> pd.DataFrame:
    """Connected components over a near-dup pair Dataset via
    hash-to-min label propagation with pointer jumping — the scale path
    for dedup clustering beyond the driver pair budget (reference
    semantics: q_dedup_clusters' union-find; cluster id = component
    min, Rastogi et al.-style hash-to-min).

    Per round (all engine-pattern primitives, nothing driver-side):
      * neighbor step: edges ⋈ labels on node (hash join, both sides
        shuffle) → candidate (nbr, label);
      * pointer jump: labels ⋈ labels (label → that label's own label)
        → candidate (node, label-of-label), which squares the
        propagation reach so a diameter-D component converges in
        O(log D) rounds, not D;
      * ONE hash repartition by node + per-block min over the candidate
        union (the repo's repartition+block-kernel shape).

    Labels start at min(node, min neighbor), only ever decrease, and
    every label is a member node id, so the fixpoint label is exactly
    the component min and the (exact, int) label sum is a convergence
    certificate.  The driver holds only per-round scalar sums; the
    returned (node, label) frame is O(nodes that appear in any pair) —
    the same size as the query's answer.  Duplicate edges (e.g. the
    same pair from several LSH bands) are harmless under min."""
    from asserts_otel_processor_ray.stages.topk import (
        collect_df, default_shuffle_blocks, use_hash_shuffle)
    if num_partitions is None:
        num_partitions = default_shuffle_blocks()

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy()
        b = t.column("doc_b").to_numpy()
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow")
    use_hash_shuffle(edges, num_partitions)
    edges = edges.materialize()
    if edges.count() == 0:
        return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                             "label": pd.Series(dtype=np.int64)})

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=False)["nbr"].min()
        return pd.DataFrame({
            "node": g.index.to_numpy(),
            "label": np.minimum(g.index.to_numpy(), g.to_numpy())})

    labels = (edges.repartition(num_blocks=num_partitions, keys=["node"])
              .map_batches(init_labels, batch_format="pandas",
                           batch_size=None).materialize())
    prev_sum = int(labels.sum("label"))

    def as_candidate(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("nbr"),
                         "label": t.column("label")})

    def as_mid_left(t: pa.Table) -> pa.Table:     # (node, mid=label)
        return pa.table({"node": t.column("node"),
                         "mid": t.column("label")})

    def as_mid_right(t: pa.Table) -> pa.Table:    # (mid=node, label)
        return pa.table({"mid": t.column("node"),
                         "label": t.column("label")})

    def block_min(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                 "label": pd.Series(dtype=np.int64)})
        g = df.groupby("node", sort=False)["label"].min()
        return pd.DataFrame({"node": g.index.to_numpy(),
                             "label": g.to_numpy()})

    for _ in range(max_iters):
        nbr_cand = edges.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("node",)).map_batches(as_candidate,
                                      batch_format="pyarrow")
        jump_cand = (labels.map_batches(as_mid_left,
                                        batch_format="pyarrow")
                     .join(labels.map_batches(as_mid_right,
                                              batch_format="pyarrow"),
                           join_type="inner",
                           num_partitions=num_partitions, on=("mid",))
                     .map_batches(lambda t: t.select(["node", "label"]),
                                  batch_format="pyarrow"))
        merged = labels.union(nbr_cand).union(jump_cand)
        use_hash_shuffle(merged, num_partitions)
        labels = (merged.repartition(num_blocks=num_partitions,
                                     keys=["node"])
                  .map_batches(block_min, batch_format="pandas",
                               batch_size=None).materialize())
        cur = int(labels.sum("label"))
        if cur == prev_sum:      # labels monotone ⇒ fixpoint reached
            break
        prev_sum = cur
    else:
        import logging
        logging.getLogger(__name__).warning(
            "connected components: no fixpoint after %d rounds "
            "(pointer jumping makes this ~2^%d hops of reach) — "
            "returning the current labeling", max_iters, max_iters)
    return collect_df(labels)


# ---- banded edit-distance near-dup -----------------------------------------

def edit_distances_vectorized(strs_a: "np.ndarray", strs_b: "np.ndarray",
                              width: int) -> "np.ndarray":
    """Levenshtein distance for P string pairs at once, each clipped
    to ``width`` chars.  Row DP vectorized ACROSS pairs; the
    insertion recurrence's in-row dependency (dp[j-1]+1) is closed in
    one vectorized pass via the running-minimum identity
    dp[j] = j + cummin_k≤j(t[k] − k), so each of the ≤width row steps
    is pure numpy — no per-cell Python.  O(width²) work per pair like
    the classic DP, but the constant is a few numpy kernels."""
    a = np.asarray(strs_a, dtype=f"U{width}")
    b = np.asarray(strs_b, dtype=f"U{width}")
    P = len(a)
    if P == 0:
        return np.empty(0, np.int32)
    A = a.view(np.uint32).reshape(P, width)
    B = b.view(np.uint32).reshape(P, width)
    # NUL padding from the fixed-width view marks ends; true lengths:
    la = (A != 0).sum(axis=1).astype(np.int32)
    lb = (B != 0).sum(axis=1).astype(np.int32)
    idx = np.arange(width + 1, dtype=np.int32)
    dp = np.tile(idx, (P, 1))                     # DP row i=0
    ans = np.where(la == 0, lb, 0).astype(np.int32)
    for i in range(1, int(la.max()) + 1 if P else 1):
        cost = (B != A[:, i - 1][:, None]).astype(np.int32)
        t = np.empty((P, width + 1), np.int32)
        t[:, 0] = i
        t[:, 1:] = np.minimum(dp[:, 1:] + 1, dp[:, :-1] + cost)
        dp = idx + np.minimum.accumulate(t - idx, axis=1)
        done = la == i
        if done.any():
            ans[done] = dp[done, lb[done]]
    return ans
