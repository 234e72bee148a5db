"""Similarity search over an embedding column (``list<float>``).

* Brute-force cosine top-k: the query matrix is broadcast once
  (``ray.put``) and every batch computes a float64 matmul against it,
  emitting only its local top-k per query (two-phase top-k, exact).
* LSH-bucketed variant (random hyperplanes) as the scale path: bucket
  signatures per batch; search only same-bucket vectors.
* Embedding-cosine near-dup: same machinery with a threshold.

Float discipline: similarity ranks must match a float64 oracle, so the
matmul always happens in float64 and only *ranks/ids* are emitted —
never raw cosines (summation order differs across engines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """map_batches stage: local top-k of each broadcast query against
    the batch's vectors (actor pool; the query matrix loads once)."""

    def __init__(self, queries_ref, query_ids, k: int,
                 exclude_ids: frozenset | None = None):
        q = (ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray)
             else queries_ref)
        self.q = _normalize(q.astype(np.float64))
        self.query_ids = np.asarray(query_ids, dtype=np.int64)
        self.k = k
        # presorted once per actor — not list()+isin per batch
        self.exclude = (np.sort(np.fromiter(exclude_ids, np.int64,
                                            len(exclude_ids)))
                        if exclude_ids else None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        keep = ~np.isin(ids, self.exclude) if self.exclude is not None \
            else np.ones(len(ids), bool)
        ids = ids[keep]
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        m = _normalize(_matrix(batch)[keep])
        sims = self.q @ m.T                       # (nq, nb) float64
        k = min(self.k, sims.shape[1])
        # exact top-k under the TOTAL order (cos desc, neighbor asc):
        # argpartition alone keeps an arbitrary subset of candidates
        # TIED at the boundary cosine (wrong under duplicate vectors —
        # the semantic-dedup norm), so expand to everything >= the
        # boundary and pick k lexicographically.  Typical expansion is
        # ~nq*k rows; the degenerate all-identical corpus expands to
        # the full matrix, which is the true tie set.
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        ck = np.take_along_axis(sims, idx, axis=1).min(axis=1)
        rows, cols = np.nonzero(sims >= ck[:, None])
        cosv = sims[rows, cols]
        nidv = ids[cols]
        order = np.lexsort((nidv, -cosv, rows))
        rows, cosv, nidv = rows[order], cosv[order], nidv[order]
        starts = np.searchsorted(rows, np.arange(sims.shape[0]))
        take = (np.arange(len(rows)) - starts[rows]) < k
        return pa.table({
            "query_id": pa.array(self.query_ids[rows[take]], pa.int64()),
            "neighbor_id": pa.array(nidv[take], pa.int64()),
            "cos": pa.array(cosv[take], pa.float64()),
        })


def ann_topk(ds: "ray.data.Dataset", queries: np.ndarray,
             query_ids, k: int,
             exclude_ids: frozenset | None = None) -> pd.DataFrame:
    """Exact cosine top-k: per-batch partials + driver merge.

    Returns (query_id, neighbor_id, rank) — rank 1-based by cosine desc,
    neighbor_id asc tie-break.  Cosines are dropped from the result (see
    module docstring).
    """
    from asserts_otel_processor_ray.stages.topk import collect_df
    qref = ray.put(queries)
    part = ds.map_batches(
        BruteForceTopK, fn_constructor_args=(qref, query_ids, k,
                                             exclude_ids),
        batch_format="pyarrow", concurrency=(1, 8))
    return _rank_merge(collect_df(part), k)


# Column-gather threshold for the ANN scale paths: when at most this
# share of a batch's vectors is a candidate of >=1 query (the UNION
# over queries — correlated in real LSH/IVF buckets), the batch
# gathers the candidate columns and runs the matmul on the subset —
# FLOPs and the (nq, ncand) score matrix then scale with the candidate
# share instead of the batch size.  Above it, gathering's copy costs
# more than the FLOPs it saves.  Measured at nv=200k nq=100 dim=64
# (BASELINE.md "ANN candidate-gather micro-bench"): gather wins 50x at
# 1% union share and is still ~1.3x at 50%; crossover is above 0.5, so
# 0.5 is the conservative cut.
GATHER_MAX_DENSITY = 0.5

_EMPTY_TOPK = {"query_id": pa.array([], pa.int64()),
               "neighbor_id": pa.array([], pa.int64()),
               "cos": pa.array([], pa.float64())}


def _topk_partial(qm: np.ndarray, qids: np.ndarray, m: np.ndarray,
                  ids: np.ndarray, cand: np.ndarray, k: int) -> pa.Table:
    """Bounded per-batch top-k over a (nq, nv) candidate mask.

    Columns that are a candidate of NO query are never multiplied:
    below GATHER_MAX_DENSITY the candidate columns are gathered and
    only the (nq, ncand) product is computed; above it the full matmul
    + mask is cheaper than the gather copy.  Either way each emitted
    cosine is the same float64 dot product of the same two vectors, so
    ranks are path-independent (pinned by
    tests/test_extra_ops.py::test_ann_gather_matches_full)."""
    empty = pa.table(_EMPTY_TOPK)
    anycand = cand.any(axis=0)
    ncols = int(anycand.sum())
    if ncols == 0:
        return empty
    if ncols <= GATHER_MAX_DENSITY * cand.shape[1]:
        cols = np.nonzero(anycand)[0]
        sims = qm @ m[cols].T                      # (nq, ncand) float64
        sims[~cand[:, cols]] = -np.inf
        sub_ids = ids[cols]
    else:
        sims = qm @ m.T                            # (nq, nv) float64
        sims[~cand] = -np.inf
        sub_ids = ids
    kk = min(k, sims.shape[1])
    idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
    simv = np.take_along_axis(sims, idx, axis=1).ravel()
    rowq = np.repeat(qids, kk)
    flatn = sub_ids[idx.ravel()]
    ok = np.isfinite(simv)                         # drop non-candidates
    if not ok.any():
        return empty
    return pa.table({
        "query_id": pa.array(rowq[ok], pa.int64()),
        "neighbor_id": pa.array(flatn[ok], pa.int64()),
        "cos": pa.array(simv[ok], pa.float64()),
    })


def _rank_merge(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """Driver merge shared by all top-k paths: global rank per query by
    cosine desc, neighbor_id asc tie-break; cosines dropped (see module
    docstring)."""
    if df.empty:
        return pd.DataFrame(columns=["query_id", "neighbor_id", "rank"])
    df = df.sort_values(["query_id", "cos", "neighbor_id"],
                        ascending=[True, False, True], kind="mergesort")
    df["rank"] = df.groupby("query_id", sort=False).cumcount() + 1
    df = df[df["rank"] <= k]
    return df[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


class HyperplaneLSH:
    """Scale path: 16-bit random-hyperplane signatures per vector; ANN
    probes only matching (or near-matching) buckets."""

    def __init__(self, dim: int, nbits: int = 16, seed: int = 99):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((nbits, dim))

    def signature(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes.T) > 0
        out = np.zeros(len(m), dtype=np.uint64)
        for i in range(bits.shape[1]):
            out |= bits[:, i].astype(np.uint64) << np.uint64(i)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        sig = self.signature(m)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "bucket": pa.array(sig.astype(np.int64), pa.int64()),
        })


def ann_topk_lsh(ds: "ray.data.Dataset", queries: np.ndarray,
                 query_ids, k: int, dim: int,
                 exclude_ids: frozenset | None = None,
                 bands: int = 8, bits_per_band: int = 2) -> pd.DataFrame:
    """ANN top-k via banded hyperplane LSH: each batch scores ONLY the
    vectors that share ≥1 band bucket with each query (the scale path —
    per-batch candidate sets shrink with bits_per_band), then the
    bounded per-batch top-k partials merge on the driver like the exact
    path.  Approximate: recall < 1 when a true neighbor collides with a
    query in no band.

    Candidate plumbing: the driver builds an inverted
    (band, hash) → query-membership table — (bands, 2^bits, nq) bools —
    so a batch derives its (nq, nv) mask by ``bands`` fancy-index ORs
    instead of a (nq, nv, bands) broadcast compare, and
    ``_topk_partial`` gathers the candidate columns when they are
    sparse so FLOPs scale with the candidate share, not the batch."""
    from asserts_otel_processor_ray.stages.topk import collect_df
    lsh = HyperplaneLSH(dim, nbits=bands * bits_per_band)
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    qsig = lsh.signature(qm)
    qids = np.asarray(query_ids, dtype=np.int64)
    mask = np.uint64((1 << bits_per_band) - 1)
    nq = len(qids)
    member = np.zeros((bands, 1 << bits_per_band, nq), dtype=bool)
    for b in range(bands):
        qb = ((qsig >> np.uint64(b * bits_per_band)) & mask) \
            .astype(np.int64)
        member[b, qb, np.arange(nq)] = True
    exclude = exclude_ids or frozenset()
    ref = ray.put({"qm": qm, "qids": qids, "member": member})

    class _Stage:
        def __init__(self, ref):
            d = ray.get(ref)
            self.qm, self.qids, self.member = (d["qm"], d["qids"],
                                               d["member"])
            self.exclude = (np.sort(np.fromiter(exclude, np.int64,
                                                len(exclude)))
                            if exclude else None)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy()
            keep = (~np.isin(ids, self.exclude)
                    if self.exclude is not None
                    else np.ones(len(ids), bool))
            ids = ids[keep]
            if len(ids) == 0:
                return pa.table(_EMPTY_TOPK)
            m = _normalize(_matrix(batch)[keep])
            sig = lsh.signature(m)
            cand_t = np.zeros((len(ids), len(self.qids)), dtype=bool)
            for b in range(bands):
                vb = ((sig >> np.uint64(b * bits_per_band)) & mask) \
                    .astype(np.int64)
                cand_t |= self.member[b, vb]       # (nv, nq)
            return _topk_partial(self.qm, self.qids, m, ids,
                                 cand_t.T, k)

    part = ds.map_batches(_Stage, fn_constructor_args=(ref,),
                          batch_format="pyarrow", concurrency=(1, 8))
    return _rank_merge(collect_df(part), k)


class IVFIndex:
    """Inverted-file (IVF) index over the embedding column — the second
    scale path next to hyperplane LSH.  ``nlist`` unit centroids are
    drawn from a seeded Gaussian (data-independent, so the generated
    DuckDB oracle embeds them as DOUBLE[] literals); every vector
    belongs to its max-cosine list, and a query probes only its
    ``nprobe`` nearest lists.  For a production deployment the seeded
    centroids are replaced by ``kmeans_fit`` output — the assign/probe
    machinery is identical either way."""

    def __init__(self, dim: int, nlist: int = 16, seed: int = 1234,
                 centroids: np.ndarray | None = None):
        if centroids is not None:
            self.centroids = _normalize(
                np.asarray(centroids, dtype=np.float64))
        else:
            rng = np.random.default_rng(seed)
            self.centroids = _normalize(rng.standard_normal((nlist, dim)))

    def assign(self, m: np.ndarray) -> np.ndarray:
        """Nearest-centroid list id per (normalized) row; ties break to
        the lowest centroid id (numpy argmax first-max == SQL
        list_position first occurrence)."""
        return (m @ self.centroids.T).argmax(axis=1)

    def probe(self, qm: np.ndarray, nprobe: int) -> np.ndarray:
        """(nq, nprobe) probed list ids: cosine desc, id asc tie-break
        (stable argsort of the negated scores)."""
        cos = qm @ self.centroids.T
        return np.argsort(-cos, axis=1, kind="stable")[:, :nprobe]


def ivf_build(ds: "ray.data.Dataset", dim: int, path: str,
              nlist: int = 16, seed: int = 1234,
              centroids: np.ndarray | None = None) -> np.ndarray:
    """Build the inverted-file LAYOUT: assign every vector to its
    nearest-centroid list and write hive-partitioned parquet — one
    ``list_id=<n>/`` directory per list.  ``ann_topk_ivf`` with
    ``index_path=`` then enumerates ONLY the probed lists' directories,
    so unprobed lists never leave storage (the point of an inverted
    file — VERDICT r4 item 1).  The list id is also kept as a regular
    ``lid`` column inside the files so a partition-pruned read still
    knows each vector's list without re-assigning.

    Write is a single streaming pass (no exchange): each block splits
    itself across its lists' directories.  At cluster scale, a keyed
    ``repartition(keys=["list_id"])`` before the write consolidates to
    one file per (list, partition) — omitted here because the write
    pass is already resumable per-directory.  Returns the centroids."""
    ivf = IVFIndex(dim, nlist=nlist, seed=seed, centroids=centroids)
    cref = ray.put(ivf.centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        lists = (_normalize(_matrix(batch)) @ c.T).argmax(axis=1) \
            .astype(np.int64)
        return (batch.append_column("lid", pa.array(lists, pa.int64()))
                     .append_column("list_id",
                                    pa.array(lists, pa.int64())))

    ds.map_batches(assign, batch_format="pyarrow") \
        .write_parquet(path, partition_cols=["list_id"])
    return ivf.centroids


def ann_topk_ivf(ds: "ray.data.Dataset | None", queries: np.ndarray,
                 query_ids, k: int, dim: int,
                 exclude_ids: frozenset | None = None,
                 nlist: int = 16, nprobe: int = 4,
                 centroids: np.ndarray | None = None,
                 index_path: str | None = None) -> pd.DataFrame:
    """ANN top-k via an IVF index.  Two source modes:

    * ``index_path=`` (the scale path): read ONLY the probed lists'
      partitions of an ``ivf_build`` layout — unprobed lists are never
      read (file-level pruning by directory, no filter-pushdown
      reliance), and each row carries its ``lid`` so no re-assignment
      happens at query time.
    * ``ds`` (index-free): each batch assigns its vectors on the fly
      and scores only probed-list vectors.

    Either way the (nq, nv) candidate mask is a probed-membership
    lookup ``probed_mask[:, lists]`` (no (nq, nprobe, nv) broadcast)
    and ``_topk_partial`` gathers candidate columns when sparse, so
    FLOPs track the scanned fraction nprobe/nlist instead of paying
    brute force + masking overhead.  Approximate: recall < 1 when a
    true neighbor lives in an unprobed list (the standard IVF
    tradeoff)."""
    import ray.data  # noqa: F401  (read_parquet for the indexed path)

    from asserts_otel_processor_ray.stages.topk import collect_df
    ivf = IVFIndex(dim, nlist=nlist, centroids=centroids)
    nlist = len(ivf.centroids)
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    probed = ivf.probe(qm, nprobe)                  # (nq, nprobe)
    probed_mask = np.zeros((len(qids), nlist), dtype=bool)
    np.put_along_axis(probed_mask, probed, True, axis=1)
    if index_path is not None:
        import glob
        import os
        files = []
        for n in sorted(set(int(x) for x in probed.ravel())):
            files += sorted(glob.glob(os.path.join(
                index_path, f"list_id={n}", "*.parquet")))
        if not files:
            return pd.DataFrame(
                columns=["query_id", "neighbor_id", "rank"])
        ds = ray.data.read_parquet(files,
                                   columns=["vec_id", "embedding",
                                            "lid"])
    exclude = exclude_ids or frozenset()
    ref = ray.put({"qm": qm, "qids": qids, "probed_mask": probed_mask,
                   "centroids": ivf.centroids})

    class _Stage:
        def __init__(self, ref):
            d = ray.get(ref)
            self.qm, self.qids = d["qm"], d["qids"]
            self.probed_mask = d["probed_mask"]
            self.ivf = IVFIndex(dim, centroids=d["centroids"])
            self.exclude = (np.sort(np.fromiter(exclude, np.int64,
                                                len(exclude)))
                            if exclude else None)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy()
            keep = (~np.isin(ids, self.exclude)
                    if self.exclude is not None
                    else np.ones(len(ids), bool))
            ids = ids[keep]
            if len(ids) == 0:
                return pa.table(_EMPTY_TOPK)
            m = _normalize(_matrix(batch)[keep])
            if "lid" in batch.schema.names:         # indexed layout
                lists = batch.column("lid").to_numpy() \
                    .astype(np.int64)[keep]
            else:
                lists = self.ivf.assign(m)          # (nv,)
            cand = self.probed_mask[:, lists]       # (nq, nv) lookup
            return _topk_partial(self.qm, self.qids, m, ids, cand, k)

    part = ds.map_batches(_Stage, fn_constructor_args=(ref,),
                          batch_format="pyarrow", concurrency=(1, 8))
    return _rank_merge(collect_df(part), k)


def kmeans_fit(ds: "ray.data.Dataset", k: int, dim: int,
               iters: int = 5, seed: int = 1234) -> np.ndarray:
    """Distributed spherical k-means (Lloyd's) over the embedding
    column — the production centroid-training path for ``IVFIndex``.
    Each iteration is ONE streaming pass: ``map_batches`` emits
    per-batch (cluster, count, sum-vector) partials (≤ k rows × dim
    floats per batch — never vectors), the driver reduces the tiny
    k×blocks partial table and renormalizes.  Empty clusters keep their
    previous centroid.  Deterministic given the seed up to float
    summation order (partials reduce in block order).  Iterative, so no
    SQL oracle — pinned by a numpy-reference equivalence test instead
    (tests/test_extra_ops.py)."""
    from asserts_otel_processor_ray.stages.topk import collect_df
    rng = np.random.default_rng(seed)
    cent = _normalize(rng.standard_normal((k, dim)))
    for _ in range(iters):
        ref = ray.put(cent)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            m = _normalize(_matrix(batch))
            asn = (m @ c.T).argmax(axis=1)
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, asn, m)
            counts = np.bincount(asn, minlength=k).astype(np.int64)
            nz = np.nonzero(counts)[0]
            return pa.table({
                "cluster": pa.array(nz.astype(np.int32), pa.int32()),
                "n": pa.array(counts[nz], pa.int64()),
                "vecsum": pa.array(list(sums[nz]),
                                   pa.list_(pa.float64())),
            })

        part = collect_df(ds.map_batches(partial, batch_format="pyarrow"))
        new = cent.copy()
        if not part.empty:
            for cl, grp in part.groupby("cluster", sort=True):
                s = np.sum(np.stack([np.asarray(v, dtype=np.float64)
                                     for v in grp["vecsum"]]), axis=0)
                norm = np.linalg.norm(s)
                if norm > 0:
                    new[int(cl)] = s / norm
        cent = new
    return cent


class BruteForcePairs:
    """map_batches stage for exact near-dup pairs: each batch's vectors
    against the broadcast full matrix (baseline path; the LSH-bucketed
    variant replaces the broadcast at cluster scale)."""

    def __init__(self, all_ref, threshold: float):
        d = ray.get(all_ref)
        self.m = _normalize(d["m"].astype(np.float64))
        self.ids = np.asarray(d["ids"], dtype=np.int64)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        m = _normalize(_matrix(batch))
        sims = m @ self.m.T
        ii, jj = np.nonzero(sims >= self.threshold)
        a, b = ids[ii], self.ids[jj]
        keep = a < b
        return pa.table({"vec_a": pa.array(a[keep], pa.int64()),
                         "vec_b": pa.array(b[keep], pa.int64())})


def near_dup_pairs_exact(ds: "ray.data.Dataset",
                         threshold: float) -> pd.DataFrame:
    """Exact embedding-cosine near-dup pairs (vec_a < vec_b)."""
    from asserts_otel_processor_ray.stages.topk import collect_df
    vecs = collect_df(ds.map_batches(
        lambda t: t.select(["vec_id", "embedding"]),
        batch_format="pyarrow"))
    all_ref = ray.put({
        "m": np.stack([np.asarray(e, dtype=np.float64)
                       for e in vecs["embedding"]]),
        "ids": vecs["vec_id"].to_numpy(),
    })
    part = ds.map_batches(BruteForcePairs,
                          fn_constructor_args=(all_ref, threshold),
                          batch_format="pyarrow", concurrency=(1, 8))
    df = collect_df(part)
    if df.empty:
        return pd.DataFrame(columns=["vec_a", "vec_b"])
    return (df.drop_duplicates().sort_values(["vec_a", "vec_b"])
            .reset_index(drop=True))


_EMPTY_VEC_PAIRS = {"vec_a": pd.Series(dtype=np.int64),
                    "vec_b": pd.Series(dtype=np.int64)}

# Hot-bucket guard for the banded near-dup path — same role (and
# default) as dedup.DEFAULT_MAX_BUCKET: a degenerate band bucket must
# not emit O(|bucket|²) candidate pairs from one task.
DEFAULT_MAX_BUCKET = 256


def _near_dup_candidates_bucket(group: pd.DataFrame, max_bucket: int | None,
                                bits_per_band: int) -> pd.DataFrame:
    """Per-bucket body: emit candidate ID pairs (no embeddings, no
    cosines — verification happens after the join gathers vectors).
    Oversize buckets emit a marker row: vec_a = a bucket-unique
    negative key (so the cross-band pair dedup can't collapse two
    distinct hot buckets), vec_b = |bucket|."""
    ids = np.unique(group["vec_id"].to_numpy().astype(np.int64))
    if len(ids) < 2:
        return pd.DataFrame(_EMPTY_VEC_PAIRS)
    if max_bucket is not None and len(ids) > max_bucket:
        bkey = (int(group["band_id"].iloc[0]) << bits_per_band) \
            | int(group["band_hash"].iloc[0])
        return pd.DataFrame({"vec_a": [np.int64(-1 - bkey)],
                             "vec_b": [np.int64(len(ids))]})
    ii, jj = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"vec_a": ids[ii], "vec_b": ids[jj]})


def _tune_multi_shuffle_context(ctx, num_partitions: int,
                                concurrent_stages: int = 2) -> None:
    """Size hash-shuffle/join aggregator actors so that
    ``concurrent_stages`` exchange stages can coexist in ONE streaming
    plan.  Ray's default reserves up to (cluster_CPUs/2)/partition per
    aggregator PER STAGE; a plan with two back-to-back exchanges
    (groupby → keyed repartition, or join → join) then asks for more
    CPU than the cluster has and the actor pool can deadlock on small
    clusters (observed: 8-aggregator stage requesting 12.5 CPUs on a
    4-CPU test cluster, wedged >5 min).  We cap every exchange stage's
    TOTAL reservation at cluster/(2*concurrent_stages), leaving half
    the cluster for map tasks; aggregators are concat/memory-bound so
    under-reserving CPU costs little.  Also pins the groupby
    parallelism to ``num_partitions`` (the default 200 is wrong at
    test scale and is re-derived from cluster CPUs at bench scale)."""
    import ray

    from ray.data.context import ShuffleStrategy
    try:
        ncpus = float(ray.cluster_resources().get("CPU", 4))
    except Exception:
        ncpus = 4.0
    per_part = max(0.01, ncpus / (2 * concurrent_stages) / num_partitions)
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.max_hash_shuffle_aggregators = num_partitions
    ctx.default_hash_shuffle_parallelism = num_partitions
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = per_part
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = \
        per_part
    ctx.join_operator_actor_num_cpus_per_partition_override = per_part


# below this many embedding-matrix bytes the near-dup verify gathers
# from ONE ray.put broadcast matrix inside each bucket (no candidate
# pair materialization, no join chain — one exchange total); above it
# the join-gather chain runs (pairs stay distributed end-to-end)
EMB_BROADCAST_BUDGET_BYTES = 256 * 1024 ** 2


def _near_dup_broadcast(ds, banded, threshold: float,
                        max_bucket: int | None, bits_per_band: int,
                        num_partitions: int | None,
                        return_stats: bool):
    """Bounded-matrix fast path of embedding_near_dup: ONE band
    groupby; each bucket gathers its vectors from the broadcast
    normalized matrix and verifies cosines with a bucket-local matmul,
    emitting only true pairs (plus the shared hot-bucket marker rows).
    Identical output to the join-gather chain."""
    import ray as _ray

    from asserts_otel_processor_ray.stages.topk import (
        collect_df, default_shuffle_blocks)
    if num_partitions is None:
        num_partitions = default_shuffle_blocks()
    tbls = [t for t in _ray.get(
        ds.map_batches(lambda t: t.select(["vec_id", "embedding"]),
                       batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    if not tbls:
        df = pd.DataFrame(_EMPTY_VEC_PAIRS)
        return (df, {"skipped_buckets": 0, "max_skipped_size": 0}) \
            if return_stats else df
    tbl = pa.concat_tables(tbls)
    ids_all = tbl.column("vec_id").to_numpy().astype(np.int64)
    order = np.argsort(ids_all, kind="mergesort")
    ref = _ray.put((ids_all[order], _normalize(_matrix(tbl))[order]))

    def verify_bucket(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(group["vec_id"].to_numpy().astype(np.int64))
        if len(ids) < 2:
            return pd.DataFrame(_EMPTY_VEC_PAIRS)
        if max_bucket is not None and len(ids) > max_bucket:
            bkey = (int(group["band_id"].iloc[0]) << bits_per_band) \
                | int(group["band_hash"].iloc[0])
            return pd.DataFrame({"vec_a": [np.int64(-1 - bkey)],
                                 "vec_b": [np.int64(len(ids))]})
        aids, mat = _ray.get(ref)      # plasma-shared per node
        m = mat[np.searchsorted(aids, ids)]
        sims = m @ m.T
        ii, jj = np.triu_indices(len(ids), k=1)
        hit = sims[ii, jj] >= threshold
        return pd.DataFrame({"vec_a": ids[ii[hit]],
                             "vec_b": ids[jj[hit]]})

    _tune_multi_shuffle_context(banded.context, num_partitions,
                                concurrent_stages=1)
    out = collect_df(banded.groupby(["band_id", "band_hash"]).map_groups(
        verify_bucket, batch_format="pandas"))
    stats = {"skipped_buckets": 0, "max_skipped_size": 0}
    if out.empty:
        df = pd.DataFrame(_EMPTY_VEC_PAIRS)
    else:
        mk = out["vec_a"] < 0
        if mk.any():
            stats = {"skipped_buckets": int(mk.sum()),
                     "max_skipped_size": int(out.loc[mk, "vec_b"].max())}
            import logging
            logging.getLogger(__name__).warning(
                "embedding near-dup LSH: skipped %d hot bucket(s) over "
                "max_bucket=%s (largest: %d vectors)",
                stats["skipped_buckets"], max_bucket,
                stats["max_skipped_size"])
        df = out[~mk]
        df = (pd.DataFrame(_EMPTY_VEC_PAIRS) if df.empty else
              df.drop_duplicates().sort_values(["vec_a", "vec_b"])
              .reset_index(drop=True))
    return (df, stats) if return_stats else df


def embedding_near_dup(ds: "ray.data.Dataset", threshold: float,
                       dim: int, bands: int = 16,
                       bits_per_band: int = 4,
                       max_bucket: int | None = DEFAULT_MAX_BUCKET,
                       num_partitions: int | None = None,
                       return_stats: bool = False,
                       broadcast_budget_bytes: int
                       = EMB_BROADCAST_BUDGET_BYTES):
    """Embedding-cosine near-duplicate pairs, distributed in three
    bounded exchanges — embeddings are NEVER duplicated ×bands:

    1. band expand ships (vec_id, band_id, band_hash) — 20-byte rows —
       through ONE groupby; each bucket emits candidate ID pairs
       (hot buckets capped + logged, marker-row pattern shared with
       dedup.verify_block).
    2. candidate pairs dedup across bands by a hash repartition on the
       pair key + per-block drop_duplicates (a pair colliding in k
       bands must be verified once, not k times).
    3. the deduped pairs gather their two vectors via two native hash
       joins against the (vec_id, embedding) projection, then a
       vectorized float64 cosine filter verifies each pair exactly.

    Defaults: 16 bands × 4 bits (the full 64-bit signature).  Wider
    bands shrink buckets 4× vs the old 8×2 config (bucket ≈ n/16 per
    band) and cut candidate volume ~30% while keeping measured recall
    1.0 at the gate data (tests/test_extra_ops.py pins recall vs
    near_dup_pairs_exact).  Approximate: recall < 1 when a qualifying
    pair collides in NO band — the standard LSH band tradeoff.

    When the whole embedding matrix fits ``broadcast_budget_bytes``
    (n·dim·4), the three-exchange chain collapses to ONE exchange: each
    bucket verifies cosines directly against a ``ray.put`` broadcast of
    the normalized matrix (gather by id + bucket-local matmul), never
    materializing the candidate pair set — a loose threshold like 0.45
    (63°) forces near-quadratic candidate volume out of any banding, so
    skipping pair materialization is worth ~8× wall at bench scale.
    Both paths produce identical pairs (test-pinned)."""
    import ray.data  # noqa: F401

    from asserts_otel_processor_ray.stages.topk import collect_df
    lsh = HyperplaneLSH(dim, nbits=bands * bits_per_band)
    mask = np.uint64((1 << bits_per_band) - 1)

    def band_expand(batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        sig = lsh.signature(m)
        n = batch.num_rows
        ids = batch.column("vec_id").to_numpy().astype(np.int64)
        band_ids = np.repeat(np.arange(bands, dtype=np.int32), n)
        hashes = np.concatenate([
            ((sig >> np.uint64(b * bits_per_band)) & mask).astype(np.int64)
            for b in range(bands)])
        return pa.table({
            "vec_id": pa.array(np.tile(ids, bands), pa.int64()),
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(hashes, pa.int64()),
        })

    banded = ds.map_batches(band_expand, batch_format="pyarrow")
    n_vec = int(ds.count())
    if num_partitions is None:
        from asserts_otel_processor_ray.stages.topk import shuffle_width
        num_partitions = shuffle_width(n_vec * bands)
    if n_vec * dim * 4 <= broadcast_budget_bytes:
        return _near_dup_broadcast(ds, banded, threshold, max_bucket,
                                   bits_per_band, num_partitions,
                                   return_stats)
    cand = banded.groupby(["band_id", "band_hash"]).map_groups(
        lambda g: _near_dup_candidates_bucket(g, max_bucket,
                                              bits_per_band),
        batch_format="pandas")

    def _dedup_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(_EMPTY_VEC_PAIRS)
        return df.drop_duplicates(["vec_a", "vec_b"])

    _tune_multi_shuffle_context(cand.context, num_partitions)
    # materialized once: both the verify-join chain and the marker
    # accounting below consume it (lazy re-execution would re-run the
    # whole band shuffle twice)
    deduped = cand.repartition(num_blocks=num_partitions,
                               keys=["vec_a", "vec_b"]) \
        .map_batches(_dedup_block, batch_format="pandas",
                     batch_size=None).materialize()

    # marker accounting up front: hot-bucket markers (negative vec_a)
    # must not enter the verify joins, and a marker-only result (every
    # bucket over the cap) would hand Ray's join operator zero-row
    # inputs whose empty partitions build ZERO-COLUMN tables inside
    # the aggregator — Acero then rejects the key FieldRef.  Split
    # them out and skip the join chain when no real pairs survive.
    stats = {"skipped_buckets": 0, "max_skipped_size": 0}
    mdf = collect_df(deduped.map_batches(
        lambda d: d[d["vec_a"] < 0], batch_format="pandas"))
    if not mdf.empty:
        stats = {"skipped_buckets": int(len(mdf)),
                 "max_skipped_size": int(mdf["vec_b"].max())}
        import logging
        logging.getLogger(__name__).warning(
            "embedding near-dup LSH: skipped %d hot bucket(s) over "
            "max_bucket=%s (largest: %d vectors)",
            stats["skipped_buckets"], max_bucket,
            stats["max_skipped_size"])
    real = deduped.map_batches(lambda d: d[d["vec_a"] >= 0],
                               batch_format="pandas")
    if real.count() == 0:
        empty_df = pd.DataFrame(_EMPTY_VEC_PAIRS)
        return (empty_df, stats) if return_stats else empty_df

    # Acero hash joins reject list<float> payload columns, so the join
    # side carries the embedding as fixed-size binary (zero-copy pack
    # from the list values; zero-copy unpack in the verify stage)
    def _pack(t: pa.Table) -> pa.Table:
        arr = t.column("embedding")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = arr.values.to_numpy(zero_copy_only=False) \
            .astype(np.float32, copy=False)
        fsb = pa.Array.from_buffers(
            pa.binary(dim * 4), len(arr),
            [None, pa.py_buffer(np.ascontiguousarray(flat).tobytes())])
        return pa.table({"vec_id": t.column("vec_id"), "emb": fsb})

    def _unpack(col) -> np.ndarray:
        arr = (col.combine_chunks()
               if isinstance(col, pa.ChunkedArray) else col)
        data = np.frombuffer(arr.buffers()[1], dtype=np.float32)
        lo = arr.offset * dim
        return data[lo:lo + len(arr) * dim].astype(np.float64) \
            .reshape(-1, dim)

    emb = ds.map_batches(_pack, batch_format="pyarrow")
    _tune_multi_shuffle_context(emb.context, num_partitions)
    _tune_multi_shuffle_context(real.context, num_partitions)
    j1 = real.join(emb, join_type="inner",
                      num_partitions=num_partitions,
                      on=("vec_a",), right_on=("vec_id",))

    def _rename_a(t: pa.Table) -> pa.Table:
        # ray's join drops the right key column; only the payload
        # column needs renaming before the second join
        if "vec_id" in t.schema.names:
            t = t.drop_columns(["vec_id"])
        names = ["emb_a" if c == "emb" else c for c in t.schema.names]
        return t.rename_columns(names)

    j1 = j1.map_batches(_rename_a, batch_format="pyarrow")
    j2 = j1.join(emb, join_type="inner", num_partitions=num_partitions,
                 on=("vec_b",), right_on=("vec_id",))

    def _verify(t: pa.Table) -> pa.Table:
        empty = pa.table({"vec_a": pa.array([], pa.int64()),
                          "vec_b": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        ea = _unpack(t.column("emb_a"))
        eb = _unpack(t.column("emb"))
        cos = np.einsum("ij,ij->i", _normalize(ea), _normalize(eb))
        hit = cos >= threshold
        if not hit.any():
            return empty
        return pa.table({
            "vec_a": pa.array(
                t.column("vec_a").to_numpy()[hit].astype(np.int64),
                pa.int64()),
            "vec_b": pa.array(
                t.column("vec_b").to_numpy()[hit].astype(np.int64),
                pa.int64()),
        })

    df = collect_df(j2.map_batches(_verify, batch_format="pyarrow"))
    if df.empty:
        df = pd.DataFrame(_EMPTY_VEC_PAIRS)
    else:
        df = (df.drop_duplicates().sort_values(["vec_a", "vec_b"])
              .reset_index(drop=True))
    if return_stats:
        return df, stats
    return df


def cluster_medoid_partial(batch: pa.Table,
                           centroids: np.ndarray) -> pa.Table:
    """Per-batch partial for cluster-representative selection (semantic
    dedup / coreset pick): assign each vector to its max-cosine
    centroid (ties → lowest centroid id, numpy argmax first-max) and
    keep, per cluster, the batch's best (max cos, tie → lowest vec_id)
    vector plus the batch's member count.  The driver final merges
    <= nlist rows per block; best_cos rides only between the partial
    and that merge (Ray-computed floats compared with each other) and
    is dropped from the operator's result."""
    ids = batch.column("vec_id").to_numpy()
    if len(ids) == 0:
        return pa.table({"list_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "n_vectors": pa.array([], pa.int64()),
                         "best_cos": pa.array([], pa.float64())})
    m = _normalize(_matrix(batch))
    cos = m @ centroids.T                  # (n, nlist), float64
    lid = cos.argmax(axis=1)
    best = cos[np.arange(len(ids)), lid]
    # per-cluster argmax(best) with vec_id asc tie-break: sort by
    # (lid, -best, vec_id) and keep first per lid
    order = np.lexsort((ids, -best, lid))
    l_s, i_s, b_s = lid[order], ids[order], best[order]
    first = np.r_[True, l_s[1:] != l_s[:-1]]
    counts = np.bincount(lid, minlength=centroids.shape[0])
    return pa.table({
        "list_id": pa.array(l_s[first].astype(np.int64), pa.int64()),
        "vec_id": pa.array(i_s[first], pa.int64()),
        "n_vectors": pa.array(counts[l_s[first]].astype(np.int64),
                              pa.int64()),
        "best_cos": pa.array(b_s[first], pa.float64()),
    })


def cluster_medoids(ds: "ray.data.Dataset", dim: int, nlist: int = 16,
                    seed: int = 1234) -> pd.DataFrame:
    """Cluster-representative table (list_id, vec_id, n_vectors): the
    per-cluster vector most similar to its (seeded — see IVFIndex) unit
    centroid, plus cluster sizes.  One streaming pass of bounded
    per-batch partials; the driver merges <= nlist x blocks rows.  The
    raw best_cos column is dropped from the result (rank-only output
    contract)."""
    from asserts_otel_processor_ray.stages.topk import collect_df
    idx = IVFIndex(dim, nlist=nlist, seed=seed)
    part = ds.map_batches(
        lambda b: cluster_medoid_partial(b, idx.centroids),
        batch_format="pyarrow")
    df = collect_df(part)
    if df.empty:
        return pd.DataFrame({"list_id": pd.Series([], dtype=np.int64),
                             "vec_id": pd.Series([], dtype=np.int64),
                             "n_vectors": pd.Series([], dtype=np.int64)})
    df = df.sort_values(["list_id", "best_cos", "vec_id"],
                        ascending=[True, False, True], kind="mergesort")
    tot = df.groupby("list_id", sort=True)["n_vectors"].sum()
    top = df.drop_duplicates("list_id", keep="first").set_index("list_id")
    out = pd.DataFrame({"list_id": tot.index.to_numpy(np.int64),
                        "vec_id": top.loc[tot.index, "vec_id"]
                        .to_numpy(np.int64),
                        "n_vectors": tot.to_numpy(np.int64)})
    return out.reset_index(drop=True)


def quantize_batch(batch: pa.Table) -> pa.Table:
    """Symmetric int8 quantization stats per embedding (the storage
    step of a vector pipeline): scale = amax/127, q = round(x/scale).
    Emits per-vector integer checksums (sum/min/max of the quantized
    values) instead of the int8 payload so the result is scalar-
    comparable against the SQL mirror; zero vectors quantize to all
    zeros with scale 0."""
    ids = batch.column("vec_id").to_numpy()
    if len(ids) == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "scale": pa.array([], pa.float64()),
                         "qsum": pa.array([], pa.int64()),
                         "qmin": pa.array([], pa.int64()),
                         "qmax": pa.array([], pa.int64())})
    m = _matrix(batch)
    amax = np.abs(m).max(axis=1)
    scale = amax / 127.0
    safe = np.where(scale == 0, 1.0, scale)
    q = np.rint(m / safe[:, None]).astype(np.int64)
    q[scale == 0] = 0
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "scale": pa.array(scale, pa.float64()),
        "qsum": pa.array(q.sum(axis=1), pa.int64()),
        "qmin": pa.array(q.min(axis=1), pa.int64()),
        "qmax": pa.array(q.max(axis=1), pa.int64()),
    })


# ---- product quantization ----------------------------------------------------

PQ_M = 4          # subspaces
PQ_KSUB = 16      # codes per subspace
PQ_SEED = 4242


def pq_centroids(dim: int, m: int = PQ_M, ksub: int = PQ_KSUB,
                 seed: int = PQ_SEED) -> np.ndarray:
    """Seeded per-subspace codebooks, shape (m, ksub, dim//m) — unit
    rows like IVFIndex's seeded centroids.  The same function feeds
    the Ray stage and the oracle's SQL literals; at scale the
    codebooks are swapped for per-subspace ``kmeans_fit`` output
    exactly as IVFIndex swaps in trained centroids."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rng = np.random.default_rng(seed)
    return _normalize(
        rng.standard_normal((m, ksub, dim // m)).reshape(m * ksub, -1)
    ).reshape(m, ksub, dim // m)


class PQCodesStage:
    """Actor-pool stage: codebooks built once per actor in __init__;
    per batch, each vector's m sub-vectors are assigned their
    max-dot-product code (first-max tie-break == the oracle's
    list_position) in one (rows, subdim) @ (subdim, ksub) matmul per
    subspace — no per-row Python."""

    def __init__(self, dim: int, m: int = PQ_M, ksub: int = PQ_KSUB,
                 seed: int = PQ_SEED):
        self.dim, self.m = dim, m
        self.sub = dim // m
        self.books = pq_centroids(dim, m, ksub, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mtx = _matrix(batch).astype(np.float64)
        ids = batch.column("vec_id").to_numpy()
        n = len(ids)
        codes = np.empty((n, self.m), np.int64)
        for s in range(self.m):
            seg = mtx[:, s * self.sub:(s + 1) * self.sub]
            codes[:, s] = (seg @ self.books[s].T).argmax(axis=1)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids.astype(np.int64), self.m),
                               pa.int64()),
            "subspace": pa.array(np.tile(np.arange(self.m, dtype=np.int64),
                                         n), pa.int64()),
            "code": pa.array(codes.ravel(), pa.int64())})
