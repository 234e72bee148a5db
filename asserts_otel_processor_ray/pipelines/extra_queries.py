"""Training-data-pipeline operators as driver queries: dedup (exact /
MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine), similarity
search (brute-force + LSH), text analysis (token stats / quality /
langid / fingerprint), generic stream ops (sessionize / window dedup /
top-K) and the multimodal plumbing.

Every operator has a DuckDB oracle over the driver's pre-registered
views (documents / embeddings / events).  The seeded-signature
operators (MinHash, SimHash, hyperplane LSH, fingerprints) emit their
permutation constants / plane matrices as SQL literals, so even they
are byte-validated rather than rows-only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from asserts_otel_processor_ray.stages import dedup as D
from asserts_otel_processor_ray.stages import events as E
from asserts_otel_processor_ray.stages import similarity as S
from asserts_otel_processor_ray.stages import text_analysis as T
from asserts_otel_processor_ray.stages.topk import (collect_df,
                                                    default_shuffle_blocks,
                                                    shuffle_width,
                                                    use_hash_shuffle)

STOP_SQL = ", ".join(f"'{w}'" for w in T.STOPWORDS)


def _named(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    """Positionally rename collect_df output; robust to the column-less
    empty frame collect_df returns when every block is empty."""
    if len(df.columns) != len(cols):
        if df.empty:
            return pd.DataFrame({c: pd.Series(dtype=object)
                                 for c in cols})
        raise ValueError(
            f"expected {len(cols)} columns {cols}, got {list(df.columns)}")
    df.columns = cols
    return df


def _docs(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


def _events(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/events.parquet")


def _emb(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


# ---- text analysis -------------------------------------------------------

def q_exact_dedup(sf_dir: str) -> pa.Table:
    """Exact dedup: per-batch partial (min doc_id + count per normalized
    text), then a DISTRIBUTED groupby final — distinct-text cardinality
    never lands on the driver (only the query's result table does)."""
    from ray.data.aggregate import Min, Sum
    part = _docs(sf_dir).map_batches(T.exact_dedup_partial,
                                     batch_format="pyarrow")
    agg = part.groupby("text_norm").aggregate(Min("doc_id"),
                                              Sum("dup_count"))
    df = collect_df(agg).rename(columns={"min(doc_id)": "doc_id",
                                         "sum(dup_count)": "dup_count"})
    return pa.Table.from_pandas(
        df[["text_norm", "doc_id", "dup_count"]], preserve_index=False)


def q_token_stats(sf_dir: str) -> pa.Table:
    part = _docs(sf_dir).map_batches(T.token_stats_batch,
                                     batch_format="pyarrow")
    return pa.Table.from_pandas(collect_df(part), preserve_index=False)


def q_quality(sf_dir: str) -> pa.Table:
    part = _docs(sf_dir).map_batches(T.quality_batch,
                                     batch_format="pyarrow")
    return pa.Table.from_pandas(collect_df(part), preserve_index=False)


def q_langid(sf_dir: str) -> pa.Table:
    part = _docs(sf_dir).map_batches(T.langid_batch,
                                     batch_format="pyarrow")
    return pa.Table.from_pandas(collect_df(part), preserve_index=False)


def q_fingerprint(sf_dir: str) -> pa.Table:
    part = _docs(sf_dir).map_batches(T.FingerprintStage,
                                     fn_constructor_args=(3,),
                                     batch_format="pyarrow",
                                     concurrency=(1, 8))
    return pa.Table.from_pandas(collect_df(part), preserve_index=False)


def _doc_token_long(tbl: pa.Table) -> pd.DataFrame:
    """(doc_id, token) long frame, deduped per doc."""
    toks = T._tokens_series(tbl.column("text"))
    ids = tbl.column("doc_id").to_numpy()
    ex = toks.explode()
    df = pd.DataFrame({"doc_id": ids[ex.index.to_numpy()],
                       "token": ex.to_numpy()})
    return df.drop_duplicates()


class _TokenJaccardStage:
    """Actor-pool stage: each batch's docs against the broadcast token
    table of the bounded query subset — intersections via a vectorized
    merge, never a per-pair Python loop."""

    def __init__(self, ref):
        import ray as _ray
        d = _ray.get(ref)
        self.long = d["long"]
        self.sizes = d["sizes"]          # doc_id -> distinct tokens

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(pa.compute.less(batch.column("doc_id"), 150))
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        mine = _doc_token_long(batch)
        m = mine.merge(self.long, on="token")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if m.empty:
            return empty
        inter = (m.groupby(["doc_id_x", "doc_id_y"], sort=False)
                 .size().reset_index(name="inter"))
        sa = inter["doc_id_x"].map(self.sizes).to_numpy()
        sb = inter["doc_id_y"].map(self.sizes).to_numpy()
        union = sa + sb - inter["inter"].to_numpy()
        jac = inter["inter"].to_numpy() / union.astype(np.float64)
        keep = jac >= 0.5
        return pa.table({
            "doc_a": pa.array(inter["doc_id_x"].to_numpy()[keep],
                              pa.int64()),
            "doc_b": pa.array(inter["doc_id_y"].to_numpy()[keep],
                              pa.int64()),
            "jaccard": pa.array(jac[keep], pa.float64()),
        })


def q_token_jaccard(sf_dir: str) -> pa.Table:
    """Exact token-set Jaccard for all doc pairs with doc_id < 150 and
    jaccard ≥ 0.5 (the brute-force baseline the LSH path approximates).
    Distributed: the bounded query subset's token table broadcasts once
    (ray.put) and each batch joins against it vectorized."""
    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    tbl = tbl.filter(pa.compute.less(tbl.column("doc_id"), 150))
    long = _doc_token_long(tbl)
    sizes = long.groupby("doc_id").size()
    ref = ray.put({"long": long, "sizes": sizes})
    part = _docs(sf_dir).map_batches(
        _TokenJaccardStage, fn_constructor_args=(ref,),
        batch_format="pyarrow", concurrency=(1, 4))
    df = collect_df(part)
    if df.empty:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    df = df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def _doc_freq_top_block(df: pd.DataFrame, n: int = 200) -> pd.DataFrame:
    """Per-block top-n partial over globally-unique token rows (exact
    two-phase: after the distributed groupby each token lives in one
    block, so the global top-n is the top-n of per-block top-ns)."""
    df = df.sort_values(["doc_freq", "token"], ascending=[False, True],
                        kind="mergesort")
    return df.head(n)


def q_doc_freq(sf_dir: str) -> pa.Table:
    """Vocabulary document-frequency top-200: per-batch distinct
    (doc, token) partial → DISTRIBUTED groupby(token).sum → two-phase
    top-200 (the driver never holds the O(vocabulary) df table)."""
    from ray.data.aggregate import Sum
    part = _docs(sf_dir).map_batches(T.doc_freq_partial,
                                     batch_format="pyarrow")
    agg = part.groupby("token").aggregate(Sum("partial_df"))
    # empty aggregate blocks can carry a different column count — rename
    # only the real 2-column blocks (same guard as q_quantiles)
    agg = agg.map_batches(
        lambda t: (t.rename_columns(["token", "doc_freq"])
                   if t.num_columns == 2 else t),
        batch_format="pyarrow")
    topped = agg.map_batches(_doc_freq_top_block, batch_format="pandas")
    out = _doc_freq_top_block(collect_df(topped)).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    out["doc_freq"] = out["doc_freq"].astype(np.int64)
    return pa.Table.from_pandas(out[["token", "doc_freq", "rank"]],
                                preserve_index=False)


def q_sample_hash(sf_dir: str) -> pa.Table:
    """Deterministic ~1/8 hash sample of events — a pure vectorized
    per-batch filter (sampling at 100 TB must not shuffle or hold
    state; reproducible at any parallelism)."""
    part = _events(sf_dir).map_batches(E.sample_hash_batch,
                                       batch_format="pyarrow")
    return pa.Table.from_pandas(collect_df(part), preserve_index=False)


def q_asof_join(sf_dir: str) -> pa.Table:
    """As-of join (the custom time-series operator the brief calls
    out): every `purchase` event joined to the latest `view` event with
    view.ts ≤ purchase.ts for the same user.  ONE hash repartition by
    user_id co-locates each user's history; the join itself is a
    per-block vectorized merge_asof — no global sort, no cross-block
    state.  Right-side ts ties resolve to min event_id (deterministic;
    the DuckDB ASOF JOIN oracle sees the same deduped right side)."""
    ds = _events(sf_dir)
    nparts = shuffle_width(ds.count())   # parquet count: metadata-only
    use_hash_shuffle(ds, nparts)
    parted = ds.repartition(num_blocks=nparts, keys=["user_id"])
    out = parted.map_batches(E.asof_join_block, batch_format="pyarrow",
                             batch_size=None)
    df = collect_df(out)
    return pa.Table.from_pandas(df.sort_values("event_id")
                                .reset_index(drop=True),
                                preserve_index=False)


def q_quantiles(sf_dir: str) -> pa.Table:
    """Exact per-event_type discrete quantiles of `value` via the
    value-count-histogram reduction: per-batch count partials → ONE
    distributed groupby-sum (|distinct values| rows) → tiny per-group
    final.  No global sort, no full-column materialization."""
    from ray.data.aggregate import Sum
    part = _events(sf_dir).map_batches(E.value_count_partial,
                                       batch_format="pyarrow")
    agg = part.groupby(["event_type", "value"]).aggregate(
        Sum("partial_n"))
    agg = agg.map_batches(
        lambda t: (t.rename_columns(["event_type", "value", "n"])
                   if t.num_columns == 3 else t),
        batch_format="pyarrow")
    out = agg.groupby("event_type").map_groups(E.quantiles_from_counts,
                                               batch_format="pandas")
    df = collect_df(out).sort_values("event_type").reset_index(drop=True)
    df["n_events"] = df["n_events"].astype(np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


# ---- near-dup (signature/hash operators) ---------------------------------

def q_ngram_jaccard(sf_dir: str) -> pa.Table:
    """Char-5-gram Jaccard near-dup pairs over the FULL corpus via the
    distributed inverted-index shuffle (hash repartition by gram,
    block-local posting lists, groupby-sum pair counts); hot grams are
    df-capped and logged, mirrored exactly by the SQL oracle."""
    pairs = D.ngram_jaccard_distributed(_docs(sf_dir))
    return pa.Table.from_pandas(pairs, preserve_index=False)


# above this many near-dup pairs the driver union-find gives way to
# the distributed hash-to-min connected components (boilerplate-heavy
# web corpora can make |pairs| large even though it is bounded by true
# near-dups)
DEDUP_PAIR_BUDGET = 5_000_000


def dedup_clusters(docs, pair_budget: int = DEDUP_PAIR_BUDGET
                   ) -> pa.Table:
    """End-to-end dedup: near-dup pairs (the distributed MinHash-LSH
    band-groupby pipeline with exact Jaccard verify) → connected
    components → (doc_id, cluster_id=min doc of the component); dedup =
    keep each cluster's min doc.  Up to ``pair_budget`` pairs the
    union-find runs on the collected pair set; beyond it the pairs stay
    distributed and D.connected_components_distributed (hash-to-min
    label propagation with pointer jumping) produces the identical
    labeling — the driver then only ever holds the final (doc, cluster)
    answer, never the pair set."""
    pairs_ds = D.minhash_pairs_distributed(
        docs, threshold=0.5, collect=False).materialize()
    if int(pairs_ds.count()) > pair_budget:
        cc = D.connected_components_distributed(pairs_ds)
        cc = cc.sort_values("node", ignore_index=True)
        return pa.table({
            "doc_id": pa.array(cc["node"].to_numpy(), pa.int64()),
            "cluster_id": pa.array(cc["label"].to_numpy(), pa.int64()),
        })
    pairs = collect_df(pairs_ds)
    if pairs.empty:
        pairs = pd.DataFrame(D._EMPTY_PAIRS)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:      # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)   # root = component min
    nodes = sorted(set(pairs["doc_a"]) | set(pairs["doc_b"]))
    return pa.table({
        "doc_id": pa.array([int(n) for n in nodes], pa.int64()),
        "cluster_id": pa.array([find(int(n)) for n in nodes], pa.int64()),
    })


def q_dedup_clusters(sf_dir: str) -> pa.Table:
    return dedup_clusters(_docs(sf_dir))


class _TfidfStage:
    """Actor-pool stage: per-doc top-3 tokens by tf·(N/df) against the
    broadcast vocabulary df slice (ONLY tokens with df >= TFIDF_MIN_DF
    are shipped; a token absent from the slice has df == 1 by
    construction, so the reconstruction is exact — the min-df filter
    bounds the driver/broadcast without approximating)."""

    def __init__(self, ref):
        import ray as _ray
        d = _ray.get(ref)
        self.df_map = d["df"]
        self.n_docs = d["n_docs"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy()
        toks = T._tokens_series(batch.column("text"))
        ex = toks.explode()
        tf = (pd.DataFrame({"d": ex.index.to_numpy(),
                            "t": ex.to_numpy()})
              .groupby(["d", "t"], sort=False).size()
              .reset_index(name="tf"))
        dfv = (tf["t"].map(self.df_map).fillna(1)  # missing ⇒ df == 1
               .to_numpy().astype(np.int64))
        score = ((tf["tf"].to_numpy().astype(np.int64) * self.n_docs)
                 .astype(np.float64) / dfv.astype(np.float64))
        tf["doc_freq"] = dfv
        tf["score"] = score
        tf = tf.sort_values(["d", "score", "t"],
                            ascending=[True, False, True],
                            kind="mergesort")
        rank = tf.groupby("d", sort=False).cumcount() + 1
        keep = tf[rank <= 3].assign(rank=rank[rank <= 3])
        return pa.table({
            "doc_id": pa.array(doc_id[keep["d"].to_numpy()], pa.int64()),
            "token": pa.array(keep["t"].to_numpy(), pa.string()),
            "tf": pa.array(keep["tf"].to_numpy().astype(np.int64),
                           pa.int64()),
            "doc_freq": pa.array(keep["doc_freq"].to_numpy(), pa.int64()),
            "rank": pa.array(keep["rank"].to_numpy().astype(np.int64),
                             pa.int64()),
        })


# broadcast-path bounds: only tokens with df >= TFIDF_MIN_DF ship to
# the driver/actors (df==1 is reconstructed exactly — see _TfidfStage),
# and if even that slice exceeds the budget the query switches to the
# fully distributed token-join path (no driver-held vocabulary at all).
TFIDF_MIN_DF = 2
TFIDF_BROADCAST_BUDGET = 2_000_000


def _tfidf_top_block(df: pd.DataFrame, n_docs: int) -> pd.DataFrame:
    """Per-block top-3 kernel over (doc_id, token, tf, doc_freq) rows —
    block-local because the rows were hash-repartitioned by doc_id."""
    cols = ["doc_id", "token", "tf", "doc_freq", "rank"]
    if df.empty:
        return pd.DataFrame({
            "doc_id": pd.Series(dtype=np.int64),
            "token": pd.Series(dtype=object),
            "tf": pd.Series(dtype=np.int64),
            "doc_freq": pd.Series(dtype=np.int64),
            "rank": pd.Series(dtype=np.int64)})
    score = (df["tf"].to_numpy().astype(np.int64) * n_docs).astype(
        np.float64) / df["doc_freq"].to_numpy().astype(np.float64)
    d = df.assign(score=score).sort_values(
        ["doc_id", "score", "token"], ascending=[True, False, True],
        kind="mergesort")
    rank = d.groupby("doc_id", sort=False).cumcount() + 1
    keep = d[rank <= 3].assign(rank=rank[rank <= 3])
    return keep[cols].reset_index(drop=True)


def _tfidf_join_path(docs, dfds, n_docs: int) -> pa.Table:
    """Fully distributed tf-idf: (doc, token, tf) long rows join the
    vocabulary df table by token (both sides shuffle — NO driver- or
    broadcast-held vocabulary), then ONE hash repartition by doc_id and
    a per-block top-3 kernel.  The scale path beyond
    TFIDF_BROADCAST_BUDGET; identical output to the broadcast path."""
    # token long rows ~ docs x avg tokens; the x32 multiplier only has
    # to be the right order of magnitude for the width clamp
    nparts = shuffle_width(docs.count() * 32)
    long = docs.map_batches(T.tf_long_batch, batch_format="pyarrow")
    use_hash_shuffle(long, nparts)
    joined = long.join(dfds, join_type="inner", num_partitions=nparts,
                       on=("token",))
    parted = joined.repartition(num_blocks=nparts, keys=["doc_id"])
    out = parted.map_batches(lambda d: _tfidf_top_block(d, n_docs),
                             batch_format="pandas", batch_size=None)
    return pa.Table.from_pandas(collect_df(out), preserve_index=False)


def tfidf_top(docs, broadcast_budget: int = TFIDF_BROADCAST_BUDGET
              ) -> pa.Table:
    """Per-doc top-3 tokens by tf·(N/df) — a multiplicative-idf tf-idf
    (no transcendental log, so the SQL oracle is IEEE-exact).  The df
    table comes from the same distributed vocabulary aggregate as
    d_doc_freq; the driver/broadcast holds at most ``broadcast_budget``
    rows of it (min-df filtered, df==1 reconstructed), else the fully
    distributed join path runs.  Output is integer/rank-only (ties →
    token asc)."""
    from ray.data.aggregate import Sum
    part = docs.map_batches(T.doc_freq_partial, batch_format="pyarrow")
    agg = part.groupby("token").aggregate(Sum("partial_df")).map_batches(
        lambda t: (t.rename_columns(["token", "doc_freq"])
                   if t.num_columns == 2 else t),
        batch_format="pyarrow").materialize()
    n_docs = int(docs.count())
    kept = agg.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(
            t.column("doc_freq"), TFIDF_MIN_DF)),
        batch_format="pyarrow")
    if int(kept.count()) > broadcast_budget:
        return _tfidf_join_path(docs, agg, n_docs)
    dfd = collect_df(kept)
    assert len(dfd) <= broadcast_budget  # the driver-held-rows pin
    df_map = (dfd.set_index("token")["doc_freq"] if not dfd.empty
              else pd.Series(dtype=np.int64))  # all-hapax corpus
    ref = ray.put({"df": df_map, "n_docs": n_docs})
    out = docs.map_batches(_TfidfStage, fn_constructor_args=(ref,),
                           batch_format="pyarrow",
                           concurrency=(1, 4))
    return pa.Table.from_pandas(collect_df(out), preserve_index=False)


def q_tfidf_top(sf_dir: str) -> pa.Table:
    return tfidf_top(_docs(sf_dir))


def q_minhash_pairs(sf_dir: str) -> pa.Table:
    """MinHash+LSH near-dup pairs via the distributed
    band-groupby-verify pipeline (no whole-corpus driver structure);
    hot buckets are skipped by the DEFAULT_MAX_BUCKET guard (and the
    generated SQL oracle applies the same cap)."""
    verified = D.minhash_pairs_distributed(_docs(sf_dir), threshold=0.5)
    return pa.Table.from_pandas(verified, preserve_index=False)


def q_simhash(sf_dir: str) -> pa.Table:
    part = _docs(sf_dir).map_batches(D.simhash_batch,
                                     batch_format="pyarrow")
    return pa.Table.from_pandas(collect_df(part), preserve_index=False)


def q_simhash_pairs(sf_dir: str) -> pa.Table:
    """SimHash near-dup pairs via the distributed chunk-band groupby."""
    pairs = D.simhash_pairs_distributed(_docs(sf_dir), max_hamming=3)
    return pa.Table.from_pandas(pairs, preserve_index=False)


def q_embedding_near_dup(sf_dir: str) -> pa.Table:
    """Embedding-cosine near-dup pairs via the DISTRIBUTED banded-LSH
    groupby path (primary at scale; near_dup_pairs_exact is the
    test-only exact oracle of its recall)."""
    ds = _emb(sf_dir)
    dim = len(ds.take(1)[0]["embedding"])
    pairs = S.embedding_near_dup(ds, threshold=0.45, dim=dim)
    return pa.Table.from_pandas(pairs, preserve_index=False)


def q_lsh_buckets(sf_dir: str) -> pa.Table:
    """Scale path for near-dup/ANN: hyperplane-LSH bucket histogram
    (buckets are deterministic given the seeded planes, which the SQL
    oracle embeds as literals).  The count is a distributed Ray
    groupby."""
    ds = _emb(sf_dir)
    dim = len(ds.take(1)[0]["embedding"])
    sig = ds.map_batches(S.HyperplaneLSH(dim), batch_format="pyarrow")
    df = collect_df(sig.groupby("bucket").count())
    out = (df.rename(columns={"count()": "n_vectors"})
           .sort_values("bucket").reset_index(drop=True))
    return pa.Table.from_pandas(out[["bucket", "n_vectors"]],
                                preserve_index=False)


# ---- similarity search ---------------------------------------------------

def q_ann_topk(sf_dir: str) -> pa.Table:
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qmask = pa.compute.less(tbl.column("vec_id"), 10)
    qt = tbl.filter(qmask)
    qids = qt.column("vec_id").to_numpy()
    qm = S._matrix(qt)
    df = S.ann_topk(_emb(sf_dir), qm, qids, k=5,
                    exclude_ids=frozenset(int(i) for i in qids))
    return pa.Table.from_pandas(df, preserve_index=False)


def q_ann_lsh(sf_dir: str) -> pa.Table:
    """ANN top-k via banded hyperplane-LSH candidate pruning (the scale
    path of e_ann_topk; approximate vs the EXACT top-k by construction
    — recall pinned by tests/test_extra_ops.py — but deterministic
    given the seeded planes, so the generated SQL oracle reproduces it
    exactly)."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qmask = pa.compute.less(tbl.column("vec_id"), 10)
    qt = tbl.filter(qmask)
    qids = qt.column("vec_id").to_numpy()
    dim = len(qt.column("embedding")[0])
    df = S.ann_topk_lsh(_emb(sf_dir), S._matrix(qt), qids, k=5, dim=dim,
                        exclude_ids=frozenset(int(i) for i in qids))
    return pa.Table.from_pandas(df, preserve_index=False)


def q_ann_ivf(sf_dir: str) -> pa.Table:
    """ANN top-k via a seeded-centroid IVF index (the second scale path
    next to e_ann_lsh; approximate vs the EXACT top-k by construction —
    recall pinned by tests/test_extra_ops.py — but deterministic given
    the seeded centroids, so the generated SQL oracle reproduces it
    exactly).  Production path swaps in kmeans_fit centroids."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qmask = pa.compute.less(tbl.column("vec_id"), 10)
    qt = tbl.filter(qmask)
    qids = qt.column("vec_id").to_numpy()
    dim = len(qt.column("embedding")[0])
    df = S.ann_topk_ivf(_emb(sf_dir), S._matrix(qt), qids, k=5, dim=dim,
                        exclude_ids=frozenset(int(i) for i in qids))
    return pa.Table.from_pandas(df, preserve_index=False)


def q_ann_ivf_indexed(sf_dir: str) -> pa.Table:
    """ANN top-k over the IVF LAYOUT: ``ivf_build`` writes vectors as
    hive-partitioned parquet (one ``list_id=<n>/`` directory per list,
    scratch under /tmp) and the query reads ONLY the probed lists'
    directories — unprobed lists never leave storage.  Same seeded
    centroids and probing as e_ann_ivf, so the result (and its oracle)
    is identical; the two entries together pin that partition-pruned
    reads lose nothing."""
    import tempfile
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qmask = pa.compute.less(tbl.column("vec_id"), 10)
    qt = tbl.filter(qmask)
    qids = qt.column("vec_id").to_numpy()
    dim = len(qt.column("embedding")[0])
    with tempfile.TemporaryDirectory(prefix="ivf_idx_") as td:
        S.ivf_build(_emb(sf_dir), dim, td + "/idx")
        df = S.ann_topk_ivf(None, S._matrix(qt), qids, k=5, dim=dim,
                            exclude_ids=frozenset(int(i) for i in qids),
                            index_path=td + "/idx")
    return pa.Table.from_pandas(df, preserve_index=False)


class _KnnLabelStage:
    def __init__(self, train_ref):
        import ray as _ray
        train = _ray.get(train_ref)
        self.m = S._normalize(train["m"])
        self.labels = train["labels"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        keep = ids >= 100
        ids = ids[keep]
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "pred_label": pa.array([], pa.int32())})
        m = S._normalize(S._matrix(batch)[keep])
        sims = m @ self.m.T
        best = sims.argmax(axis=1)   # first max = smallest train id
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "pred_label": pa.array(self.labels[best], pa.int32()),
        })


def q_knn_label(sf_dir: str) -> pa.Table:
    import ray as _ray
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    tr = tbl.filter(pa.compute.less(tbl.column("vec_id"), 100))
    tr = tr.sort_by("vec_id")
    train_ref = _ray.put({"m": S._matrix(tr),
                          "labels": tr.column("label").to_numpy()})
    part = _emb(sf_dir).map_batches(
        _KnnLabelStage, fn_constructor_args=(train_ref,),
        batch_format="pyarrow", concurrency=(1, 4))
    return pa.Table.from_pandas(collect_df(part), preserve_index=False)


# ---- generic stream ops --------------------------------------------------

def q_sessionize(sf_dir: str) -> pa.Table:
    ds = _events(sf_dir)
    nparts = shuffle_width(ds.count())   # parquet count: metadata-only
    use_hash_shuffle(ds, nparts)
    parted = ds.repartition(num_blocks=nparts, keys=["user_id"])
    out = parted.map_batches(E.sessionize_batch, batch_format="pyarrow",
                             batch_size=None)
    return pa.Table.from_pandas(collect_df(out), preserve_index=False)


def q_window_dedup(sf_dir: str) -> pa.Table:
    """First event per (user, 5-min bucket): per-batch partial idxmin,
    then a DISTRIBUTED groupby-min final (the driver only receives the
    result table, not O(users × buckets) partials)."""
    from ray.data.aggregate import Min
    part = _events(sf_dir).map_batches(E.window_dedup_partial,
                                       batch_format="pyarrow")
    agg = part.groupby(["user_id", "bucket"]).aggregate(Min("pick"))
    out = collect_df(agg).rename(columns={"min(pick)": "pick"})
    out["event_id"] = out["pick"].str.slice(21).astype(np.int64)
    out = out[["user_id", "bucket", "event_id"]]
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


def _topk_users_block_partial(df: pd.DataFrame) -> pd.DataFrame:
    """Per-block top-10 per event_type over globally-unique
    (event_type, user_id) count rows — exact two-phase top-K (each pair
    appears in exactly one block after the distributed groupby, so the
    global top-10 is the top-10 of the per-block top-10s)."""
    df = df.sort_values(["event_type", "n_events", "user_id"],
                        ascending=[True, False, True], kind="mergesort")
    rank = df.groupby("event_type", sort=False).cumcount()
    return df[rank < 10]


def q_topk_users(sf_dir: str) -> pa.Table:
    """Top-10 users per event type: per-batch count partial →
    DISTRIBUTED groupby-sum final → per-block top-10 partial → bounded
    driver final (the driver never holds O(distinct users) rows)."""
    from ray.data.aggregate import Sum
    part = _events(sf_dir).map_batches(E.count_topk_partial,
                                       batch_format="pyarrow")
    agg = part.groupby(["event_type", "user_id"]).aggregate(
        Sum("partial_count"))
    agg = agg.map_batches(
        lambda t: t.rename_columns(["event_type", "user_id", "n_events"]),
        batch_format="pyarrow")
    topped = agg.map_batches(_topk_users_block_partial,
                             batch_format="pandas")
    out = _topk_users_block_partial(collect_df(topped))
    out = out.reset_index(drop=True)
    out["rank"] = out.groupby("event_type", sort=False).cumcount() + 1
    out["n_events"] = out["n_events"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


# ---- multimodal ----------------------------------------------------------

def q_media_features(sf_dir: str) -> pa.Table:
    from asserts_otel_processor_ray.stages.multimodal import (
        MediaFeatureStage, documents_as_media)
    media = _docs(sf_dir).map_batches(documents_as_media,
                                      batch_format="pyarrow")
    feats = media.map_batches(MediaFeatureStage, batch_size=64,
                              concurrency=(1, 4), batch_format="pyarrow")
    out = feats.map_batches(
        lambda t: t.select(["media_id", "media_type", "n_bytes",
                            "payload_sha8"]),
        batch_format="pyarrow")
    return pa.Table.from_pandas(collect_df(out), preserve_index=False)


def _nation_rollup_partial(nmap_names: np.ndarray):
    """Per-batch partial for the joined orders×customer stream: attach
    the nation name via the broadcast 25-row dimension (a numpy gather,
    not a shuffle) and pre-aggregate count/max per nation."""
    def part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"n_name": pa.array([], pa.string()),
                             "partial_n": pa.array([], pa.int64()),
                             "partial_max": pa.array([], pa.float64())})
        nk = batch.column("c_nationkey").to_numpy().astype(np.int64)
        df = pd.DataFrame({
            "n_name": nmap_names[nk],
            "p": batch.column("o_totalprice").to_numpy()})
        g = df.groupby("n_name", sort=False)["p"].agg(["size", "max"])
        g = g.reset_index()
        return pa.table({
            "n_name": pa.array(g["n_name"].to_numpy(), pa.string()),
            "partial_n": pa.array(g["size"].to_numpy().astype(np.int64),
                                  pa.int64()),
            "partial_max": pa.array(g["max"].to_numpy(), pa.float64()),
        })
    return part


def q_nation_orders(sf_dir: str) -> pa.Table:
    """Big-big distributed hash join + broadcast dim + rollup over the
    TPC-H-ish tables: orders ⋈ customer on custkey via Ray Data's
    native hash join (both sides shuffle by key — the one shape the
    log pipeline itself never needs), nation attached from a broadcast
    25-row dimension, then per-batch partials → distributed
    groupby(n_name) count/max.  Max (not sum) keeps the float
    aggregate order-independent and oracle-exact."""
    from ray.data.aggregate import Max, Sum
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_nationkey"])
    nparts = shuffle_width(orders.count())  # metadata-only count
    use_hash_shuffle(orders, nparts)
    joined = orders.join(cust, join_type="inner", num_partitions=nparts,
                         on=("o_custkey",), right_on=("c_custkey",))
    nt = pq.read_table(f"{sf_dir}/nation.parquet",
                       columns=["n_nationkey", "n_name"])
    nmap_names = np.empty(
        int(pa.compute.max(nt.column("n_nationkey")).as_py()) + 1,
        dtype=object)
    nmap_names[nt.column("n_nationkey").to_numpy()] = \
        nt.column("n_name").to_numpy(zero_copy_only=False)
    part = joined.map_batches(_nation_rollup_partial(nmap_names),
                              batch_format="pyarrow")
    agg = part.groupby("n_name").aggregate(Sum("partial_n"),
                                           Max("partial_max"))
    df = collect_df(agg)
    df.columns = ["n_name", "n_orders", "max_totalprice"]
    df["n_orders"] = df["n_orders"].astype(np.int64)
    return pa.Table.from_pandas(df.sort_values("n_name")
                                .reset_index(drop=True),
                                preserve_index=False)


def q_bpe_tokens(sf_dir: str) -> pa.Table:
    """BPE-ish regex token counts per doc (the brief's 'whitespace + a
    BPE-ish regex' token counting; whitespace counts live in
    d_token_stats).  Pure vectorized RE2 count per batch."""
    part = _docs(sf_dir).map_batches(T.bpe_token_count_batch,
                                     batch_format="pyarrow")
    return pa.Table.from_pandas(collect_df(part), preserve_index=False)


def q_resize(sf_dir: str) -> pa.Table:
    """Image resize plumbing: fit-into-256-box with integer aspect
    math through an actor-pool stage (decode stubbed as documented)."""
    from asserts_otel_processor_ray.stages.multimodal import (
        ResizeStage, documents_as_media)
    media = _docs(sf_dir).map_batches(documents_as_media,
                                      batch_format="pyarrow")
    out = media.map_batches(ResizeStage, batch_size=64,
                            concurrency=(1, 4), batch_format="pyarrow")
    return pa.Table.from_pandas(collect_df(out), preserve_index=False)


def q_frame_sample(sf_dir: str) -> pa.Table:
    """Video frame-sampling plumbing: one media row → k evenly-spaced
    frame rows through an actor-pool explode stage (decode is the
    documented deterministic stub; the Ray-side layout is real)."""
    from asserts_otel_processor_ray.stages.multimodal import (
        FrameSampleStage, documents_as_media)
    media = _docs(sf_dir).map_batches(documents_as_media,
                                      batch_format="pyarrow")
    frames = media.map_batches(FrameSampleStage, batch_size=64,
                               concurrency=(1, 4),
                               batch_format="pyarrow")
    return pa.Table.from_pandas(collect_df(frames), preserve_index=False)


# ---- round-5 additions: decontamination, repetition filter, per-source
# ---- caps, rolling windows, cluster medoids, pricing rollup ------------

def _collect_table(ds: "ray.data.Dataset") -> pa.Table:
    """Like collect_df but schema-preserving for EMPTY results (a typed
    0-row table instead of a columnless DataFrame)."""
    import ray as _ray
    tables = _ray.get(ds.to_arrow_refs())
    tables = [t for t in tables if t.num_rows > 0] or tables[:1]
    return pa.concat_tables(tables) if tables else pa.table({})


def q_repetition(sf_dir: str) -> pa.Table:
    """Duplicate-bigram repetition ratio per document (boilerplate
    filter) — one streaming map_batches pass, no shuffle."""
    part = _docs(sf_dir).map_batches(T.RepetitionStage,
                                     fn_constructor_args=(2,),
                                     batch_format="pyarrow",
                                     concurrency=(1, 8))
    return pa.Table.from_pandas(collect_df(part), preserve_index=False)


DECONTAM_BROADCAST_BUDGET = 50_000_000   # benchmark grams the driver
# may hold/broadcast — eval sets are small by construction; a corpus
# whose "benchmark" exceeds this needs the distributed-join variant
# (same shape as tfidf's join path), not a bigger broadcast.


def _bench_grams_ref(docs: "ray.data.Dataset", w: int, mod: int):
    """Collect the benchmark slice's distinct gram hashes and ray.put
    them (the shared setup of q_decontaminate and q_curation).  The
    budget is enforced on the DISTRIBUTED partial-row count (an upper
    bound on the distinct grams) BEFORE anything lands on the driver —
    materialize() keeps the partials in the object store so the count
    does not re-tokenize."""
    import ray as _ray
    bench = docs.map_batches(
        lambda b: T.bench_grams_partial(b, w, mod),
        batch_format="pyarrow").materialize()
    n_partial = int(bench.count())
    if n_partial > DECONTAM_BROADCAST_BUDGET:
        raise ValueError(
            f"benchmark gram partials ({n_partial}) exceed the "
            "broadcast budget — use a distributed gram join for this "
            "corpus")
    gdf = collect_df(bench)
    g = (np.unique(gdf["gram"].to_numpy().astype(np.uint64))
         if len(gdf) else np.array([], np.uint64))
    return _ray.put(g)


def q_decontaminate(sf_dir: str, w: int = 3, mod: int = 97) -> pa.Table:
    """Benchmark decontamination: flag corpus docs sharing >= 1
    distinct w-token shingle with the benchmark slice
    (doc_id % mod == 0).  Benchmark grams are collected once (bounded
    by DECONTAM_BROADCAST_BUDGET) and broadcast via ray.put; the
    corpus pass is a stateless actor-pool membership test — documents
    never shuffle."""
    docs = _docs(sf_dir)
    ref = _bench_grams_ref(docs, w, mod)
    out = docs.map_batches(T.DecontaminateStage,
                           fn_constructor_args=(ref, w, mod),
                           batch_format="pyarrow", concurrency=(1, 8))
    return _collect_table(out)


SOURCE_CAP_K = 10


def _source_cap_block(df: pd.DataFrame, k: int) -> pd.DataFrame:
    df = df.sort_values(["source", "doc_id"], kind="mergesort")
    return df[df.groupby("source", sort=False).cumcount() < k]


def q_source_cap(sf_dir: str, k: int = SOURCE_CAP_K) -> pa.Table:
    """Per-source document cap (the per-domain cap of web-corpus
    curation): keep the k lowest doc_ids per source.  Two-phase exact
    top-K — per-batch partial (<= k x sources rows per block) then ONE
    hash repartition by source + per-block final, so the full corpus
    never shuffles and the driver never holds more than the result."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)
    part = ds.map_batches(lambda df: _source_cap_block(df, k),
                          batch_format="pandas")
    parted = part.repartition(num_blocks=nparts, keys=["source"])

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        df = _source_cap_block(df, k).reset_index(drop=True)
        df["rank"] = df.groupby("source", sort=False).cumcount() + 1
        return df

    out = parted.map_batches(_final, batch_format="pandas",
                             batch_size=None)
    return pa.Table.from_pandas(collect_df(out), preserve_index=False)


def q_rolling_count(sf_dir: str, window_s: float = 1800.0) -> pa.Table:
    """Event-time rolling window count per user (RANGE frame): ONE
    hash repartition by user_id + a vectorized two-searchsorted block
    kernel; the count is an integer, so the result is bitwise-stable
    under any block layout."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id"])
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)
    parted = ds.repartition(num_blocks=nparts, keys=["user_id"])
    out = parted.map_batches(
        lambda b: E.rolling_count_block(b, window_s),
        batch_format="pyarrow", batch_size=None)
    return pa.Table.from_pandas(collect_df(out), preserve_index=False)


def q_cluster_medoid(sf_dir: str) -> pa.Table:
    """Semantic-dedup representative per embedding cluster: the
    max-cosine vector to each seeded unit centroid (IVFIndex seed
    1234) plus cluster sizes — per-batch bounded partials, <= nlist
    rows per block to the driver."""
    out = S.cluster_medoids(_emb(sf_dir), dim=_EMB_DIM, nlist=16,
                            seed=1234)
    return pa.Table.from_pandas(out, preserve_index=False)


_PRICING_CUTOFF_US = int(pd.Timestamp("1998-09-02").value // 1000)


def _pricing_partial(batch: pa.Table) -> pa.Table:
    """TPC-H Q1-style pricing partial with EXACT integer arithmetic:
    money columns are 2-decimal by construction, so sums run in
    integer cents (disc_price at 1e4 scale, charge at 1e6) — the
    latency_sum trick — making every aggregate order-independent and
    bitwise-reproducible.  Per-row magnitude <= ~1e11, so per-block
    int64 sums are safe; the driver merges them as Python ints
    (arbitrary precision) before the single final division."""
    ship = batch.column("l_shipdate").cast(pa.int64()).to_numpy()
    keep = ship <= _PRICING_CUTOFF_US
    qty = np.rint(batch.column("l_quantity").to_numpy()[keep]) \
        .astype(np.int64)
    pc_ = np.rint(batch.column("l_extendedprice").to_numpy()[keep]
                  * 100).astype(np.int64)
    dc = np.rint(batch.column("l_discount").to_numpy()[keep]
                 * 100).astype(np.int64)
    tc = np.rint(batch.column("l_tax").to_numpy()[keep] * 100) \
        .astype(np.int64)
    df = pd.DataFrame({
        "l_returnflag": batch.column("l_returnflag").to_numpy(
            zero_copy_only=False)[keep],
        "l_linestatus": batch.column("l_linestatus").to_numpy(
            zero_copy_only=False)[keep],
        "sq": qty, "spc": pc_, "sdc": dc,
        "sdpu": pc_ * (100 - dc),
        "schu": pc_ * (100 - dc) * (100 + tc),
        "n": np.ones(len(qty), np.int64),
    })
    out = df.groupby(["l_returnflag", "l_linestatus"], sort=False) \
        .sum().reset_index()
    return pa.Table.from_pandas(out, preserve_index=False)


def q_pricing(sf_dir: str) -> pa.Table:
    """TPC-H Q1 pricing summary analog over lineitem: per-batch exact
    integer partials -> tiny driver merge (Python-int sums -> one
    division per aggregate)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_shipdate",
                 "l_quantity", "l_extendedprice", "l_discount",
                 "l_tax"])
    part = ds.map_batches(_pricing_partial, batch_format="pyarrow")
    df = collect_df(part)
    for c in ("sq", "spc", "sdc", "sdpu", "schu", "n"):
        df[c] = df[c].astype(object)        # python ints: no overflow
    m = df.groupby(["l_returnflag", "l_linestatus"], sort=True) \
        .sum().reset_index()
    n = m["n"].astype(np.int64)
    out = pd.DataFrame({
        "l_returnflag": m["l_returnflag"],
        "l_linestatus": m["l_linestatus"],
        "sum_qty": m["sq"].astype(np.int64),
        "sum_base_price": np.array(
            [float(v) for v in m["spc"]]) / 100.0,
        "sum_disc_price": np.array(
            [float(v) for v in m["sdpu"]]) / 10000.0,
        "sum_charge": np.array(
            [float(v) for v in m["schu"]]) / 1000000.0,
        "avg_qty": np.array([float(v) for v in m["sq"]])
        / n.to_numpy(np.float64),
        "avg_price": (np.array([float(v) for v in m["spc"]]) / 100.0)
        / n.to_numpy(np.float64),
        "avg_disc": (np.array([float(v) for v in m["sdc"]]) / 100.0)
        / n.to_numpy(np.float64),
        "count_order": n,
    })
    return pa.Table.from_pandas(out, preserve_index=False)


STRAT_SAMPLE_K = 3


def _strat_partial(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """Per-batch stratified-sample partial: k lowest (md5(doc_id),
    doc_id) per language — the same deterministic token hash as the
    fingerprint family, so the oracle mirrors it as a literal
    expression."""
    h = T.token_hashes(df["doc_id"].astype(np.int64).astype(str))
    df = df.assign(h=h.astype(np.uint64))
    df = df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
    return df[df.groupby("lang", sort=False).cumcount() < k]


def q_stratified_sample(sf_dir: str, k: int = STRAT_SAMPLE_K) -> pa.Table:
    """Deterministic stratified sampling: the k hash-lowest documents
    per language — per-batch partial (<= k x langs rows per block),
    one hash repartition by lang, per-block final.  The corpus never
    shuffles and the sample is stable under any blocking."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"])
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)
    part = ds.map_batches(lambda df: _strat_partial(df, k),
                          batch_format="pandas")
    parted = part.repartition(num_blocks=nparts, keys=["lang"])

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        df = df[df.groupby("lang", sort=False).cumcount() < k] \
            .reset_index(drop=True)
        df["sample_rank"] = df.groupby("lang", sort=False).cumcount() + 1
        return df[["doc_id", "lang", "sample_rank"]]

    out = parted.map_batches(_final, batch_format="pandas",
                             batch_size=None)
    return pa.Table.from_pandas(collect_df(out), preserve_index=False)


PACK_SEQ_TOKENS = 2048          # training-sequence token budget
PACK_BUCKET_DOCS = 4096         # doc_ids per prefix-sum bucket


def _pack_tokens_batch(batch: pa.Table,
                       bucket_docs: int) -> pa.Table:
    """(doc_id, bucket, n_tokens) slim rows (whitespace token count,
    the d_token_stats definition)."""
    import pyarrow.compute as pc
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(batch.column("text")), r"\s+")
    ids = batch.column("doc_id").to_numpy()
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "bucket": pa.array(ids // bucket_docs, pa.int64()),
        "n_tokens": pc.list_value_length(toks).cast(pa.int64()),
    })


def q_pack_offsets(sf_dir: str, budget: int = PACK_SEQ_TOKENS,
                   bucket_docs: int | None = None) -> pa.Table:
    """Token-offset packing for training sequences: every document's
    global start offset in the doc_id-ordered token stream, and the
    sequence (of ``budget`` tokens) it starts in.  Distributed prefix
    sum: (1) per-batch bucket partials -> distributed
    groupby(bucket).sum -> bounded driver prefix; (2) ONE hash
    repartition by bucket + per-block bucket-local cumsum + the
    broadcast bucket offset.  Exact integer arithmetic; result
    independent of blocking and of the bucket width (test-pinned), so
    the default width scales with the corpus to keep the driver's
    prefix table <= ~64k rows at any size."""
    import ray as _ray
    from ray.data.aggregate import Sum
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    if bucket_docs is None:
        bucket_docs = max(PACK_BUCKET_DOCS,
                          -(-int(ds.count()) // 65_536))
    slim = ds.map_batches(lambda b: _pack_tokens_batch(b, bucket_docs),
                          batch_format="pyarrow").materialize()
    bsum = collect_df(slim.groupby("bucket").aggregate(Sum("n_tokens")))
    bsum = bsum.rename(columns={"sum(n_tokens)": "tok"}) \
        .sort_values("bucket", ignore_index=True)
    starts = np.r_[0, bsum["tok"].to_numpy(np.int64).cumsum()][:-1]
    ref = _ray.put((bsum["bucket"].to_numpy(np.int64), starts))

    nparts = shuffle_width(ds.count())
    use_hash_shuffle(slim, nparts)
    parted = slim.repartition(num_blocks=nparts, keys=["bucket"])

    def _final(batch: pa.Table) -> pa.Table:
        buckets, offs = _ray.get(ref)
        import pyarrow.compute as pc
        idx = pc.sort_indices(batch,
                              sort_keys=[("bucket", "ascending"),
                                         ("doc_id", "ascending")])
        batch = batch.take(idx)
        b = batch.column("bucket").to_numpy()
        nt = batch.column("n_tokens").to_numpy()
        cum = nt.cumsum()
        new_b = np.r_[True, b[1:] != b[:-1]]
        base = np.maximum.accumulate(
            np.where(new_b, cum - nt, np.int64(-1)))
        local_start = cum - nt - base   # bucket-local prefix
        start = offs[np.searchsorted(buckets, b)] + local_start
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": batch.column("n_tokens"),
            "start_offset": pa.array(start.astype(np.int64), pa.int64()),
            "seq_id": pa.array(start // budget, pa.int64()),
        })

    out = parted.map_batches(_final, batch_format="pyarrow",
                             batch_size=None)
    return pa.Table.from_pandas(collect_df(out), preserve_index=False)


def q_dedup_keep(sf_dir: str) -> pa.Table:
    """The kept corpus after MinHash near-dup clustering: drop every
    cluster member except its min doc.  The drop set is bounded by the
    near-dup volume (broadcast via ray.put); the corpus pass is a
    stateless filter."""
    import ray as _ray
    docs = _docs(sf_dir)
    cl = dedup_clusters(docs).to_pandas()
    ids_only = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id"])
    drop = cl.loc[cl["doc_id"] != cl["cluster_id"], "doc_id"] \
        .to_numpy(np.int64)
    drop.sort()
    ref = _ray.put(drop)

    class _Keep:
        def __init__(self, ref):
            self.drop = _ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy()
            keep = ~np.isin(ids, self.drop, assume_unique=False)
            return pa.table({"doc_id": pa.array(ids[keep], pa.int64())})

    out = ids_only.map_batches(_Keep, fn_constructor_args=(ref,),
                               batch_format="pyarrow",
                               concurrency=(1, 8))
    return _collect_table(out)


# curation thresholds (mirrored literally in the oracle SQL)
CURATION_MIN_TOKENS = 20
CURATION_MIN_QUALITY = 0.6
CURATION_MAX_REP = 0.08
CURATION_MAX_CONTAM = 0.10


class _CurationStage:
    """The composite curation pipeline: every per-document signal
    (token count, quality score, repetition ratio, benchmark
    contamination) computed in ONE read pass; emits keep/reject with
    the first failing rule.  Rule order: benchmark > too_short >
    repetitive > contaminated > low_quality."""

    def __init__(self, grams_ref, w: int = 3, mod: int = 97):
        import ray as _ray
        self.grams = np.sort(np.asarray(_ray.get(grams_ref),
                                        dtype=np.uint64))
        self.w, self.mod = w, mod
        self.cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        toks = T._tokens_series(batch.column("text"))   # tokenize ONCE
        q = T.quality_batch(batch, toks)
        nt = q.column("n_tokens").to_numpy()
        score = q.column("quality_score").to_numpy()
        rep = T.repetition_batch(batch, 2, self.cache, toks) \
            .column("rep_ratio").to_numpy()
        nd, nh = T.decontam_counts(batch, self.grams, self.w,
                                   self.cache, toks)
        contam = nh.astype(np.float64) / np.maximum(nd, 1)
        reason = np.full(len(ids), "", dtype=object)
        reason[score < CURATION_MIN_QUALITY] = "low_quality"
        reason[contam > CURATION_MAX_CONTAM] = "contaminated"
        reason[rep > CURATION_MAX_REP] = "repetitive"
        reason[nt < CURATION_MIN_TOKENS] = "too_short"
        reason[ids % self.mod == 0] = "benchmark"
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "keep": pa.array((reason == "").astype(np.int64),
                             pa.int64()),
            "reject_reason": pa.array(reason.astype("U"), pa.string()),
        })


def q_curation(sf_dir: str) -> pa.Table:
    """End-to-end curation decision per document — the flagship
    composite of the training-data operators: one benchmark-gram
    collection (bounded broadcast) + one corpus pass computing all
    signals; no shuffle anywhere."""
    docs = _docs(sf_dir)
    ref = _bench_grams_ref(docs, 3, 97)
    out = docs.map_batches(_CurationStage, fn_constructor_args=(ref,),
                           batch_format="pyarrow", concurrency=(1, 8))
    return _collect_table(out)


def q_funnel(sf_dir: str) -> pa.Table:
    """Ordered event funnel (view -> click -> purchase) per user: ONE
    hash repartition by user_id + a vectorized per-stage minimum
    sweep.  Integer timestamps and counts — bitwise-stable."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_type"])
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)
    parted = ds.repartition(num_blocks=nparts, keys=["user_id"])
    out = parted.map_batches(E.funnel_block, batch_format="pyarrow",
                             batch_size=None)
    return pa.Table.from_pandas(collect_df(out), preserve_index=False)


def q_quantize(sf_dir: str) -> pa.Table:
    """Int8 embedding quantization stats (vector-storage step): pure
    per-vector map_batches, no shuffle."""
    out = _emb(sf_dir).map_batches(S.quantize_batch,
                                   batch_format="pyarrow")
    return pa.Table.from_pandas(collect_df(out), preserve_index=False)


def q_chunk(sf_dir: str) -> pa.Table:
    """Overlapping-window chunking (128-token windows, stride 96):
    pure one-to-many map_batches explode, no shuffle."""
    out = _docs(sf_dir).map_batches(T.chunk_batch,
                                    batch_format="pyarrow")
    return pa.Table.from_pandas(collect_df(out), preserve_index=False)


# ---- round-5 additions: payload extraction, exact distinct counts,
# ---- a 3-table join, corpus-LM commonness --------------------------------

def q_props_extract(sf_dir: str) -> pa.Table:
    """Semi-structured payload extraction + aggregation: pull the
    integer ``k`` from every event's JSON-ish props string with one
    vectorized RE2 extract, pre-reduce per batch, distributed
    groupby(event_type) final.  Exact int64 arithmetic end-to-end."""
    from ray.data.aggregate import Max, Sum
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "props"])
    part = ds.map_batches(E.props_extract_partial,
                          batch_format="pyarrow")
    agg = part.groupby("event_type").aggregate(
        Sum("sum_k"), Max("max_k"), Sum("n_events"))
    df = _named(collect_df(agg),
                ["event_type", "sum_k", "max_k", "n_events"])
    for c in ("sum_k", "max_k", "n_events"):
        df[c] = df[c].astype(np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


def _distinct_block_final(df: pd.DataFrame) -> pd.DataFrame:
    """Block kernel for COUNT(DISTINCT user_id): rows are
    hash-partitioned by user_id, so every (event_type, user_id) pair
    is fully contained in this block — a block-local pair dedupe THEN
    per-type rollup is globally exact (5 × blocks partial rows reach
    the driver)."""
    if df.empty:
        return pd.DataFrame({"event_type": pd.Series(dtype=object),
                             "distinct_users": pd.Series(dtype=np.int64),
                             "n_events": pd.Series(dtype=np.int64)})
    g = df.groupby(["event_type", "user_id"], sort=False,
                   as_index=False)["pair_count"].sum()
    out = g.groupby("event_type", sort=False).agg(
        distinct_users=("user_id", "size"),
        n_events=("pair_count", "sum")).reset_index()
    for c in ("distinct_users", "n_events"):
        out[c] = out[c].astype(np.int64)
    return out


def _distinct_users_final(parted) -> pa.Table:
    """parted: (event_type, user_id, pair_count) partials
    hash-partitioned by user_id → block kernel → tiny exact driver
    merge (types × blocks rows)."""
    out = parted.map_batches(_distinct_block_final,
                             batch_format="pandas", batch_size=None)
    df = collect_df(out)
    if df.empty:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "distinct_users": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64())})
    m = df.groupby("event_type", sort=True, as_index=False).sum()
    for c in ("distinct_users", "n_events"):
        m[c] = m[c].astype(np.int64)
    return pa.Table.from_pandas(m, preserve_index=False)


def q_distinct_users(sf_dir: str) -> pa.Table:
    """Exact distributed COUNT(DISTINCT user_id) per event_type: a
    per-batch (event_type, user_id) dedupe partial → ONE hash
    repartition by user_id → block-local dedupe + per-type rollup →
    tiny exact driver merge.  The driver never holds O(distinct users)
    rows; the single wide exchange moves pre-deduped pairs, not raw
    events (one repartition + block kernel instead of two
    groupby.aggregate pools — the measured-faster shape for ~100k
    groups)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)
    part = ds.map_batches(E.distinct_pairs_partial,
                          batch_format="pyarrow")
    parted = part.repartition(num_blocks=nparts, keys=["user_id"])
    return _distinct_users_final(parted)


# TPC-H-Q3-style parameters over the synthetic tables
Q3_CUTOFF = "1998-06-01 00:00:00"
_Q3_CUTOFF_US = int(pd.Timestamp(Q3_CUTOFF).value // 1000)
Q3_SEGMENT = "BUILDING"
Q3_TOPK = 10


def _q3_line_partial(batch: pa.Table) -> pa.Table:
    """lineitem → per-batch (l_orderkey, du) revenue partials in exact
    discounted-price units (1e-4 dollars — the h_pricing integer
    idiom), shipped-after-cutoff rows only."""
    ship = batch.column("l_shipdate").cast(pa.int64()).to_numpy()
    keep = ship > _Q3_CUTOFF_US
    key = batch.column("l_orderkey").to_numpy()[keep]
    pc_ = np.rint(batch.column("l_extendedprice").to_numpy()[keep]
                  * 100).astype(np.int64)
    dc = np.rint(batch.column("l_discount").to_numpy()[keep]
                 * 100).astype(np.int64)
    g = pd.DataFrame({"l_orderkey": key, "du": pc_ * (100 - dc)}) \
        .groupby("l_orderkey", sort=False).sum().reset_index()
    return pa.table({
        "l_orderkey": pa.array(g["l_orderkey"].to_numpy(), pa.int64()),
        "du": pa.array(g["du"].to_numpy(), pa.int64()),
    })


def _q3_topk_block(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """Per-block top-k by (revenue desc, orderkey asc) — blocks of the
    revenue aggregate are disjoint by orderkey, so block-local top-k +
    a driver final is exact."""
    if df.empty:
        return df
    df = df.sort_values(["du", "o_orderkey"], ascending=[False, True],
                        kind="mergesort")
    return df.head(k)


def q_q3_topk(sf_dir: str) -> pa.Table:
    """TPC-H-Q3-style 3-table join: customers in one market segment ⋈
    their pre-cutoff orders ⋈ post-cutoff lineitem revenue, top-10
    orders by revenue.  Shape for 100 TB: lineitem (the big fan-in
    side) is pre-reduced per batch THEN repartition+block-kernel
    summed per orderkey BEFORE any join; the segment filter is pushed
    into the customer scan; both joins are native hash joins; the
    final top-10 is two-phase (per-block → driver); the two dim
    columns for the 10 winners come from a 10-key pruned parquet
    read, not the wide join payload."""
    import pyarrow.compute as apc
    import pyarrow.dataset as pads
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda t: t.filter(apc.equal(t.column("c_mktsegment"),
                                     Q3_SEGMENT)).select(["c_custkey"]),
        batch_format="pyarrow")
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey",
                                            "o_orderdate"])
    orders = orders.map_batches(
        lambda t: t.filter(apc.less(
            t.column("o_orderdate").cast(pa.int64()),
            _Q3_CUTOFF_US)).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow")
    line = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                 columns=["l_orderkey", "l_shipdate",
                                          "l_extendedprice",
                                          "l_discount"])
    nparts = shuffle_width(line.count())
    for ds in (cust, orders, line):
        use_hash_shuffle(ds, nparts)
    # one exchange in flight at a time: each shuffle op spawns its own
    # aggregator-actor pool, and three concurrent pools starve each
    # other on small CPU counts (and needlessly contend on big ones) —
    # the materialized intermediates are pre-reduced slim key tables
    # (orderkeys + one int), object-store-resident and spillable.
    # The revenue rollup is repartition + block kernel, not
    # groupby.aggregate: ~130k orderkey groups at sf0.1 is past the
    # measured ~40k-group boundary where the block kernel wins
    # (measured 3.7 s vs 12.5 s here).
    def _rev_block(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_orderkey", sort=False,
                          as_index=False)["du"].sum()

    rev = line.map_batches(_q3_line_partial, batch_format="pyarrow") \
        .repartition(num_blocks=nparts, keys=["l_orderkey"]) \
        .map_batches(_rev_block, batch_format="pandas",
                     batch_size=None).materialize()
    eligible = orders.join(cust, join_type="inner",
                           num_partitions=nparts,
                           on=("o_custkey",), right_on=("c_custkey",)) \
        .materialize()
    joined = eligible.join(rev, join_type="inner",
                           num_partitions=nparts,
                           on=("o_orderkey",), right_on=("l_orderkey",))
    topped = joined.map_batches(
        lambda d: _q3_topk_block(d[["o_orderkey", "du"]], Q3_TOPK),
        batch_format="pandas")
    top = _q3_topk_block(collect_df(topped), Q3_TOPK)
    if top.empty:
        return pa.table({"o_orderkey": pa.array([], pa.int64()),
                         "revenue": pa.array([], pa.float64()),
                         "o_orderdate": pa.array([], pa.timestamp("us")),
                         "o_orderpriority": pa.array([], pa.string())})
    keys = top["o_orderkey"].to_numpy(np.int64)
    dims = pads.dataset(f"{sf_dir}/orders.parquet").to_table(
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=pads.field("o_orderkey").isin(keys)).to_pandas()
    out = top.merge(dims, on="o_orderkey", how="left")
    out["revenue"] = np.array([float(v) for v in out["du"]]) / 10000.0
    return pa.Table.from_pandas(
        out[["o_orderkey", "revenue", "o_orderdate", "o_orderpriority"]],
        preserve_index=False)


# unigram-LM commonness bounds — the tfidf treatment: only tokens with
# corpus count >= 2 ship (count==1 reconstructed exactly); beyond the
# broadcast budget the fully distributed token-join path runs.
UNIGRAM_MIN_C = 2
UNIGRAM_BROADCAST_BUDGET = 2_000_000


class _UnigramMassStage:
    """Actor-pool stage: per-doc commonness mass against the broadcast
    corpus term-count slice — tokens absent from the slice have corpus
    count == 1 by construction, so the reconstruction is exact."""

    def __init__(self, ref):
        import ray as _ray
        self.cmap = _ray.get(ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy()
        toks = T._tokens_series(batch.column("text"))
        ex = toks.explode().dropna()     # empty docs drop (as in SQL)
        c = ex.map(self.cmap).fillna(1).to_numpy().astype(np.int64)
        g = pd.DataFrame({"d": ex.index.to_numpy(), "c": c,
                          "one": np.ones(len(c), np.int64)}) \
            .groupby("d", sort=False).sum()
        d_idx = g.index.to_numpy()
        return pa.table({
            "doc_id": pa.array(doc_id[d_idx], pa.int64()),
            "tf_mass": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
            "n_tokens": pa.array(g["one"].to_numpy(np.int64),
                                 pa.int64()),
        })


def _unigram_join_path(docs, cntds) -> pa.Table:
    """Fully distributed commonness: (doc, token, tf) long rows join
    the corpus term-count table by token, then a distributed
    groupby(doc_id) sums mass and token count — no driver- or
    broadcast-held vocabulary.  Identical output to the broadcast
    path (test-pinned)."""
    from ray.data.aggregate import Sum
    nparts = shuffle_width(docs.count() * 32)
    long = docs.map_batches(T.tf_long_batch, batch_format="pyarrow")
    use_hash_shuffle(long, nparts)
    joined = long.join(cntds, join_type="inner", num_partitions=nparts,
                       on=("token",))

    def _mass(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "mass": pa.array(
                tf * t.column("c").to_numpy().astype(np.int64),
                pa.int64()),
            "ntok": pa.array(tf, pa.int64()),
        })

    agg = joined.map_batches(_mass, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("mass"), Sum("ntok"))
    df = _named(collect_df(agg), ["doc_id", "tf_mass", "n_tokens"])
    for c in ("tf_mass", "n_tokens"):
        df[c] = df[c].astype(np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


def unigram_mass(docs,
                 broadcast_budget: int = UNIGRAM_BROADCAST_BUDGET
                 ) -> pa.Table:
    """Corpus-LM commonness per document: tf_mass = Σ over the doc's
    token instances of that token's total corpus count — the exact
    integer core of count-based perplexity filtering (the float score
    tf_mass/n_tokens is one division away; keeping integers makes the
    oracle bitwise).  Distributed term-count build, min-count-bounded
    broadcast (count==1 reconstructed), distributed join beyond the
    budget."""
    from ray.data.aggregate import Sum
    part = docs.map_batches(T.term_count_partial, batch_format="pyarrow")
    def _rename(t: pa.Table) -> pa.Table:
        # empty aggregate blocks can carry a different column count;
        # pass ONLY those through, fail loudly on real shape drift
        if t.num_columns == 2:
            return t.rename_columns(["token", "c"])
        if t.num_rows == 0:
            return t
        raise ValueError(f"unexpected aggregate shape: {t.schema}")

    agg = part.groupby("token").aggregate(Sum("partial_c")).map_batches(
        _rename, batch_format="pyarrow").materialize()
    kept = agg.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(
            t.column("c"), UNIGRAM_MIN_C)),
        batch_format="pyarrow")
    if int(kept.count()) > broadcast_budget:
        return _unigram_join_path(docs, agg)
    dfd = collect_df(kept)
    assert len(dfd) <= broadcast_budget   # the driver-held-rows pin
    cmap = (dfd.set_index("token")["c"] if not dfd.empty
            else pd.Series(dtype=np.int64))  # all-hapax corpus
    ref = ray.put(cmap)
    out = docs.map_batches(_UnigramMassStage, fn_constructor_args=(ref,),
                           batch_format="pyarrow", concurrency=(1, 4))
    return pa.Table.from_pandas(collect_df(out), preserve_index=False)


def q_unigram_lm(sf_dir: str) -> pa.Table:
    return unigram_mass(_docs(sf_dir))


def q_semi_join(sf_dir: str) -> pa.Table:
    """Broadcast semi-join: restrict the event stream to users who ever
    purchased, then aggregate per type.  The buyer set is built by a
    distributed dedupe of the (pre-filtered, column-pruned) purchase
    scan, broadcast ONCE via ray.put as a sorted int64 array, and
    probed per batch with searchsorted — the scale alternative to
    shuffling the full stream through a hash join when the filter side
    is small (the classic broadcast-semi-join pattern; beyond driver
    memory the g_distinct_users pair-shuffle shape applies)."""
    import pyarrow.compute as apc
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    buyers_part = ev.map_batches(
        lambda t: pa.table({"user_id": apc.unique(
            t.filter(apc.equal(t.column("event_type"),
                               "purchase")).column("user_id"))}),
        batch_format="pyarrow")
    bdf = collect_df(buyers_part)
    buyers = (np.sort(np.unique(bdf["user_id"].to_numpy(np.int64)))
              if not bdf.empty else np.empty(0, np.int64))
    ref = ray.put(buyers)

    class _SemiJoinStage:
        def __init__(self, r):
            import ray as _ray
            self.keys = _ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(self.keys) == 0:
                return E.distinct_pairs_partial(t.slice(0, 0))
            u = t.column("user_id").to_numpy()
            pos = np.searchsorted(self.keys, u)
            pos[pos == len(self.keys)] = 0
            keep = self.keys[pos] == u
            return E.distinct_pairs_partial(
                t.filter(pa.array(keep)))

    nparts = shuffle_width(ev.count())
    use_hash_shuffle(ev, nparts)
    part = ev.map_batches(_SemiJoinStage, fn_constructor_args=(ref,),
                          batch_format="pyarrow", concurrency=(1, 4))
    parted = part.repartition(num_blocks=nparts, keys=["user_id"])
    return _distinct_users_final(parted)


_DAY_US = 86_400 * 1_000_000
_WEEK_US = 7 * _DAY_US


def q_retention(sf_dir: str) -> pa.Table:
    """Weekly cohort retention: per epoch-aligned 7-day bucket, the
    number of distinct active users and how many of them are active
    again in the NEXT bucket.  Per-batch (user, week) dedupe → ONE
    hash repartition by user_id → block kernel (each user's full week
    set is block-local, so the week+1 membership test needs no second
    exchange) → tiny exact driver merge (weeks × blocks rows).
    Epoch-aligned integer buckets mirror the SQL exactly — no calendar
    week semantics to disagree on."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)

    def _uw_partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        g = pd.DataFrame({
            "user_id": t.column("user_id").to_numpy(),
            "week_bucket": ts // _WEEK_US,
        }).drop_duplicates()
        return pa.Table.from_pandas(g, preserve_index=False)

    def _block_final(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "week_bucket": pd.Series(dtype=np.int64),
                "n_active": pd.Series(dtype=np.int64),
                "n_retained": pd.Series(dtype=np.int64)})
        d = df.drop_duplicates().sort_values(
            ["user_id", "week_bucket"], kind="mergesort")
        u = d["user_id"].to_numpy()
        w = d["week_bucket"].to_numpy(np.int64)
        retained = np.r_[(u[1:] == u[:-1]) & (w[1:] == w[:-1] + 1),
                         False]
        out = pd.DataFrame({"week_bucket": w,
                            "one": np.ones(len(w), np.int64),
                            "ret": retained.astype(np.int64)}) \
            .groupby("week_bucket", sort=False, as_index=False).sum()
        return out.rename(columns={"one": "n_active",
                                   "ret": "n_retained"})

    parted = ds.map_batches(_uw_partial, batch_format="pyarrow") \
        .repartition(num_blocks=nparts, keys=["user_id"])
    out = parted.map_batches(_block_final, batch_format="pandas",
                             batch_size=None)
    df = collect_df(out)
    if df.empty:
        return pa.table({"week_bucket": pa.array([], pa.int64()),
                         "n_active": pa.array([], pa.int64()),
                         "n_retained": pa.array([], pa.int64())})
    m = df.groupby("week_bucket", sort=True, as_index=False).sum()
    for c in ("week_bucket", "n_active", "n_retained"):
        m[c] = m[c].astype(np.int64)
    return pa.Table.from_pandas(m, preserve_index=False)


def q_tumbling(sf_dir: str) -> pa.Table:
    """Tumbling 1-day event-time windows per event type: per-batch
    (type, day) partials → ONE distributed two-key groupby final.
    Counts are exact integers; max is order-independent, so the float
    column is oracle-exact too (vs an order-dependent float sum)."""
    from ray.data.aggregate import Max, Sum
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts", "value"])

    def _partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        g = pd.DataFrame({
            "event_type": t.column("event_type").to_numpy(
                zero_copy_only=False),
            "day_us": ts - ts % _DAY_US,
            "value": t.column("value").to_numpy(),
        }).groupby(["event_type", "day_us"], sort=False)["value"] \
            .agg(n_events="size", max_value="max").reset_index()
        g["n_events"] = g["n_events"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(_partial, batch_format="pyarrow") \
        .groupby(["event_type", "day_us"]).aggregate(
            Sum("n_events"), Max("max_value"))
    df = _named(collect_df(agg),
                ["event_type", "day_us", "n_events", "max_value"])
    df["day"] = pd.to_datetime(df.pop("day_us"), unit="us") \
        .astype("datetime64[us]")
    df["n_events"] = df["n_events"].astype(np.int64)
    return pa.Table.from_pandas(
        df[["event_type", "day", "n_events", "max_value"]],
        preserve_index=False)


EXTRA_QUERIES = {
    "d_exact_dedup": q_exact_dedup,
    "d_token_stats": q_token_stats,
    "d_quality": q_quality,
    "d_langid": q_langid,
    "d_fingerprint": q_fingerprint,
    "d_token_jaccard": q_token_jaccard,
    "d_ngram_jaccard": q_ngram_jaccard,
    "d_dedup_clusters": q_dedup_clusters,
    "d_doc_freq": q_doc_freq,
    "d_tfidf_top": q_tfidf_top,
    "d_minhash_pairs": q_minhash_pairs,
    "d_simhash": q_simhash,
    "d_simhash_pairs": q_simhash_pairs,
    "e_ann_topk": q_ann_topk,
    "e_ann_lsh": q_ann_lsh,
    "e_ann_ivf": q_ann_ivf,
    "e_ann_ivf_indexed": q_ann_ivf_indexed,
    "e_knn_label": q_knn_label,
    "e_embedding_near_dup": q_embedding_near_dup,
    "e_lsh_buckets": q_lsh_buckets,
    "g_sessionize": q_sessionize,
    "g_window_dedup": q_window_dedup,
    "g_topk_users": q_topk_users,
    "g_sample_hash": q_sample_hash,
    "g_quantiles": q_quantiles,
    "g_asof_join": q_asof_join,
    "d_bpe_tokens": q_bpe_tokens,
    "h_nation_orders": q_nation_orders,
    "m_media_features": q_media_features,
    "m_frame_sample": q_frame_sample,
    "m_resize": q_resize,
    "d_repetition": q_repetition,
    "d_decontaminate": q_decontaminate,
    "g_source_cap": q_source_cap,
    "g_rolling_count": q_rolling_count,
    "e_cluster_medoid": q_cluster_medoid,
    "h_pricing": q_pricing,
    "d_stratified_sample": q_stratified_sample,
    "d_pack_offsets": q_pack_offsets,
    "d_dedup_keep": q_dedup_keep,
    "d_curation": q_curation,
    "g_funnel": q_funnel,
    "e_quantize": q_quantize,
    "d_chunk": q_chunk,
    "g_props_extract": q_props_extract,
    "g_distinct_users": q_distinct_users,
    "h_q3_topk": q_q3_topk,
    "d_unigram_lm": q_unigram_lm,
    "g_semi_join": q_semi_join,
    "g_tumbling": q_tumbling,
    "g_retention": q_retention,
}


# ---- generated oracles for the seeded-signature operators ----------------
#
# The MinHash permutation constants, LSH hyperplanes and band folds are
# deterministic given their seeds, so the oracle SQL embeds them as
# literals — the same treatment that graduated d_simhash to a full
# oracle.  Validated byte-for-byte at sf0.001/0.01/0.1.

_TOKHASH_SQL = ("CAST(CAST(concat('0x', substr(md5(x),1,16)) AS UBIGINT)"
                " % 2305843009213693951 AS HUGEINT)")
_W64 = 1 << 64


def _minhash_pairs_sql(k: int = 32, bands: int = 8, rows: int = 4,
                       threshold: float = 0.5,
                       max_bucket: int = D.DEFAULT_MAX_BUCKET) -> str:
    """SQL mirror of dedup.minhash_pairs_distributed: md5 token hashes →
    rolling 3-shingles → distinct per doc → 32 seeded permutation mins →
    8 uint64-fold band hashes → bucket self-join (with the same
    hot-bucket cap) → exact Jaccard ≥ threshold."""
    a, b = D._hash_params(k)
    sig_cols = ",\n    ".join(
        f"list_min([(CAST({int(a[i])} AS HUGEINT) * x + {int(b[i])}) "
        f"% 2305843009213693951 FOR x IN sd]) AS mh{i:02d}"
        for i in range(k))
    band_exprs = []
    for bi in range(bands):
        expr = f"mh{bi * rows:02d} % {_W64}"
        for r in range(1, rows):
            expr = (f"((({expr}) * 1000003 + mh{bi * rows + r:02d}) "
                    f"% {_W64})")
        band_exprs.append(f"({expr}) AS bh{bi}")
    band_list = ", ".join(f"bh{i}" for i in range(bands))
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents),
hsh AS (
  SELECT doc_id, [{_TOKHASH_SQL} FOR x IN t] AS h FROM toks),
sh AS (
  SELECT doc_id,
    CASE WHEN len(h) < 3
      THEN [list_reduce(h, (a, b) -> (a * 1000003 + b)
                               % 2305843009213693951)]
      ELSE [((((h[i] * 1000003 + h[i+1]) % 2305843009213693951)
              * 1000003 + h[i+2]) % 2305843009213693951)
            FOR i IN generate_series(1, len(h) - 2)]
    END AS s
  FROM hsh),
shd AS (SELECT doc_id, list_distinct(s) AS sd FROM sh),
sig AS (
  SELECT doc_id,
    {sig_cols}
  FROM shd),
bh AS (
  SELECT doc_id, {", ".join(band_exprs)} FROM sig),
bands AS (
  SELECT doc_id, i AS band_id, [{band_list}][i+1] AS band_hash
  FROM bh, generate_series(0, {bands - 1}) AS g(i)),
bsz AS (SELECT band_id, band_hash, count(*) AS n
        FROM bands GROUP BY 1, 2),
ok AS (SELECT bands.* FROM bands JOIN bsz USING (band_id, band_hash)
       WHERE n <= {max_bucket}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM ok a JOIN ok c ON a.band_id = c.band_id
   AND a.band_hash = c.band_hash AND a.doc_id < c.doc_id),
jac AS (
  SELECT doc_a, doc_b,
    CAST(len(list_intersect(x.sd, y.sd)) AS DOUBLE) /
    CAST(len(x.sd) + len(y.sd) - len(list_intersect(x.sd, y.sd))
         AS DOUBLE) AS jaccard
  FROM cand JOIN shd x ON cand.doc_a = x.doc_id
            JOIN shd y ON cand.doc_b = y.doc_id)
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= {threshold}"""


# the driver testdata's embedding dimension (constant across sf dirs);
# the seeded hyperplane literals below are generated for this dim
_EMB_DIM = 64


def _lsh_plane_literals(dim: int = _EMB_DIM, nbits: int = 16,
                        seed: int = 99) -> list[str]:
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((nbits, dim))
    return ["[" + ", ".join(repr(float(v)) for v in row) + "]"
            for row in planes]


def _lsh_sig_terms(lits: list[str]) -> str:
    return " + ".join(
        f"CASE WHEN list_dot_product(e, CAST({lits[i]} AS DOUBLE[])) > 0 "
        f"THEN {1 << i} ELSE 0 END"
        for i in range(len(lits)))


def _lsh_buckets_sql(dim: int = _EMB_DIM, nbits: int = 16) -> str:
    """SQL mirror of similarity.HyperplaneLSH bucket histogram: the
    seeded planes are emitted as DOUBLE[] literals; a bucket bit is a
    strict-positive dot product (float64 both sides)."""
    bit_terms = _lsh_sig_terms(_lsh_plane_literals(dim, nbits))
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings),
s AS (SELECT vec_id, CAST({bit_terms} AS BIGINT) AS bucket FROM v)
SELECT bucket, count(*) AS n_vectors FROM s GROUP BY bucket"""


def _ann_lsh_sql(dim: int = _EMB_DIM, bands: int = 8,
                 bits_per_band: int = 2, k: int = 5) -> str:
    """SQL mirror of similarity.ann_topk_lsh: same seeded planes,
    2-bit band chunks, candidates = vectors sharing ≥1 band with a
    query, exact cosine rank (ties → neighbor_id asc) top-k."""
    nbits = bands * bits_per_band
    bit_terms = _lsh_sig_terms(_lsh_plane_literals(dim, nbits))
    mask = (1 << bits_per_band) - 1
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings),
s AS (SELECT vec_id, CAST({bit_terms} AS BIGINT) AS sig FROM v),
sb AS (SELECT vec_id, i AS band_id,
              (sig >> ({bits_per_band} * i)) & {mask} AS chunk
       FROM s, generate_series(0, {bands - 1}) AS g(i)),
q AS (SELECT * FROM sb WHERE vec_id < 10),
t AS (SELECT * FROM sb WHERE vec_id >= 10),
cand AS (SELECT DISTINCT q.vec_id AS qid, t.vec_id AS nid
         FROM q JOIN t ON q.band_id = t.band_id AND q.chunk = t.chunk),
c AS (SELECT cand.qid, cand.nid,
        list_cosine_similarity(a.embedding, b.embedding) AS cos
      FROM cand JOIN embeddings a ON cand.qid = a.vec_id
                JOIN embeddings b ON cand.nid = b.vec_id)
SELECT qid AS query_id, nid AS neighbor_id, rn AS rank FROM (
  SELECT qid, nid,
    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
  FROM c)
WHERE rn <= {k}"""


def _ivf_centroid_literals(dim: int = _EMB_DIM, nlist: int = 16,
                           seed: int = 1234) -> list[str]:
    """The SeededCentroids of similarity.IVFIndex as DOUBLE[] literals
    (normalized rows, same rng stream)."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((nlist, dim))
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    return ["[" + ", ".join(repr(float(v)) for v in row) + "]"
            for row in c]


def _ann_ivf_sql(dim: int = _EMB_DIM, nlist: int = 16, nprobe: int = 4,
                 k: int = 5) -> str:
    """SQL mirror of similarity.ann_topk_ivf: same seeded centroids as
    literals; a vector's list = first max-cosine centroid
    (list_position == numpy argmax first-max), a query probes its
    nprobe best lists (cos desc, id asc — stable argsort mirror),
    candidates = vectors in probed lists, exact cosine rank top-k."""
    lits = _ivf_centroid_literals(dim, nlist)
    cos_terms = ", ".join(
        f"list_cosine_similarity(e, CAST({lits[i]} AS DOUBLE[]))"
        for i in range(nlist))
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings),
cs AS (SELECT vec_id, [{cos_terms}] AS cl FROM v),
asn AS (SELECT vec_id,
               list_position(cl, list_aggregate(cl, 'max')) - 1 AS list_id
        FROM cs),
qp AS (SELECT vec_id AS qid, i - 1 AS list_id,
              row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cl[i] DESC, i) AS rn
       FROM cs, generate_series(1, {nlist}) AS g(i)
       WHERE vec_id < 10),
probed AS (SELECT qid, list_id FROM qp WHERE rn <= {nprobe}),
cand AS (SELECT probed.qid, a.vec_id AS nid
         FROM probed JOIN asn a ON a.list_id = probed.list_id
         WHERE a.vec_id >= 10),
c AS (SELECT cand.qid, cand.nid,
        list_cosine_similarity(a.embedding, b.embedding) AS cos
      FROM cand JOIN embeddings a ON cand.qid = a.vec_id
                JOIN embeddings b ON cand.nid = b.vec_id)
SELECT qid AS query_id, nid AS neighbor_id, rn AS rank FROM (
  SELECT qid, nid,
    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
  FROM c)
WHERE rn <= {k}"""


def _ngram_jaccard_sql(w: int = D.NGRAM_W,
                       threshold: float = D.NGRAM_THRESHOLD,
                       max_df: int = D.NGRAM_MAX_DF,
                       metric: str = "jaccard") -> str:
    """SQL mirror of dedup.ngram_jaccard_distributed: codepoint rolling
    polynomial over char w-grams of trim(lower(text)), distinct per
    doc, df-capped inverted-index pair counts, scored as jaccard
    (inter/union over FULL distinct-gram sizes) or containment
    (inter/min size)."""
    p = 2305843009213693951
    win = "c[i]"
    for j in range(1, w):
        win = f"(({win}) * 1000003 + c[i+{j}]) % {p}"
    den = ("CAST(least(sa, sb) AS DOUBLE)" if metric == "containment"
           else "CAST(sa + sb - inter AS DOUBLE)")
    return f"""
WITH s AS (
  SELECT doc_id, trim(lower(text)) AS st FROM documents
  WHERE len(trim(lower(text))) >= 1),
cp AS (
  SELECT doc_id,
    [CAST(unicode(st[i]) AS HUGEINT)
     FOR i IN generate_series(1, len(st))] AS c
  FROM s),
g AS (
  SELECT doc_id,
    CASE WHEN len(c) < {w}
      THEN [list_reduce(c, (a, b) -> (a * 1000003 + b) % {p})]
      ELSE [{win} FOR i IN generate_series(1, len(c) - {w - 1})]
    END AS gr
  FROM cp),
gd AS (SELECT doc_id, list_distinct(gr) AS gs FROM g),
lng AS (SELECT doc_id, len(gs) AS sz, unnest(gs) AS h FROM gd),
dfc AS (SELECT h, count(*) AS n FROM lng GROUP BY h),
ok AS (SELECT lng.* FROM lng JOIN dfc USING (h)
       WHERE n >= 2 AND n <= {max_df}),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sz AS sa, b.sz AS sb, count(*) AS inter
  FROM ok a JOIN ok b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT doc_a, doc_b,
  CAST(inter AS DOUBLE) / {den} AS {metric}
FROM p
WHERE CAST(inter AS DOUBLE) / {den}
      >= {threshold}"""


def _dedup_clusters_sql() -> str:
    """SQL mirror of q_dedup_clusters: the MinHash near-dup pairs feed
    a recursive transitive closure; cluster id = min doc reachable."""
    pairs = _minhash_pairs_sql().strip()
    return f"""
WITH RECURSIVE np AS ({pairs}),
und AS (SELECT doc_a AS a, doc_b AS b FROM np
        UNION SELECT doc_b, doc_a FROM np),
reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
comp AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
         FROM reach GROUP BY a)
SELECT doc_id, cluster_id FROM comp"""


_TFIDF_SQL = """
WITH lng AS (
  SELECT doc_id,
    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM lng GROUP BY 1, 2),
dfx AS (SELECT token, count(DISTINCT doc_id) AS doc_freq
        FROM lng GROUP BY token),
nd AS (SELECT count(*) AS n FROM documents),
s AS (SELECT tf.doc_id, tf.token, tf.tf, dfx.doc_freq,
        CAST(tf.tf * nd.n AS DOUBLE) / CAST(dfx.doc_freq AS DOUBLE)
          AS score
      FROM tf JOIN dfx USING (token) CROSS JOIN nd)
SELECT doc_id, token, tf, doc_freq, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
    ORDER BY score DESC, token) AS rank
  FROM s)
WHERE rank <= 3"""


def _quantiles_sql() -> str:
    """SQL mirror of events.quantiles_from_counts: discrete quantile =
    value at 1-based rank ceil(p·n/100) (integer arithmetic) among the
    per-type sorted values."""
    from asserts_otel_processor_ray.stages.events import QUANTILE_PCTS
    cols = ",\n  ".join(
        f"max(CASE WHEN rn = ({p} * n + 99) // 100 THEN value END) "
        f"AS p{p}" for p in QUANTILE_PCTS)
    return f"""
WITH r AS (
  SELECT event_type, value,
    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM events)
SELECT event_type, max(n) AS n_events,
  {cols}
FROM r GROUP BY event_type"""


def _sample_hash_sql() -> str:
    from asserts_otel_processor_ray.stages.events import (
        SAMPLE_A, SAMPLE_B, SAMPLE_MOD)
    return f"""
SELECT * FROM events
WHERE ((CAST(event_id AS HUGEINT) * {SAMPLE_A} + {SAMPLE_B})
       % 2305843009213693951) % {SAMPLE_MOD} = 0"""


def _langid_sql() -> str:
    score_cols = []
    for lang in T.LANG_ORDER:
        markers = ", ".join(f"'{m}'" for m in T.LANG_MARKERS[lang])
        score_cols.append(
            f"len(list_filter(t, x -> x IN ({markers}))) AS score_{lang}")
    branches = []
    for lang in T.LANG_ORDER:
        others = [o for o in T.LANG_ORDER if o != lang]
        cond = " AND ".join(f"score_{lang} >= score_{o}" for o in others)
        branches.append(f"WHEN {cond} THEN '{lang}'")
    greatest = ", ".join(f"score_{o}" for o in T.LANG_ORDER)
    pred = (f"CASE WHEN greatest({greatest}) = 0 THEN 'und' "
            + " ".join(branches) + " END")
    cols = ", ".join(f"score_{o}" for o in T.LANG_ORDER)
    return f"""
WITH toks AS (
  SELECT doc_id,
    regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents),
scored AS (
  SELECT doc_id, {", ".join(score_cols)} FROM toks)
SELECT doc_id, {pred} AS pred_lang, {cols} FROM scored"""


EXTRA_ORACLE_SQL = {
    "d_exact_dedup": """
SELECT trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS text_norm,
       min(doc_id) AS doc_id, count(*) AS dup_count
FROM documents GROUP BY 1""",
    "d_token_stats": """
SELECT doc_id, n_tokens, chars_no_ws,
       CAST(chars_no_ws AS DOUBLE) / CAST(n_tokens AS DOUBLE)
         AS avg_token_len
FROM (SELECT doc_id,
        array_length(regexp_split_to_array(trim(text), '\\s+'))
          AS n_tokens,
        length(regexp_replace(text, '\\s', '', 'g')) AS chars_no_ws
      FROM documents)""",
    "d_quality": f"""
WITH toks AS (
  SELECT doc_id,
    regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents),
base AS (
  SELECT doc_id, len(t) AS n_tokens,
    len(list_filter(t, x -> x IN ({STOP_SQL}))) AS n_stopwords,
    len(list_distinct(t)) AS n_distinct
  FROM toks),
ratios AS (
  SELECT *,
    CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)
      AS stopword_ratio,
    CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
      AS type_token_ratio
  FROM base)
SELECT *,
  0.4 * least(greatest(CAST(n_tokens AS DOUBLE) / 100.0, 0.0), 1.0)
  + 0.3 * (1.0 - stopword_ratio) + 0.3 * type_token_ratio
    AS quality_score
FROM ratios""",
    "d_langid": _langid_sql(),
    # token hash = first 8 bytes of md5, big-endian, mod 2^61-1 —
    # reproducible in SQL via hex-prefix cast (validated byte-for-byte
    # against text_analysis.token_hashes)
    "d_fingerprint": """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents),
hsh AS (
  SELECT doc_id,
    [CAST(CAST(concat('0x', substr(md5(x),1,16)) AS UBIGINT)
          % 2305843009213693951 AS HUGEINT) FOR x IN t] AS h
  FROM toks),
sh AS (
  SELECT doc_id,
    CASE WHEN len(h) < 3
      THEN [list_reduce(h, (a, b) -> (a * 1000003 + b)
                               % 2305843009213693951)]
      ELSE [((((h[i] * 1000003 + h[i+1]) % 2305843009213693951)
              * 1000003 + h[i+2]) % 2305843009213693951)
            FOR i IN generate_series(1, len(h) - 2)]
    END AS s
  FROM hsh)
SELECT doc_id, printf('%016x', CAST(list_min(s) AS BIGINT)) AS fingerprint
FROM sh""",
    # SimHash near-dup pairs: 4×16-bit chunk banding + exact hamming,
    # the SQL mirror of dedup.simhash_pairs_distributed (the bsz/ok
    # CTEs mirror its DEFAULT_MAX_BUCKET=256 hot-bucket cap)
    "d_simhash_pairs": """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents),
hsh AS (
  SELECT doc_id,
    [CAST(concat('0x', substr(md5(x),1,16)) AS UBIGINT)
     % 2305843009213693951 FOR x IN t] AS h,
    len(t) AS n
  FROM toks),
s AS (
  SELECT doc_id, CAST(list_sum(
    [CASE WHEN 2 * list_sum([CAST((x >> b) & 1 AS BIGINT) FOR x IN h]) > n
          THEN CAST(1 AS HUGEINT) << b ELSE CAST(0 AS HUGEINT) END
     FOR b IN generate_series(0, 63)]) AS BIGINT) AS v
  FROM hsh),
b AS (
  SELECT doc_id, v, i AS band, (v >> (16*i)) & 65535 AS chunk
  FROM s, generate_series(0, 3) AS g(i)),
bsz AS (SELECT band, chunk, count(*) AS n FROM b GROUP BY 1, 2),
ok AS (SELECT b.* FROM b JOIN bsz USING (band, chunk)
       WHERE n <= 256),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
    a.v AS va, c.v AS vb
  FROM ok a JOIN ok c ON a.band = c.band AND a.chunk = c.chunk
   AND a.doc_id < c.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(va, vb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(va, vb)) <= 3""",
    # 64-bit SimHash: per-bit majority vote over the same md5 token
    # hashes (bits 61-63 of a mod-2^61-1 hash are always 0, so the
    # result fits BIGINT)
    "d_simhash": """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents),
hsh AS (
  SELECT doc_id,
    [CAST(concat('0x', substr(md5(x),1,16)) AS UBIGINT)
     % 2305843009213693951 FOR x IN t] AS h,
    len(t) AS n
  FROM toks)
SELECT doc_id,
  printf('%016x', CAST(list_sum(
    [CASE WHEN 2 * list_sum([CAST((x >> b) & 1 AS BIGINT) FOR x IN h]) > n
          THEN CAST(1 AS HUGEINT) << b ELSE CAST(0 AS HUGEINT) END
     FOR b IN generate_series(0, 63)]) AS BIGINT)) AS simhash
FROM hsh""",
    "d_token_jaccard": """
WITH s AS (
  SELECT doc_id,
    list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
  FROM documents WHERE doc_id < 150)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CAST(len(list_intersect(a.t, b.t)) AS DOUBLE) /
    CAST(len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)) AS DOUBLE)
      AS jaccard
  FROM s a JOIN s b ON a.doc_id < b.doc_id)
WHERE jaccard >= 0.5""",
    "e_ann_topk": """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id < 10),
c AS (SELECT q.qid, e.vec_id AS nid,
        list_cosine_similarity(e.embedding, q.qe) AS cos
      FROM embeddings e, q WHERE e.vec_id >= 10)
SELECT qid AS query_id, nid AS neighbor_id, rn AS rank FROM (
  SELECT qid, nid,
    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
  FROM c)
WHERE rn <= 5""",
    "e_embedding_near_dup": """
WITH p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
    list_cosine_similarity(a.embedding, b.embedding) AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
SELECT vec_a, vec_b FROM p WHERE cos >= 0.45""",
    "e_knn_label": """
WITH tr AS (SELECT * FROM embeddings WHERE vec_id < 100),
te AS (SELECT * FROM embeddings WHERE vec_id >= 100),
c AS (SELECT te.vec_id, tr.label, tr.vec_id AS tid,
        list_cosine_similarity(te.embedding, tr.embedding) AS cos
      FROM te, tr)
SELECT vec_id, label AS pred_label FROM (
  SELECT vec_id, label,
    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, tid) AS rn
  FROM c)
WHERE rn = 1""",
    "g_sessionize": """
WITH e AS (
  SELECT user_id, ts, event_id,
    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
  FROM events),
f AS (
  SELECT *, CASE WHEN pts IS NULL
    OR epoch_us(ts) - epoch_us(pts) > 1800000000
    THEN 1 ELSE 0 END AS brk
  FROM e),
g AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id
    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
    AS sid
  FROM f)
SELECT user_id, sid AS session_id, count(*) AS n_events,
       min(ts) AS first_ts, max(ts) AS last_ts
FROM g GROUP BY user_id, sid""",
    "g_window_dedup": """
SELECT user_id, bucket,
  CAST(substr(min(pick), 22) AS BIGINT) AS event_id
FROM (SELECT user_id, epoch_us(ts) // 300000000 AS bucket,
        lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '|' ||
        lpad(CAST(event_id AS VARCHAR), 12, '0') AS pick
      FROM events)
GROUP BY user_id, bucket""",
    "g_topk_users": """
WITH c AS (SELECT event_type, user_id, count(*) AS n_events
           FROM events GROUP BY 1, 2)
SELECT event_type, user_id, n_events, rn AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
    ORDER BY n_events DESC, user_id) AS rn
  FROM c)
WHERE rn <= 10""",
    "d_minhash_pairs": _minhash_pairs_sql(),
    "d_ngram_jaccard": _ngram_jaccard_sql(),
    "d_dedup_clusters": _dedup_clusters_sql(),
    "d_tfidf_top": _TFIDF_SQL,
    "d_doc_freq": """
WITH lng AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id,
      unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
    FROM documents)),
c AS (SELECT token, count(*) AS doc_freq FROM lng GROUP BY token)
SELECT token, doc_freq, rank FROM (
  SELECT *, row_number() OVER (ORDER BY doc_freq DESC, token) AS rank
  FROM c)
WHERE rank <= 200""",
    "g_sample_hash": _sample_hash_sql(),
    "g_quantiles": _quantiles_sql(),
    "h_nation_orders": """
SELECT n_name, count(*) AS n_orders, max(o_totalprice) AS max_totalprice
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name""",
    "g_asof_join": """
WITH l AS (SELECT event_id, user_id, ts, value FROM events
           WHERE event_type = 'purchase'),
r AS (
  SELECT user_id, ts AS view_ts, event_id AS view_event_id,
         value AS view_value
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, ts
                                     ORDER BY event_id) AS rn
        FROM events WHERE event_type = 'view')
  WHERE rn = 1)
SELECT l.event_id, l.user_id, l.ts, l.value,
       r.view_event_id, r.view_ts, r.view_value
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts >= r.view_ts""",
    "e_lsh_buckets": _lsh_buckets_sql(),
    "e_ann_lsh": _ann_lsh_sql(),
    "e_ann_ivf": _ann_ivf_sql(),
    "e_ann_ivf_indexed": _ann_ivf_sql(),
    "m_media_features": """
SELECT doc_id AS media_id, 'image' AS media_type,
       octet_length(CAST(text AS BLOB)) AS n_bytes,
       substr(sha256(text), 1, 8) AS payload_sha8
FROM documents""",
    "m_frame_sample": """
WITH f AS (
  SELECT doc_id AS media_id,
         greatest(octet_length(CAST(text AS BLOB)) // 64, 1) AS n_frames
  FROM documents),
s AS (SELECT media_id, n_frames, least(8, n_frames) AS k FROM f)
SELECT media_id, n_frames, (j * n_frames) // k AS frame_idx,
       j + 1 AS frame_rank,
       (((j * n_frames) // k) * 1000003 + media_id)
         % 2305843009213693951 AS frame_sig
FROM s, generate_series(0, 7) AS g(j) WHERE j < k""",
    "d_bpe_tokens": f"""
SELECT doc_id,
  len(regexp_extract_all(text, '{T.BPE_PATTERN}')) AS n_bpe_tokens,
  len(regexp_extract_all(text, '\\s+')) AS n_ws_runs
FROM documents""",
    "m_resize": """
WITH d AS (
  SELECT doc_id AS media_id,
         64 + octet_length(CAST(text AS BLOB)) % 512 AS in_w,
         64 + (octet_length(CAST(text AS BLOB)) * 7919) % 512 AS in_h
  FROM documents),
m AS (SELECT *, greatest(in_w, in_h) AS mx FROM d)
SELECT media_id, in_w, in_h,
  CASE WHEN mx > 256 THEN greatest(1, in_w * 256 // mx) ELSE in_w END
    AS out_w,
  CASE WHEN mx > 256 THEN greatest(1, in_h * 256 // mx) ELSE in_h END
    AS out_h,
  CASE WHEN mx > 256 THEN mx ELSE 256 END AS scale_den
FROM m""",
}


def _shingle_cte_sql(w: int, sfx: str = "") -> str:
    """toks/hsh/sh CTE text: md5 token hashes + w-token rolling
    polynomial shingles (the proven d_fingerprint mirror of
    text_analysis.shingle_hashes, parameterized by w).  ``sfx``
    renames the CTEs (toks{sfx}/hsh{sfx}/sh{sfx}) so two widths can
    compose in one query."""
    p = 2305843009213693951
    win = "h[i]"
    for j in range(1, w):
        win = f"(({win}) * 1000003 + h[i+{j}]) % {p}"
    return f"""
toks{sfx} AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents),
hsh{sfx} AS (
  SELECT doc_id,
    [CAST(CAST(concat('0x', substr(md5(x),1,16)) AS UBIGINT)
          % {p} AS HUGEINT) FOR x IN t] AS h
  FROM toks{sfx}),
sh{sfx} AS (
  SELECT doc_id,
    CASE WHEN len(h) < {w}
      THEN [list_reduce(h, (a, b) -> (a * 1000003 + b) % {p})]
      ELSE [{win} FOR i IN generate_series(1, len(h) - {w - 1})]
    END AS s
  FROM hsh{sfx})"""


def _cluster_medoid_sql(dim: int = _EMB_DIM, nlist: int = 16) -> str:
    """SQL mirror of similarity.cluster_medoids: same seeded centroid
    literals as the IVF oracle; list = first max-cosine centroid, the
    representative = max-cosine member (vec_id asc tie-break)."""
    lits = _ivf_centroid_literals(dim, nlist)
    cos_terms = ", ".join(
        f"list_cosine_similarity(e, CAST({lits[i]} AS DOUBLE[]))"
        for i in range(nlist))
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings),
cs AS (SELECT vec_id, [{cos_terms}] AS cl FROM v),
asn AS (SELECT vec_id,
               list_position(cl, list_aggregate(cl, 'max')) - 1
                 AS list_id,
               list_aggregate(cl, 'max') AS best
        FROM cs)
SELECT list_id, vec_id, n_vectors FROM (
  SELECT list_id, vec_id,
    count(*) OVER (PARTITION BY list_id) AS n_vectors,
    row_number() OVER (PARTITION BY list_id
                       ORDER BY best DESC, vec_id) AS rk
  FROM asn) WHERE rk = 1"""


EXTRA_ORACLE_SQL.update({
    "d_repetition": f"""
WITH {_shingle_cte_sql(2).strip()}
SELECT doc_id, len(s) AS n_grams, len(list_distinct(s)) AS n_distinct,
  1.0 - CAST(len(list_distinct(s)) AS DOUBLE)
      / CAST(greatest(len(s), 1) AS DOUBLE) AS rep_ratio
FROM sh""",
    "d_decontaminate": f"""
WITH {_shingle_cte_sql(3).strip()},
gd AS (SELECT doc_id, list_distinct(s) AS gs FROM sh),
bg AS (SELECT DISTINCT unnest(gs) AS gram FROM gd
       WHERE doc_id % 97 = 0),
corp AS (SELECT doc_id, len(gs) AS n_grams, unnest(gs) AS gram
         FROM gd WHERE doc_id % 97 <> 0)
SELECT doc_id, n_grams, count(*) AS n_hit,
  CAST(count(*) AS DOUBLE) / CAST(greatest(n_grams, 1) AS DOUBLE)
    AS contaminated_frac
FROM corp JOIN bg USING (gram)
GROUP BY doc_id, n_grams""",
    "g_source_cap": f"""
SELECT doc_id, source, rk AS rank FROM (
  SELECT doc_id, source,
    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
  FROM documents) WHERE rk <= {SOURCE_CAP_K}""",
    "g_rolling_count": """
SELECT event_id, user_id, ts,
  count(*) OVER (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING
                 AND CURRENT ROW) AS n_window
FROM events""",
    "e_cluster_medoid": _cluster_medoid_sql(),
    "h_pricing": """
WITH f AS (
  SELECT l_returnflag, l_linestatus,
    CAST(round(l_quantity) AS BIGINT) AS q,
    CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
    CAST(round(l_discount * 100) AS BIGINT) AS dc,
    CAST(round(l_tax * 100) AS BIGINT) AS tc
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'),
s AS (
  SELECT l_returnflag, l_linestatus,
    sum(CAST(q AS HUGEINT)) AS sq,
    sum(CAST(pc AS HUGEINT)) AS spc,
    sum(CAST(dc AS HUGEINT)) AS sdc,
    sum(CAST(pc * (100 - dc) AS HUGEINT)) AS sdpu,
    sum(CAST(pc * (100 - dc) * (100 + tc) AS HUGEINT)) AS schu,
    count(*) AS n
  FROM f GROUP BY 1, 2)
SELECT l_returnflag, l_linestatus,
  CAST(sq AS BIGINT) AS sum_qty,
  CAST(spc AS DOUBLE) / 100.0 AS sum_base_price,
  CAST(sdpu AS DOUBLE) / 10000.0 AS sum_disc_price,
  CAST(schu AS DOUBLE) / 1000000.0 AS sum_charge,
  CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) AS avg_qty,
  (CAST(spc AS DOUBLE) / 100.0) / CAST(n AS DOUBLE) AS avg_price,
  (CAST(sdc AS DOUBLE) / 100.0) / CAST(n AS DOUBLE) AS avg_disc,
  n AS count_order
FROM s""",
})


def _curation_sql() -> str:
    """SQL mirror of q_curation: the d_quality, d_repetition and
    d_decontaminate oracle bodies composed in one statement, with the
    same rule precedence (benchmark > too_short > repetitive >
    contaminated > low_quality) and literal thresholds."""
    return f"""
WITH {_shingle_cte_sql(2, "r").strip()},
rep AS (
  SELECT doc_id,
    1.0 - CAST(len(list_distinct(s)) AS DOUBLE)
        / CAST(greatest(len(s), 1) AS DOUBLE) AS rep_ratio
  FROM shr),
{_shingle_cte_sql(3, "c").strip()},
gd AS (SELECT doc_id, list_distinct(s) AS gs FROM shc),
bg AS (SELECT DISTINCT unnest(gs) AS gram FROM gd
       WHERE doc_id % 97 = 0),
lng AS (SELECT doc_id, unnest(gs) AS gram FROM gd),
hits AS (SELECT lng.doc_id, count(*) AS n_hit
         FROM lng JOIN bg USING (gram) GROUP BY lng.doc_id),
contam AS (
  SELECT gd.doc_id,
    CAST(coalesce(hits.n_hit, 0) AS DOUBLE)
      / CAST(greatest(len(gd.gs), 1) AS DOUBLE) AS contaminated_frac
  FROM gd LEFT JOIN hits ON gd.doc_id = hits.doc_id),
qb AS (
  SELECT doc_id, len(t) AS n_tokens,
    len(list_filter(t, x -> x IN ({STOP_SQL}))) AS n_stopwords,
    len(list_distinct(t)) AS n_distinct
  FROM toksr),
qr AS (
  SELECT doc_id, n_tokens,
    CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)
      AS stopword_ratio,
    CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
      AS type_token_ratio
  FROM qb),
qual AS (
  SELECT doc_id, n_tokens,
    0.4 * least(greatest(CAST(n_tokens AS DOUBLE) / 100.0, 0.0), 1.0)
    + 0.3 * (1.0 - stopword_ratio) + 0.3 * type_token_ratio
      AS quality_score
  FROM qr),
j AS (
  SELECT q.doc_id, q.n_tokens, q.quality_score,
         r.rep_ratio, c.contaminated_frac
  FROM qual q JOIN rep r USING (doc_id)
              JOIN contam c ON q.doc_id = c.doc_id)
SELECT doc_id,
  CAST(CASE WHEN reason = '' THEN 1 ELSE 0 END AS BIGINT) AS keep,
  reason AS reject_reason
FROM (
  SELECT doc_id, CASE
    WHEN doc_id % 97 = 0 THEN 'benchmark'
    WHEN n_tokens < {CURATION_MIN_TOKENS} THEN 'too_short'
    WHEN rep_ratio > {CURATION_MAX_REP} THEN 'repetitive'
    WHEN contaminated_frac > {CURATION_MAX_CONTAM} THEN 'contaminated'
    WHEN quality_score < {CURATION_MIN_QUALITY} THEN 'low_quality'
    ELSE '' END AS reason
  FROM j)"""


_ID_HASH_SQL = ("CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS "
                "VARCHAR)), 1, 16)) AS UBIGINT) % 2305843009213693951 "
                "AS HUGEINT)")

EXTRA_ORACLE_SQL.update({
    "d_stratified_sample": f"""
WITH h AS (SELECT doc_id, lang, {_ID_HASH_SQL} AS hv FROM documents)
SELECT doc_id, lang, rk AS sample_rank FROM (
  SELECT doc_id, lang,
    row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rk
  FROM h) WHERE rk <= {STRAT_SAMPLE_K}""",
    "d_pack_offsets": f"""
WITH t AS (
  SELECT doc_id,
    CAST(array_length(regexp_split_to_array(trim(text), '\\s+'))
         AS BIGINT) AS n_tokens
  FROM documents),
o AS (
  SELECT doc_id, n_tokens,
    CAST(coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS start_offset
  FROM t)
SELECT doc_id, n_tokens, start_offset,
       CAST(start_offset // {PACK_SEQ_TOKENS} AS BIGINT) AS seq_id
FROM o""",
    "d_dedup_keep": f"""
SELECT doc_id FROM documents
WHERE doc_id NOT IN (
  SELECT doc_id FROM ({_dedup_clusters_sql()})
  WHERE doc_id <> cluster_id)""",
    "d_curation": _curation_sql(),
})

EXTRA_ORACLE_SQL.update({
    "g_funnel": """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN v ON e.user_id = v.user_id AND e.ts >= v.t1
      WHERE e.event_type = 'click' GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      JOIN c ON e.user_id = c.user_id AND e.ts >= c.t2
      WHERE e.event_type = 'purchase' GROUP BY 1)
SELECT u.user_id,
  CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2
            WHEN v.user_id IS NOT NULL THEN 1
            ELSE 0 END AS BIGINT) AS stage
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN v ON u.user_id = v.user_id
LEFT JOIN c ON u.user_id = c.user_id
LEFT JOIN p ON u.user_id = p.user_id""",
    # round_even(x, 0) == numpy rint (banker's rounding) — exact
    # quantized-value parity, not just tolerance
    "e_quantize": """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings),
s AS (SELECT vec_id, e,
        list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
      FROM v),
q AS (SELECT vec_id, scale,
        CASE WHEN scale = 0 THEN list_transform(e, x -> CAST(0 AS BIGINT))
             ELSE [CAST(round_even(x / scale, 0) AS BIGINT) FOR x IN e]
        END AS ql
      FROM s)
SELECT vec_id, scale,
  CAST(list_sum(ql) AS BIGINT) AS qsum,
  CAST(list_min(ql) AS BIGINT) AS qmin,
  CAST(list_max(ql) AS BIGINT) AS qmax
FROM q""",
})


EXTRA_ORACLE_SQL.update({
    "d_chunk": """
WITH t AS (
  SELECT doc_id,
    CAST(array_length(regexp_split_to_array(trim(text), '\\s+'))
         AS BIGINT) AS n
  FROM documents),
c AS (SELECT doc_id, n,
        CASE WHEN n <= 128 THEN 1
             ELSE (n - 128 + 95) // 96 + 1 END AS nch
      FROM t),
u AS (SELECT doc_id, n,
        unnest(generate_series(0, nch - 1)) AS j
      FROM c)
SELECT doc_id, CAST(j AS BIGINT) AS chunk_idx,
  CAST(j * 96 AS BIGINT) AS start_tok,
  CAST(least(j * 96 + 128, n) AS BIGINT) AS end_tok,
  CAST(least(j * 96 + 128, n) - j * 96 AS BIGINT) AS n_chunk_tokens
FROM u""",
})


EXTRA_ORACLE_SQL.update({
    # RE2 on both sides: Arrow extract_regex == DuckDB regexp_extract
    "g_props_extract": r"""
SELECT event_type,
  CAST(sum(CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1)
               AS BIGINT)) AS BIGINT) AS sum_k,
  max(CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1)
           AS BIGINT)) AS max_k,
  count(*) AS n_events
FROM events GROUP BY event_type""",
    "g_distinct_users": """
SELECT event_type,
  CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
  count(*) AS n_events
FROM events GROUP BY event_type""",
    "h_q3_topk": f"""
WITH li AS (
  SELECT l_orderkey,
    sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))
             AS HUGEINT)) AS sdu
  FROM lineitem
  WHERE l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
  GROUP BY 1),
o AS (
  SELECT o_orderkey, o_orderdate, o_orderpriority
  FROM orders JOIN customer ON c_custkey = o_custkey
  WHERE c_mktsegment = '{Q3_SEGMENT}'
    AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}')
SELECT o.o_orderkey,
  CAST(li.sdu AS DOUBLE) / 10000.0 AS revenue,
  o.o_orderdate, o.o_orderpriority
FROM o JOIN li ON li.l_orderkey = o.o_orderkey
ORDER BY revenue DESC, o.o_orderkey
LIMIT {Q3_TOPK}""",
    # every token instance joins the corpus term-count table exactly
    # once, so sum(c) is the commonness mass with multiplicity
    "d_unigram_lm": r"""
WITH tok AS (
  SELECT doc_id,
    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
  FROM documents),
cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w)
SELECT t.doc_id,
  CAST(sum(c.c) AS BIGINT) AS tf_mass,
  count(*) AS n_tokens
FROM tok t JOIN cnt c ON t.w = c.w
GROUP BY t.doc_id""",
    "g_semi_join": """
SELECT event_type,
  CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
  count(*) AS n_events
FROM events
WHERE user_id IN (SELECT DISTINCT user_id FROM events
                  WHERE event_type = 'purchase')
GROUP BY event_type""",
    "g_tumbling": """
SELECT event_type, date_trunc('day', ts) AS day,
  count(*) AS n_events, max(value) AS max_value
FROM events GROUP BY 1, 2""",
    "g_retention": """
WITH uw AS (
  SELECT DISTINCT user_id,
    CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS wk
  FROM events),
r AS (
  SELECT a.wk, count(*) AS n_retained
  FROM uw a JOIN uw b
    ON a.user_id = b.user_id AND b.wk = a.wk + 1
  GROUP BY a.wk),
act AS (SELECT wk, count(*) AS n_active FROM uw GROUP BY wk)
SELECT act.wk AS week_bucket, act.n_active,
  CAST(coalesce(r.n_retained, 0) AS BIGINT) AS n_retained
FROM act LEFT JOIN r ON act.wk = r.wk""",
})


# ---- round-5 third block: redaction, global shuffle, normalization --------

def q_redact(sf_dir: str) -> pa.Table:
    """PII-style corpus rewrite: one vectorized RE2 count + replace per
    batch, zero shuffle (stages/text_analysis.redact_batch)."""
    out = _docs(sf_dir).map_batches(T.redact_batch,
                                    batch_format="pyarrow")
    df = collect_df(out)
    if df.empty:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_redactions": pa.array([], pa.int64()),
                         "redacted": pa.array([], pa.string())})
    return pa.Table.from_pandas(df, preserve_index=False)


def q_shard_assign(sf_dir: str) -> pa.Table:
    """Deterministic global shuffle as (shard, position) assignment:
    seeded affine hash per doc → ONE hash exchange by shard →
    block-local ordering by (h, doc_id) numbers each shard densely.
    Writing shards in position order materializes the shuffled corpus
    with no global sort."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)
    keyed = ds.map_batches(T.shard_assign_partial,
                           batch_format="pyarrow")
    parted = keyed.repartition(num_blocks=nparts, keys=["shard"])
    out = parted.map_batches(T.shard_positions_block,
                             batch_format="pandas", batch_size=None)
    df = collect_df(out)
    if df.empty:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "shard": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64())})
    return pa.Table.from_pandas(df, preserve_index=False)


def _zscore_partial(batch: pa.Table) -> pa.Table:
    """Per-batch exact integer moments per language: (n, s, sq) over
    n_chars.  int64 is safe: n_chars ≤ ~1e5 → sq per row ≤ 1e10,
    ~1e8 rows per batch away from overflow."""
    df = pd.DataFrame({
        "lang": batch.column("lang").to_numpy(zero_copy_only=False),
        "x": batch.column("n_chars").to_numpy().astype(np.int64),
    })
    df["xx"] = df["x"] * df["x"]
    g = df.groupby("lang", sort=False).agg(
        n=("x", "size"), s=("x", "sum"), sq=("xx", "sum")).reset_index()
    for c in ("n", "s", "sq"):
        g[c] = g[c].astype(np.int64)
    return pa.Table.from_pandas(g, preserve_index=False)


class _ZScoreStage:
    """Per-row standardization against broadcast per-language moments
    (languages are few — the classic tiny-side ray.put broadcast)."""

    def __init__(self, ref):
        import ray as _ray
        mom = _ray.get(ref)   # {lang: (n, s, sq)}
        self.mean = {}
        self.std = {}
        for lang, (n, s, sq) in mom.items():
            # float() BEFORE the divide mirrors the oracle's
            # CAST(... AS DOUBLE)/n exactly (matters past 2^53)
            mean = float(s) / n
            var = float(sq) / n - mean * mean
            self.mean[lang] = mean
            self.std[lang] = float(np.sqrt(var)) if var > 0 else 0.0

    def __call__(self, t: pa.Table) -> pa.Table:
        lang = t.column("lang").to_numpy(zero_copy_only=False)
        x = t.column("n_chars").to_numpy().astype(np.float64)
        # vectorized gather via factorize (no per-row dict lookups)
        codes, uniq = pd.factorize(lang)
        if (codes < 0).any():
            # fail loud: a null lang would silently wrap to uniq[-1]'s
            # moments (and the oracle's inner JOIN drops the row)
            raise ValueError("null lang in documents")
        mu = np.array([self.mean[u] for u in uniq])[codes]
        sd = np.array([self.std[u] for u in uniq])[codes]
        z = np.where(sd > 0, (x - mu) / np.where(sd > 0, sd, 1.0), 0.0)
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "lang": t.column("lang"),
            "zscore": pa.array(z, pa.float64()),
        })


def q_zscore(sf_dir: str) -> pa.Table:
    """Per-group feature normalization (z-score of document length by
    language): distributed exact-integer moment partials → tiny
    groupby(lang) driver merge → broadcast → pure per-batch map.  The
    float math is one expression over exact integers, so drift vs the
    oracle is below the 1e-9 hash rounding."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "n_chars"])
    part = ds.map_batches(_zscore_partial, batch_format="pyarrow")
    pdf = collect_df(part)
    if pdf.empty:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "lang": pa.array([], pa.string()),
                         "zscore": pa.array([], pa.float64())})
    m = pdf.groupby("lang", as_index=False).sum()
    mom = {r.lang: (int(r.n), int(r.s), int(r.sq))
           for r in m.itertuples()}
    ref = ray.put(mom)
    out = ds.map_batches(_ZScoreStage, fn_constructor_args=(ref,),
                         batch_format="pyarrow", concurrency=(1, 4))
    return pa.Table.from_pandas(collect_df(out), preserve_index=False)


EXTRA_QUERIES.update({
    "d_redact": q_redact,
    "d_shard_assign": q_shard_assign,
    "d_zscore": q_zscore,
})

EXTRA_ORACLE_SQL.update({
    "d_redact": f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{T.REDACT_PATTERN}')) AS BIGINT)
    AS n_redactions,
  regexp_replace(text, '{T.REDACT_PATTERN}', '{T.REDACT_TOKEN}', 'g')
    AS redacted
FROM documents""",
    "d_shard_assign": f"""
WITH h AS (
  SELECT doc_id,
    (CAST(doc_id AS HUGEINT) * {T.SHARD_A} + {T.SHARD_B})
      % 2305843009213693951 AS h
  FROM documents)
SELECT doc_id, CAST(h % {T.SHARD_N} AS BIGINT) AS shard,
  CAST(ROW_NUMBER() OVER (PARTITION BY h % {T.SHARD_N}
                          ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
FROM h""",
    "d_zscore": """
WITH m AS (
  SELECT lang, count(*) AS n, sum(n_chars) AS s,
         sum(n_chars * n_chars) AS sq
  FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang,
  CASE WHEN CAST(m.sq AS DOUBLE)/m.n
            - (CAST(m.s AS DOUBLE)/m.n)*(CAST(m.s AS DOUBLE)/m.n) > 0
    THEN (d.n_chars - CAST(m.s AS DOUBLE)/m.n)
         / sqrt(CAST(m.sq AS DOUBLE)/m.n
                - (CAST(m.s AS DOUBLE)/m.n)*(CAST(m.s AS DOUBLE)/m.n))
    ELSE 0.0 END AS zscore
FROM documents d JOIN m ON d.lang = m.lang""",
})


# ---- raw-drop source formats: JSONL transcripts, CSV events ---------------

def q_jsonl_source(sf_dir: str) -> pa.Table:
    """S-family: JSONL transcript ingest via Ray-native distributed
    read_json + one vectorized cast to the canonical transcript schema
    (sources/textio.py).  Input is the deterministic fixture, not
    sf_dir — the conversion is what's under test (the t_jaeger
    pattern); the returned Dataset is drop-in for run_pipeline."""
    from asserts_otel_processor_ray.sources.textio import (
        read_transcripts_jsonl)
    return pa.Table.from_pandas(
        collect_df(read_transcripts_jsonl()), preserve_index=False)


def q_csv_source(sf_dir: str) -> pa.Table:
    """S-family: CSV event ingest via Ray-native distributed read_csv
    (typed header inference) + a per-batch partial → tiny driver
    merge per event type.  Integer-cent amounts keep the aggregate
    exact."""
    from asserts_otel_processor_ray.sources.textio import (
        read_events_csv)

    def _partial(t: pa.Table) -> pa.Table:
        gb = t.group_by("event_type").aggregate(
            [("amount", "sum"), ([], "count_all")])
        return gb.rename_columns(["event_type", "sum_amount",
                                  "n_events"])

    part = read_events_csv().map_batches(_partial,
                                         batch_format="pyarrow")
    df = collect_df(part)
    if df.empty:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "sum_amount": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64())})
    m = df.groupby("event_type", sort=True, as_index=False).sum()
    for c in ("sum_amount", "n_events"):
        m[c] = m[c].astype(np.int64)
    return pa.Table.from_pandas(m, preserve_index=False)


def ensure_source_fixtures() -> None:
    """Write the deterministic JSONL/CSV fixtures if absent.  Called
    at USE time (by the s_* queries and by __ray_entry__.oracle_sql())
    — deliberately NOT at import, so importing this module has no
    filesystem side effect and survives a read-only /tmp."""
    from asserts_otel_processor_ray.sources.textio import (
        ensure_csv_fixture, ensure_jsonl_fixture)
    ensure_jsonl_fixture()
    ensure_csv_fixture()


def _jsonl_sql() -> str:
    from asserts_otel_processor_ray.sources.textio import JSONL_DIR
    return f"""
SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx, role, text,
       tool, make_timestamp(ts) AS ts
FROM read_json('{JSONL_DIR}/*.jsonl', format='newline_delimited')"""


def _csv_sql() -> str:
    from asserts_otel_processor_ray.sources.textio import CSV_DIR
    return f"""
SELECT event_type, CAST(sum(amount) AS BIGINT) AS sum_amount,
       count(*) AS n_events
FROM read_csv('{CSV_DIR}/*.csv')
GROUP BY event_type"""


EXTRA_QUERIES.update({
    "s_jsonl": q_jsonl_source,
    "s_csv_events": q_csv_source,
})

# static strings: the fixture PATHS are constants; the files are
# created lazily by ensure_source_fixtures()
EXTRA_ORACLE_SQL.update({
    "s_jsonl": _jsonl_sql(),
    "s_csv_events": _csv_sql(),
})


# ---- hopping window + percentile-threshold filter --------------------------

HOP_US = 6 * 3600 * 1_000_000          # hop = 6 h
HOP_K = 4                              # window length = 4 hops = 24 h


def q_hopping(sf_dir: str) -> pa.Table:
    """Sliding (hopping) event-time windows: 24-hour windows advancing
    every 6 hours — each event lands in exactly HOP_K windows, so the
    per-batch partial EXPLODES ×HOP_K (numpy tile, no Python loop),
    pre-reduces per (type, window_start), and ONE distributed two-key
    groupby finishes.  Counts exact; max order-independent."""
    from ray.data.aggregate import Max, Sum
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts", "value"])

    def _partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        if len(ts) and ts.min() < 0:
            # fail loud: floored (numpy) vs truncated (SQL) modulo
            # diverge on pre-epoch timestamps
            raise ValueError("pre-epoch ts in events")
        aligned = ts - ts % HOP_US
        k = np.arange(HOP_K, dtype=np.int64)
        # window starts: aligned - k*HOP for k=0..K-1 (all contain ts
        # because window length == K hops)
        win = (aligned[:, None] - k[None, :] * HOP_US).ravel()
        g = pd.DataFrame({
            "event_type": np.repeat(t.column("event_type").to_numpy(
                zero_copy_only=False), HOP_K),
            "win_us": win,
            "value": np.repeat(t.column("value").to_numpy(), HOP_K),
        }).groupby(["event_type", "win_us"], sort=False)["value"] \
            .agg(n_events="size", max_value="max").reset_index()
        g["n_events"] = g["n_events"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(_partial, batch_format="pyarrow") \
        .groupby(["event_type", "win_us"]).aggregate(
            Sum("n_events"), Max("max_value"))
    df = _named(collect_df(agg),
                ["event_type", "win_us", "n_events", "max_value"])
    if df.empty:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "window_start": pa.array([], pa.timestamp("us")),
            "n_events": pa.array([], pa.int64()),
            "max_value": pa.array([], pa.float64())})
    df["window_start"] = pd.to_datetime(df.pop("win_us"), unit="us") \
        .astype("datetime64[us]")
    df["n_events"] = df["n_events"].astype(np.int64)
    return pa.Table.from_pandas(
        df[["event_type", "window_start", "n_events", "max_value"]],
        preserve_index=False)


PCTL_RANK = 90


def q_percentile_filter(sf_dir: str) -> pa.Table:
    """Percentile-threshold quality gating (keep the longest ~10% of
    documents): pass 1 builds the exact (n_chars, count) histogram via
    ONE distributed groupby over per-batch partials (|distinct
    lengths| rows — never the corpus), the driver takes the discrete
    p90 from the cumulative counts, pass 2 is a stateless broadcast
    filter.  The two-scan shape is the 100-TB one: no sort, no
    per-row state, threshold computed from a bounded histogram."""
    import math

    from ray.data.aggregate import Sum
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars"])

    def _hist_partial(t: pa.Table) -> pa.Table:
        gb = t.select(["n_chars"]).group_by(["n_chars"]).aggregate(
            [([], "count_all")])
        return gb.rename_columns(["n_chars", "partial_n"])

    agg = ds.map_batches(_hist_partial, batch_format="pyarrow") \
        .groupby("n_chars").aggregate(Sum("partial_n"))
    h = _named(collect_df(agg), ["n_chars", "n"]) \
        .sort_values("n_chars").reset_index(drop=True)
    if h.empty:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_chars": pa.array([], pa.int64())})
    total = int(h["n"].sum())
    rank = math.ceil(PCTL_RANK / 100 * total)
    cum = h["n"].cumsum().to_numpy()
    thr = int(h["n_chars"].to_numpy()[np.searchsorted(cum, rank)])

    out = ds.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(
            t.column("n_chars"), thr)),
        batch_format="pyarrow")
    df = collect_df(out)
    if df.empty:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_chars": pa.array([], pa.int64())})
    return pa.Table.from_pandas(df, preserve_index=False)


EXTRA_QUERIES.update({
    "g_hopping": q_hopping,
    "d_percentile_filter": q_percentile_filter,
})

EXTRA_ORACLE_SQL.update({
    "g_hopping": f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) AS t, value FROM events),
w AS (
  SELECT event_type,
    (t - t % {HOP_US}) - k.k * {HOP_US} AS win_us, value
  FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k)
SELECT event_type, make_timestamp(win_us) AS window_start,
  count(*) AS n_events, max(value) AS max_value
FROM w GROUP BY 1, 2""",
    "d_percentile_filter": f"""
WITH c AS (
  SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY v),
cum AS (
  SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM c),
thr AS (
  SELECT min(v) AS thr FROM cum
  WHERE cum >= ceil({PCTL_RANK} / 100.0 * (SELECT count(*)
                                           FROM documents)))
SELECT doc_id, n_chars FROM documents, thr WHERE n_chars >= thr""",
})


# ---- source-weighted mixture sampling (epoch mixing) -----------------------
#
# The data-mixing step of an LLM training pipeline: each source gets a
# repeat FACTOR (2.0 = two epochs, 0.5 = half the docs, 1.375 = every
# doc once + 3/8 of them twice).  Factors are kept in eighths so the
# fractional part is an EXACT integer comparison against h mod 8 —
# deterministic, reproducible, and oracle-expressible with no float
# anywhere.  Pure per-batch map + explode: zero shuffle, zero state.

MIX_A = 472_882_049_982_006_893   # < 2^61-1, odd; decorrelated
MIX_B = 104_395_301_778_409_111
# factor in EIGHTHS per source: src_i -> (i*5) % 17 + 4  (0.5x..2.5x)
MIX_FACTORS_8 = {f"src{i}": (i * 5) % 17 + 4 for i in range(20)}


def mixture_sample_batch(t: pa.Table,
                         factors_8: dict[str, int] | None = None
                         ) -> pa.Table:
    """(doc_id, copy_idx) rows: floor(f) full copies per doc plus one
    more iff h mod 8 < the factor's fractional eighths.  Vectorized
    explode via np.repeat + cumsum offsets."""
    from asserts_otel_processor_ray.stages.text_analysis import (
        _MOD, _addmod61, _mulmod61)
    if factors_8 is None:
        factors_8 = MIX_FACTORS_8
    doc_id = t.column("doc_id").to_numpy()
    src = t.column("source").to_numpy(zero_copy_only=False)
    codes, uniq = pd.factorize(src)
    unknown = [u for u in uniq if u not in factors_8]
    if unknown or (codes < 0).any():
        # fail loud: the oracle's inner JOIN would silently drop these
        raise ValueError(
            f"sources without a mixture factor: {unknown or ['<null>']}")
    if (doc_id < 0).any():
        raise ValueError("negative doc_id: floored vs truncated modulo "
                         "would diverge from the SQL oracle")
    fe = np.array([int(factors_8[u]) for u in uniq], np.int64)[codes]
    dm = (doc_id % np.int64(_MOD)).astype(np.uint64)
    h = _addmod61(_mulmod61(dm, MIX_A), MIX_B)
    k = fe // 8 + ((h % np.uint64(8)).astype(np.int64) < fe % 8)
    out_id = np.repeat(doc_id, k)
    # copy_idx = 0..k-1 per doc: global arange minus each doc's offset
    ends = np.cumsum(k)
    copy_idx = np.arange(ends[-1] if len(ends) else 0,
                         dtype=np.int64) - np.repeat(ends - k, k)
    return pa.table({
        "doc_id": pa.array(out_id, pa.int64()),
        "copy_idx": pa.array(copy_idx, pa.int64()),
    })


def q_mixture_sample(sf_dir: str) -> pa.Table:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])
    out = ds.map_batches(mixture_sample_batch, batch_format="pyarrow")
    df = collect_df(out)
    if df.empty:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "copy_idx": pa.array([], pa.int64())})
    return pa.Table.from_pandas(df, preserve_index=False)


def _mixture_sql() -> str:
    vals = ", ".join(f"('{s}', {v})"
                     for s, v in sorted(MIX_FACTORS_8.items()))
    return f"""
WITH fe(source, fe) AS (VALUES {vals}),
d AS (
  SELECT doc_id, source,
    (CAST(doc_id AS HUGEINT) * {MIX_A} + {MIX_B})
      % 2305843009213693951 AS h
  FROM documents),
k AS (
  SELECT doc_id,
    fe // 8 + CASE WHEN d.h % 8 < fe % 8 THEN 1 ELSE 0 END AS k
  FROM d JOIN fe USING (source))
SELECT doc_id, CAST(unnest(range(k)) AS BIGINT) AS copy_idx
FROM k WHERE k > 0"""


EXTRA_QUERIES.update({"d_mixture_sample": q_mixture_sample})
EXTRA_ORACLE_SQL.update({"d_mixture_sample": _mixture_sql()})


# ---- token co-occurrence (PMI numerators) -----------------------------------

COOC_TOPK = 50


def _cooccur_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial pair counts: distinct tokens per doc, all
    a<b pairs via a per-doc self-merge (vectorized; pair count per doc
    is bounded by distinct-tokens², itself bounded by the vocabulary),
    then an in-batch pre-reduce so the exchange moves (pair, count)
    rows, not doc×pair rows."""
    toks = T._tokens_series(batch.column("text"))
    ex = toks.explode().dropna()
    d = pd.DataFrame({"doc": ex.index.to_numpy(),
                      "t": ex.to_numpy()}).drop_duplicates()
    m = d.merge(d, on="doc")
    m = m[m["t_x"] < m["t_y"]]
    g = m.groupby(["t_x", "t_y"], sort=False).size().reset_index(
        name="partial_n")
    return pa.table({
        "ta": pa.array(g["t_x"].to_numpy(), pa.string()),
        "tb": pa.array(g["t_y"].to_numpy(), pa.string()),
        "partial_n": pa.array(g["partial_n"].to_numpy(np.int64),
                              pa.int64()),
    })


def _cooccur_top_block(df: pd.DataFrame, n: int = COOC_TOPK
                       ) -> pd.DataFrame:
    df = df.sort_values(["c_ab", "ta", "tb"],
                        ascending=[False, True, True], kind="mergesort")
    return df.head(n)


def q_cooccur(sf_dir: str) -> pa.Table:
    """Corpus token co-occurrence top-50 with PMI numerators: pair
    counts via distributed groupby over per-batch pre-reduced
    partials → exact two-phase top-50 (each pair lives in one block
    after the groupby) → per-token doc frequencies for JUST the ≤100
    surviving tokens attached from a filtered scan of the distributed
    df table.  All columns exact integers — PMI is
    log(n_docs·c_ab / (c_a·c_b)), one log away, kept out so the
    oracle stays bitwise."""
    import pyarrow.compute as apc
    from ray.data.aggregate import Sum
    docs = _docs(sf_dir)
    part = docs.map_batches(_cooccur_partial, batch_format="pyarrow")
    agg = part.groupby(["ta", "tb"]).aggregate(Sum("partial_n"))
    agg = agg.map_batches(
        lambda t: (t.rename_columns(["ta", "tb", "c_ab"])
                   if t.num_columns == 3 else t),
        batch_format="pyarrow")
    topped = agg.map_batches(_cooccur_top_block, batch_format="pandas")
    tdf = collect_df(topped)
    if tdf.empty:
        return pa.table({"ta": pa.array([], pa.string()),
                         "tb": pa.array([], pa.string()),
                         "c_ab": pa.array([], pa.int64()),
                         "c_a": pa.array([], pa.int64()),
                         "c_b": pa.array([], pa.int64())})
    top = _cooccur_top_block(tdf).reset_index(drop=True)

    need = sorted(set(top["ta"]) | set(top["tb"]))
    dfp = docs.map_batches(T.doc_freq_partial, batch_format="pyarrow")
    dfa = dfp.map_batches(
        lambda t: t.filter(apc.is_in(t.column("token"),
                                     pa.array(need, pa.string()))),
        batch_format="pyarrow").groupby("token").aggregate(
            Sum("partial_df"))
    fdf = _named(collect_df(dfa), ["token", "df"])
    dmap = dict(zip(fdf["token"], fdf["df"].astype(np.int64)))
    top["c_a"] = top["ta"].map(dmap).astype(np.int64)
    top["c_b"] = top["tb"].map(dmap).astype(np.int64)
    top["c_ab"] = top["c_ab"].astype(np.int64)
    return pa.Table.from_pandas(top[["ta", "tb", "c_ab", "c_a", "c_b"]],
                                preserve_index=False)


EXTRA_QUERIES.update({"d_cooccur": q_cooccur})
EXTRA_ORACLE_SQL.update({"d_cooccur": f"""
WITH tok AS (
  SELECT DISTINCT doc_id,
    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
  FROM documents),
pairs AS (
  SELECT a.t AS ta, b.t AS tb, count(*) AS c_ab
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.t < b.t
  GROUP BY 1, 2),
top AS (
  SELECT * FROM pairs ORDER BY c_ab DESC, ta, tb LIMIT {COOC_TOPK}),
df AS (SELECT t, count(*) AS c FROM tok GROUP BY t)
SELECT ta, tb, c_ab, da.c AS c_a, db.c AS c_b
FROM top JOIN df da ON ta = da.t JOIN df db ON tb = db.t"""})


# ---- KMV (k-minimum-values) approximate distinct sketch --------------------
#
# The sketch family entry: estimate COUNT(DISTINCT user_id) per
# event_type from only the K smallest hash values per group.  Unlike
# HLL, KMV is fully deterministic given the hash function, so the
# approximation algorithm itself gets an EXACT oracle: DuckDB computes
# the same K-th-smallest hash and the same estimate expression.
# Shape: per-batch per-group K-smallest partial (tiny) → driver merge
# of blocks×groups×K rows → estimate = (K-1)·M / h_K.  At 100 TB the
# exchange is K·groups·blocks rows of two ints — nothing else moves.

KMV_K = 64
KMV_A = 818_205_325_379_551_653   # < 2^61-1, odd
KMV_B = 266_312_756_309_400_839
KMV_A2 = 592_431_846_559_340_421


def _kmv_partial(t: pa.Table) -> pa.Table:
    """K smallest distinct user-hashes per event_type in this batch.
    Uses the avalanche-MIXED hash: the plain affine map's minimum
    order statistics over sequential ids are structured (measured 3x
    estimator bias); mix_hash61 restores uniformity (est within ~6%
    at n=10k-100k)."""
    from asserts_otel_processor_ray.stages.text_analysis import (
        _MOD, mix_hash61)
    u = t.column("user_id").to_numpy()
    if len(u) and u.min() < 0:
        raise ValueError("negative user_id: floored vs truncated "
                         "modulo would diverge from the SQL oracle")
    um = (u % np.int64(_MOD)).astype(np.uint64)
    h = mix_hash61(um, KMV_A, KMV_B, KMV_A2).astype(np.int64)
    df = pd.DataFrame({
        "event_type": t.column("event_type").to_numpy(
            zero_copy_only=False),
        "h": h,
    }).drop_duplicates()
    df = df.sort_values(["event_type", "h"], kind="mergesort")
    top = df.groupby("event_type", sort=False).head(KMV_K)
    return pa.Table.from_pandas(top, preserve_index=False)


def q_kmv_distinct(sf_dir: str) -> pa.Table:
    """Approximate distinct users per event type via a KMV sketch:
    exact small driver state (groups × K hashes), deterministic
    estimate.  Groups with < K distinct hashes report the exact
    count (the sketch is lossless below K)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    part = ds.map_batches(_kmv_partial, batch_format="pyarrow")
    df = collect_df(part)
    if df.empty:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "kth_hash": pa.array([], pa.int64()),
                         "n_kept": pa.array([], pa.int64()),
                         "est_distinct": pa.array([], pa.float64())})
    df = df.drop_duplicates().sort_values(["event_type", "h"],
                                          kind="mergesort")
    top = df.groupby("event_type", sort=True).head(KMV_K)
    out = top.groupby("event_type", sort=True).agg(
        kth_hash=("h", "max"), n_kept=("h", "size")).reset_index()
    full = out["n_kept"].to_numpy(np.int64) >= KMV_K
    hk = out["kth_hash"].to_numpy(np.int64).astype(np.float64)
    m = float((1 << 61) - 1)
    est = np.where(full, (KMV_K - 1) * m / np.where(hk > 0, hk, 1.0),
                   out["n_kept"].to_numpy(np.int64).astype(np.float64))
    out["kth_hash"] = out["kth_hash"].astype(np.int64)
    out["n_kept"] = out["n_kept"].astype(np.int64)
    out["est_distinct"] = est
    return pa.Table.from_pandas(out, preserve_index=False)


def _kmv_sql() -> str:
    return f"""
WITH h1 AS (
  SELECT DISTINCT event_type,
    CAST((CAST(user_id AS HUGEINT) * {KMV_A} + {KMV_B})
         % 2305843009213693951 AS BIGINT) AS h
  FROM events),
h2 AS (SELECT event_type, xor(h, h >> 31) AS h FROM h1),
h3 AS (SELECT event_type,
         CAST((CAST(h AS HUGEINT) * {KMV_A2})
              % 2305843009213693951 AS BIGINT) AS h FROM h2),
h AS (SELECT DISTINCT event_type, xor(h, h >> 29) AS h FROM h3),
r AS (
  SELECT event_type, h,
    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h),
s AS (
  SELECT event_type, CAST(max(h) AS BIGINT) AS kth_hash,
    count(*) AS n_kept
  FROM r WHERE rn <= {KMV_K} GROUP BY event_type)
SELECT event_type, kth_hash, n_kept,
  CASE WHEN n_kept >= {KMV_K}
    THEN ({KMV_K} - 1) * 2305843009213693951.0 / kth_hash
    ELSE CAST(n_kept AS DOUBLE) END AS est_distinct
FROM s"""


EXTRA_QUERIES.update({"g_kmv_distinct": q_kmv_distinct})
EXTRA_ORACLE_SQL.update({"g_kmv_distinct": _kmv_sql()})


def write_shuffled(ds, out_dir: str, num_partitions: int | None = None):
    """Materialize the deterministic global shuffle: attach (h, shard)
    per batch (payload columns ride along), ONE keyed exchange by
    shard, order each block by (shard, h, doc_id), and write Parquet
    hive-partitioned by shard — each shard directory holds its rows in
    shuffled training order, resumable per shard, and a training
    loader streams shard files in name order.  The only data movement
    is the single hash exchange; there is no global sort.

    With ``num_partitions=None`` the width comes from ``ds.count()`` —
    metadata-only for a bare read_parquet, but it EXECUTES the
    upstream DAG once for a transformed dataset (and write_parquet
    runs it again): pass num_partitions explicitly in that case."""
    if num_partitions is None:
        num_partitions = shuffle_width(ds.count())
    use_hash_shuffle(ds, num_partitions)
    keyed = ds.map_batches(T.shard_attach, batch_format="pyarrow")
    parted = keyed.repartition(num_blocks=num_partitions,
                               keys=["shard"])
    ordered = parted.map_batches(T.shard_order_block,
                                 batch_format="pyarrow",
                                 batch_size=None)
    ordered.write_parquet(out_dir, partition_cols=["shard"])
    return out_dir


# ---- kNN graph construction -------------------------------------------------

KNN_GRAPH_K = 5


def q_knn_graph(sf_dir: str) -> pa.Table:
    """k-nearest-neighbor graph over the embedding corpus (every
    vector's exact top-5 cosine neighbors, self excluded) — the edge
    build behind semantic dedup / clustering / graph-based curation.
    Reuses the exact ANN machinery with queries = ALL vectors: ask
    k+1, drop self, renumber — exact because self (cosine 1.0) either
    occupies one pool slot or is beaten only by other cosine-1.0
    vectors that outrank it anyway.  This exact path doubles as the
    oracle baseline; at corpus scale the same call swaps to
    ann_topk_lsh / ann_topk_ivf (queries shard per batch, candidates
    prune per bucket) exactly as e_ann_lsh/e_ann_ivf demonstrate."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qids = tbl.column("vec_id").to_numpy()
    qm = S._matrix(tbl)
    df = S.ann_topk(_emb(sf_dir), qm, qids, k=KNN_GRAPH_K + 1)
    df = df[df["query_id"] != df["neighbor_id"]]
    df = df.sort_values(["query_id", "rank"], kind="mergesort")
    df["rank"] = df.groupby("query_id", sort=False).cumcount() + 1
    df = df[df["rank"] <= KNN_GRAPH_K].reset_index(drop=True)
    df["rank"] = df["rank"].astype(np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


EXTRA_QUERIES.update({"e_knn_graph": q_knn_graph})
EXTRA_ORACLE_SQL.update({"e_knn_graph": f"""
WITH c AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
    list_cosine_similarity(a.embedding, b.embedding) AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)
SELECT query_id, neighbor_id, rn AS rank FROM (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id) AS rn
  FROM c)
WHERE rn <= {KNN_GRAPH_K}"""})


# ---- OLAP ROLLUP (multi-granularity aggregate in one pass) -----------------

ROLLUP_ALL = "(all)"


def q_rollup(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP (event_type, day): leaf, per-type and grand
    totals from ONE scan — the distributed groupby produces the exact
    leaf table (types × days rows, tiny) and the coarser levels are
    re-aggregated from it on the driver for free (counts add; max of
    max is max — both order-independent).  NULL rollup positions are
    coalesced to sentinels ('(all)' / -1) in engine AND oracle so the
    hash compare never depends on NULL ordering."""
    from ray.data.aggregate import Max, Sum
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts", "value"])

    def _partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        g = pd.DataFrame({
            "event_type": t.column("event_type").to_numpy(
                zero_copy_only=False),
            "day_us": ts - ts % _DAY_US,
            "value": t.column("value").to_numpy(),
        }).groupby(["event_type", "day_us"], sort=False)["value"] \
            .agg(n_events="size", max_value="max").reset_index()
        g["n_events"] = g["n_events"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(_partial, batch_format="pyarrow") \
        .groupby(["event_type", "day_us"]).aggregate(
            Sum("n_events"), Max("max_value"))
    leaf = _named(collect_df(agg),
                  ["event_type", "day_us", "n_events", "max_value"])
    if leaf.empty:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "day_us": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64()),
                         "max_value": pa.array([], pa.float64())})
    leaf["n_events"] = leaf["n_events"].astype(np.int64)
    leaf["day_us"] = leaf["day_us"].astype(np.int64)
    lvl1 = leaf.groupby("event_type", as_index=False).agg(
        n_events=("n_events", "sum"), max_value=("max_value", "max"))
    lvl1["day_us"] = np.int64(-1)
    lvl0 = pd.DataFrame({
        "event_type": [ROLLUP_ALL], "day_us": np.array([-1], np.int64),
        "n_events": np.array([leaf["n_events"].sum()], np.int64),
        "max_value": [leaf["max_value"].max()],
    })
    out = pd.concat([leaf, lvl1, lvl0], ignore_index=True)
    out["n_events"] = out["n_events"].astype(np.int64)
    return pa.Table.from_pandas(
        out[["event_type", "day_us", "n_events", "max_value"]],
        preserve_index=False)


EXTRA_QUERIES.update({"g_rollup": q_rollup})
EXTRA_ORACLE_SQL.update({"g_rollup": f"""
WITH e AS (
  SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us, value
  FROM events)
SELECT COALESCE(event_type, '{ROLLUP_ALL}') AS event_type,
  CAST(COALESCE(day_us, -1) AS BIGINT) AS day_us,
  count(*) AS n_events, max(value) AS max_value
FROM e GROUP BY ROLLUP (event_type, day_us)"""})


# ---- per-key inter-arrival (LAG window) statistics --------------------------

def _lag_stats_block(df: pd.DataFrame) -> pd.DataFrame:
    """Block kernel after repartition(keys=['user_id']): each user's
    events are block-local, so consecutive gaps under the total
    (ts, event_id) order are computed with one vectorized diff.  All
    integers (µs) — the mean is emitted as exact (sum, count) parts."""
    if df.empty:
        return pd.DataFrame({
            "user_id": pd.Series(dtype=np.int64),
            "n_events": pd.Series(dtype=np.int64),
            "first_ts": pd.Series(dtype=np.int64),
            "last_ts": pd.Series(dtype=np.int64),
            "gap_sum_us": pd.Series(dtype=np.int64),
            "max_gap_us": pd.Series(dtype=np.int64)})
    d = df.sort_values(["user_id", "ts", "event_id"],
                       kind="mergesort").reset_index(drop=True)
    u = d["user_id"].to_numpy(np.int64)
    ts = d["ts"].to_numpy(np.int64)
    same = np.r_[False, u[1:] == u[:-1]]
    gap = np.where(same, np.r_[0, ts[1:] - ts[:-1]], 0)
    g = pd.DataFrame({"user_id": u, "ts": ts, "gap": gap,
                      "has_gap": same.astype(np.int64)}) \
        .groupby("user_id", sort=False).agg(
            n_events=("ts", "size"), first_ts=("ts", "min"),
            last_ts=("ts", "max"), gap_sum_us=("gap", "sum"),
            max_gap_us=("gap", "max"),
            n_gaps=("has_gap", "sum")).reset_index()
    # users with one event have no gap: max stays 0, matching the
    # oracle's COALESCE
    for c in g.columns:
        g[c] = g[c].astype(np.int64)
    return g.drop(columns=["n_gaps"])


def q_lag_stats(sf_dir: str) -> pa.Table:
    """LAG-window family: per-user inter-arrival statistics (first /
    last timestamp, total and max gap between consecutive events under
    the deterministic (ts, event_id) order).  ONE hash repartition by
    user — the sessionize/asof partitioning reused — then a block
    kernel; output is one row per user, all exact integers."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts"])
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)

    def _cast(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id").cast(pa.int64()),
            "user_id": t.column("user_id").cast(pa.int64()),
            "ts": t.column("ts").cast(pa.int64()),
        })

    parted = ds.map_batches(_cast, batch_format="pyarrow") \
        .repartition(num_blocks=nparts, keys=["user_id"])
    out = parted.map_batches(_lag_stats_block, batch_format="pandas",
                             batch_size=None)
    df = collect_df(out)
    if df.empty:
        return pa.table({c: pa.array([], pa.int64())
                         for c in ("user_id", "n_events", "first_ts",
                                   "last_ts", "gap_sum_us",
                                   "max_gap_us")})
    return pa.Table.from_pandas(df, preserve_index=False)


EXTRA_QUERIES.update({"g_lag_stats": q_lag_stats})
EXTRA_ORACLE_SQL.update({"g_lag_stats": """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events)
SELECT user_id, count(*) AS n_events,
  CAST(min(ts) AS BIGINT) AS first_ts,
  CAST(max(ts) AS BIGINT) AS last_ts,
  CAST(COALESCE(sum(gap), 0) AS BIGINT) AS gap_sum_us,
  CAST(COALESCE(max(gap), 0) AS BIGINT) AS max_gap_us
FROM e GROUP BY user_id"""})


# ---- pivot / crosstab --------------------------------------------------------

PIVOT_SOURCES = [f"src{i}" for i in range(20)]


def q_pivot(sf_dir: str) -> pa.Table:
    """Crosstab: document counts per language × source, pivoted wide
    (one int64 column per source).  Per-batch two-key partials → ONE
    distributed groupby → the driver pivots the tiny (langs × sources)
    frame.  Unknown sources fail loud (fixed output schema)."""
    from ray.data.aggregate import Sum
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "source"])

    def _partial(t: pa.Table) -> pa.Table:
        gb = t.group_by(["lang", "source"]).aggregate([([], "count_all")])
        return gb.rename_columns(["lang", "source", "partial_n"])

    agg = ds.map_batches(_partial, batch_format="pyarrow") \
        .groupby(["lang", "source"]).aggregate(Sum("partial_n"))
    df = _named(collect_df(agg), ["lang", "source", "n"])
    if df.empty:
        return pa.table({"lang": pa.array([], pa.string()),
                         **{s: pa.array([], pa.int64())
                            for s in PIVOT_SOURCES}})
    unknown = sorted(set(df["source"]) - set(PIVOT_SOURCES))
    if unknown:
        raise ValueError(f"sources outside the pivot schema: {unknown}")
    wide = df.pivot_table(index="lang", columns="source", values="n",
                          aggfunc="sum", fill_value=0) \
        .reindex(columns=PIVOT_SOURCES, fill_value=0) \
        .sort_index().reset_index()
    wide.columns.name = None
    for s in PIVOT_SOURCES:
        wide[s] = wide[s].astype(np.int64)
    return pa.Table.from_pandas(wide, preserve_index=False)


def _pivot_sql() -> str:
    cols = ",\n  ".join(
        f"CAST(count(*) FILTER (source = '{s}') AS BIGINT) AS {s}"
        for s in PIVOT_SOURCES)
    return f"SELECT lang,\n  {cols}\nFROM documents GROUP BY lang"


EXTRA_QUERIES.update({"d_pivot": q_pivot})
EXTRA_ORACLE_SQL.update({"d_pivot": _pivot_sql()})


# ---- Bloom-filter semi-join (broadcast-filter pushdown) ---------------------
#
# The classic big-join accelerator: build a Bloom filter over the
# small side's keys (purchase users), broadcast the BITMAP (m/8 bytes
# — kilobytes, vs the g_semi_join key array's 8 bytes/key), probe
# every event vectorized.  Deterministic hash functions make even the
# FALSE POSITIVES reproducible, so the filter itself gets an exact
# DuckDB oracle: the occupied-position set and the all-k-bits-set
# probe are re-expressed in SQL.

BLOOM_M = 1 << 14                 # bits
BLOOM_SEEDS = (402_653_189, 805_306_457, 201_326_611)   # k = 3, odd


def _bloom_positions(u: np.ndarray) -> np.ndarray:
    """(len(u), k) bit positions via the avalanche-mixed hash —
    order-statistic-quality mixing matters here too (affine maps of
    sequential ids would stripe the bitmap)."""
    from asserts_otel_processor_ray.stages.text_analysis import (
        _MOD, mix_hash61)
    if len(u) and u.min() < 0:
        raise ValueError("negative user_id: floored vs truncated "
                         "modulo would diverge from the SQL oracle")
    um = (u % np.int64(_MOD)).astype(np.uint64)
    cols = [mix_hash61(um, KMV_A, np.uint64(s), KMV_A2)
            % np.uint64(BLOOM_M) for s in BLOOM_SEEDS]
    return np.stack(cols, axis=1).astype(np.int64)


def q_bloom_semi(sf_dir: str) -> pa.Table:
    """Events whose user MIGHT be a buyer, per the Bloom filter —
    counted per event type.  Build: distributed dedupe of per-batch
    position partials → the driver ORs a BLOOM_M-bit bitmap → ONE
    ray.put broadcast.  Probe: pure per-batch bit test.  Includes the
    filter's deterministic false positives — exactly what the oracle
    computes."""
    import pyarrow.compute as apc
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])

    def _pos_partial(t: pa.Table) -> pa.Table:
        buyers = apc.unique(
            t.filter(apc.equal(t.column("event_type"),
                               "purchase")).column("user_id"))
        pos = _bloom_positions(buyers.to_numpy(zero_copy_only=False))
        return pa.table({"pos": pa.array(np.unique(pos.ravel()),
                                         pa.int64())})

    pdf = collect_df(ds.map_batches(_pos_partial,
                                    batch_format="pyarrow"))
    bits = np.zeros(BLOOM_M, bool)
    if not pdf.empty:
        bits[np.unique(pdf["pos"].to_numpy(np.int64))] = True
    ref = ray.put(bits)

    class _ProbeStage:
        def __init__(self, r):
            import ray as _ray
            self.bits = _ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            u = t.column("user_id").to_numpy()
            pos = _bloom_positions(u)
            hit = self.bits[pos].all(axis=1)
            g = pd.DataFrame({
                "event_type": t.column("event_type").to_numpy(
                    zero_copy_only=False),
                "hit": hit.astype(np.int64),
            }).groupby("event_type", sort=False, as_index=False).agg(
                maybe_buyer_events=("hit", "sum"),
                n_events=("hit", "size"))
            for c in ("maybe_buyer_events", "n_events"):
                g[c] = g[c].astype(np.int64)
            return pa.Table.from_pandas(g, preserve_index=False)

    out = ds.map_batches(_ProbeStage, fn_constructor_args=(ref,),
                         batch_format="pyarrow", concurrency=(1, 4))
    df = collect_df(out)
    if df.empty:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "maybe_buyer_events": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64())})
    m = df.groupby("event_type", sort=True, as_index=False).sum()
    for c in ("maybe_buyer_events", "n_events"):
        m[c] = m[c].astype(np.int64)
    return pa.Table.from_pandas(m, preserve_index=False)


def _bloom_sql() -> str:
    mixes = []
    for j, s in enumerate(BLOOM_SEEDS):
        mixes.append(f"""
h{j} AS (
  SELECT user_id, xor(h, h >> 29) % {BLOOM_M} AS pos FROM (
    SELECT user_id,
      CAST((CAST(xor(h, h >> 31) AS HUGEINT) * {KMV_A2})
           % 2305843009213693951 AS BIGINT) AS h
    FROM (SELECT user_id,
            CAST((CAST(user_id AS HUGEINT) * {KMV_A} + {s})
                 % 2305843009213693951 AS BIGINT) AS h
          FROM u)))""")
    return f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
buyers AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'purchase'),
{','.join(m.strip() for m in mixes)},
pos AS (SELECT user_id, 0 AS j, pos FROM h0
        UNION ALL SELECT user_id, 1, pos FROM h1
        UNION ALL SELECT user_id, 2, pos FROM h2),
bset AS (SELECT DISTINCT pos FROM pos
         WHERE user_id IN (SELECT user_id FROM buyers)),
hits AS (
  SELECT p.user_id FROM pos p JOIN bset b ON p.pos = b.pos
  GROUP BY p.user_id HAVING count(*) = 3)
SELECT event_type,
  CAST(count(*) FILTER (user_id IN (SELECT user_id FROM hits))
       AS BIGINT) AS maybe_buyer_events,
  count(*) AS n_events
FROM events GROUP BY event_type"""


EXTRA_QUERIES.update({"g_bloom_semi": q_bloom_semi})
EXTRA_ORACLE_SQL.update({"g_bloom_semi": _bloom_sql()})


# ---- first-seen cohorts (daily new users) -----------------------------------

def q_new_users(sf_dir: str) -> pa.Table:
    """Daily new users — the first-seen growth metric: per-batch
    (user, min ts) partials → ONE distributed groupby(user).min →
    per-batch day-bucket partial counts → tiny exact driver merge.
    The second reduction rides the first's output blocks (users ×
    blocks rows), so only pre-reduced rows ever move."""
    from ray.data.aggregate import Min
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def _first_partial(t: pa.Table) -> pa.Table:
        gb = t.group_by(["user_id"]).aggregate([("ts", "min")])
        return gb.rename_columns(["user_id", "first_ts"])

    agg = ds.map_batches(_first_partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Min("first_ts"))

    def _day_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns != 2:
            return pa.table({"day_us": pa.array([], pa.int64()),
                             "n_new": pa.array([], pa.int64())})
        ts = t.column(1).cast(pa.int64()).to_numpy()
        day = ts - ts % _DAY_US
        uniq, cnt = np.unique(day, return_counts=True)
        return pa.table({"day_us": pa.array(uniq, pa.int64()),
                         "n_new": pa.array(cnt.astype(np.int64),
                                           pa.int64())})

    out = agg.map_batches(_day_partial, batch_format="pyarrow")
    df = collect_df(out)
    if df.empty:
        return pa.table({"day": pa.array([], pa.timestamp("us")),
                         "n_new_users": pa.array([], pa.int64())})
    m = df.groupby("day_us", sort=True, as_index=False)["n_new"].sum()
    return pa.table({
        "day": pa.array(m["day_us"].to_numpy(np.int64)
                        .astype("datetime64[us]"), pa.timestamp("us")),
        "n_new_users": pa.array(m["n_new"].to_numpy(np.int64),
                                pa.int64()),
    })


EXTRA_QUERIES.update({"g_new_users": q_new_users})
EXTRA_ORACLE_SQL.update({"g_new_users": """
WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events
           GROUP BY user_id)
SELECT date_trunc('day', first_ts) AS day,
  count(*) AS n_new_users
FROM f GROUP BY 1"""})


# ---- per-dimension embedding statistics -------------------------------------

def q_dim_stats(sf_dir: str) -> pa.Table:
    """Feature-wise statistics over the embedding matrix (per
    dimension: min, max, n) — the scan a vector-normalization /
    clipping step needs.  Per-batch numpy axis-0 partials (dims × 3
    numbers per batch, regardless of batch size) → tiny driver merge.
    Min/max are order-independent, so the float columns are
    oracle-exact; the mean is one division away and deliberately left
    out (float sums are order-dependent across a distributed scan)."""
    ds = _emb(sf_dir)

    def _partial(t: pa.Table) -> pa.Table:
        m = S._matrix(t)
        d = m.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(1, d + 1, dtype=np.int64),
                            pa.int64()),
            "vmin": pa.array(m.min(axis=0), pa.float64()),
            "vmax": pa.array(m.max(axis=0), pa.float64()),
            "n": pa.array(np.full(d, m.shape[0], np.int64), pa.int64()),
        })

    df = collect_df(ds.map_batches(_partial, batch_format="pyarrow"))
    if df.empty:
        return pa.table({"dim": pa.array([], pa.int64()),
                         "vmin": pa.array([], pa.float64()),
                         "vmax": pa.array([], pa.float64()),
                         "n": pa.array([], pa.int64())})
    m = df.groupby("dim", sort=True).agg(
        vmin=("vmin", "min"), vmax=("vmax", "max"),
        n=("n", "sum")).reset_index()
    m["n"] = m["n"].astype(np.int64)
    return pa.Table.from_pandas(m, preserve_index=False)


EXTRA_QUERIES.update({"e_dim_stats": q_dim_stats})
EXTRA_ORACLE_SQL.update({"e_dim_stats": """
WITH dims AS (
  SELECT unnest(generate_series(1, len(embedding))) AS dim, embedding
  FROM embeddings)
SELECT dim, min(CAST(embedding[dim] AS DOUBLE)) AS vmin,
  max(CAST(embedding[dim] AS DOUBLE)) AS vmax, count(*) AS n
FROM dims GROUP BY dim"""})


# ---- term-distribution drift between corpus halves ---------------------------

DRIFT_TOPK = 20


def q_term_drift(sf_dir: str) -> pa.Table:
    """Distribution-shift detector for corpus QA: split the corpus by
    doc_id parity, count term occurrences on each side (ONE
    distributed groupby over per-batch partials carrying a side key),
    and rank terms by the exact integer cross-product divergence
    |c_even·N_odd − c_odd·N_even| — scale-free like a rate diff but
    with no float anywhere.  Exact two-phase top-20 under the total
    (score desc, token) order."""
    from ray.data.aggregate import Sum
    docs = _docs(sf_dir)

    def _partial(t: pa.Table) -> pa.Table:
        side = (t.column("doc_id").to_numpy() % 2).astype(np.int64)
        toks = T._tokens_series(t.column("text"))
        ex = toks.explode().dropna()
        df = pd.DataFrame({"side": side[ex.index.to_numpy()],
                           "token": ex.to_numpy()})
        g = df.groupby(["side", "token"], sort=False).size() \
            .reset_index(name="partial_c")
        g["partial_c"] = g["partial_c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = docs.map_batches(_partial, batch_format="pyarrow") \
        .groupby(["side", "token"]).aggregate(Sum("partial_c"))
    long = _named(collect_df(agg), ["side", "token", "c"])
    if long.empty:
        return pa.table({"token": pa.array([], pa.string()),
                         "c_even": pa.array([], pa.int64()),
                         "c_odd": pa.array([], pa.int64()),
                         "drift": pa.array([], pa.int64())})
    # NOTE: the driver frame is O(vocab) here; this corpus family has
    # a bounded vocabulary (the doc_freq op's distributed top-K shape
    # is the unbounded-vocab path).
    wide = long.pivot_table(index="token", columns="side", values="c",
                            aggfunc="sum", fill_value=0) \
        .reindex(columns=[0, 1], fill_value=0)
    ce = wide[0].to_numpy(np.int64)
    co = wide[1].to_numpy(np.int64)
    ne, no = int(ce.sum()), int(co.sum())
    drift = np.abs(ce * no - co * ne)
    out = pd.DataFrame({"token": wide.index.to_numpy(),
                        "c_even": ce, "c_odd": co, "drift": drift})
    out = out.sort_values(["drift", "token"],
                          ascending=[False, True], kind="mergesort") \
        .head(DRIFT_TOPK).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


EXTRA_QUERIES.update({"d_term_drift": q_term_drift})
EXTRA_ORACLE_SQL.update({"d_term_drift": f"""
WITH tok AS (
  SELECT doc_id % 2 AS side,
    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents),
c AS (
  SELECT token,
    CAST(count(*) FILTER (side = 0) AS BIGINT) AS c_even,
    CAST(count(*) FILTER (side = 1) AS BIGINT) AS c_odd
  FROM tok GROUP BY token),
n AS (SELECT sum(c_even) AS ne, sum(c_odd) AS no FROM c)
SELECT token, c_even, c_odd,
  CAST(abs(c_even * n.no - c_odd * n.ne) AS BIGINT) AS drift
FROM c, n
ORDER BY drift DESC, token LIMIT {DRIFT_TOPK}"""})


# ---- market-basket pair co-occurrence ----------------------------------------

BASKET_TOPK = 50
_BASKET_PK_BASE = np.int64(1) << 31


def _basket_pairs_block(df: pd.DataFrame) -> pd.DataFrame:
    """Within-order part pairs for a hash partition of lineitem.  The
    repartition makes each order block-local, so pair generation needs
    no further exchange.  Fully vectorized: orders are grouped by
    distinct-part count n, and for each n one triu_indices template is
    broadcast across all that-size orders (TPC-H order sizes are tiny,
    so there are only a handful of templates per block)."""
    cols = {"pk": pd.Series(dtype=np.int64),
            "partial_c": pd.Series(dtype=np.int64)}
    if df.empty:
        return pd.DataFrame(cols)
    d = df.drop_duplicates().sort_values(
        ["l_orderkey", "l_partkey"], kind="mergesort")
    parts = d["l_partkey"].to_numpy(np.int64)
    ok = d["l_orderkey"].to_numpy(np.int64)
    # group starts / sizes over the sorted order column
    change = np.flatnonzero(np.diff(ok)) + 1
    starts = np.concatenate(([0], change))
    sizes = np.diff(np.concatenate((starts, [len(ok)])))
    out_a, out_b = [], []
    for n in np.unique(sizes):
        if n < 2:
            continue
        s = starts[sizes == n]
        iu, ju = np.triu_indices(n, k=1)
        out_a.append(parts[(s[:, None] + iu).ravel()])
        out_b.append(parts[(s[:, None] + ju).ravel()])
    if not out_a:
        return pd.DataFrame(cols)
    pa_arr = np.concatenate(out_a)
    pb_arr = np.concatenate(out_b)
    # pack the pair into ONE int64 key: the multi-key groupby.aggregate
    # is the measured slow path (28.6 s vs <1 s at sf0.01), and a
    # single-key hash repartition + block reduce is the repo's
    # established shape for pair keys.  Fail loud outside the packable
    # range rather than corrupting keys (ADVICE r4 on _ngram_pack_pk).
    if pa_arr.size and (pa_arr.min() < 0 or pb_arr.max() >= _BASKET_PK_BASE):
        raise ValueError("part key outside packable range for pair key")
    g = pd.DataFrame({"pk": pa_arr * _BASKET_PK_BASE + pb_arr}) \
        .groupby("pk", sort=False).size().reset_index(name="partial_c")
    g["partial_c"] = g["partial_c"].astype(np.int64)
    return g


def _basket_reduce_block(df: pd.DataFrame) -> pd.DataFrame:
    """Block-local final for a pk hash partition: each pair key lives
    in exactly ONE partition after the repartition, so a pandas
    groupby-sum here IS the global count, and the per-block top-K
    under the total order (n_orders desc, part_a, part_b) — which the
    packed key preserves, pk ordering == (part_a, part_b) ordering —
    is an exact two-phase top-K."""
    if df.empty:
        return pd.DataFrame({"part_a": pd.Series(dtype=np.int64),
                             "part_b": pd.Series(dtype=np.int64),
                             "n_orders": pd.Series(dtype=np.int64)})
    g = df.groupby("pk", sort=False)["partial_c"].sum().reset_index()
    g = g.sort_values(["partial_c", "pk"], ascending=[False, True],
                      kind="mergesort").head(BASKET_TOPK)
    pk = g["pk"].to_numpy(np.int64)
    return pd.DataFrame({"part_a": pk // _BASKET_PK_BASE,
                         "part_b": pk % _BASKET_PK_BASE,
                         "n_orders": g["partial_c"].to_numpy(np.int64)})


def _basket_topk_final(df: pd.DataFrame) -> pd.DataFrame:
    if df.empty:
        return df
    return df.sort_values(["n_orders", "part_a", "part_b"],
                          ascending=[False, True, True],
                          kind="mergesort").head(BASKET_TOPK)


def q_basket_pairs(sf_dir: str) -> pa.Table:
    """Market-basket analysis over lineitem: the top-50 part pairs by
    the number of orders containing both.  Per-batch (order, part)
    dedupe shrinks the exchange; ONE hash repartition by l_orderkey
    makes orders block-local; pair explosion is bounded by order size
    (≤ a few lines per order, so ≤ ~tens of pairs); pair counts ride a
    SECOND single-int64-key hash repartition (the pair packed as one
    int64 — the multi-key groupby.aggregate is the measured slow path)
    with a block-local reduce and an exact two-phase top-K — the
    driver never holds O(distinct pairs) rows."""
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_partkey"])
    nparts = shuffle_width(li.count())
    use_hash_shuffle(li, nparts)

    def _dedup_partial(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            pd.DataFrame({
                "l_orderkey": t.column("l_orderkey").to_numpy(),
                "l_partkey": t.column("l_partkey").to_numpy(),
            }).drop_duplicates(), preserve_index=False)

    part = li.map_batches(_dedup_partial, batch_format="pyarrow")
    parted = part.repartition(num_blocks=nparts, keys=["l_orderkey"])
    pairs = parted.map_batches(_basket_pairs_block, batch_format="pandas")
    by_pk = pairs.repartition(num_blocks=nparts, keys=["pk"])
    topped = by_pk.map_batches(_basket_reduce_block, batch_format="pandas")
    out = _basket_topk_final(collect_df(topped))
    if out.empty:
        return pa.table({"part_a": pa.array([], pa.int64()),
                         "part_b": pa.array([], pa.int64()),
                         "n_orders": pa.array([], pa.int64())})
    out = out.reset_index(drop=True)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return pa.Table.from_pandas(out[["part_a", "part_b", "n_orders"]],
                                preserve_index=False)


EXTRA_QUERIES.update({"h_basket_pairs": q_basket_pairs})
EXTRA_ORACLE_SQL.update({"h_basket_pairs": f"""
WITH dp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
    count(*) AS n_orders
  FROM dp a JOIN dp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2)
SELECT part_a, part_b, CAST(n_orders AS BIGINT) AS n_orders
FROM p ORDER BY n_orders DESC, part_a, part_b LIMIT {BASKET_TOPK}"""})


# ---- distributed anti-join ---------------------------------------------------

def _anti_join_block(df: pd.DataFrame) -> pd.DataFrame:
    """Block-local anti for one hash partition of the tagged union:
    the repartition co-locates every row of a key, so a key with no
    probe-side (side=1) row here has none anywhere."""
    if df.empty:
        return pd.DataFrame({"c_custkey": pd.Series(dtype=np.int64),
                             "c_nationkey": pd.Series(dtype=np.int64),
                             "c_acctbal": pd.Series(dtype=np.float64)})
    have = np.unique(df.loc[df["side"] == 1, "key"].to_numpy(np.int64))
    keep = df[(df["side"] == 0)
              & ~df["key"].isin(have)]
    return pd.DataFrame({
        "c_custkey": keep["key"].to_numpy(np.int64),
        "c_nationkey": keep["c_nationkey"].to_numpy(np.int64),
        "c_acctbal": keep["c_acctbal"].to_numpy(np.float64)})


def q_anti_join(sf_dir: str) -> pa.Table:
    """Distributed ANTI join — customers who never placed an order —
    as a tagged union: build side (customer rows, side=0, payload
    kept) and probe side (per-batch-deduped order custkeys, side=1)
    are unioned into ONE dataset and hash-repartitioned by key ONCE;
    each block then drops build rows whose key has a probe row.  No
    broadcast (exact even when the probe side's distinct-key set
    exceeds driver memory — the complement of the Bloom/semi-join
    family, where false positives would here LOSE rows)."""
    import pyarrow.compute as apc
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"])
    ords = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_custkey"])

    def _build_side(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": t.column("c_custkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            "c_nationkey": t.column("c_nationkey").cast(pa.int64()),
            "c_acctbal": t.column("c_acctbal").cast(pa.float64())})

    def _probe_side(t: pa.Table) -> pa.Table:
        u = apc.unique(t.column("o_custkey").cast(pa.int64()))
        n = len(u)
        return pa.table({
            "key": u,
            "side": pa.array(np.ones(n, np.int8), pa.int8()),
            "c_nationkey": pa.array(np.zeros(n, np.int64), pa.int64()),
            "c_acctbal": pa.array(np.zeros(n, np.float64), pa.float64())})

    tagged = cust.map_batches(_build_side, batch_format="pyarrow").union(
        ords.map_batches(_probe_side, batch_format="pyarrow"))
    nparts = shuffle_width(cust.count() + ords.count())
    use_hash_shuffle(tagged, nparts)
    parted = tagged.repartition(num_blocks=nparts, keys=["key"])
    out = collect_df(parted.map_batches(_anti_join_block,
                                        batch_format="pandas"))
    if out.empty:
        return pa.table({"c_custkey": pa.array([], pa.int64()),
                         "c_nationkey": pa.array([], pa.int64()),
                         "c_acctbal": pa.array([], pa.float64())})
    out["c_custkey"] = out["c_custkey"].astype(np.int64)
    out["c_nationkey"] = out["c_nationkey"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


EXTRA_QUERIES.update({"h_anti_join": q_anti_join})
EXTRA_ORACLE_SQL.update({"h_anti_join": """
SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey, c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"""})


# ---- lexical diversity (type-token ratio) ------------------------------------

def _ttr_batch(t: pa.Table) -> pa.Table:
    """Per-document type-token ratio — doc-local, so a pure map stage
    with no exchange.  Counts are exact integers; the ratio is ONE
    IEEE division mirrored verbatim by the oracle (no float sums to
    drift across a distributed scan)."""
    import pyarrow.compute as apc
    if t.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "n_types": pa.array([], pa.int64()),
                         "ttr": pa.array([], pa.float64())})
    toks = T._tokens_series(t.column("text"))
    ids = t.column("doc_id").to_numpy()
    n_tokens = toks.str.len().to_numpy(np.int64)
    ex = toks.explode()
    long = pd.DataFrame({"row": ex.index.to_numpy(), "token": ex.to_numpy()})
    n_types = long.drop_duplicates().groupby("row", sort=True).size() \
        .reindex(np.arange(len(ids)), fill_value=0).to_numpy(np.int64)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_types": pa.array(n_types, pa.int64()),
        "ttr": pa.array(n_types.astype(np.float64)
                        / n_tokens.astype(np.float64), pa.float64())})


def q_ttr(sf_dir: str) -> pa.Table:
    """Lexical-diversity scoring for corpus curation: per-doc token
    count, distinct-token count and type-token ratio."""
    part = _docs(sf_dir).map_batches(_ttr_batch, batch_format="pyarrow")
    df = collect_df(part)
    if df.empty:
        return _ttr_batch(pa.table({"doc_id": pa.array([], pa.int64()),
                                    "text": pa.array([], pa.string())}))
    return pa.Table.from_pandas(df, preserve_index=False)


EXTRA_QUERIES.update({"d_ttr": q_ttr})
EXTRA_ORACLE_SQL.update({"d_ttr": """
WITH tok AS (
  SELECT doc_id,
    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents)
SELECT doc_id, count(*) AS n_tokens,
  count(DISTINCT token) AS n_types,
  CAST(count(DISTINCT token) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS ttr
FROM tok GROUP BY doc_id"""})


# ---- equi-width value histogram ----------------------------------------------

HIST_NBINS = 10


def q_value_histogram(sf_dir: str) -> pa.Table:
    """Equi-width histogram of event value per event type — the
    classic TWO-scan shape: pass 1 reduces (min, max) per batch to a
    driver pair of scalars (order-independent, so float-exact); pass 2
    bins each batch with one affine expression mirrored token-for-token
    by the oracle (floor((v − min)·nb / (max − min)) — IEEE doubles are
    deterministic, so identical expressions give identical bins) and
    emits per-batch (type, bin) partial counts; the driver merge holds
    ≤ blocks × types × nb rows."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def _minmax(t: pa.Table) -> pa.Table:
        import pyarrow.compute as apc
        if t.num_rows == 0:
            return pa.table({"vmin": pa.array([], pa.float64()),
                             "vmax": pa.array([], pa.float64())})
        return pa.table({
            "vmin": pa.array([apc.min(t.column("value")).as_py()],
                             pa.float64()),
            "vmax": pa.array([apc.max(t.column("value")).as_py()],
                             pa.float64())})

    mm = collect_df(ds.map_batches(_minmax, batch_format="pyarrow"))
    if mm.empty:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "bin": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64())})
    vmin, vmax = float(mm["vmin"].min()), float(mm["vmax"].max())
    span = vmax - vmin

    def _bin_partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy()
        if span > 0:
            b = np.minimum(np.floor((v - vmin) * float(HIST_NBINS) / span),
                           HIST_NBINS - 1).astype(np.int64)
        else:
            b = np.zeros(len(v), np.int64)
        g = pd.DataFrame({"event_type": t.column("event_type").to_numpy(),
                          "bin": b}) \
            .groupby(["event_type", "bin"], sort=False).size() \
            .reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    df = collect_df(ds.map_batches(_bin_partial, batch_format="pyarrow"))
    out = df.groupby(["event_type", "bin"], sort=True, as_index=False)["c"] \
        .sum().rename(columns={"c": "n_events"})
    out["n_events"] = out["n_events"].astype(np.int64)
    out["bin"] = out["bin"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


EXTRA_QUERIES.update({"g_value_histogram": q_value_histogram})
EXTRA_ORACLE_SQL.update({"g_value_histogram": f"""
WITH mm AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events)
SELECT event_type,
  CASE WHEN mm.vmax > mm.vmin THEN least(CAST(floor(
      (value - mm.vmin) * {HIST_NBINS}.0 / (mm.vmax - mm.vmin))
      AS BIGINT), {HIST_NBINS - 1}) ELSE 0 END AS bin,
  count(*) AS n_events
FROM events, mm GROUP BY 1, 2"""})


# ---- distributed NTILE (quartile bucketing) ------------------------------------

NTILE_K = 4


def _ntile_bucket(rank: np.ndarray, n: int, k: int) -> np.ndarray:
    """DuckDB/ANSI ntile(k) from a 0-based global rank: the first
    n%k buckets hold n//k+1 rows, the rest n//k (rows with rank < k
    when n < k each get their own bucket — the size-0 else-branch is
    unreachable then because rem == n)."""
    size, rem = divmod(n, k)
    head = rem * (size + 1)
    b = np.empty(len(rank), np.int64)
    lo = rank < head
    b[lo] = rank[lo] // (size + 1) + 1
    if size:
        b[~lo] = rem + (rank[~lo] - head) // size + 1
    return b


def q_user_ntile(sf_dir: str) -> pa.Table:
    """Quartile bucketing of users by activity — a distributed exact
    NTILE with no global sort: (1) per-user event counts via ONE
    keyed exchange + block reduce; (2) the count-HISTOGRAM of those
    counts (a per-batch partial, |distinct activity levels| rows)
    gives the driver every tie-group's base rank; (3) one hash
    repartition by n_events co-locates each tie group, whose
    block-local user_id cumcount completes the exact global rank —
    rank = base[v] + tie_idx mirrors ORDER BY (n_events, user_id)."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])

    def _cnt_partial(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({"user_id": t.column("user_id").to_numpy()}) \
            .groupby("user_id", sort=False).size().reset_index(name="partial_c")
        g["partial_c"] = g["partial_c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    nparts = shuffle_width(ev.count())
    use_hash_shuffle(ev, nparts)

    def _cnt_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                                 "n_events": pd.Series(dtype=np.int64)})
        g = df.groupby("user_id", sort=False)["partial_c"].sum() \
            .reset_index(name="n_events")
        g["n_events"] = g["n_events"].astype(np.int64)
        return g

    # per-user totals via repartition + block reduce (each user is
    # block-local after the keyed exchange) — the groupby.aggregate
    # under a hash-shuffle context pays a wide aggregator-pool startup
    # (measured 27 s vs 7 s for this query at sf0.01)
    agg = ev.map_batches(_cnt_partial, batch_format="pyarrow") \
        .repartition(num_blocks=nparts, keys=["user_id"]) \
        .map_batches(_cnt_block, batch_format="pandas")

    def _hist_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_events" not in t.column_names:
            return pa.table({"v": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        v, c = np.unique(
            t.column("n_events").to_numpy(zero_copy_only=False)
            .astype(np.int64), return_counts=True)
        return pa.table({"v": pa.array(v, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    hist = collect_df(agg.map_batches(_hist_partial, batch_format="pyarrow"))
    if hist.empty:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64()),
                         "quartile": pa.array([], pa.int64())})
    h = hist.groupby("v", sort=True)["c"].sum()
    n_users = int(h.sum())
    # sorted (value, base-rank) arrays: the block kernel maps values
    # to base ranks with one searchsorted — no per-row Python
    base_vals = h.index.to_numpy(np.int64)
    base_ranks = np.concatenate(
        ([0], np.cumsum(h.to_numpy(np.int64))[:-1]))
    base_ref = ray.put((base_vals, base_ranks))

    class _NtileBlock:
        def __init__(self, r, n):
            import ray as _ray
            self.vals, self.ranks = _ray.get(r)
            self.n = n

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if df.empty or "n_events" not in df.columns:
                return pd.DataFrame({
                    "user_id": pd.Series(dtype=np.int64),
                    "n_events": pd.Series(dtype=np.int64),
                    "quartile": pd.Series(dtype=np.int64)})
            d = df.sort_values(["n_events", "user_id"], kind="mergesort")
            tie = d.groupby("n_events", sort=False).cumcount().to_numpy(np.int64)
            v = d["n_events"].to_numpy(np.int64)
            rank = self.ranks[np.searchsorted(self.vals, v)] + tie
            return pd.DataFrame({
                "user_id": d["user_id"].to_numpy(np.int64),
                "n_events": v,
                "quartile": _ntile_bucket(rank, self.n, NTILE_K)})

    parted = agg.repartition(num_blocks=nparts, keys=["n_events"])
    out = collect_df(parted.map_batches(
        _NtileBlock, fn_constructor_args=(base_ref, n_users),
        batch_format="pandas", concurrency=(1, 8)))
    return pa.Table.from_pandas(out, preserve_index=False)


EXTRA_QUERIES.update({"g_user_ntile": q_user_ntile})
EXTRA_ORACLE_SQL.update({"g_user_ntile": f"""
WITH c AS (SELECT user_id, count(*) AS n_events FROM events
           GROUP BY user_id)
SELECT user_id, n_events,
  CAST(ntile({NTILE_K}) OVER (ORDER BY n_events, user_id) AS BIGINT)
    AS quartile
FROM c"""})


# ---- per-user modal event type -------------------------------------------------

def q_user_mode(sf_dir: str) -> pa.Table:
    """Per-user MODE (most frequent event type, ties to the
    lexicographically smallest type): per-batch (user, type) count
    partials shrink the exchange; ONE hash repartition by user_id
    makes each user's partials block-local, where a sum + total-order
    sort + first-row-per-user completes the exact argmax — no global
    sort, no O(users × types) driver frame."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])

    def _pair_partial(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "user_id": t.column("user_id").to_numpy(),
            "event_type": t.column("event_type").to_numpy(),
        }).groupby(["user_id", "event_type"], sort=False).size() \
            .reset_index(name="partial_c")
        g["partial_c"] = g["partial_c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _mode_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "user_id": pd.Series(dtype=np.int64),
                "mode_type": pd.Series(dtype=object),
                "n": pd.Series(dtype=np.int64)})
        g = df.groupby(["user_id", "event_type"], sort=False)["partial_c"] \
            .sum().reset_index(name="n")
        g = g.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="mergesort")
        top = g.groupby("user_id", sort=False).head(1)
        return pd.DataFrame({"user_id": top["user_id"].to_numpy(np.int64),
                             "mode_type": top["event_type"].to_numpy(),
                             "n": top["n"].to_numpy(np.int64)})

    nparts = shuffle_width(ev.count())
    use_hash_shuffle(ev, nparts)
    out = collect_df(
        ev.map_batches(_pair_partial, batch_format="pyarrow")
        .repartition(num_blocks=nparts, keys=["user_id"])
        .map_batches(_mode_block, batch_format="pandas"))
    if out.empty:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "mode_type": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    return pa.Table.from_pandas(out, preserve_index=False)


EXTRA_QUERIES.update({"g_user_mode": q_user_mode})
EXTRA_ORACLE_SQL.update({"g_user_mode": """
WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events
           GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY n DESC, event_type) AS rn FROM c)
SELECT user_id, event_type AS mode_type, n FROM r WHERE rn = 1"""})


# ---- CUBE aggregate ------------------------------------------------------------

def q_cube(sf_dir: str) -> pa.Table:
    """GROUP BY CUBE (event_type, weekday): all four granularities —
    leaf, per-type, per-weekday, grand — synthesized from ONE pass of
    per-batch leaf count partials (types × 7 rows per batch) and a
    tiny driver merge; NULL dimension values mark rolled-up levels as
    in ANSI CUBE.  Weekday is an epoch-day modulus (epoch day 0 is a
    Thursday → weekday 4), not a calendar lookup, mirrored verbatim
    by the oracle."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts"])

    def _leaf_partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        wd = ((ts // _DAY_US) + 4) % 7
        g = pd.DataFrame({"event_type": t.column("event_type").to_numpy(),
                          "weekday": wd.astype(np.int64)}) \
            .groupby(["event_type", "weekday"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    df = collect_df(ds.map_batches(_leaf_partial, batch_format="pyarrow"))
    if df.empty:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "weekday": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64())})
    leaf = df.groupby(["event_type", "weekday"], sort=True,
                      as_index=False)["c"].sum()
    by_type = leaf.groupby("event_type", as_index=False)["c"].sum()
    by_type["weekday"] = np.nan
    by_wd = leaf.groupby("weekday", as_index=False)["c"].sum()
    by_wd["event_type"] = None
    grand = pd.DataFrame({"event_type": [None], "weekday": [np.nan],
                          "c": [leaf["c"].sum()]})
    out = pd.concat([leaf, by_type, by_wd, grand], ignore_index=True)
    return pa.table({
        "event_type": pa.array(out["event_type"].tolist(), pa.string()),
        "weekday": pa.array(
            [None if pd.isna(v) else int(v) for v in out["weekday"]],
            pa.int64()),
        "n_events": pa.array(out["c"].to_numpy(np.int64), pa.int64())})


EXTRA_QUERIES.update({"g_cube": q_cube})
EXTRA_ORACLE_SQL.update({"g_cube": """
SELECT event_type,
  CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT) AS weekday,
  count(*) AS n_events
FROM events GROUP BY CUBE (1, 2)"""})


# ---- banded edit-distance near-dup --------------------------------------------

EDIT_PREFIX = 8      # band key: docs sharing this lowered prefix
EDIT_WIDTH = 32      # distance computed on this prefix
EDIT_MAX_DIST = 8


def _edit_pairs_block(df: pd.DataFrame) -> pd.DataFrame:
    """All within-band pairs for one hash partition of prefix bands,
    with the MinHash-style hot-bucket guard (a degenerate band —
    boilerplate-heavy corpora — would otherwise trigger O(|band|²)
    work in one task; skipped bands are logged, and at sf scales the
    cap never fires so the SQL oracle needs no mirror)."""
    out_cols = {"doc_a": pd.Series(dtype=np.int64),
                "doc_b": pd.Series(dtype=np.int64),
                "dist": pd.Series(dtype=np.int64)}
    if df.empty:
        return pd.DataFrame(out_cols)
    d = df.sort_values(["pfx", "doc_id"], kind="mergesort")
    ids = d["doc_id"].to_numpy(np.int64)
    p32 = d["p32"].to_numpy()
    pfx = d["pfx"].to_numpy()
    change = np.flatnonzero(pfx[1:] != pfx[:-1]) + 1
    starts = np.concatenate(([0], change))
    sizes = np.diff(np.concatenate((starts, [len(pfx)])))
    ia, ib = [], []
    for n in np.unique(sizes):
        if n < 2:
            continue
        if n > D.DEFAULT_MAX_BUCKET:
            import logging
            logging.getLogger(__name__).warning(
                "edit_pairs: skipping %d bands of size %d (> cap %d)",
                int((sizes == n).sum()), int(n), D.DEFAULT_MAX_BUCKET)
            continue
        s = starts[sizes == n]
        iu, ju = np.triu_indices(n, k=1)
        ia.append((s[:, None] + iu).ravel())
        ib.append((s[:, None] + ju).ravel())
    if not ia:
        return pd.DataFrame(out_cols)
    ia = np.concatenate(ia)
    ib = np.concatenate(ib)
    dist = D.edit_distances_vectorized(p32[ia], p32[ib], EDIT_WIDTH)
    keep = dist <= EDIT_MAX_DIST
    return pd.DataFrame({"doc_a": ids[ia[keep]], "doc_b": ids[ib[keep]],
                         "dist": dist[keep].astype(np.int64)})


def q_edit_pairs(sf_dir: str) -> pa.Table:
    """Edit-distance near-dup pairs: docs sharing an 8-char lowered
    prefix band whose 32-char prefixes are within Levenshtein 8.
    ONE hash repartition by band key co-locates each band; pair
    explosion is band-local and hot-bucket-capped; the distance
    kernel is the vectorized row DP (no per-cell Python).  The LSH
    analog for EDIT similarity, where MinHash's set semantics don't
    apply."""
    import pyarrow.compute as apc
    docs = _docs(sf_dir)

    def _keys(t: pa.Table) -> pa.Table:
        norm = apc.utf8_lower(apc.utf8_trim_whitespace(t.column("text")))
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "pfx": apc.utf8_slice_codeunits(norm, 0, EDIT_PREFIX),
            "p32": apc.utf8_slice_codeunits(norm, 0, EDIT_WIDTH)})

    nparts = shuffle_width(docs.count())
    use_hash_shuffle(docs, nparts)
    out = collect_df(docs.map_batches(_keys, batch_format="pyarrow")
                     .repartition(num_blocks=nparts, keys=["pfx"])
                     .map_batches(_edit_pairs_block, batch_format="pandas"))
    if out.empty:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "dist": pa.array([], pa.int64())})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


EXTRA_QUERIES.update({"d_edit_pairs": q_edit_pairs})
EXTRA_ORACLE_SQL.update({"d_edit_pairs": f"""
WITH d AS (SELECT doc_id,
    substr(lower(trim(text)), 1, {EDIT_PREFIX}) AS pfx,
    substr(lower(trim(text)), 1, {EDIT_WIDTH}) AS p32
  FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(levenshtein(a.p32, b.p32) AS BIGINT) AS dist
FROM d a JOIN d b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
WHERE levenshtein(a.p32, b.p32) <= {EDIT_MAX_DIST}"""})


# ---- TPC-H-Q4-style priority count (EXISTS via max-reduction semi-join) --------

Q4_LATE_DAYS = 60


def _q4_block(df: pd.DataFrame) -> pd.DataFrame:
    """Block-local EXISTS: after the keyed exchange each order's row
    and its lineitem max-shipdate partials are co-located, and
    EXISTS(shipdate > orderdate + Δ) ≡ max(shipdate) > orderdate + Δ —
    the max is an algebraic reduction, so the probe side shipped only
    per-batch (orderkey, max) partials, never lineitem rows."""
    if df.empty:
        return pd.DataFrame({"o_orderpriority": pd.Series(dtype=object),
                             "partial_n": pd.Series(dtype=np.int64)})
    probe = df[df["side"] == 1].groupby("key", sort=False)["ship_us"].max()
    build = df[df["side"] == 0]
    ship = probe.reindex(build["key"]).to_numpy()
    late = ship > (build["odate_us"].to_numpy(np.int64)
                   + Q4_LATE_DAYS * _DAY_US)
    g = build.loc[late].groupby("o_orderpriority", sort=False).size() \
        .reset_index(name="partial_n")
    g["partial_n"] = g["partial_n"].astype(np.int64)
    return g


def q_q4_priority(sf_dir: str) -> pa.Table:
    """Late-order count per priority (the TPC-H Q4 shape adapted to
    this schema): orders for which ANY lineitem shipped more than 60
    days after the order date.  Tagged union of the build side
    (orders: key, priority, orderdate) and an already-max-reduced
    probe side (lineitem: per-batch (orderkey, max shipdate)) → ONE
    hash repartition by orderkey → block-local EXISTS + priority
    partial counts → tiny driver merge (priorities × blocks rows)."""
    ords = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"])
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_shipdate"])

    def _build(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": t.column("o_orderkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            "o_orderpriority": t.column("o_orderpriority"),
            "odate_us": t.column("o_orderdate").cast(pa.int64()),
            "ship_us": pa.array(np.zeros(n, np.int64), pa.int64())})

    def _probe(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "key": t.column("l_orderkey").to_numpy(),
            "ship_us": t.column("l_shipdate").cast(pa.int64()).to_numpy(),
        }).groupby("key", sort=False)["ship_us"].max().reset_index()
        n = len(g)
        return pa.table({
            "key": pa.array(g["key"].to_numpy(np.int64), pa.int64()),
            "side": pa.array(np.ones(n, np.int8), pa.int8()),
            "o_orderpriority": pa.array([""] * n, pa.string()),
            "odate_us": pa.array(np.zeros(n, np.int64), pa.int64()),
            "ship_us": pa.array(g["ship_us"].to_numpy(np.int64),
                                pa.int64())})

    tagged = ords.map_batches(_build, batch_format="pyarrow").union(
        li.map_batches(_probe, batch_format="pyarrow"))
    nparts = shuffle_width(ords.count() + li.count())
    use_hash_shuffle(tagged, nparts)
    parted = tagged.repartition(num_blocks=nparts, keys=["key"])
    df = collect_df(parted.map_batches(_q4_block, batch_format="pandas"))
    if df.empty:
        return pa.table({"o_orderpriority": pa.array([], pa.string()),
                         "n_orders": pa.array([], pa.int64())})
    out = df.groupby("o_orderpriority", sort=True, as_index=False)[
        "partial_n"].sum().rename(columns={"partial_n": "n_orders"})
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


EXTRA_QUERIES.update({"h_q4_priority": q_q4_priority})
EXTRA_ORACLE_SQL.update({"h_q4_priority": f"""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY)
GROUP BY 1"""})


# ---- embedding near-dup clusters ------------------------------------------------

def q_embed_clusters(sf_dir: str) -> pa.Table:
    """Connected components over the embedding-cosine near-dup graph
    (the vector-side sibling of d_dedup_clusters): pairs from the
    distributed banded-LSH path with exact cosine verify, then
    driver union-find up to DEDUP_PAIR_BUDGET pairs and the
    distributed hash-to-min label propagation beyond it.  Cluster id =
    component-min vec_id; the oracle's recursive transitive closure
    runs over the EXACT cross-join pair set, so the LSH path's
    recall-1.0 property is byte-checked, not assumed."""
    ds = _emb(sf_dir)
    dim = len(ds.take(1)[0]["embedding"])
    pairs = S.embedding_near_dup(ds, threshold=0.45, dim=dim)
    if len(pairs) > DEDUP_PAIR_BUDGET:
        pairs_ds = ray.data.from_pandas(
            pairs.rename(columns={"vec_a": "doc_a", "vec_b": "doc_b"}))
        cc = D.connected_components_distributed(pairs_ds) \
            .sort_values("node", ignore_index=True)
        return pa.table({
            "vec_id": pa.array(cc["node"].to_numpy(np.int64), pa.int64()),
            "cluster_id": pa.array(cc["label"].to_numpy(np.int64),
                                   pa.int64())})
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["vec_a"], pairs["vec_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(set(pairs["vec_a"]) | set(pairs["vec_b"]))
    return pa.table({
        "vec_id": pa.array(np.array(nodes, np.int64), pa.int64()),
        "cluster_id": pa.array(
            np.array([find(int(v)) for v in nodes], np.int64),
            pa.int64())})


EXTRA_QUERIES.update({"e_embed_clusters": q_embed_clusters})
EXTRA_ORACLE_SQL.update({"e_embed_clusters": """
WITH RECURSIVE np AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45),
und AS (SELECT vec_a AS a, vec_b AS b FROM np
        UNION SELECT vec_b, vec_a FROM np),
reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
comp AS (SELECT a AS vec_id, least(a, min(b)) AS cluster_id
         FROM reach GROUP BY a)
SELECT vec_id, cluster_id FROM comp"""})


# ---- product-quantization codes -------------------------------------------------

def q_pq_codes(sf_dir: str) -> pa.Table:
    """Product-quantization encoding of the embedding corpus — the
    memory-compression step an ANN index runs before scale-out (dim
    floats → m small codes per vector).  Pure actor-pool map stage:
    codebooks once per actor, one matmul per subspace per batch."""
    out = _emb(sf_dir).map_batches(
        S.PQCodesStage, fn_constructor_args=(_EMB_DIM,),
        batch_format="pyarrow", concurrency=(1, 8))
    df = collect_df(out)
    if df.empty:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "subspace": pa.array([], pa.int64()),
                         "code": pa.array([], pa.int64())})
    return pa.Table.from_pandas(df, preserve_index=False)


def _pq_codes_sql(dim: int = _EMB_DIM, m: int = S.PQ_M,
                  ksub: int = S.PQ_KSUB) -> str:
    """SQL mirror of PQCodesStage: each (subspace, code) codebook row
    is zero-padded to full dim and emitted as a DOUBLE[] literal, so a
    sub-vector dot product is a full-vector dot product; code =
    first-max list_position, the numpy argmax mirror."""
    books = S.pq_centroids(dim, m, ksub)
    sub = dim // m
    selects = []
    for s in range(m):
        lits = []
        for c in range(ksub):
            full = np.zeros(dim)
            full[s * sub:(s + 1) * sub] = books[s, c]
            lits.append("[" + ", ".join(repr(float(x)) for x in full) + "]")
        dots = ", ".join(
            f"list_dot_product(e, CAST({lit} AS DOUBLE[]))" for lit in lits)
        selects.append(f"""
SELECT vec_id, CAST({s} AS BIGINT) AS subspace,
  CAST(list_position(dl, list_aggregate(dl, 'max')) - 1 AS BIGINT)
    AS code
FROM (SELECT vec_id, [{dots}] AS dl
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings))""")
    return " UNION ALL ".join(selects)


EXTRA_QUERIES.update({"e_pq_codes": q_pq_codes})
EXTRA_ORACLE_SQL.update({"e_pq_codes": _pq_codes_sql()})


# ---- language-ID confusion matrix -----------------------------------------------

def q_lang_confusion(sf_dir: str) -> pa.Table:
    """Quality evaluation of the language-ID heuristic: confusion
    matrix of (labelled lang, predicted lang).  One map pass — the
    langid scores never leave the batch, only per-batch (lang, pred)
    partial counts do — and a tiny driver merge (|langs|² rows)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])

    def _partial(t: pa.Table) -> pa.Table:
        pred = T.langid_batch(t).column("pred_lang").to_numpy()
        g = pd.DataFrame({"lang": t.column("lang").to_numpy(),
                          "pred_lang": pred}) \
            .groupby(["lang", "pred_lang"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    df = collect_df(ds.map_batches(_partial, batch_format="pyarrow"))
    if df.empty:
        return pa.table({"lang": pa.array([], pa.string()),
                         "pred_lang": pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64())})
    out = df.groupby(["lang", "pred_lang"], sort=True, as_index=False)[
        "c"].sum().rename(columns={"c": "n_docs"})
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def _lang_confusion_sql() -> str:
    """Confusion-matrix mirror sharing _langid_sql's scoring pieces
    (same marker lists, same first-max-in-LANG_ORDER tie-break)."""
    score_cols = []
    for lang in T.LANG_ORDER:
        markers = ", ".join(f"'{m}'" for m in T.LANG_MARKERS[lang])
        score_cols.append(
            f"len(list_filter(t, x -> x IN ({markers}))) AS score_{lang}")
    branches = []
    for lang in T.LANG_ORDER:
        others = [o for o in T.LANG_ORDER if o != lang]
        cond = " AND ".join(f"score_{lang} >= score_{o}" for o in others)
        branches.append(f"WHEN {cond} THEN '{lang}'")
    greatest = ", ".join(f"score_{o}" for o in T.LANG_ORDER)
    pred = (f"CASE WHEN greatest({greatest}) = 0 THEN 'und' "
            + " ".join(branches) + " END")
    return f"""
WITH toks AS (
  SELECT lang,
    regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents),
scored AS (
  SELECT lang, {", ".join(score_cols)} FROM toks)
SELECT lang, {pred} AS pred_lang, count(*) AS n_docs
FROM scored GROUP BY 1, 2"""


EXTRA_QUERIES.update({"d_lang_confusion": q_lang_confusion})
EXTRA_ORACLE_SQL.update({"d_lang_confusion": _lang_confusion_sql()})


# ---- last-touch attribution ------------------------------------------------------

def _attribution_block(df: pd.DataFrame) -> pd.DataFrame:
    """Per-user last-touch scan: after the keyed exchange each user's
    events are block-local; one sort + a running last-non-purchase
    index (maximum.accumulate) attributes every purchase — no
    per-event Python, no self-join."""
    if df.empty:
        return pd.DataFrame({"purchase_id": pd.Series(dtype=np.int64),
                             "touch_id": pd.Series(dtype=np.int64),
                             "touch_type": pd.Series(dtype=object)})
    d = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ids = d["event_id"].to_numpy(np.int64)
    et = d["event_type"].to_numpy()
    is_p = et == "purchase"
    pos = np.arange(len(d))
    # last non-purchase position at-or-before each row, per user
    # (groupby cummax resets at user boundaries); the global shift
    # then leaks each user's final value into the next user's first
    # row, which ubreak masks back to "no prior touch"
    cand = np.where(~is_p, pos, -1)
    ubreak = np.concatenate(
        ([True], d["user_id"].to_numpy()[1:] != d["user_id"].to_numpy()[:-1]))
    last = pd.Series(cand).groupby(d["user_id"].to_numpy()).cummax() \
        .to_numpy()
    prior = np.concatenate(([-1], last[:-1]))
    prior[ubreak] = -1
    take = is_p & (prior >= 0)
    return pd.DataFrame({
        "purchase_id": ids[take],
        "touch_id": ids[prior[take]],
        "touch_type": et[prior[take]]})


def q_attribution(sf_dir: str) -> pa.Table:
    """Last-touch attribution: for every purchase, the user's most
    recent strictly-earlier non-purchase event.  ONE hash repartition
    by user_id, then a block-local sorted scan (the self-join-free
    attribution shape — the oracle's row_number-over-join is the
    semantics, not the plan)."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])
    nparts = shuffle_width(ev.count())
    use_hash_shuffle(ev, nparts)
    out = collect_df(ev.repartition(num_blocks=nparts, keys=["user_id"])
                     .map_batches(_attribution_block,
                                  batch_format="pandas"))
    if out.empty:
        return pa.table({"purchase_id": pa.array([], pa.int64()),
                         "touch_id": pa.array([], pa.int64()),
                         "touch_type": pa.array([], pa.string())})
    out["purchase_id"] = out["purchase_id"].astype(np.int64)
    out["touch_id"] = out["touch_id"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


EXTRA_QUERIES.update({"g_attribution": q_attribution})
EXTRA_ORACLE_SQL.update({"g_attribution": """
WITH p AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT p.event_id AS purchase_id, x.event_id AS touch_id,
        x.event_type AS touch_type,
        row_number() OVER (PARTITION BY p.event_id
          ORDER BY x.ts DESC, x.event_id DESC) AS rn
      FROM p JOIN events x ON x.user_id = p.user_id
        AND (x.ts < p.ts OR (x.ts = p.ts AND x.event_id < p.event_id))
        AND x.event_type <> 'purchase')
SELECT purchase_id, touch_id, touch_type FROM c WHERE rn = 1"""})


# ---- event-type transition matrix (Markov counts) -------------------------------

def _transitions_block(df: pd.DataFrame) -> pd.DataFrame:
    """Per-user adjacent-event transitions for one hash partition:
    sort by (user, ts, event_id), shift by one, mask user boundaries —
    the LAG window as a vectorized scan."""
    if df.empty:
        return pd.DataFrame({"from_type": pd.Series(dtype=object),
                             "to_type": pd.Series(dtype=object),
                             "partial_n": pd.Series(dtype=np.int64)})
    d = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    et = d["event_type"].to_numpy()
    u = d["user_id"].to_numpy()
    same = np.concatenate(([False], u[1:] == u[:-1]))
    g = pd.DataFrame({"from_type": np.concatenate(([""], et[:-1])),
                      "to_type": et})[same]
    g = g.groupby(["from_type", "to_type"], sort=False).size() \
        .reset_index(name="partial_n")
    g["partial_n"] = g["partial_n"].astype(np.int64)
    return g


def q_transitions(sf_dir: str) -> pa.Table:
    """Event-type transition matrix (the Markov-chain counts a
    session-model or anomaly detector trains on): ONE hash repartition
    by user_id, a block-local lag scan, then a tiny driver merge
    (|types|² × blocks rows)."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])
    nparts = shuffle_width(ev.count())
    use_hash_shuffle(ev, nparts)
    df = collect_df(ev.repartition(num_blocks=nparts, keys=["user_id"])
                    .map_batches(_transitions_block,
                                 batch_format="pandas"))
    if df.empty:
        return pa.table({"from_type": pa.array([], pa.string()),
                         "to_type": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    out = df.groupby(["from_type", "to_type"], sort=True,
                     as_index=False)["partial_n"].sum() \
        .rename(columns={"partial_n": "n"})
    out["n"] = out["n"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


EXTRA_QUERIES.update({"g_transitions": q_transitions})
EXTRA_ORACLE_SQL.update({"g_transitions": """
WITH e AS (SELECT user_id, event_type,
    lag(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev
  FROM events)
SELECT prev AS from_type, event_type AS to_type, count(*) AS n
FROM e WHERE prev IS NOT NULL GROUP BY 1, 2"""})


# ---- token bigram top-50 ---------------------------------------------------------

BIGRAM_TOPK = 50


def q_bigrams(sf_dir: str) -> pa.Table:
    """Top-50 adjacent token bigrams over the corpus (the phrase-table
    / collocation scan): per-batch bigram partial counts (doc-local
    adjacency, so zero exchange to build them) → ONE distributed
    groupby-sum → exact two-phase top-K under (n desc, bigram)."""
    from ray.data.aggregate import Sum
    docs = _docs(sf_dir)

    def _partial(t: pa.Table) -> pa.Table:
        toks = T._tokens_series(t.column("text"))
        ex = toks.explode()
        w = ex.to_numpy()
        rows = ex.index.to_numpy()
        same = rows[1:] == rows[:-1]
        big = np.char.add(np.char.add(w[:-1][same].astype("U"), " "),
                          w[1:][same].astype("U"))
        u, c = np.unique(big, return_counts=True)
        return pa.table({"bigram": pa.array(u, pa.string()),
                         "partial_n": pa.array(c.astype(np.int64),
                                               pa.int64())})

    agg = docs.map_batches(_partial, batch_format="pyarrow") \
        .groupby("bigram").aggregate(Sum("partial_n"))
    agg = agg.map_batches(
        lambda t: (t.rename_columns(["bigram", "n"])
                   if t.num_columns == 2 else t),
        batch_format="pyarrow")

    def _topk(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return df.sort_values(["n", "bigram"], ascending=[False, True],
                              kind="mergesort").head(BIGRAM_TOPK)

    out = _topk(collect_df(agg.map_batches(_topk, batch_format="pandas")))
    if out.empty:
        return pa.table({"bigram": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    out = out.reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


EXTRA_QUERIES.update({"d_bigrams": q_bigrams})
EXTRA_ORACLE_SQL.update({"d_bigrams": f"""
WITH tok AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents),
z AS (SELECT unnest(list_zip(t, t[2:])) AS p FROM tok),
b AS (SELECT p[1] || ' ' || p[2] AS bigram FROM z
      WHERE p[2] IS NOT NULL)
SELECT bigram, count(*) AS n FROM b
GROUP BY 1 ORDER BY n DESC, bigram LIMIT {BIGRAM_TOPK}"""})


# ---- order-size distribution -----------------------------------------------------

def q_order_sizes(sf_dir: str) -> pa.Table:
    """Distribution of lineitem counts per order — the group-size
    histogram that sizes a skew/salting decision: per-batch (order,
    count) partials → ONE keyed exchange + block reduce → per-block
    size-histogram partials → driver merge (|sizes| × blocks rows)."""
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey"])

    def _cnt_partial(t: pa.Table) -> pa.Table:
        k, c = np.unique(
            t.column("l_orderkey").to_numpy(zero_copy_only=False)
            .astype(np.int64), return_counts=True)
        return pa.table({"l_orderkey": pa.array(k, pa.int64()),
                         "partial_c": pa.array(c.astype(np.int64),
                                               pa.int64())})

    def _size_hist_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"n_lines": pd.Series(dtype=np.int64),
                                 "partial_n": pd.Series(dtype=np.int64)})
        sizes = df.groupby("l_orderkey", sort=False)["partial_c"].sum()
        v, c = np.unique(sizes.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"n_lines": v,
                             "partial_n": c.astype(np.int64)})

    nparts = shuffle_width(li.count())
    use_hash_shuffle(li, nparts)
    df = collect_df(li.map_batches(_cnt_partial, batch_format="pyarrow")
                    .repartition(num_blocks=nparts, keys=["l_orderkey"])
                    .map_batches(_size_hist_block, batch_format="pandas"))
    if df.empty:
        return pa.table({"n_lines": pa.array([], pa.int64()),
                         "n_orders": pa.array([], pa.int64())})
    out = df.groupby("n_lines", sort=True, as_index=False)["partial_n"] \
        .sum().rename(columns={"partial_n": "n_orders"})
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


EXTRA_QUERIES.update({"h_order_sizes": q_order_sizes})
EXTRA_ORACLE_SQL.update({"h_order_sizes": """
WITH c AS (SELECT l_orderkey, count(*) AS n_lines FROM lineitem
           GROUP BY 1)
SELECT n_lines, count(*) AS n_orders FROM c GROUP BY 1"""})


# ---- DAU / trailing-WAU stickiness -----------------------------------------------

def _stickiness_block(df: pd.DataFrame) -> pd.DataFrame:
    """Per-user day sets are block-local after the keyed exchange, so
    BOTH the daily dedupe and the 7-day trailing-window expansion
    (each active day marks itself + the 6 following window-end days)
    complete without a second exchange; the block emits (day,
    partial_dau, partial_wau) pairs."""
    if df.empty:
        return pd.DataFrame({"day": pd.Series(dtype=np.int64),
                             "partial_dau": pd.Series(dtype=np.int64),
                             "partial_wau": pd.Series(dtype=np.int64)})
    ud = df.drop_duplicates()
    u = ud["user_id"].to_numpy(np.int64)
    d = ud["day"].to_numpy(np.int64)
    dv, dc = np.unique(d, return_counts=True)
    dau = pd.DataFrame({"day": dv, "partial_dau": dc.astype(np.int64)})
    w = pd.DataFrame({
        "user_id": np.repeat(u, 7),
        "day": (d[:, None] + np.arange(7)).ravel()}).drop_duplicates()
    wv, wc = np.unique(w["day"].to_numpy(np.int64), return_counts=True)
    wau = pd.DataFrame({"day": wv, "partial_wau": wc.astype(np.int64)})
    out = dau.merge(wau, on="day", how="outer").fillna(0)
    out["partial_dau"] = out["partial_dau"].astype(np.int64)
    out["partial_wau"] = out["partial_wau"].astype(np.int64)
    return out


def q_stickiness(sf_dir: str) -> pa.Table:
    """DAU / trailing-7-day-WAU stickiness per day — the engagement
    ratio a growth dashboard plots: per-batch (user, day) dedupe
    partials → ONE hash repartition by user_id → block-local dedupe +
    window expansion → tiny driver merge (days × blocks rows).  Days
    are epoch-aligned integer buckets; the ratio is one mirrored IEEE
    division.  Only days with activity are reported (wau is defined on
    them by construction)."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def _ud_partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        g = pd.DataFrame({"user_id": t.column("user_id").to_numpy(),
                          "day": ts // _DAY_US}).drop_duplicates()
        return pa.Table.from_pandas(g, preserve_index=False)

    nparts = shuffle_width(ev.count())
    use_hash_shuffle(ev, nparts)
    df = collect_df(ev.map_batches(_ud_partial, batch_format="pyarrow")
                    .repartition(num_blocks=nparts, keys=["user_id"])
                    .map_batches(_stickiness_block, batch_format="pandas"))
    if df.empty:
        return pa.table({"day": pa.array([], pa.int64()),
                         "dau": pa.array([], pa.int64()),
                         "wau": pa.array([], pa.int64()),
                         "stickiness": pa.array([], pa.float64())})
    m = df.groupby("day", sort=True, as_index=False).sum()
    m = m[m["partial_dau"] > 0]          # report only active days
    dau = m["partial_dau"].to_numpy(np.int64)
    wau = m["partial_wau"].to_numpy(np.int64)
    return pa.table({
        "day": pa.array(m["day"].to_numpy(np.int64), pa.int64()),
        "dau": pa.array(dau, pa.int64()),
        "wau": pa.array(wau, pa.int64()),
        "stickiness": pa.array(dau.astype(np.float64)
                               / wau.astype(np.float64), pa.float64())})


EXTRA_QUERIES.update({"g_stickiness": q_stickiness})
EXTRA_ORACLE_SQL.update({"g_stickiness": """
WITH ud AS (SELECT DISTINCT user_id,
    epoch_us(ts) // 86400000000 AS day FROM events),
w AS (SELECT DISTINCT user_id, day + o AS day
      FROM ud, generate_series(0, 6) AS g(o)),
dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
wau AS (SELECT day, count(*) AS wau FROM w GROUP BY 1)
SELECT dau.day, dau.dau, wau.wau,
  CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
FROM dau JOIN wau ON dau.day = wau.day"""})


# ---- session-size distribution ---------------------------------------------------

def q_session_sizes(sf_dir: str) -> pa.Table:
    """Histogram of session lengths (events per 30-min-gap session):
    rides the sessionize exchange — per-block session sizes reduce to
    size-histogram partials, so the driver merge holds |sizes| ×
    blocks rows, never O(sessions)."""
    ds = _events(sf_dir)
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)
    parted = ds.repartition(num_blocks=nparts, keys=["user_id"])
    sess = parted.map_batches(E.sessionize_batch, batch_format="pyarrow",
                              batch_size=None)

    def _hist_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n_events": pa.array([], pa.int64()),
                             "partial_n": pa.array([], pa.int64())})
        v, c = np.unique(
            t.column("n_events").to_numpy(zero_copy_only=False)
            .astype(np.int64), return_counts=True)
        return pa.table({"n_events": pa.array(v, pa.int64()),
                         "partial_n": pa.array(c.astype(np.int64),
                                               pa.int64())})

    df = collect_df(sess.map_batches(_hist_partial,
                                     batch_format="pyarrow"))
    if df.empty:
        return pa.table({"n_events": pa.array([], pa.int64()),
                         "n_sessions": pa.array([], pa.int64())})
    out = df.groupby("n_events", sort=True, as_index=False)["partial_n"] \
        .sum().rename(columns={"partial_n": "n_sessions"})
    out["n_sessions"] = out["n_sessions"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


EXTRA_QUERIES.update({"g_session_sizes": q_session_sizes})
EXTRA_ORACLE_SQL.update({"g_session_sizes": """
WITH e AS (
  SELECT user_id, ts, event_id,
    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
  FROM events),
f AS (
  SELECT *, CASE WHEN pts IS NULL
    OR epoch_us(ts) - epoch_us(pts) > 1800000000
    THEN 1 ELSE 0 END AS brk
  FROM e),
g AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id
    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
  FROM f),
s AS (SELECT user_id, sid, count(*) AS n_events FROM g
      GROUP BY user_id, sid)
SELECT n_events, count(*) AS n_sessions FROM s GROUP BY 1"""})


# ---- top customers by order count (broadcast dim attach + exact top-K) -----------

TOPCUST_K = 20


def q_top_customers(sf_dir: str) -> pa.Table:
    """Top-20 customers by order count with their names attached: the
    fact side reduces FIRST (per-batch custkey partials → ONE keyed
    exchange + block reduce + per-block top-K → bounded driver final),
    and the customer dimension is probed only for the 20 winners via
    a parquet read of two columns — the attach-after-reduce shape that
    never joins the dimension against the fact stream."""
    ords = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_custkey"])

    def _cnt_partial(t: pa.Table) -> pa.Table:
        k, c = np.unique(
            t.column("o_custkey").to_numpy(zero_copy_only=False)
            .astype(np.int64), return_counts=True)
        return pa.table({"c_custkey": pa.array(k, pa.int64()),
                         "partial_c": pa.array(c.astype(np.int64),
                                               pa.int64())})

    def _reduce_topk(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"c_custkey": pd.Series(dtype=np.int64),
                                 "n_orders": pd.Series(dtype=np.int64)})
        g = df.groupby("c_custkey", sort=False)["partial_c"].sum() \
            .reset_index(name="n_orders")
        return g.sort_values(["n_orders", "c_custkey"],
                             ascending=[False, True],
                             kind="mergesort").head(TOPCUST_K)

    nparts = shuffle_width(ords.count())
    use_hash_shuffle(ords, nparts)
    blocks = collect_df(
        ords.map_batches(_cnt_partial, batch_format="pyarrow")
        .repartition(num_blocks=nparts, keys=["c_custkey"])
        .map_batches(_reduce_topk, batch_format="pandas"))
    # keys are partition-disjoint, so the global top-K is the top-K of
    # the per-block top-Ks — no re-sum needed
    top = (blocks.sort_values(["n_orders", "c_custkey"],
                              ascending=[False, True], kind="mergesort")
           .head(TOPCUST_K) if not blocks.empty else blocks)
    if top.empty:
        return pa.table({"c_custkey": pa.array([], pa.int64()),
                         "c_name": pa.array([], pa.string()),
                         "n_orders": pa.array([], pa.int64())})
    names = pq.read_table(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_name"]).to_pandas()
    out = top.merge(names, on="c_custkey", how="left")
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return pa.Table.from_pandas(out[["c_custkey", "c_name", "n_orders"]],
                                preserve_index=False)


EXTRA_QUERIES.update({"h_top_customers": q_top_customers})
EXTRA_ORACLE_SQL.update({"h_top_customers": f"""
WITH c AS (SELECT o_custkey AS c_custkey, count(*) AS n_orders
           FROM orders GROUP BY 1)
SELECT c.c_custkey, cu.c_name, c.n_orders
FROM c JOIN customer cu USING (c_custkey)
ORDER BY n_orders DESC, c_custkey LIMIT {TOPCUST_K}"""})


# ---- document-length deciles -------------------------------------------------------

def q_len_deciles(sf_dir: str) -> pa.Table:
    """Exact corpus length deciles (the curation cut points): the
    value-count-histogram reduction over n_chars — per-batch (value,
    count) partials, ONE distributed groupby-sum, and a driver order
    statistic at rank ceil(p·n/10) (1-based, integer arithmetic, the
    q_quantiles convention) — no global sort, no full column pull."""
    from ray.data.aggregate import Sum
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["n_chars"])

    def _vc_partial(t: pa.Table) -> pa.Table:
        v, c = np.unique(
            t.column("n_chars").to_numpy(zero_copy_only=False)
            .astype(np.int64), return_counts=True)
        return pa.table({"n_chars": pa.array(v, pa.int64()),
                         "partial_n": pa.array(c.astype(np.int64),
                                               pa.int64())})

    agg = ds.map_batches(_vc_partial, batch_format="pyarrow") \
        .groupby("n_chars").aggregate(Sum("partial_n"))
    df = _named(collect_df(agg), ["n_chars", "n"])
    if df.empty:
        return pa.table({"decile": pa.array([], pa.int64()),
                         "n_chars": pa.array([], pa.int64())})
    df = df.sort_values("n_chars", ignore_index=True)
    vals = df["n_chars"].to_numpy(np.int64)
    cum = df["n"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])
    deciles = np.arange(1, 10, dtype=np.int64)
    ranks = -(-deciles * n // 10)        # ceil(p·n/10), 1-based
    pos = np.searchsorted(cum, ranks, side="left")
    return pa.table({"decile": pa.array(deciles, pa.int64()),
                     "n_chars": pa.array(vals[pos], pa.int64())})


EXTRA_QUERIES.update({"d_len_deciles": q_len_deciles})
EXTRA_ORACLE_SQL.update({"d_len_deciles": """
WITH s AS (SELECT n_chars,
    row_number() OVER (ORDER BY n_chars) AS rk,
    count(*) OVER () AS n
  FROM documents)
SELECT d AS decile, n_chars
FROM generate_series(1, 9) AS g(d) JOIN s
  ON s.rk = CAST(ceil(d * s.n / 10.0) AS BIGINT)"""})


# ---- embedding-norm histogram -------------------------------------------------------

NORM_NBINS = 10


def q_norm_histogram(sf_dir: str) -> pa.Table:
    """Distribution of squared embedding L2 norms — the scan that
    decides whether a corpus needs renormalizing before cosine ANN.
    Two passes like g_value_histogram: distributed min/max of
    list_dot_product(e, e) (order-independent), then mirrored affine
    binning partials.  The squared norm (one dot product) keeps the
    float expression identical on both sides — no sqrt to diverge."""
    ds = _emb(sf_dir)

    def _sq(t: pa.Table) -> np.ndarray:
        m = S._matrix(t).astype(np.float64)
        # row-wise dot in C order == DuckDB list_dot_product's
        # sequential element sum (same shape as the e_pq_codes oracle)
        return np.einsum("ij,ij->i", m, m)

    def _minmax(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vmin": pa.array([], pa.float64()),
                             "vmax": pa.array([], pa.float64())})
        v = _sq(t)
        return pa.table({"vmin": pa.array([v.min()], pa.float64()),
                         "vmax": pa.array([v.max()], pa.float64())})

    mm = collect_df(ds.map_batches(_minmax, batch_format="pyarrow"))
    if mm.empty:
        return pa.table({"bin": pa.array([], pa.int64()),
                         "n_vectors": pa.array([], pa.int64())})
    vmin, vmax = float(mm["vmin"].min()), float(mm["vmax"].max())
    span = vmax - vmin

    def _bin_partial(t: pa.Table) -> pa.Table:
        v = _sq(t)
        if span > 0:
            b = np.minimum(np.floor((v - vmin) * float(NORM_NBINS) / span),
                           NORM_NBINS - 1).astype(np.int64)
        else:
            b = np.zeros(len(v), np.int64)
        u, c = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(u, pa.int64()),
                         "partial_n": pa.array(c.astype(np.int64),
                                               pa.int64())})

    df = collect_df(ds.map_batches(_bin_partial, batch_format="pyarrow"))
    out = df.groupby("bin", sort=True, as_index=False)["partial_n"].sum() \
        .rename(columns={"partial_n": "n_vectors"})
    out["n_vectors"] = out["n_vectors"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


EXTRA_QUERIES.update({"e_norm_histogram": q_norm_histogram})
EXTRA_ORACLE_SQL.update({"e_norm_histogram": f"""
WITH v AS (SELECT list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[])) AS sq
           FROM embeddings),
mm AS (SELECT min(sq) AS vmin, max(sq) AS vmax FROM v)
SELECT CASE WHEN mm.vmax > mm.vmin THEN least(CAST(floor(
    (sq - mm.vmin) * {NORM_NBINS}.0 / (mm.vmax - mm.vmin))
    AS BIGINT), {NORM_NBINS - 1}) ELSE 0 END AS bin,
  count(*) AS n_vectors
FROM v, mm GROUP BY 1"""})


# ---- per-source exact-duplicate rate ------------------------------------------------

def q_dup_rate(sf_dir: str) -> pa.Table:
    """Exact-duplicate rate per source (the corpus-QA split of
    d_exact_dedup): per-batch (source, text_norm) dedupe partials →
    ONE keyed exchange on text_norm+source → block distinct count per
    source → tiny driver merge.  Rate = 1 − distinct/docs as one
    mirrored division; doc totals ride the same partials."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])

    def _partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as apc
        norm = apc.utf8_trim_whitespace(
            apc.replace_substring_regex(
                apc.utf8_lower(t.column("text")), r"\s+", " "))
        g = pd.DataFrame({"source": t.column("source").to_numpy(),
                          "text_norm": norm.to_numpy(zero_copy_only=False)})
        g["partial_docs"] = np.int64(1)
        g = g.groupby(["source", "text_norm"], sort=False,
                      as_index=False)["partial_docs"].sum()
        g["partial_docs"] = g["partial_docs"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "source": pd.Series(dtype=object),
                "partial_docs": pd.Series(dtype=np.int64),
                "partial_distinct": pd.Series(dtype=np.int64)})
        g = df.groupby(["source", "text_norm"], sort=False,
                       as_index=False)["partial_docs"].sum()
        out = g.groupby("source", sort=False).agg(
            partial_docs=("partial_docs", "sum"),
            partial_distinct=("text_norm", "size")).reset_index()
        out["partial_docs"] = out["partial_docs"].astype(np.int64)
        out["partial_distinct"] = out["partial_distinct"].astype(np.int64)
        return out

    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)
    df = collect_df(ds.map_batches(_partial, batch_format="pyarrow")
                    .repartition(num_blocks=nparts, keys=["text_norm"])
                    .map_batches(_block, batch_format="pandas"))
    if df.empty:
        return pa.table({"source": pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64()),
                         "n_distinct": pa.array([], pa.int64()),
                         "dup_rate": pa.array([], pa.float64())})
    m = df.groupby("source", sort=True, as_index=False).sum()
    nd = m["partial_docs"].to_numpy(np.int64)
    nu = m["partial_distinct"].to_numpy(np.int64)
    return pa.table({
        "source": pa.array(m["source"].tolist(), pa.string()),
        "n_docs": pa.array(nd, pa.int64()),
        "n_distinct": pa.array(nu, pa.int64()),
        "dup_rate": pa.array(1.0 - nu.astype(np.float64)
                             / nd.astype(np.float64), pa.float64())})


EXTRA_QUERIES.update({"d_dup_rate": q_dup_rate})
EXTRA_ORACLE_SQL.update({"d_dup_rate": """
WITH n AS (SELECT source,
    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS text_norm
  FROM documents),
s AS (SELECT source, count(*) AS n_docs,
        count(DISTINCT text_norm) AS n_distinct
      FROM n GROUP BY 1)
SELECT source, n_docs, n_distinct,
  1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate
FROM s"""})


# ---- customer order-count distribution (TPC-H Q13 shape) ---------------------------

def q_custdist(sf_dir: str) -> pa.Table:
    """Distribution of customers by order count INCLUDING the
    zero-order cohort (the left-join subtlety that makes TPC-H Q13
    famous): per-customer counts via ONE keyed exchange + block
    reduce, per-block count-histogram partials, and the zero bucket
    closed in O(1) from the customer total minus the customers seen —
    no left join materialized anywhere."""
    ords = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_custkey"])
    n_cust = int(pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows)

    def _cnt_partial(t: pa.Table) -> pa.Table:
        k, c = np.unique(
            t.column("o_custkey").to_numpy(zero_copy_only=False)
            .astype(np.int64), return_counts=True)
        return pa.table({"k": pa.array(k, pa.int64()),
                         "partial_c": pa.array(c.astype(np.int64),
                                               pa.int64())})

    def _hist_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"c_count": pd.Series(dtype=np.int64),
                                 "partial_n": pd.Series(dtype=np.int64)})
        sizes = df.groupby("k", sort=False)["partial_c"].sum()
        v, c = np.unique(sizes.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"c_count": v, "partial_n": c.astype(np.int64)})

    nparts = shuffle_width(ords.count())
    use_hash_shuffle(ords, nparts)
    df = collect_df(ords.map_batches(_cnt_partial, batch_format="pyarrow")
                    .repartition(num_blocks=nparts, keys=["k"])
                    .map_batches(_hist_block, batch_format="pandas"))
    m = (df.groupby("c_count", sort=False, as_index=False)["partial_n"]
         .sum() if not df.empty
         else pd.DataFrame({"c_count": [], "partial_n": []}))
    zero = n_cust - int(m["partial_n"].sum()) if len(m) else n_cust
    if zero > 0:
        m = pd.concat([m, pd.DataFrame({"c_count": [0],
                                        "partial_n": [zero]})],
                      ignore_index=True)
    m = m.sort_values("c_count", ignore_index=True)
    return pa.table({
        "c_count": pa.array(m["c_count"].to_numpy(np.int64), pa.int64()),
        "custdist": pa.array(m["partial_n"].to_numpy(np.int64),
                             pa.int64())})


EXTRA_QUERIES.update({"h_custdist": q_custdist})
EXTRA_ORACLE_SQL.update({"h_custdist": """
WITH c AS (SELECT cu.c_custkey, count(o.o_orderkey) AS c_count
           FROM customer cu LEFT JOIN orders o
             ON cu.c_custkey = o.o_custkey
           GROUP BY 1)
SELECT c_count, count(*) AS custdist FROM c GROUP BY 1"""})


# ---- winsorized per-source length stats ---------------------------------------------

def q_winsorize(sf_dir: str) -> pa.Table:
    """Winsorized (p5/p95-clipped) document-length statistics per
    source — the outlier-robust curation summary: global exact p5/p95
    cut values from the n_chars count-histogram (rank ceil(p·n/100),
    the repo's quantile convention), then per-batch clipped integer
    sums — exact, with ONE mirrored division for the mean."""
    from ray.data.aggregate import Sum
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "n_chars"])

    def _vc_partial(t: pa.Table) -> pa.Table:
        v, c = np.unique(
            t.column("n_chars").to_numpy(zero_copy_only=False)
            .astype(np.int64), return_counts=True)
        return pa.table({"n_chars": pa.array(v, pa.int64()),
                         "partial_n": pa.array(c.astype(np.int64),
                                               pa.int64())})

    agg = ds.map_batches(_vc_partial, batch_format="pyarrow") \
        .groupby("n_chars").aggregate(Sum("partial_n"))
    hist = _named(collect_df(agg), ["n_chars", "n"])
    if hist.empty:
        return pa.table({"source": pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64()),
                         "sum_clipped": pa.array([], pa.int64()),
                         "mean_clipped": pa.array([], pa.float64())})
    hist = hist.sort_values("n_chars", ignore_index=True)
    vals = hist["n_chars"].to_numpy(np.int64)
    cum = hist["n"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])
    lo = vals[np.searchsorted(cum, -(-5 * n // 100), side="left")]
    hi = vals[np.searchsorted(cum, -(-95 * n // 100), side="left")]

    def _clip_partial(t: pa.Table) -> pa.Table:
        v = np.clip(t.column("n_chars").to_numpy(zero_copy_only=False)
                    .astype(np.int64), lo, hi)
        g = pd.DataFrame({"source": t.column("source").to_numpy(),
                          "v": v}).groupby("source", sort=False).agg(
            partial_docs=("v", "size"),
            partial_sum=("v", "sum")).reset_index()
        g["partial_docs"] = g["partial_docs"].astype(np.int64)
        g["partial_sum"] = g["partial_sum"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    df = collect_df(ds.map_batches(_clip_partial, batch_format="pyarrow"))
    m = df.groupby("source", sort=True, as_index=False).sum()
    nd = m["partial_docs"].to_numpy(np.int64)
    sm = m["partial_sum"].to_numpy(np.int64)
    return pa.table({
        "source": pa.array(m["source"].tolist(), pa.string()),
        "n_docs": pa.array(nd, pa.int64()),
        "sum_clipped": pa.array(sm, pa.int64()),
        "mean_clipped": pa.array(sm.astype(np.float64)
                                 / nd.astype(np.float64), pa.float64())})


EXTRA_QUERIES.update({"d_winsorize": q_winsorize})
EXTRA_ORACLE_SQL.update({"d_winsorize": """
WITH s AS (SELECT n_chars,
    row_number() OVER (ORDER BY n_chars) AS rk,
    count(*) OVER () AS n
  FROM documents),
cuts AS (SELECT
    (SELECT n_chars FROM s WHERE rk = CAST(ceil(5 * n / 100.0) AS BIGINT)
     LIMIT 1) AS lo,
    (SELECT n_chars FROM s WHERE rk = CAST(ceil(95 * n / 100.0) AS BIGINT)
     LIMIT 1) AS hi
  FROM (SELECT DISTINCT n FROM s)),
c AS (SELECT source,
        least(greatest(n_chars, cuts.lo), cuts.hi) AS v
      FROM documents, cuts)
SELECT source, count(*) AS n_docs,
  CAST(sum(v) AS BIGINT) AS sum_clipped,
  CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_clipped
FROM c GROUP BY 1"""})


# ---- shingle novelty scoring ---------------------------------------------------------

def q_novelty(sf_dir: str) -> pa.Table:
    """Per-document token-3-gram novelty — the streaming-curation
    signal "how much of this doc is first-seen": a shingle's first
    owner is its min doc_id, novelty = first-owned / distinct
    shingles.  Per-batch distinct (doc, shingle) partials → ONE hash
    repartition by shingle (each shingle's owners block-local: min +
    per-doc tallies) → per-doc merge.  Integers + one mirrored
    division; docs with < 3 tokens have no shingles and drop out on
    both sides."""
    docs = _docs(sf_dir)

    def _shingle_partial(t: pa.Table) -> pa.Table:
        toks = T._tokens_series(t.column("text"))
        ids = t.column("doc_id").to_numpy()
        ex = toks.explode()
        rows = ex.index.to_numpy()
        w = ex.to_numpy().astype("U")
        s2 = rows[2:] == rows[:-2]
        g = np.char.add(np.char.add(
            np.char.add(np.char.add(w[:-2], " "), w[1:-1]), " "), w[2:])
        df = pd.DataFrame({"doc_id": ids[rows[:-2][s2]],
                           "shingle": g[s2]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def _first_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype=np.int64),
                "partial_total": pd.Series(dtype=np.int64),
                "partial_novel": pd.Series(dtype=np.int64)})
        d = df.drop_duplicates()
        first = d.groupby("shingle", sort=False)["doc_id"].transform("min")
        d = d.assign(novel=(d["doc_id"] == first).astype(np.int64))
        out = d.groupby("doc_id", sort=False).agg(
            partial_total=("shingle", "size"),
            partial_novel=("novel", "sum")).reset_index()
        out["partial_total"] = out["partial_total"].astype(np.int64)
        out["partial_novel"] = out["partial_novel"].astype(np.int64)
        return out

    nparts = shuffle_width(docs.count())
    use_hash_shuffle(docs, nparts)
    df = collect_df(docs.map_batches(_shingle_partial,
                                     batch_format="pyarrow")
                    .repartition(num_blocks=nparts, keys=["shingle"])
                    .map_batches(_first_block, batch_format="pandas"))
    if df.empty:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_shingles": pa.array([], pa.int64()),
                         "n_novel": pa.array([], pa.int64()),
                         "novelty": pa.array([], pa.float64())})
    m = df.groupby("doc_id", sort=True, as_index=False).sum()
    tot = m["partial_total"].to_numpy(np.int64)
    nov = m["partial_novel"].to_numpy(np.int64)
    return pa.table({
        "doc_id": pa.array(m["doc_id"].to_numpy(np.int64), pa.int64()),
        "n_shingles": pa.array(tot, pa.int64()),
        "n_novel": pa.array(nov, pa.int64()),
        "novelty": pa.array(nov.astype(np.float64)
                            / tot.astype(np.float64), pa.float64())})


EXTRA_QUERIES.update({"d_novelty": q_novelty})
EXTRA_ORACLE_SQL.update({"d_novelty": """
WITH tok AS (
  SELECT doc_id,
    regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents),
z AS (SELECT doc_id, unnest(list_zip(t, t[2:], t[3:])) AS p FROM tok),
sh AS (SELECT DISTINCT doc_id,
         p[1] || ' ' || p[2] || ' ' || p[3] AS g
       FROM z WHERE p[3] IS NOT NULL),
f AS (SELECT g, min(doc_id) AS fd FROM sh GROUP BY g)
SELECT sh.doc_id, count(*) AS n_shingles,
  CAST(sum(CASE WHEN f.fd = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
    AS n_novel,
  CAST(sum(CASE WHEN f.fd = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) AS novelty
FROM sh JOIN f USING (g) GROUP BY sh.doc_id"""})


# ---- ANN recall evaluation -----------------------------------------------------------

def q_ann_recall(sf_dir: str) -> pa.Table:
    """Recall@5 of the LSH ANN path against the exact top-k, per
    query — the index-quality report an ANN deployment watches.  Both
    paths run distributed (broadcast queries, bounded two-phase
    top-k); the per-query intersection is a driver merge over 2·k·|Q|
    rows.  The oracle composes the two generated SQL mirrors, so the
    recall itself is byte-checked."""
    ex = q_ann_topk(sf_dir).to_pandas()
    ap = q_ann_lsh(sf_dir).to_pandas()
    hit = ex.merge(ap, on=["query_id", "neighbor_id"], how="inner") \
        .groupby("query_id").size()
    qids = np.sort(ex["query_id"].unique())
    k = int(ex.groupby("query_id").size().max())
    n_hit = hit.reindex(qids, fill_value=0).to_numpy(np.int64)
    return pa.table({
        "query_id": pa.array(qids.astype(np.int64), pa.int64()),
        "n_hit": pa.array(n_hit, pa.int64()),
        "recall": pa.array(n_hit.astype(np.float64) / float(k),
                           pa.float64())})


def _ann_recall_sql() -> str:
    exact = EXTRA_ORACLE_SQL["e_ann_topk"].strip()
    approx = EXTRA_ORACLE_SQL["e_ann_lsh"].strip()
    return f"""
WITH ex AS ({exact}),
ap AS ({approx}),
k AS (SELECT max(cnt) AS k FROM (
    SELECT count(*) AS cnt FROM ex GROUP BY query_id)),
h AS (SELECT ex.query_id,
        CAST(count(ap.neighbor_id) AS BIGINT) AS n_hit
      FROM ex LEFT JOIN ap
        ON ex.query_id = ap.query_id
       AND ex.neighbor_id = ap.neighbor_id
      GROUP BY ex.query_id)
SELECT query_id, n_hit,
  CAST(n_hit AS DOUBLE) / CAST(k.k AS DOUBLE) AS recall
FROM h, k"""


EXTRA_QUERIES.update({"e_ann_recall": q_ann_recall})
EXTRA_ORACLE_SQL.update({"e_ann_recall": _ann_recall_sql()})


# ---- IVF list-size balance ------------------------------------------------------------

def q_ivf_sizes(sf_dir: str) -> pa.Table:
    """IVF list-size histogram — the balance check that decides
    whether centroids need retraining before the index is written
    (skewed lists break the nprobe cost model): per-batch nearest-
    centroid assignment (one matmul against the broadcast codebook) →
    per-batch list-count partials → tiny driver merge (nlist rows)."""
    ds = _emb(sf_dir)

    def _asn_partial(t: pa.Table) -> pa.Table:
        ivf = S.IVFIndex(_EMB_DIM, nlist=16)
        asn = ivf.assign(S._normalize(S._matrix(t).astype(np.float64)))
        v, c = np.unique(asn, return_counts=True)
        return pa.table({"list_id": pa.array(v.astype(np.int64),
                                             pa.int64()),
                         "partial_n": pa.array(c.astype(np.int64),
                                               pa.int64())})

    df = collect_df(ds.map_batches(_asn_partial, batch_format="pyarrow"))
    if df.empty:
        return pa.table({"list_id": pa.array([], pa.int64()),
                         "n_vectors": pa.array([], pa.int64())})
    out = df.groupby("list_id", sort=True, as_index=False)["partial_n"] \
        .sum().rename(columns={"partial_n": "n_vectors"})
    out["n_vectors"] = out["n_vectors"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def _ivf_sizes_sql(dim: int = _EMB_DIM, nlist: int = 16) -> str:
    lits = _ivf_centroid_literals(dim, nlist)
    cos_terms = ", ".join(
        f"list_cosine_similarity(e, CAST({lits[i]} AS DOUBLE[]))"
        for i in range(nlist))
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings),
cs AS (SELECT vec_id, [{cos_terms}] AS cl FROM v),
asn AS (SELECT vec_id,
          CAST(list_position(cl, list_aggregate(cl, 'max')) - 1
               AS BIGINT) AS list_id
        FROM cs)
SELECT list_id, count(*) AS n_vectors FROM asn GROUP BY 1"""


EXTRA_QUERIES.update({"e_ivf_sizes": q_ivf_sizes})
EXTRA_ORACLE_SQL.update({"e_ivf_sizes": _ivf_sizes_sql()})


# ---- first-event → first-purchase conversion lag ---------------------------------------

def q_conversion_lag(sf_dir: str) -> pa.Table:
    """Histogram of days from a user's first event to their first
    purchase — the activation-funnel lag: per-batch (user, min ts,
    min purchase ts) partials → ONE keyed exchange + block reduce →
    per-block day-lag histogram partials → tiny driver merge.  Users
    who never purchase drop out (inner semantics, both sides)."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_type"])

    def _min_partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        u = t.column("user_id").to_numpy()
        isp = t.column("event_type").to_numpy(zero_copy_only=False) \
            == "purchase"
        g = pd.DataFrame({"user_id": u, "first_us": ts,
                          "first_p_us": np.where(isp, ts, np.int64(2**62))})
        out = g.groupby("user_id", sort=False).agg(
            first_us=("first_us", "min"),
            first_p_us=("first_p_us", "min")).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    def _lag_hist_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"lag_days": pd.Series(dtype=np.int64),
                                 "partial_n": pd.Series(dtype=np.int64)})
        g = df.groupby("user_id", sort=False).agg(
            first_us=("first_us", "min"),
            first_p_us=("first_p_us", "min"))
        g = g[g["first_p_us"] < 2**62]
        lag = (g["first_p_us"].to_numpy(np.int64) // _DAY_US
               - g["first_us"].to_numpy(np.int64) // _DAY_US)
        v, c = np.unique(lag, return_counts=True)
        return pd.DataFrame({"lag_days": v,
                             "partial_n": c.astype(np.int64)})

    nparts = shuffle_width(ev.count())
    use_hash_shuffle(ev, nparts)
    df = collect_df(ev.map_batches(_min_partial, batch_format="pyarrow")
                    .repartition(num_blocks=nparts, keys=["user_id"])
                    .map_batches(_lag_hist_block, batch_format="pandas"))
    if df.empty:
        return pa.table({"lag_days": pa.array([], pa.int64()),
                         "n_users": pa.array([], pa.int64())})
    out = df.groupby("lag_days", sort=True, as_index=False)["partial_n"] \
        .sum().rename(columns={"partial_n": "n_users"})
    out["n_users"] = out["n_users"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


EXTRA_QUERIES.update({"g_conversion_lag": q_conversion_lag})
EXTRA_ORACLE_SQL.update({"g_conversion_lag": """
WITH f AS (SELECT user_id, min(epoch_us(ts)) AS first_us,
    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
      AS first_p_us
  FROM events GROUP BY 1)
SELECT (first_p_us // 86400000000) - (first_us // 86400000000)
    AS lag_days,
  count(*) AS n_users
FROM f WHERE first_p_us IS NOT NULL GROUP BY 1"""})


# ---- boolean keyword search ------------------------------------------------------------

SEARCH_TERMS = ("shuffle", "spill")


def q_bool_search(sf_dir: str) -> pa.Table:
    """Conjunctive keyword search (docs containing ALL query terms) —
    the retrieval primitive behind corpus probes: a stateless
    vectorized scan (per-batch token-set membership, zero exchange).
    At index scale the same predicate runs against the d_doc_freq
    inverted index instead; this is the scan path."""
    docs = _docs(sf_dir)

    def _match(t: pa.Table) -> pa.Table:
        toks = T._tokens_series(t.column("text"))
        ids = t.column("doc_id").to_numpy()
        ex = toks.explode()
        rows = ex.index.to_numpy()
        hits = np.zeros((len(ids), len(SEARCH_TERMS)), bool)
        for j, term in enumerate(SEARCH_TERMS):
            m = (ex == term).to_numpy()
            if m.any():
                hits[np.unique(rows[m]), j] = True
        keep = hits.all(axis=1)
        return pa.table({"doc_id": pa.array(ids[keep].astype(np.int64),
                                            pa.int64())})

    df = collect_df(docs.map_batches(_match, batch_format="pyarrow"))
    if df.empty:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    return pa.Table.from_pandas(df.sort_values("doc_id",
                                               ignore_index=True),
                                preserve_index=False)


EXTRA_QUERIES.update({"d_bool_search": q_bool_search})
EXTRA_ORACLE_SQL.update({"d_bool_search": f"""
WITH tok AS (
  SELECT doc_id,
    regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents)
SELECT doc_id FROM tok
WHERE {' AND '.join(f"list_contains(t, '{w}')" for w in SEARCH_TERMS)}"""})


# ---- deterministic A/B split with per-arm metrics --------------------------------------

AB_A1 = 818_205_325_379_551_653
AB_B1 = 266_312_756_309_400_839
AB_A2 = 911_160_543_907_900_417
_MOD61 = 2305843009213693951


def q_ab_split(sf_dir: str) -> pa.Table:
    """Deterministic hash-based A/B assignment (arm = avalanche-mixed
    user hash mod 2) with per-(arm, event_type) counts — the
    experiment-infrastructure primitive: assignment is a pure
    function of user_id (stable across runs and machines, mirrored in
    SQL), metrics are per-batch partials → tiny driver merge.  Counts
    only — integer-exact; value metrics would ride the integer-cents
    pattern."""
    from asserts_otel_processor_ray.stages.text_analysis import (
        mix_hash61)
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])

    def _partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy()
        h = mix_hash61((u % np.int64(_MOD61)).astype(np.uint64),
                       AB_A1, AB_B1, AB_A2)
        arm = (h & np.uint64(1)).astype(np.int64)
        g = pd.DataFrame({"arm": arm,
                          "event_type": t.column("event_type").to_numpy()
                          }).groupby(["arm", "event_type"], sort=False) \
            .size().reset_index(name="partial_n")
        g["partial_n"] = g["partial_n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    df = collect_df(ev.map_batches(_partial, batch_format="pyarrow"))
    if df.empty:
        return pa.table({"arm": pa.array([], pa.int64()),
                         "event_type": pa.array([], pa.string()),
                         "n_events": pa.array([], pa.int64())})
    out = df.groupby(["arm", "event_type"], sort=True, as_index=False)[
        "partial_n"].sum().rename(columns={"partial_n": "n_events"})
    out["n_events"] = out["n_events"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


EXTRA_QUERIES.update({"g_ab_split": q_ab_split})
EXTRA_ORACLE_SQL.update({"g_ab_split": f"""
WITH h1 AS (
  SELECT event_type,
    CAST((CAST(user_id % {_MOD61} AS HUGEINT) * {AB_A1} + {AB_B1})
         % {_MOD61} AS BIGINT) AS h
  FROM events),
h2 AS (SELECT event_type, xor(h, h >> 31) AS h FROM h1),
h3 AS (SELECT event_type,
         CAST((CAST(h AS HUGEINT) * {AB_A2}) % {_MOD61} AS BIGINT) AS h
       FROM h2),
h4 AS (SELECT event_type, xor(h, h >> 29) AS h FROM h3)
SELECT h & 1 AS arm, event_type, count(*) AS n_events
FROM h4 GROUP BY 1, 2"""})


# ---- top user journeys (ordered path aggregation) --------------------------------------

JOURNEY_LEN = 3
JOURNEY_TOPK = 20


def _journey_block(df: pd.DataFrame) -> pd.DataFrame:
    """First-JOURNEY_LEN event-type path per user for one hash
    partition (users block-local): sort, cumcount-limit, one
    str.cat per user — then partial path counts."""
    if df.empty:
        return pd.DataFrame({"journey": pd.Series(dtype=object),
                             "partial_n": pd.Series(dtype=np.int64)})
    d = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    d = d[d.groupby("user_id", sort=False).cumcount() < JOURNEY_LEN]
    j = d.groupby("user_id", sort=False)["event_type"] \
        .agg(">".join).reset_index(name="journey")
    g = j.groupby("journey", sort=False).size().reset_index(
        name="partial_n")
    g["partial_n"] = g["partial_n"].astype(np.int64)
    return g


def q_user_journey(sf_dir: str) -> pa.Table:
    """Top-20 onboarding paths — the ordered first-3-event-type
    journey per user, counted across users: ONE hash repartition by
    user_id, a block-local sort + ordered string aggregation, then a
    bounded driver merge (|types|^3 × blocks partial rows) and the
    exact total-order top-K."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])
    nparts = shuffle_width(ev.count())
    use_hash_shuffle(ev, nparts)
    df = collect_df(ev.repartition(num_blocks=nparts, keys=["user_id"])
                    .map_batches(_journey_block, batch_format="pandas"))
    if df.empty:
        return pa.table({"journey": pa.array([], pa.string()),
                         "n_users": pa.array([], pa.int64())})
    m = df.groupby("journey", sort=False, as_index=False)["partial_n"] \
        .sum().rename(columns={"partial_n": "n_users"})
    m = m.sort_values(["n_users", "journey"], ascending=[False, True],
                      kind="mergesort").head(JOURNEY_TOPK) \
        .reset_index(drop=True)
    m["n_users"] = m["n_users"].astype(np.int64)
    return pa.Table.from_pandas(m, preserve_index=False)


EXTRA_QUERIES.update({"g_user_journey": q_user_journey})
EXTRA_ORACLE_SQL.update({"g_user_journey": f"""
WITH e AS (SELECT user_id, event_type,
    row_number() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS rn
  FROM events),
j AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn)
        AS journey
      FROM e WHERE rn <= {JOURNEY_LEN} GROUP BY user_id)
SELECT journey, count(*) AS n_users FROM j
GROUP BY 1 ORDER BY n_users DESC, journey LIMIT {JOURNEY_TOPK}"""})


# ---- incremental dedup against a reference corpus --------------------------------------

def q_incremental_dedup(sf_dir: str) -> pa.Table:
    """Incremental-ingestion dedup: treat even doc_ids as the already-
    ingested reference corpus and keep only the odd (new) docs whose
    normalized text is NOT in it — the nightly-batch shape (new data
    dedups against petabytes of history without ever joining history
    against itself).  Tagged union on text_norm → ONE keyed exchange →
    block-local anti; history ships only (hash-partitioned) normalized
    keys, never payloads."""
    import pyarrow.compute as apc
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def _tag(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64())
        norm = apc.utf8_trim_whitespace(
            apc.replace_substring_regex(
                apc.utf8_lower(t.column("text")), r"\s+", " "))
        side = apc.cast(apc.equal(
            apc.bit_wise_and(ids, 1), 0), pa.int8())  # 1 = reference
        return pa.table({"text_norm": norm, "side": side,
                         "doc_id": ids})

    def _anti_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64)})
        ref = df.loc[df["side"] == 1, "text_norm"]
        keep = df[(df["side"] == 0) & ~df["text_norm"].isin(set(ref))]
        return pd.DataFrame({"doc_id": keep["doc_id"]
                             .to_numpy(np.int64)})

    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)
    out = collect_df(ds.map_batches(_tag, batch_format="pyarrow")
                     .repartition(num_blocks=nparts, keys=["text_norm"])
                     .map_batches(_anti_block, batch_format="pandas"))
    if out.empty:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    return pa.Table.from_pandas(
        out.sort_values("doc_id", ignore_index=True),
        preserve_index=False)


EXTRA_QUERIES.update({"d_incremental_dedup": q_incremental_dedup})
EXTRA_ORACLE_SQL.update({"d_incremental_dedup": """
WITH n AS (SELECT doc_id,
    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS text_norm
  FROM documents)
SELECT doc_id FROM n
WHERE doc_id % 2 = 1
  AND text_norm NOT IN (SELECT text_norm FROM n WHERE doc_id % 2 = 0)"""})


# ---- snowflake region rollup ------------------------------------------------------------

def q_region_orders(sf_dir: str) -> pa.Table:
    """Order counts per REGION through the snowflake chain orders →
    customer → nation → region: the fact stream joins customer via
    the native distributed hash join ONCE, then nation→region
    collapses into a single composed broadcast gather (25 + 5 rows —
    dimensions this small never justify an exchange)."""
    from ray.data.aggregate import Sum
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"])
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_nationkey"])
    nparts = shuffle_width(orders.count())
    use_hash_shuffle(orders, nparts)
    joined = orders.join(cust, join_type="inner", num_partitions=nparts,
                         on=("o_custkey",), right_on=("c_custkey",))
    nt = pq.read_table(f"{sf_dir}/nation.parquet",
                       columns=["n_nationkey", "n_regionkey"])
    rt = pq.read_table(f"{sf_dir}/region.parquet")
    rmap_of_nation = np.empty(
        int(pa.compute.max(nt.column("n_nationkey")).as_py()) + 1,
        dtype=object)
    rnames = dict(zip(rt.column("r_regionkey").to_numpy(),
                      rt.column("r_name").to_numpy(zero_copy_only=False)))
    rmap_of_nation[nt.column("n_nationkey").to_numpy()] = [
        rnames[int(k)] for k in nt.column("n_regionkey").to_numpy()]
    ref = ray.put(rmap_of_nation)

    class _RegionPartial:
        def __init__(self, r):
            import ray as _ray
            self.rmap = _ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            nk = t.column("c_nationkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            g = pd.DataFrame({"r_name": self.rmap[nk]}) \
                .groupby("r_name", sort=False).size() \
                .reset_index(name="partial_n")
            g["partial_n"] = g["partial_n"].astype(np.int64)
            return pa.Table.from_pandas(g, preserve_index=False)

    df = collect_df(joined.map_batches(
        _RegionPartial, fn_constructor_args=(ref,),
        batch_format="pyarrow", concurrency=(1, 8)))
    if df.empty:
        return pa.table({"r_name": pa.array([], pa.string()),
                         "n_orders": pa.array([], pa.int64())})
    out = df.groupby("r_name", sort=True, as_index=False)["partial_n"] \
        .sum().rename(columns={"partial_n": "n_orders"})
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


EXTRA_QUERIES.update({"h_region_orders": q_region_orders})
EXTRA_ORACLE_SQL.update({"h_region_orders": """
SELECT r.r_name, count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1"""})


# ---- TPC-H Q14 / Q5 analogs + ROWS-frame window --------------------------

PROMO_MONTH = "1997-09-01 00:00:00"
_PROMO_LO_US = int(pd.Timestamp("1997-09-01").value // 1000)
_PROMO_HI_US = int(pd.Timestamp("1997-10-01").value // 1000)
DIM_BROADCAST_BUDGET = 50_000_000   # dimension rows the driver may
# hold and ray.put; TPC-H part/customer/supplier at petabyte scale
# exceed it, at which point the query falls back to the distributed
# hash join (equality between the two paths is test-pinned).


def _dim_rows(path: str) -> int:
    """Row count from parquet metadata only — no column data read."""
    return pq.ParquetFile(path).metadata.num_rows


def _du_partial_cols(batch: pa.Table, keep: np.ndarray) -> np.ndarray:
    """Exact discounted-revenue units (1e-4 dollars) for kept rows —
    the h_pricing integer idiom (reference parity: the money math of
    assertsprocessor metrics, metric_helper.go, is float; we tighten
    to exact ints so results are order-independent)."""
    pc_ = np.rint(batch.column("l_extendedprice").to_numpy()[keep]
                  * 100).astype(np.int64)
    dc = np.rint(batch.column("l_discount").to_numpy()[keep]
                 * 100).astype(np.int64)
    return pc_ * (100 - dc)


def q_promo_revenue(sf_dir: str, force_join: bool = False) -> pa.Table:
    """TPC-H-Q14-style promo revenue share for one ship month:
    lineitem classifies each row by the part's p_type.  Scale shape:
    the part dimension becomes ONE ray.put boolean array (is_promo by
    partkey) gathered inside a streaming lineitem pass — zero
    exchange; beyond DIM_BROADCAST_BUDGET (or force_join=True) the
    slimmed (l_partkey, du) partials take a native distributed hash
    join against part instead, and the rollup stays a per-batch
    integer partial either way."""
    import ray as _ray
    n_part = _dim_rows(f"{sf_dir}/part.parquet")

    def _filter_keep(batch: pa.Table) -> np.ndarray:
        ship = batch.column("l_shipdate").cast(pa.int64()).to_numpy()
        return (ship >= _PROMO_LO_US) & (ship < _PROMO_HI_US)

    if n_part <= DIM_BROADCAST_BUDGET and not force_join:
        part_t = pq.read_table(f"{sf_dir}/part.parquet",
                               columns=["p_partkey", "p_type"])
        pk = part_t.column("p_partkey").to_numpy()
        promo = np.zeros(int(pk.max()) + 1 if len(pk) else 1, np.bool_)
        promo[pk] = np.asarray(
            part_t.column("p_type").to_numpy(zero_copy_only=False)
        ) == "PROMO"
        ref = _ray.put(promo)

        class _PromoPartial:
            def __init__(self, r):
                self.promo = _ray.get(r)

            def __call__(self, batch: pa.Table) -> pa.Table:
                keep = _filter_keep(batch)
                du = _du_partial_cols(batch, keep)
                isp = self.promo[
                    batch.column("l_partkey").to_numpy()[keep]]
                return pa.table({
                    "pdu": pa.array([int(du[isp].sum())], pa.int64()),
                    "tdu": pa.array([int(du.sum())], pa.int64())})

        li = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_shipdate", "l_extendedprice",
                     "l_discount"])
        part = li.map_batches(_PromoPartial, fn_constructor_args=(ref,),
                              batch_format="pyarrow", concurrency=(1, 8))
        df = collect_df(part)
        pdu = sum(int(v) for v in df.iloc[:, 0]) if not df.empty else 0
        tdu = sum(int(v) for v in df.iloc[:, 1]) if not df.empty else 0
    else:
        def _slim(batch: pa.Table) -> pa.Table:
            keep = _filter_keep(batch)
            return pa.table({
                "l_partkey": pa.array(
                    batch.column("l_partkey").to_numpy()[keep],
                    pa.int64()),
                "du": pa.array(_du_partial_cols(batch, keep),
                               pa.int64())})

        raw = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_shipdate", "l_extendedprice",
                     "l_discount"])
        # width from the RAW read (metadata-only count) — counting the
        # mapped dataset would execute the slim pass twice
        nparts = shuffle_width(raw.count())
        li = raw.map_batches(_slim, batch_format="pyarrow")
        pd_ds = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                      columns=["p_partkey", "p_type"])
        use_hash_shuffle(li, nparts)
        joined = li.join(pd_ds, join_type="inner",
                         num_partitions=nparts,
                         on=("l_partkey",), right_on=("p_partkey",))

        def _sum_block(batch: pa.Table) -> pa.Table:
            du = batch.column("du").to_numpy()
            isp = np.asarray(batch.column("p_type").to_numpy(
                zero_copy_only=False)) == "PROMO"
            return pa.table({
                "pdu": pa.array([int(du[isp].sum())], pa.int64()),
                "tdu": pa.array([int(du.sum())], pa.int64())})

        df = collect_df(joined.map_batches(_sum_block,
                                           batch_format="pyarrow"))
        pdu = sum(int(v) for v in df.iloc[:, 0]) if not df.empty else 0
        tdu = sum(int(v) for v in df.iloc[:, 1]) if not df.empty else 0
    return pa.table({
        "promo_revenue": pa.array([float(pdu) / 10000.0], pa.float64()),
        "total_revenue": pa.array([float(tdu) / 10000.0], pa.float64()),
        "promo_share_pct": pa.array(
            [100.0 * float(pdu) / float(tdu) if tdu else 0.0],
            pa.float64())})


Q5_LO = "1997-01-01 00:00:00"
Q5_HI = "1998-01-01 00:00:00"
_Q5_LO_US = int(pd.Timestamp(Q5_LO).value // 1000)
_Q5_HI_US = int(pd.Timestamp(Q5_HI).value // 1000)


def q_q5_volume(sf_dir: str) -> pa.Table:
    """TPC-H-Q5-style local supplier volume: revenue per nation where
    the ordering customer and the line's supplier share a nation, for
    one order year.  Scale shape: the only exchange is the fact-fact
    lineitem ⋈ orders hash join on orderkey, with BOTH sides slimmed
    first (lineitem → (orderkey, suppkey, du) exact-integer partial
    rows; orders → date-filtered (orderkey, custkey)); customer and
    supplier collapse to budget-checked key→nationkey ray.put arrays
    gathered in the post-join pass, and nation (25 rows) names the
    final driver merge."""
    import ray as _ray
    for dim in ("customer", "supplier"):
        n = _dim_rows(f"{sf_dir}/{dim}.parquet")
        if n > DIM_BROADCAST_BUDGET:
            raise ValueError(
                f"{dim} has {n} rows > DIM_BROADCAST_BUDGET — use a "
                "second distributed join for this corpus")
    ct = pq.read_table(f"{sf_dir}/customer.parquet",
                       columns=["c_custkey", "c_nationkey"])
    st = pq.read_table(f"{sf_dir}/supplier.parquet",
                       columns=["s_suppkey", "s_nationkey"])

    def _keymap(keys: np.ndarray, vals: np.ndarray) -> np.ndarray:
        m = np.full(int(keys.max()) + 1 if len(keys) else 1, -1,
                    np.int32)
        m[keys] = vals.astype(np.int32)
        return m

    cmap = _ray.put(_keymap(ct.column("c_custkey").to_numpy(),
                            ct.column("c_nationkey").to_numpy()))
    smap = _ray.put(_keymap(st.column("s_suppkey").to_numpy(),
                            st.column("s_nationkey").to_numpy()))

    def _li_slim(batch: pa.Table) -> pa.Table:
        keep = np.ones(batch.num_rows, np.bool_)
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "l_suppkey": batch.column("l_suppkey"),
            "du": pa.array(_du_partial_cols(batch, keep), pa.int64())})

    def _o_slim(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy()
        keep = (od >= _Q5_LO_US) & (od < _Q5_HI_US)
        return pa.table({
            "o_orderkey": batch.column("o_orderkey").filter(
                pa.array(keep)),
            "o_custkey": batch.column("o_custkey").filter(
                pa.array(keep))})

    raw = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])
    # width from the RAW read (metadata-only count, no execution)
    nparts = shuffle_width(raw.count())
    li = raw.map_batches(_li_slim, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(_o_slim, batch_format="pyarrow")
    use_hash_shuffle(li, nparts)
    joined = li.join(orders, join_type="inner", num_partitions=nparts,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    class _LocalVolume:
        def __init__(self, cm, sm):
            self.cmap = _ray.get(cm)
            self.smap = _ray.get(sm)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cn = self.cmap[batch.column("o_custkey").to_numpy()]
            sn = self.smap[batch.column("l_suppkey").to_numpy()]
            keep = cn == sn
            g = pd.DataFrame({
                "nationkey": cn[keep],
                "du": batch.column("du").to_numpy()[keep],
            }).groupby("nationkey", sort=False)["du"].agg(
                ["sum", "count"]).reset_index()
            return pa.table({
                "nationkey": pa.array(g["nationkey"].to_numpy(),
                                      pa.int32()),
                "du": pa.array(g["sum"].to_numpy(), pa.int64()),
                "n": pa.array(g["count"].to_numpy(), pa.int64())})

    df = collect_df(joined.map_batches(
        _LocalVolume, fn_constructor_args=(cmap, smap),
        batch_format="pyarrow", concurrency=(1, 8)))
    nt = pq.read_table(f"{sf_dir}/nation.parquet",
                       columns=["n_nationkey", "n_name"])
    names = dict(zip(nt.column("n_nationkey").to_numpy(),
                     nt.column("n_name").to_numpy(zero_copy_only=False)))
    if df.empty:
        return pa.table({"n_name": pa.array([], pa.string()),
                         "revenue": pa.array([], pa.float64()),
                         "n_lines": pa.array([], pa.int64())})
    df.columns = ["nationkey", "du", "n"]
    m = df.groupby("nationkey", sort=True).agg(
        du=("du", lambda s: sum(int(v) for v in s)),
        n=("n", "sum")).reset_index()
    return pa.table({
        "n_name": pa.array([names[int(k)] for k in m["nationkey"]],
                           pa.string()),
        "revenue": pa.array([float(int(v)) / 10000.0 for v in m["du"]],
                            pa.float64()),
        "n_lines": pa.array(m["n"].to_numpy().astype(np.int64),
                            pa.int64())})


def _moving_avg_block(batch: pa.Table) -> pa.Table:
    """Vectorized ROWS-frame kernel over one user-partitioned block:
    sort by (user_id, ts, event_id), windowed sums via one cumsum of
    exact integer cents (events.value is 2-decimal by construction),
    one float division at the end — bitwise-stable under any block
    layout."""
    if batch.num_rows == 0:
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "user_id": pa.array([], pa.int64()),
                         "mov_avg": pa.array([], pa.float64())})
    uid = batch.column("user_id").to_numpy()
    ts = batch.column("ts").cast(pa.int64()).to_numpy()
    eid = batch.column("event_id").to_numpy()
    cents = np.rint(batch.column("value").to_numpy() * 100) \
        .astype(np.int64)
    order = np.lexsort((eid, ts, uid))
    uid, ts, eid, cents = uid[order], ts[order], eid[order], cents[order]
    n = len(uid)
    idx = np.arange(n, dtype=np.int64)
    grp_start = np.empty(n, np.bool_)
    grp_start[0] = True
    grp_start[1:] = uid[1:] != uid[:-1]
    start_idx = np.maximum.accumulate(np.where(grp_start, idx, 0))
    lo = np.maximum(idx - 3, start_idx)
    cs = np.cumsum(cents)
    wsum = cs - cs[lo] + cents[lo]
    nwin = idx - lo + 1
    mov = wsum / (100.0 * nwin)
    return pa.table({"event_id": pa.array(eid, pa.int64()),
                     "user_id": pa.array(uid, pa.int64()),
                     "mov_avg": pa.array(mov, pa.float64())})


def q_moving_avg(sf_dir: str) -> pa.Table:
    """Per-user ROWS-frame moving average (last 4 events by (ts,
    event_id)) over exact integer cents: ONE hash repartition by
    user_id + a vectorized cumsum block kernel — no global sort, and
    the single final division makes the float bitwise-stable."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)
    parted = ds.repartition(num_blocks=nparts, keys=["user_id"])
    out = parted.map_batches(_moving_avg_block, batch_format="pyarrow",
                             batch_size=None)
    return pa.Table.from_pandas(collect_df(out), preserve_index=False)


EXTRA_QUERIES.update({
    "h_promo_revenue": q_promo_revenue,
    "h_q5_volume": q_q5_volume,
    "g_moving_avg": q_moving_avg,
})
EXTRA_ORACLE_SQL.update({
    "h_promo_revenue": f"""
WITH f AS (
  SELECT l_partkey,
    CAST(round(l_extendedprice * 100) AS BIGINT)
      * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS du
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{PROMO_MONTH}'
    AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'),
s AS (
  SELECT
    sum(CAST(CASE WHEN p.p_type = 'PROMO' THEN f.du ELSE 0 END
             AS HUGEINT)) AS pdu,
    sum(CAST(f.du AS HUGEINT)) AS tdu
  FROM f JOIN part p ON f.l_partkey = p.p_partkey)
SELECT CAST(pdu AS DOUBLE) / 10000.0 AS promo_revenue,
  CAST(tdu AS DOUBLE) / 10000.0 AS total_revenue,
  100.0 * CAST(pdu AS DOUBLE) / CAST(tdu AS DOUBLE) AS promo_share_pct
FROM s""",
    "h_q5_volume": f"""
WITH f AS (
  SELECT l.l_suppkey, o.o_custkey,
    CAST(round(l.l_extendedprice * 100) AS BIGINT)
      * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS du
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '{Q5_LO}'
    AND o.o_orderdate < TIMESTAMP '{Q5_HI}')
SELECT n.n_name,
  CAST(sum(CAST(f.du AS HUGEINT)) AS DOUBLE) / 10000.0 AS revenue,
  count(*) AS n_lines
FROM f
JOIN customer c ON f.o_custkey = c.c_custkey
JOIN supplier s ON f.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_nationkey = s.s_nationkey
GROUP BY 1""",
    "g_moving_avg": """
SELECT event_id, user_id,
  sum(CAST(round(value * 100) AS BIGINT)) OVER w
    / (100.0 * count(*) OVER w) AS mov_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""",
})


# ---- dup-gram coverage / minutely spikes / Q18 big orders -----------------

DUP_GRAM_W = 3


class _GramPairsStage:
    """(gram, doc_id) distinct-per-doc shingle pairs with the actor
    vocab cache (the d_decontaminate tokenizer, w-token shingles)."""

    def __init__(self, w: int = DUP_GRAM_W):
        self.w = w
        self.cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        h, d, _ = T._distinct_shingles(batch, self.w, self.cache)
        ids = batch.column("doc_id").to_numpy()
        return pa.table({
            "gram": pa.array(h.astype(np.int64), pa.int64()),
            "doc_id": pa.array(ids[d], pa.int64())})


def _dup_gram_block(t: pa.Table) -> pa.Table:
    """Per-gram df within one gram-partitioned block (complete by the
    one-block-per-key hash-repartition invariant) folded straight into
    per-doc (n_grams, n_dup) partials — the pair rows never leave the
    block."""
    if t.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_grams": pa.array([], pa.int64()),
                         "n_dup": pa.array([], pa.int64())})
    g = t.column("gram").to_numpy()
    doc = t.column("doc_id").to_numpy()
    _, inv, cnt = np.unique(g, return_inverse=True, return_counts=True)
    dup = (cnt[inv] >= 2).astype(np.int64)
    ud, dinv = np.unique(doc, return_inverse=True)
    return pa.table({
        "doc_id": pa.array(ud, pa.int64()),
        "n_grams": pa.array(np.bincount(dinv).astype(np.int64),
                            pa.int64()),
        "n_dup": pa.array(np.bincount(dinv, weights=dup)
                          .astype(np.int64), pa.int64())})


def _dup_gram_final(df: pd.DataFrame) -> pd.DataFrame:
    if df.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                             "n_grams": pd.Series(dtype=np.int64),
                             "n_dup": pd.Series(dtype=np.int64),
                             "dup_coverage": pd.Series(dtype=np.float64)})
    m = df.groupby("doc_id", sort=False, as_index=False).sum()
    m["dup_coverage"] = (m["n_dup"].to_numpy().astype(np.float64)
                         / m["n_grams"].to_numpy().astype(np.float64))
    return m


def q_dup_gram_coverage(sf_dir: str, w: int = DUP_GRAM_W) -> pa.Table:
    """Boilerplate coverage per document: the fraction of a doc's
    distinct w-token shingles that occur in >= 2 documents (the
    fine-grained sibling of exact dedup, the signal behind
    RefinedWeb-style line dedup).  Shape: distinct (gram, doc) pairs →
    ONE hash exchange by gram (df computed block-locally, pairs never
    re-shipped) → bounded (doc × blocks) partials → ONE hash exchange
    by doc_id for the exact final; one float division at the end."""
    docs = _docs(sf_dir)
    pairs = docs.map_batches(_GramPairsStage, fn_constructor_args=(w,),
                             batch_format="pyarrow", concurrency=(1, 8))
    nparts = shuffle_width(docs.count())
    use_hash_shuffle(pairs, nparts)
    parted = pairs.repartition(num_blocks=nparts, keys=["gram"])
    partial = parted.map_batches(_dup_gram_block, batch_format="pyarrow",
                                 batch_size=None)
    parted2 = partial.repartition(num_blocks=nparts, keys=["doc_id"])
    out = parted2.map_batches(_dup_gram_final, batch_format="pandas",
                              batch_size=None)
    return pa.Table.from_pandas(collect_df(out), preserve_index=False)


SPIKE_Z = 2.0


def _minute_partial(batch: pa.Table) -> pa.Table:
    ts = batch.column("ts").cast(pa.int64()).to_numpy()
    g = pd.DataFrame({
        "event_type": batch.column("event_type").to_numpy(
            zero_copy_only=False),
        "minute": ts // 60_000_000,
    }).groupby(["event_type", "minute"], sort=False).size() \
        .reset_index(name="c")
    g["c"] = g["c"].astype(np.int64)
    return pa.Table.from_pandas(g, preserve_index=False)


def q_spikes(sf_dir: str, z_min: float = SPIKE_Z) -> pa.Table:
    """Minutely anomaly detection per event type: flag minutes whose
    count sits more than z_min population standard deviations above
    the type's per-observed-minute mean.  All moments come from exact
    integer sums (n·c − s over sqrt(n·ssq − s²) — one float division
    per row, bitwise-stable); shape: per-batch (type, minute) count
    partials → ONE hash exchange by minute (per-block exact merge) →
    driver holds only types × observed-minutes rows (bounded by the
    stream's wall-clock span, not its volume)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts"])
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)
    part = ds.map_batches(_minute_partial, batch_format="pyarrow")
    parted = part.repartition(num_blocks=nparts, keys=["minute"])

    def _merge_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return df.groupby(["event_type", "minute"], sort=False,
                          as_index=False)["c"].sum()

    df = collect_df(parted.map_batches(_merge_block,
                                       batch_format="pandas",
                                       batch_size=None))
    if df.empty:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "minute": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64()),
                         "z": pa.array([], pa.float64())})
    df.columns = ["event_type", "minute", "c"]
    rows = []
    for etype, grp in df.groupby("event_type", sort=True):
        c = grp["c"].to_numpy().astype(object)
        n = int(len(c))
        s = sum(int(v) for v in c)
        ssq = sum(int(v) * int(v) for v in c)
        den2 = n * ssq - s * s
        if den2 <= 0:
            continue
        den = float(den2) ** 0.5
        cc = grp["c"].to_numpy().astype(np.int64)
        z = (cc * n - s).astype(np.float64) / den
        keep = z > z_min
        rows.append(pd.DataFrame({
            "event_type": etype,
            "minute": grp["minute"].to_numpy()[keep],
            "n_events": cc[keep],
            "z": z[keep]}))
    if not rows:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "minute": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64()),
                         "z": pa.array([], pa.float64())})
    out = pd.concat(rows, ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)


BIG_ORDER_QTY = 200


def q_big_orders(sf_dir: str, min_qty: int = BIG_ORDER_QTY) -> pa.Table:
    """TPC-H-Q18-style large-volume orders: orders whose total line
    quantity exceeds min_qty, with customer name and order header
    attached.  Shape: lineitem pre-reduces per batch, ONE hash
    exchange by orderkey for the exact HAVING filter, and the tiny
    winner set broadcasts back into key-pruned orders / customer
    scans — the header attach never joins the fact table."""
    import ray as _ray
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_quantity"])
    nparts = shuffle_width(li.count())
    use_hash_shuffle(li, nparts)

    def _qty_partial(batch: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "l_orderkey": batch.column("l_orderkey").to_numpy(),
            "q": np.rint(batch.column("l_quantity").to_numpy())
            .astype(np.int64),
        }).groupby("l_orderkey", sort=False)["q"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    part = li.map_batches(_qty_partial, batch_format="pyarrow")
    parted = part.repartition(num_blocks=nparts, keys=["l_orderkey"])

    def _having_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        m = df.groupby("l_orderkey", sort=False, as_index=False)["q"] \
            .sum()
        return m[m["q"] > min_qty]

    win = collect_df(parted.map_batches(_having_block,
                                        batch_format="pandas",
                                        batch_size=None))
    if win.empty:
        return pa.table({
            "c_name": pa.array([], pa.string()),
            "o_custkey": pa.array([], pa.int64()),
            "o_orderkey": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
            "o_totalprice": pa.array([], pa.float64()),
            "total_qty": pa.array([], pa.int64())})
    win.columns = ["l_orderkey", "q"]
    wkeys = np.sort(win["l_orderkey"].to_numpy())
    qty = dict(zip(win["l_orderkey"].to_numpy(), win["q"].to_numpy()))
    kref = _ray.put(wkeys)

    class _KeyFilter:
        def __init__(self, ref, col):
            self.keys = _ray.get(ref)
            self.col = col

        def __call__(self, batch: pa.Table) -> pa.Table:
            k = batch.column(self.col).to_numpy()
            if not len(self.keys):
                return batch.slice(0, 0)
            pos = np.searchsorted(self.keys, k)
            pos[pos == len(self.keys)] = len(self.keys) - 1
            return batch.filter(pa.array(self.keys[pos] == k))

    od = collect_df(ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_totalprice"]).map_batches(
        _KeyFilter, fn_constructor_args=(kref, "o_orderkey"),
        batch_format="pyarrow", concurrency=(1, 8)))
    od.columns = ["o_orderkey", "o_custkey", "o_orderdate",
                  "o_totalprice"]
    ckeys = np.sort(np.unique(od["o_custkey"].to_numpy()))
    cref = _ray.put(ckeys)
    cd = collect_df(ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"]).map_batches(
        _KeyFilter, fn_constructor_args=(cref, "c_custkey"),
        batch_format="pyarrow", concurrency=(1, 8)))
    cd.columns = ["c_custkey", "c_name"]
    names = dict(zip(cd["c_custkey"].to_numpy(), cd["c_name"]))
    out = pd.DataFrame({
        "c_name": [names[int(k)] for k in od["o_custkey"]],
        "o_custkey": od["o_custkey"].to_numpy().astype(np.int64),
        "o_orderkey": od["o_orderkey"].to_numpy().astype(np.int64),
        "o_orderdate": od["o_orderdate"],
        "o_totalprice": od["o_totalprice"].to_numpy(),
        "total_qty": np.array([int(qty[int(k)])
                               for k in od["o_orderkey"]], np.int64)})
    return pa.Table.from_pandas(out, preserve_index=False)


EXTRA_QUERIES.update({
    "d_dup_gram_coverage": q_dup_gram_coverage,
    "g_spikes": q_spikes,
    "h_big_orders": q_big_orders,
})
EXTRA_ORACLE_SQL.update({
    "d_dup_gram_coverage": f"""
WITH {_shingle_cte_sql(DUP_GRAM_W).strip()},
pairs AS (
  SELECT doc_id, unnest(list_distinct(s)) AS gram FROM sh),
df AS (SELECT gram, count(*) AS dfc FROM pairs GROUP BY gram)
SELECT p.doc_id, count(*) AS n_grams,
  CAST(sum(CASE WHEN d.dfc >= 2 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dup,
  CAST(sum(CASE WHEN d.dfc >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) AS dup_coverage
FROM pairs p JOIN df d USING (gram)
GROUP BY 1""",
    "g_spikes": f"""
WITH m AS (
  SELECT event_type,
    CAST(epoch_us(ts) // 60000000 AS BIGINT) AS minute,
    count(*) AS c
  FROM events GROUP BY 1, 2),
mo AS (
  SELECT event_type, count(*) AS n,
    sum(CAST(c AS HUGEINT)) AS s,
    sum(CAST(c * c AS HUGEINT)) AS ssq
  FROM m GROUP BY 1)
SELECT m.event_type, m.minute, m.c AS n_events,
  CAST(m.c * mo.n - mo.s AS DOUBLE)
    / sqrt(CAST(mo.n * mo.ssq - mo.s * mo.s AS DOUBLE)) AS z
FROM m JOIN mo USING (event_type)
WHERE mo.n * mo.ssq - mo.s * mo.s > 0
  AND CAST(m.c * mo.n - mo.s AS DOUBLE)
    / sqrt(CAST(mo.n * mo.ssq - mo.s * mo.s AS DOUBLE)) > {SPIKE_Z}""",
    "h_big_orders": f"""
WITH lq AS (
  SELECT l_orderkey,
    sum(CAST(round(l_quantity) AS BIGINT)) AS tq
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > {BIG_ORDER_QTY})
SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
  o.o_totalprice, CAST(lq.tq AS BIGINT) AS total_qty
FROM lq
JOIN orders o ON o.o_orderkey = lq.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey""",
})


CONTAIN_THRESHOLD = 0.6


def q_containment_pairs(sf_dir: str) -> pa.Table:
    """Asymmetric near-subset pairs (quote/boilerplate-containment
    detection): char-5-gram containment |A∩B| / min(|A|,|B|) over the
    SAME df-capped inverted-index shuffle as d_ngram_jaccard — only
    the final per-pair score kernel differs, so the shuffle discipline
    (grams move, documents never do) carries over unchanged."""
    pairs = D.ngram_jaccard_distributed(
        _docs(sf_dir), threshold=CONTAIN_THRESHOLD, metric="containment")
    return pa.Table.from_pandas(pairs, preserve_index=False)


EXTRA_QUERIES.update({"d_containment_pairs": q_containment_pairs})
EXTRA_ORACLE_SQL.update({
    "d_containment_pairs": _ngram_jaccard_sql(
        threshold=CONTAIN_THRESHOLD, metric="containment")})


RANGE_JOIN_WINDOW_S = 1800


def _range_join_block(t: pa.Table, window_us: int) -> pa.Table:
    """Per-user-partitioned block kernel for the interval join: for
    each purchase, count and sum the same user's clicks in the
    preceding window via two searchsorted cuts over the user's
    time-sorted click rows — no pair materialization, O(n log n)."""
    if t.num_rows == 0:
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "user_id": pa.array([], pa.int64()),
                         "n_clicks": pa.array([], pa.int64()),
                         "click_value_sum": pa.array([], pa.float64())})
    uid = t.column("user_id").to_numpy()
    ts = t.column("ts").cast(pa.int64()).to_numpy()
    et = np.asarray(t.column("event_type").to_numpy(
        zero_copy_only=False))
    eid = t.column("event_id").to_numpy()
    cents = np.rint(t.column("value").to_numpy() * 100).astype(np.int64)
    # pack (user, ts) into one sortable key stream per class
    order = np.lexsort((ts, uid))
    uid, ts, et, eid, cents = (uid[order], ts[order], et[order],
                               eid[order], cents[order])
    is_c = et == "click"
    is_p = et == "purchase"
    cu, ct, cc = uid[is_c], ts[is_c], cents[is_c]
    ccs = np.cumsum(cc)
    pu, pt, pe = uid[is_p], ts[is_p], eid[is_p]
    # clicks of user u live in cu's contiguous run; searchsorted on the
    # composite (user, ts) ordering via separate cuts per bound
    lo = np.searchsorted(
        np.stack([cu, ct], 1).view([("u", cu.dtype), ("t", ct.dtype)])
        .ravel(),
        np.stack([pu, pt - window_us], 1)
        .view([("u", pu.dtype), ("t", pt.dtype)]).ravel())
    hi = np.searchsorted(
        np.stack([cu, ct], 1).view([("u", cu.dtype), ("t", ct.dtype)])
        .ravel(),
        np.stack([pu, pt], 1)
        .view([("u", pu.dtype), ("t", pt.dtype)]).ravel())
    n = (hi - lo).astype(np.int64)
    csum = np.where(hi > 0, ccs[hi - 1], 0) - np.where(lo > 0, ccs[lo - 1], 0)
    return pa.table({
        "event_id": pa.array(pe, pa.int64()),
        "user_id": pa.array(pu, pa.int64()),
        "n_clicks": pa.array(n, pa.int64()),
        "click_value_sum": pa.array(csum.astype(np.float64) / 100.0,
                                    pa.float64())})


def q_range_join(sf_dir: str,
                 window_s: int = RANGE_JOIN_WINDOW_S) -> pa.Table:
    """Interval (range) join: for every purchase, the count and value
    sum of the same user's clicks in the preceding 30 minutes
    (half-open window, click strictly before the purchase).  Shape:
    ONE hash exchange by user_id, then a per-block two-searchsorted
    kernel over (user, ts)-sorted composite keys — the pair set is
    never materialized, unlike a SQL range join's quadratic expand;
    the sum rides exact integer cents with one final division."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"])
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)
    parted = ds.repartition(num_blocks=nparts, keys=["user_id"])
    out = parted.map_batches(
        lambda t: _range_join_block(t, window_s * 1_000_000),
        batch_format="pyarrow", batch_size=None)
    return pa.Table.from_pandas(collect_df(out), preserve_index=False)


EXTRA_QUERIES.update({"g_range_join": q_range_join})
EXTRA_ORACLE_SQL.update({"g_range_join": f"""
SELECT p.event_id, p.user_id,
  count(c.event_id) AS n_clicks,
  CAST(coalesce(sum(CAST(round(c.value * 100) AS BIGINT)), 0)
       AS DOUBLE) / 100.0 AS click_value_sum
FROM events p
LEFT JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click'
  AND c.ts >= p.ts - INTERVAL {RANGE_JOIN_WINDOW_S} SECONDS
  AND c.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY 1, 2"""})


def q_hub_degree(sf_dir: str) -> pa.Table:
    """kNN-graph in-degree histogram (hub detection — the vectors many
    others call a nearest neighbor dominate semantic-dedup clusters
    and skew graph-based curation): composes the exact kNN edge build
    with an integer degree rollup; the histogram is |degrees| rows, so
    only the edge→degree reduce moves data."""
    edges = q_knn_graph(sf_dir).to_pandas()
    if edges.empty:
        return pa.table({"in_degree": pa.array([], pa.int64()),
                         "n_vectors": pa.array([], pa.int64())})
    deg = edges.groupby("neighbor_id", sort=False).size()
    hist = deg.value_counts().sort_index()
    return pa.table({
        "in_degree": pa.array(hist.index.to_numpy().astype(np.int64),
                              pa.int64()),
        "n_vectors": pa.array(hist.to_numpy().astype(np.int64),
                              pa.int64())})


def q_hourly_heatmap(sf_dir: str) -> pa.Table:
    """Hour-of-day × event-type activity heatmap: per-batch integer
    count partials → tiny driver merge (24 × types rows) — the load
    profile behind capacity planning and time-based sampling."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])

    def _partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        hour = (ts // 3_600_000_000) % 24
        g = pd.DataFrame({
            "event_type": batch.column("event_type").to_numpy(
                zero_copy_only=False),
            "hour": hour,
        }).groupby(["event_type", "hour"], sort=False).size() \
            .reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    df = collect_df(ds.map_batches(_partial, batch_format="pyarrow"))
    if df.empty:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "hour": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64())})
    df.columns = ["event_type", "hour", "n"]
    m = df.groupby(["event_type", "hour"], sort=True, as_index=False) \
        .sum().rename(columns={"n": "n_events"})
    m["n_events"] = m["n_events"].astype(np.int64)
    return pa.Table.from_pandas(m, preserve_index=False)


EXTRA_QUERIES.update({"e_hub_degree": q_hub_degree,
                      "g_hourly_heatmap": q_hourly_heatmap})
EXTRA_ORACLE_SQL.update({
    "e_hub_degree": f"""
WITH c AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
    list_cosine_similarity(a.embedding, b.embedding) AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
e AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
      row_number() OVER (PARTITION BY query_id
                         ORDER BY cos DESC, neighbor_id) AS rn
    FROM c) WHERE rn <= {KNN_GRAPH_K}),
d AS (SELECT neighbor_id, count(*) AS deg FROM e GROUP BY 1)
SELECT deg AS in_degree, count(*) AS n_vectors FROM d GROUP BY 1""",
    "g_hourly_heatmap": """
SELECT event_type,
  CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour,
  count(*) AS n_events
FROM events GROUP BY 1, 2""",
})


TURN_DEDUP_K = 50


def q_turn_dedup(sf_dir: str, k: int = TURN_DEDUP_K) -> pa.Table:
    """Boilerplate-turn mining over the TRANSCRIPTS table itself (the
    north-rule input): the top-k most-repeated turn texts with their
    occurrence and distinct-conversation counts — repeated greetings /
    canned tool outputs are the highest-value dedup targets in
    conversation training data.  Shape: per-batch (text, conv) pair
    partials → ONE hash exchange by text (each text wholly in one
    block) → block-local exact counts + per-block top-k → tiny exact
    driver final."""
    from asserts_otel_processor_ray.sources.synthetic import (
        ensure_transcripts)
    path = ensure_transcripts(sf_dir)
    ds = ray.data.read_parquet(path, columns=["conv_id", "text"])
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)

    def _pair_partial(batch: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "text": batch.column("text").to_numpy(zero_copy_only=False),
            "conv_id": batch.column("conv_id").to_numpy(
                zero_copy_only=False),
        }).groupby(["text", "conv_id"], sort=False).size() \
            .reset_index(name="pn")
        g["pn"] = g["pn"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    part = ds.map_batches(_pair_partial, batch_format="pyarrow")
    parted = part.repartition(num_blocks=nparts, keys=["text"])

    def _topk_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "text": pd.Series(dtype=object),
                "n_occurrences": pd.Series(dtype=np.int64),
                "n_convs": pd.Series(dtype=np.int64)})
        m = df.groupby("text", sort=False).agg(
            n_occurrences=("pn", "sum"), n_convs=("conv_id", "nunique")
        ).reset_index()
        m = m.sort_values(["n_occurrences", "text"],
                          ascending=[False, True], kind="mergesort")
        for c in ("n_occurrences", "n_convs"):
            m[c] = m[c].astype(np.int64)
        return m.head(k)

    df = collect_df(parted.map_batches(_topk_block,
                                       batch_format="pandas",
                                       batch_size=None))
    if df.empty:
        return pa.table({"text": pa.array([], pa.string()),
                         "n_occurrences": pa.array([], pa.int64()),
                         "n_convs": pa.array([], pa.int64())})
    df.columns = ["text", "n_occurrences", "n_convs"]
    df = df.sort_values(["n_occurrences", "text"],
                        ascending=[False, True],
                        kind="mergesort").head(k).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def _turn_dedup_sql() -> str:
    from asserts_otel_processor_ray.sources.synthetic import (
        transcripts_dir)
    path = transcripts_dir("/root/testdata/sf0.01")
    return f"""
WITH t AS (
  SELECT text, count(*) AS n_occurrences,
    count(DISTINCT conv_id) AS n_convs
  FROM read_parquet('{path}/*.parquet') GROUP BY text)
SELECT text, n_occurrences, n_convs FROM (
  SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, text) AS rn
  FROM t) WHERE rn <= {TURN_DEDUP_K}"""


EXTRA_QUERIES.update({"d_turn_dedup": q_turn_dedup})
EXTRA_ORACLE_SQL.update({"d_turn_dedup": _turn_dedup_sql()})


PREFIX_DUP_LEN = 64


def q_prefix_dup(sf_dir: str, k: int = PREFIX_DUP_LEN) -> pa.Table:
    """Prefix-duplicate groups: documents sharing the same first-k
    normalized characters (truncation / re-crawl / near-copy families
    that exact dedup misses when tails differ).  Shape: per-batch
    Arrow partial (prefix, min doc, count) → distributed
    groupby(prefix) Min/Sum final → HAVING >= 2; the driver only ever
    holds the duplicated groups."""
    from ray.data.aggregate import Min, Sum

    def _partial(batch: pa.Table) -> pa.Table:
        norm = T.normalize_expr(batch.column("text"))
        pre = pa.compute.utf8_slice_codeunits(norm, 0, k)
        t = pa.table({"prefix": pre, "doc_id": batch.column("doc_id")})
        gb = t.group_by(["prefix"]).aggregate(
            [("doc_id", "min"), ([], "count_all")])
        return gb.rename_columns(["prefix", "doc_id", "pn"])

    part = _docs(sf_dir).map_batches(_partial, batch_format="pyarrow")
    agg = part.groupby("prefix").aggregate(Min("doc_id"), Sum("pn"))
    df = collect_df(agg)
    if df.empty:
        return pa.table({"prefix": pa.array([], pa.string()),
                         "rep_doc_id": pa.array([], pa.int64()),
                         "n_docs": pa.array([], pa.int64())})
    df.columns = ["prefix", "rep_doc_id", "n_docs"]
    df = df[df["n_docs"] >= 2].reset_index(drop=True)
    df["n_docs"] = df["n_docs"].astype(np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


EXTRA_QUERIES.update({"d_prefix_dup": q_prefix_dup})
EXTRA_ORACLE_SQL.update({"d_prefix_dup": f"""
WITH p AS (
  SELECT doc_id,
    substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
           1, {PREFIX_DUP_LEN}) AS prefix
  FROM documents)
SELECT prefix, min(doc_id) AS rep_doc_id, count(*) AS n_docs
FROM p GROUP BY prefix HAVING count(*) >= 2"""})


# ---- Q6 scan, Q10 returned-top, Gram-matrix scan, per-user argmax ----------

Q6_LO = "1997-01-01 00:00:00"
Q6_HI = "1998-01-01 00:00:00"
_Q6_LO_US = int(pd.Timestamp(Q6_LO).value // 1000)
_Q6_HI_US = int(pd.Timestamp(Q6_HI).value // 1000)


def q_q6_revenue(sf_dir: str) -> pa.Table:
    """TPC-H-Q6-style forecasting-revenue scan: one pruned streaming
    pass over lineitem, per-batch exact integer partials (revenue
    units = price-cents × discount-cents, 1e-4 dollars), a two-number
    driver add — zero exchange, zero joins.  Reference parity: the
    scan+add shape of every counter in assertsprocessor
    metric_helper.go:34-89, tightened to order-independent ints."""

    def _partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").cast(pa.int64()).to_numpy()
        dc = np.rint(batch.column("l_discount").to_numpy() * 100) \
            .astype(np.int64)
        qty = batch.column("l_quantity").to_numpy()
        keep = ((ship >= _Q6_LO_US) & (ship < _Q6_HI_US)
                & (dc >= 5) & (dc <= 7) & (qty < 24))
        pc_ = np.rint(batch.column("l_extendedprice").to_numpy()[keep]
                      * 100).astype(np.int64)
        du = pc_ * dc[keep]
        return pa.table({"du": pa.array([int(du.sum())], pa.int64()),
                         "n": pa.array([int(keep.sum())], pa.int64())})

    df = collect_df(ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"])
        .map_batches(_partial, batch_format="pyarrow"))
    du = sum(int(v) for v in df.iloc[:, 0]) if not df.empty else 0
    n = int(df.iloc[:, 1].sum()) if not df.empty else 0
    return pa.table({
        "revenue": pa.array([float(du) / 10000.0], pa.float64()),
        "n_lines": pa.array([n], pa.int64())})


Q10_LO = "1997-01-01 00:00:00"
Q10_HI = "1997-07-01 00:00:00"
_Q10_LO_US = int(pd.Timestamp(Q10_LO).value // 1000)
_Q10_HI_US = int(pd.Timestamp(Q10_HI).value // 1000)
Q10_K = 20


def q_returned_top(sf_dir: str) -> pa.Table:
    """TPC-H-Q10-style returned-item report: revenue lost to returns
    per customer over one order window, exact top-20.  Scale shape:
    both fact sides slim and pre-reduce BEFORE the single distributed
    hash join (lineitem R-rows fold to per-batch (orderkey, du, n)
    partials; orders prune to the window), the joined stream folds to
    per-batch customer partials, the driver merge holds only
    customers-with-returns and takes the exact top-20 under
    (revenue desc, custkey), and the customer/nation dimensions are
    probed AFTER the reduce for the 20 winners only (predicate-pushed
    parquet read — never joined against the fact stream)."""
    raw = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"])
    nparts = shuffle_width(raw.count())

    def _li(batch: pa.Table) -> pa.Table:
        keep = np.asarray(batch.column("l_returnflag")
                          .to_numpy(zero_copy_only=False)) == "R"
        key = batch.column("l_orderkey").to_numpy()[keep]
        g = pd.DataFrame({"l_orderkey": key,
                          "du": _du_partial_cols(batch, keep)}) \
            .groupby("l_orderkey", sort=False)["du"] \
            .agg(["sum", "count"]).reset_index()
        return pa.table({
            "l_orderkey": pa.array(g["l_orderkey"].to_numpy(),
                                   pa.int64()),
            "du": pa.array(g["sum"].to_numpy(), pa.int64()),
            "n": pa.array(g["count"].to_numpy().astype(np.int64),
                          pa.int64())})

    def _o(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy()
        keep = pa.array((od >= _Q10_LO_US) & (od < _Q10_HI_US))
        return pa.table({
            "o_orderkey": batch.column("o_orderkey").filter(keep),
            "o_custkey": batch.column("o_custkey").filter(keep)})

    li = raw.map_batches(_li, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(_o, batch_format="pyarrow")
    use_hash_shuffle(li, nparts)
    joined = li.join(orders, join_type="inner", num_partitions=nparts,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def _cust_partial(batch: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "c_custkey": batch.column("o_custkey").to_numpy(),
            "du": batch.column("du").to_numpy(),
            "n": batch.column("n").to_numpy(),
        }).groupby("c_custkey", sort=False).sum().reset_index()
        return pa.table({
            "c_custkey": pa.array(g["c_custkey"].to_numpy(), pa.int64()),
            "du": pa.array(g["du"].to_numpy(), pa.int64()),
            "n": pa.array(g["n"].to_numpy(), pa.int64())})

    df = _named(collect_df(joined.map_batches(
        _cust_partial, batch_format="pyarrow")),
        ["c_custkey", "du", "n"])
    empty = pa.table({
        "c_custkey": pa.array([], pa.int64()),
        "c_name": pa.array([], pa.string()),
        "n_name": pa.array([], pa.string()),
        "revenue": pa.array([], pa.float64()),
        "n_lines": pa.array([], pa.int64())})
    if df.empty:
        return empty
    m = df.groupby("c_custkey", sort=False).agg(
        du=("du", lambda s: sum(int(v) for v in s)),
        n_lines=("n", "sum")).reset_index()
    top = m.sort_values(["du", "c_custkey"], ascending=[False, True],
                        kind="mergesort").head(Q10_K)
    winners = [int(k) for k in top["c_custkey"]]
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
        filters=[("c_custkey", "in", winners)]).to_pandas()
    nt = pq.read_table(f"{sf_dir}/nation.parquet",
                       columns=["n_nationkey", "n_name"]).to_pandas()
    out = top.merge(cust, on="c_custkey", how="left").merge(
        nt, left_on="c_nationkey", right_on="n_nationkey", how="left")
    return pa.table({
        "c_custkey": pa.array(out["c_custkey"].to_numpy().astype(
            np.int64), pa.int64()),
        "c_name": pa.array(out["c_name"], pa.string()),
        "n_name": pa.array(out["n_name"], pa.string()),
        "revenue": pa.array([float(int(v)) / 10000.0
                             for v in out["du"]], pa.float64()),
        "n_lines": pa.array(out["n_lines"].to_numpy().astype(np.int64),
                            pa.int64())})


GRAM_SCALE = 10_000


def q_gram(sf_dir: str) -> pa.Table:
    """Quantized Gram-matrix scan (Xᵀ X upper triangle + row count)
    over the embedding corpus — the one-pass sufficient statistic a
    PCA / whitening / ridge step needs.  Per-batch int64 matmul over
    floor-quantized coordinates (floor(v·1e4) is IEEE-identical in
    numpy and DuckDB — unlike round(), whose half-tie convention
    differs), then the driver adds dim×dim partials: zero exchange
    at any corpus size, driver memory O(d²)."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"])

    def _partial(t: pa.Table) -> pa.Table:
        m = S._matrix(t)
        q = np.floor(m * GRAM_SCALE).astype(np.int64)
        g = q.T @ q
        iu, ju = np.triu_indices(g.shape[0])
        return pa.table({
            "dim_i": pa.array((iu + 1).astype(np.int64), pa.int64()),
            "dim_j": pa.array((ju + 1).astype(np.int64), pa.int64()),
            "gram": pa.array(g[iu, ju], pa.int64()),
            "n": pa.array(np.full(len(iu), t.num_rows, np.int64),
                          pa.int64())})

    df = _named(collect_df(ds.map_batches(_partial,
                                          batch_format="pyarrow")),
                ["dim_i", "dim_j", "gram", "n"])
    if df.empty:
        return pa.table({"dim_i": pa.array([], pa.int64()),
                         "dim_j": pa.array([], pa.int64()),
                         "gram": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    out = df.groupby(["dim_i", "dim_j"], sort=True).agg(
        gram=("gram", lambda s: sum(int(v) for v in s)),
        n=("n", "sum")).reset_index()
    return pa.table({
        "dim_i": pa.array(out["dim_i"].to_numpy().astype(np.int64),
                          pa.int64()),
        "dim_j": pa.array(out["dim_j"].to_numpy().astype(np.int64),
                          pa.int64()),
        "gram": pa.array([int(v) for v in out["gram"]], pa.int64()),
        "n": pa.array(out["n"].to_numpy().astype(np.int64), pa.int64())})


def _argmax_last(uid: np.ndarray, ts: np.ndarray, eid: np.ndarray,
                 cents: np.ndarray) -> np.ndarray:
    """Indices of each user's argmax row under the total order
    (cents, ts, event_id) — the last row of each user group after one
    lexsort.  Associative: safe as both the per-batch partial and the
    per-partition final."""
    order = np.lexsort((eid, ts, cents, uid))
    u_s = uid[order]
    last = np.empty(len(u_s), np.bool_)
    last[-1] = True
    last[:-1] = u_s[1:] != u_s[:-1]
    return order[last]


_BEST_EMPTY = pa.table({
    "user_id": pa.array([], pa.int64()),
    "event_id": pa.array([], pa.int64()),
    "ts": pa.array([], pa.timestamp("us")),
    "best_cents": pa.array([], pa.int64())})


def _best_partial(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return _BEST_EMPTY
    uid = batch.column("user_id").to_numpy()
    ts = batch.column("ts").cast(pa.int64()).to_numpy()
    eid = batch.column("event_id").to_numpy()
    cents = np.rint(batch.column("value").to_numpy() * 100) \
        .astype(np.int64)
    sel = _argmax_last(uid, ts, eid, cents)
    return pa.table({
        "user_id": pa.array(uid[sel], pa.int64()),
        "event_id": pa.array(eid[sel], pa.int64()),
        "ts": pa.array(ts[sel], pa.int64()).cast(pa.timestamp("us")),
        "best_cents": pa.array(cents[sel], pa.int64())})


def _best_final(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return _BEST_EMPTY
    uid = batch.column("user_id").to_numpy()
    ts = batch.column("ts").cast(pa.int64()).to_numpy()
    eid = batch.column("event_id").to_numpy()
    cents = batch.column("best_cents").to_numpy()
    sel = _argmax_last(uid, ts, eid, cents)
    return pa.table({
        "user_id": pa.array(uid[sel], pa.int64()),
        "event_id": pa.array(eid[sel], pa.int64()),
        "ts": pa.array(ts[sel], pa.int64()).cast(pa.timestamp("us")),
        "best_cents": pa.array(cents[sel], pa.int64())})


def q_best_event(sf_dir: str) -> pa.Table:
    """Per-user argmax (each user's single highest-value event,
    ties → latest ts → largest event_id): per-batch argmax partials
    (one row per user per batch) → ONE hash repartition by user →
    block-local final argmax — the distributed
    row_number()-over-window = 1 without a global sort; the driver
    holds only the O(users) answer it must return."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)
    part = ds.map_batches(_best_partial, batch_format="pyarrow")
    parted = part.repartition(num_blocks=nparts, keys=["user_id"])
    out = parted.map_batches(_best_final, batch_format="pyarrow",
                             batch_size=None)
    df = _named(collect_df(out),
                ["user_id", "event_id", "ts", "best_cents"])
    if df.empty:
        return _BEST_EMPTY
    return pa.Table.from_pandas(df, preserve_index=False).cast(
        _BEST_EMPTY.schema)


EXTRA_QUERIES.update({
    "h_q6_revenue": q_q6_revenue,
    "h_returned_top": q_returned_top,
    "e_gram": q_gram,
    "g_best_event": q_best_event,
})
EXTRA_ORACLE_SQL.update({
    "h_q6_revenue": f"""
SELECT CAST(sum(CAST(
    CAST(round(l_extendedprice * 100) AS BIGINT)
    * CAST(round(l_discount * 100) AS BIGINT) AS HUGEINT))
  AS DOUBLE) / 10000.0 AS revenue,
  count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_LO}'
  AND l_shipdate < TIMESTAMP '{Q6_HI}'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24""",
    "h_returned_top": f"""
WITH f AS (
  SELECT l_orderkey,
    CAST(round(l_extendedprice * 100) AS BIGINT)
      * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS du
  FROM lineitem WHERE l_returnflag = 'R'),
j AS (
  SELECT o.o_custkey, f.du
  FROM f JOIN orders o ON f.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '{Q10_LO}'
    AND o.o_orderdate < TIMESTAMP '{Q10_HI}'),
g AS (
  SELECT o_custkey AS c_custkey, sum(CAST(du AS HUGEINT)) AS du,
    count(*) AS n_lines
  FROM j GROUP BY 1
  ORDER BY du DESC, c_custkey LIMIT {Q10_K})
SELECT g.c_custkey, c.c_name, n.n_name,
  CAST(g.du AS DOUBLE) / 10000.0 AS revenue, g.n_lines
FROM g
JOIN customer c ON g.c_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey""",
    "e_gram": f"""
WITH u AS (
  SELECT vec_id, unnest(generate_series(1, len(embedding))) AS dim,
         embedding
  FROM embeddings),
q AS (
  SELECT vec_id, CAST(dim AS BIGINT) AS dim,
    CAST(floor(CAST(embedding[dim] AS DOUBLE) * {GRAM_SCALE})
         AS BIGINT) AS qv
  FROM u)
SELECT a.dim AS dim_i, b.dim AS dim_j,
  CAST(sum(CAST(a.qv * b.qv AS HUGEINT)) AS BIGINT) AS gram,
  count(*) AS n
FROM q a JOIN q b ON a.vec_id = b.vec_id AND b.dim >= a.dim
GROUP BY 1, 2""",
    "g_best_event": """
SELECT user_id, event_id, ts,
  CAST(round(value * 100) AS BIGINT) AS best_cents
FROM (
  SELECT user_id, event_id, ts, value, row_number() OVER (
    PARTITION BY user_id
    ORDER BY CAST(round(value * 100) AS BIGINT) DESC, ts DESC,
             event_id DESC) AS rn
  FROM events)
WHERE rn = 1""",
})


# ---- Q16 distinct suppliers, Q19 disjunctive revenue, label centroids ------

Q16_EXCL_BRAND = "Brand#5"
Q16_EXCL_TYPE = "PROMO"


def q_supp_distinct(sf_dir: str) -> pa.Table:
    """TPC-H-Q16-style supplier diversity: COUNT(DISTINCT l_suppkey)
    per surviving (p_brand, p_type, p_size).  Scale shape: the part
    dimension becomes ONE broadcast int32 group-id array (excluded
    parts = -1), each lineitem batch dedupes its (gid, suppkey) pairs
    BEFORE the single hash exchange on suppkey, blocks dedupe + fold
    to (gid, cnt) partials, and the driver holds only
    O(brand×type×size) rows — the q_distinct_users shape with a
    broadcast-encoded composite group key."""
    import ray as _ray
    part_t = pq.read_table(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand", "p_type",
                                    "p_size"])
    pk = part_t.column("p_partkey").to_numpy()
    brand = np.asarray(part_t.column("p_brand")
                       .to_numpy(zero_copy_only=False))
    ptype = np.asarray(part_t.column("p_type")
                       .to_numpy(zero_copy_only=False))
    size = part_t.column("p_size").to_numpy().astype(np.int64)
    ub, bi = np.unique(brand, return_inverse=True)
    ut, ti = np.unique(ptype, return_inverse=True)
    smax = int(size.max()) + 1 if len(size) else 1
    gid_of_part = bi * (len(ut) * smax) + ti * smax + size
    excl = (brand == Q16_EXCL_BRAND) | (ptype == Q16_EXCL_TYPE)
    gid_of_part[excl] = -1
    lut = np.full(int(pk.max()) + 1 if len(pk) else 1, -1, np.int64)
    lut[pk] = gid_of_part
    ref = _ray.put(lut)

    class _PairPartial:
        def __init__(self, r):
            self.lut = _ray.get(r)

        def __call__(self, batch: pa.Table) -> pa.Table:
            gid = self.lut[batch.column("l_partkey").to_numpy()]
            sk = batch.column("l_suppkey").to_numpy()
            keep = gid >= 0
            pairs = np.unique(
                np.stack([gid[keep], sk[keep]], axis=1), axis=0)
            return pa.table({
                "gid": pa.array(pairs[:, 0], pa.int64()),
                "l_suppkey": pa.array(pairs[:, 1], pa.int64())})

    raw = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                columns=["l_partkey", "l_suppkey"])
    nparts = shuffle_width(raw.count())
    use_hash_shuffle(raw, nparts)
    part = raw.map_batches(_PairPartial, fn_constructor_args=(ref,),
                           batch_format="pyarrow", concurrency=(1, 8))
    parted = part.repartition(num_blocks=nparts, keys=["l_suppkey"])

    def _cnt_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"gid": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        pairs = np.unique(np.stack(
            [t.column("gid").to_numpy(), t.column("l_suppkey").to_numpy()],
            axis=1), axis=0)
        g, c = np.unique(pairs[:, 0], return_counts=True)
        return pa.table({"gid": pa.array(g, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64())})

    df = _named(collect_df(parted.map_batches(
        _cnt_block, batch_format="pyarrow", batch_size=None)),
        ["gid", "cnt"])
    if df.empty:
        return pa.table({"p_brand": pa.array([], pa.string()),
                         "p_type": pa.array([], pa.string()),
                         "p_size": pa.array([], pa.int64()),
                         "supplier_cnt": pa.array([], pa.int64())})
    m = df.groupby("gid", sort=True)["cnt"].sum().reset_index()
    g = m["gid"].to_numpy()
    return pa.table({
        "p_brand": pa.array(ub[g // (len(ut) * smax)], pa.string()),
        "p_type": pa.array(ut[(g // smax) % len(ut)], pa.string()),
        "p_size": pa.array((g % smax).astype(np.int64), pa.int64()),
        "supplier_cnt": pa.array(m["cnt"].to_numpy().astype(np.int64),
                                 pa.int64())})


# (brand, max size, qty lo, qty hi) — the three Q19-style branches
Q19_BRANCHES = (("Brand#1", 5, 1, 11), ("Brand#12", 10, 10, 20),
                ("Brand#23", 15, 20, 30))


def q_q19_revenue(sf_dir: str) -> pa.Table:
    """TPC-H-Q19-style disjunctive-predicate revenue: three
    (brand, size-range, quantity-range) OR-branches evaluated as
    vectorized masks against TWO broadcast part arrays (brand index +
    size by partkey) inside one streaming lineitem pass; per-batch
    exact integer partials, two-number driver add — zero exchange."""
    import ray as _ray
    part_t = pq.read_table(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand", "p_size"])
    pk = part_t.column("p_partkey").to_numpy()
    brand = np.asarray(part_t.column("p_brand")
                       .to_numpy(zero_copy_only=False))
    size = part_t.column("p_size").to_numpy().astype(np.int64)
    nmax = int(pk.max()) + 1 if len(pk) else 1
    bidx = np.full(nmax, -1, np.int64)   # branch id by partkey, -1=none
    szs = np.zeros(nmax, np.int64)
    szs[pk] = size
    for i, (b, smax, _, _) in enumerate(Q19_BRANCHES):
        hit = (brand == b) & (size >= 1) & (size <= smax)
        bidx[pk[hit]] = i
    ref = _ray.put(np.stack([bidx, szs]))

    qlo = np.array([b[2] for b in Q19_BRANCHES], np.float64)
    qhi = np.array([b[3] for b in Q19_BRANCHES], np.float64)

    class _Q19Partial:
        def __init__(self, r):
            self.bidx = _ray.get(r)[0]

        def __call__(self, batch: pa.Table) -> pa.Table:
            bi = self.bidx[batch.column("l_partkey").to_numpy()]
            qty = batch.column("l_quantity").to_numpy()
            ok = bi >= 0
            sel = np.where(ok)[0]
            b = bi[sel]
            keep = np.zeros(batch.num_rows, np.bool_)
            keep[sel] = (qty[sel] >= qlo[b]) & (qty[sel] <= qhi[b])
            du = _du_partial_cols(batch, keep)
            return pa.table({
                "du": pa.array([int(du.sum())], pa.int64()),
                "n": pa.array([int(keep.sum())], pa.int64())})

    df = collect_df(ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"])
        .map_batches(_Q19Partial, fn_constructor_args=(ref,),
                     batch_format="pyarrow", concurrency=(1, 8)))
    du = sum(int(v) for v in df.iloc[:, 0]) if not df.empty else 0
    n = int(df.iloc[:, 1].sum()) if not df.empty else 0
    return pa.table({
        "revenue": pa.array([float(du) / 10000.0], pa.float64()),
        "n_lines": pa.array([n], pa.int64())})


def q_label_centroids(sf_dir: str) -> pa.Table:
    """Class-separation audit: cosine similarity between per-label
    centroid directions, over floor-quantized coordinate SUMS (exact
    integers — order-independent across the distributed scan; one
    deterministic float divide/sqrt at the end).  Per-batch partials
    are O(labels × dims) regardless of batch size; the driver reduce
    is O(labels² ) — zero exchange."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["label", "embedding"])

    def _partial(t: pa.Table) -> pa.Table:
        m = S._matrix(t)
        q = np.floor(m * GRAM_SCALE).astype(np.int64)
        lab = t.column("label").to_numpy().astype(np.int64)
        ul, inv = np.unique(lab, return_inverse=True)
        d = q.shape[1]
        sums = np.zeros((len(ul), d), np.int64)
        np.add.at(sums, inv, q)
        li = np.repeat(ul, d)
        di = np.tile(np.arange(1, d + 1, dtype=np.int64), len(ul))
        return pa.table({"label": pa.array(li, pa.int64()),
                         "dim": pa.array(di, pa.int64()),
                         "qsum": pa.array(sums.ravel(), pa.int64())})

    df = _named(collect_df(ds.map_batches(_partial,
                                          batch_format="pyarrow")),
                ["label", "dim", "qsum"])
    empty = pa.table({"label_a": pa.array([], pa.int64()),
                      "label_b": pa.array([], pa.int64()),
                      "cos_sim": pa.array([], pa.float64())})
    if df.empty:
        return empty
    s = df.groupby(["label", "dim"], sort=True)["qsum"] \
        .agg(lambda v: sum(int(x) for x in v)).reset_index()
    labels = sorted(int(x) for x in s["label"].unique())
    vecs = {l: [int(v) for v in
                s[s["label"] == l].sort_values("dim")["qsum"]]
            for l in labels}
    import math
    la, lb, cs = [], [], []
    for i, a in enumerate(labels):
        for b in labels[i + 1:]:
            dot = sum(x * y for x, y in zip(vecs[a], vecs[b]))
            na = sum(x * x for x in vecs[a])
            nb = sum(y * y for y in vecs[b])
            la.append(a)
            lb.append(b)
            cs.append(float(dot)
                      / (math.sqrt(float(na)) * math.sqrt(float(nb))))
    return pa.table({"label_a": pa.array(la, pa.int64()),
                     "label_b": pa.array(lb, pa.int64()),
                     "cos_sim": pa.array(cs, pa.float64())})


EXTRA_QUERIES.update({
    "h_supp_distinct": q_supp_distinct,
    "h_q19_revenue": q_q19_revenue,
    "e_label_centroids": q_label_centroids,
})
EXTRA_ORACLE_SQL.update({
    "h_supp_distinct": f"""
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
  count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> '{Q16_EXCL_BRAND}' AND p.p_type <> '{Q16_EXCL_TYPE}'
GROUP BY 1, 2, 3""",
    "h_q19_revenue": f"""
WITH f AS (
  SELECT CAST(round(l.l_extendedprice * 100) AS BIGINT)
      * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS du
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE (p.p_brand = '{Q19_BRANCHES[0][0]}'
         AND p.p_size BETWEEN 1 AND {Q19_BRANCHES[0][1]}
         AND l.l_quantity BETWEEN {Q19_BRANCHES[0][2]}
                               AND {Q19_BRANCHES[0][3]})
     OR (p.p_brand = '{Q19_BRANCHES[1][0]}'
         AND p.p_size BETWEEN 1 AND {Q19_BRANCHES[1][1]}
         AND l.l_quantity BETWEEN {Q19_BRANCHES[1][2]}
                               AND {Q19_BRANCHES[1][3]})
     OR (p.p_brand = '{Q19_BRANCHES[2][0]}'
         AND p.p_size BETWEEN 1 AND {Q19_BRANCHES[2][1]}
         AND l.l_quantity BETWEEN {Q19_BRANCHES[2][2]}
                               AND {Q19_BRANCHES[2][3]}))
SELECT CAST(sum(CAST(du AS HUGEINT)) AS DOUBLE) / 10000.0 AS revenue,
  count(*) AS n_lines
FROM f""",
    "e_label_centroids": f"""
WITH u AS (
  SELECT label, unnest(generate_series(1, len(embedding))) AS dim,
         embedding
  FROM embeddings),
q AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
    CAST(floor(CAST(embedding[dim] AS DOUBLE) * {GRAM_SCALE})
         AS BIGINT) AS qv
  FROM u),
s AS (
  SELECT label, dim, sum(CAST(qv AS HUGEINT)) AS sv
  FROM q GROUP BY 1, 2),
p AS (
  SELECT a.label AS label_a, b.label AS label_b,
    sum(a.sv * b.sv) AS dot
  FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
  GROUP BY 1, 2),
nn AS (SELECT label, sum(sv * sv) AS sq FROM s GROUP BY 1)
SELECT p.label_a, p.label_b,
  CAST(p.dot AS DOUBLE)
    / (sqrt(CAST(na.sq AS DOUBLE)) * sqrt(CAST(nb.sq AS DOUBLE)))
    AS cos_sim
FROM p
JOIN nn na ON p.label_a = na.label
JOIN nn nb ON p.label_b = nb.label"""})


# ---- embedding outliers, MinHash recall eval, churned users -----------------

OUTLIER_TAU = -0.05


def q_embed_outliers(sf_dir: str) -> pa.Table:
    """Label-conditional outlier sweep: flag vectors whose cosine to
    their own label centroid falls below τ — the cheap first-pass
    mislabel/noise detector before training.  TWO zero-exchange
    streaming passes: pass 1 reduces per-label quantized coordinate
    SUMS (exact ints, O(labels×dims) partials); pass 2 broadcasts the
    label-sum matrix via ray.put and scores every vector with one
    int64 matmul per batch, emitting only flagged rows.  The single
    float divide per row is deterministic (IEEE-identical here and in
    the SQL mirror)."""
    import ray as _ray
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["label", "embedding"])

    def _sum_partial(t: pa.Table) -> pa.Table:
        m = S._matrix(t)
        q = np.floor(m * GRAM_SCALE).astype(np.int64)
        lab = t.column("label").to_numpy().astype(np.int64)
        ul, inv = np.unique(lab, return_inverse=True)
        d = q.shape[1]
        sums = np.zeros((len(ul), d), np.int64)
        np.add.at(sums, inv, q)
        return pa.table({
            "label": pa.array(np.repeat(ul, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    len(ul)), pa.int64()),
            "qsum": pa.array(sums.ravel(), pa.int64())})

    sdf = _named(collect_df(ds.map_batches(_sum_partial,
                                           batch_format="pyarrow")),
                 ["label", "dim", "qsum"])
    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "label": pa.array([], pa.int64()),
                      "cos_sim": pa.array([], pa.float64())})
    if sdf.empty:
        return empty
    agg = sdf.groupby(["label", "dim"], sort=True)["qsum"].sum() \
        .reset_index()
    labels = np.sort(agg["label"].unique())
    d = int(agg["dim"].max()) + 1
    smat = np.zeros((int(labels.max()) + 1, d), np.int64)
    for l in labels:
        smat[int(l)] = agg[agg["label"] == l].sort_values("dim")[
            "qsum"].to_numpy()
    # exact-integer sum of squares BEFORE the one float conversion, so
    # the norm matches the SQL mirror's HUGEINT sum bit-for-bit
    import math
    snorm = np.array([math.sqrt(float(sum(int(x) * int(x)
                                          for x in row)))
                      for row in smat], np.float64)
    ref = _ray.put((smat, snorm))

    class _Score:
        def __init__(self, r):
            self.smat, self.snorm = _ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = S._matrix(t)
            q = np.floor(m * GRAM_SCALE).astype(np.int64)
            lab = t.column("label").to_numpy().astype(np.int64)
            dots = np.einsum("ij,ij->i", q, self.smat[lab]) \
                .astype(np.float64)
            qn = np.sqrt(np.einsum("ij,ij->i", q, q)
                         .astype(np.float64))
            cos = dots / (qn * self.snorm[lab])
            keep = cos < OUTLIER_TAU
            return pa.table({
                "vec_id": pa.array(
                    t.column("vec_id").to_numpy()[keep], pa.int64()),
                "label": pa.array(lab[keep], pa.int64()),
                "cos_sim": pa.array(cos[keep], pa.float64())})

    out = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "label", "embedding"]) \
        .map_batches(_Score, fn_constructor_args=(ref,),
                     batch_format="pyarrow", concurrency=(1, 8))
    df = _named(collect_df(out), ["vec_id", "label", "cos_sim"])
    if df.empty:
        return empty
    return pa.Table.from_pandas(df, preserve_index=False).cast(
        empty.schema)


def q_minhash_recall(sf_dir: str) -> pa.Table:
    """Index-quality report for the dedup stack: precision/recall of
    the MinHash-LSH candidate pairs against the exact n-gram-Jaccard
    pair set (both already distributed queries; the driver merge is
    over the bounded pair lists).  The oracle composes the two
    generated SQL mirrors, so the metric itself is byte-checked —
    same pattern as e_ann_recall."""
    ex = q_ngram_jaccard(sf_dir).to_pandas()
    ap = q_minhash_pairs(sf_dir).to_pandas()
    hit = ex.merge(ap, on=["doc_a", "doc_b"], how="inner")
    n_true, n_pred, n_hit = len(ex), len(ap), len(hit)
    return pa.table({
        "n_true": pa.array([n_true], pa.int64()),
        "n_pred": pa.array([n_pred], pa.int64()),
        "n_hit": pa.array([n_hit], pa.int64()),
        "precision": pa.array(
            [float(n_hit) / float(n_pred) if n_pred else 0.0],
            pa.float64()),
        "recall": pa.array(
            [float(n_hit) / float(n_true) if n_true else 0.0],
            pa.float64())})


def _minhash_recall_sql() -> str:
    exact = EXTRA_ORACLE_SQL["d_ngram_jaccard"].strip()
    approx = EXTRA_ORACLE_SQL["d_minhash_pairs"].strip()
    return f"""
WITH ex AS ({exact}),
ap AS ({approx}),
h AS (SELECT count(*) AS n_hit
      FROM ex JOIN ap ON ex.doc_a = ap.doc_a AND ex.doc_b = ap.doc_b)
SELECT (SELECT count(*) FROM ex) AS n_true,
  (SELECT count(*) FROM ap) AS n_pred, h.n_hit,
  CASE WHEN (SELECT count(*) FROM ap) = 0 THEN 0.0
       ELSE CAST(h.n_hit AS DOUBLE)
            / CAST((SELECT count(*) FROM ap) AS DOUBLE) END
    AS precision,
  CASE WHEN (SELECT count(*) FROM ex) = 0 THEN 0.0
       ELSE CAST(h.n_hit AS DOUBLE)
            / CAST((SELECT count(*) FROM ex) AS DOUBLE) END
    AS recall
FROM h"""


CHURN_SPLIT = "2024-01-30 00:00:00"
CHURN_END = "2024-01-31 00:00:00"
_CHURN_SPLIT_US = int(pd.Timestamp(CHURN_SPLIT).value // 1000)
_CHURN_END_US = int(pd.Timestamp(CHURN_END).value // 1000)


def q_churned_users(sf_dir: str) -> pa.Table:
    """Churn list: users active before the split with zero events in
    the follow-up window — the time-windowed anti-join every
    engagement pipeline runs.  Per-batch (user, n_before, n_after)
    partials → ONE hash exchange on user → block reduce + filter;
    the driver holds only the churned rows it must return."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)

    def _partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy()
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        before = (ts < _CHURN_SPLIT_US).astype(np.int64)
        after = ((ts >= _CHURN_SPLIT_US)
                 & (ts < _CHURN_END_US)).astype(np.int64)
        ul, inv = np.unique(uid, return_inverse=True)
        return pa.table({
            "user_id": pa.array(ul, pa.int64()),
            "nb": pa.array(np.bincount(inv, weights=before)
                           .astype(np.int64), pa.int64()),
            "na": pa.array(np.bincount(inv, weights=after)
                           .astype(np.int64), pa.int64())})

    def _final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_before": pa.array([], pa.int64())})
        uid = t.column("user_id").to_numpy()
        ul, inv = np.unique(uid, return_inverse=True)
        nb = np.bincount(inv, weights=t.column("nb").to_numpy()) \
            .astype(np.int64)
        na = np.bincount(inv, weights=t.column("na").to_numpy()) \
            .astype(np.int64)
        keep = (nb > 0) & (na == 0)
        return pa.table({"user_id": pa.array(ul[keep], pa.int64()),
                         "n_before": pa.array(nb[keep], pa.int64())})

    parted = ds.map_batches(_partial, batch_format="pyarrow") \
        .repartition(num_blocks=nparts, keys=["user_id"])
    df = _named(collect_df(parted.map_batches(
        _final, batch_format="pyarrow", batch_size=None)),
        ["user_id", "n_before"])
    if df.empty:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "n_before": pa.array([], pa.int64())})
    return pa.Table.from_pandas(
        df.astype({"user_id": np.int64, "n_before": np.int64}),
        preserve_index=False)


EXTRA_QUERIES.update({
    "e_outliers": q_embed_outliers,
    "d_minhash_recall": q_minhash_recall,
    "g_churned_users": q_churned_users,
})
EXTRA_ORACLE_SQL.update({
    "e_outliers": f"""
WITH u AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
    unnest(generate_series(1, len(embedding))) AS dim, embedding
  FROM embeddings),
q AS (
  SELECT vec_id, label, CAST(dim AS BIGINT) AS dim,
    CAST(floor(CAST(embedding[dim] AS DOUBLE) * {GRAM_SCALE})
         AS BIGINT) AS qv
  FROM u),
s AS (
  SELECT label, dim, sum(CAST(qv AS HUGEINT)) AS sv
  FROM q GROUP BY 1, 2),
d AS (
  SELECT q.vec_id, q.label,
    sum(q.qv * s.sv) AS dot,
    sum(CAST(q.qv AS HUGEINT) * q.qv) AS qq
  FROM q JOIN s ON q.label = s.label AND q.dim = s.dim
  GROUP BY 1, 2),
nn AS (SELECT label, sum(sv * sv) AS sq FROM s GROUP BY 1)
SELECT d.vec_id, d.label,
  CAST(d.dot AS DOUBLE)
    / (sqrt(CAST(d.qq AS DOUBLE)) * sqrt(CAST(nn.sq AS DOUBLE)))
    AS cos_sim
FROM d JOIN nn ON d.label = nn.label
WHERE CAST(d.dot AS DOUBLE)
    / (sqrt(CAST(d.qq AS DOUBLE)) * sqrt(CAST(nn.sq AS DOUBLE)))
    < {OUTLIER_TAU}""",
    "d_minhash_recall": _minhash_recall_sql(),
    "g_churned_users": f"""
SELECT user_id, count(*) AS n_before
FROM events
WHERE ts < TIMESTAMP '{CHURN_SPLIT}'
  AND user_id NOT IN (
    SELECT user_id FROM events
    WHERE ts >= TIMESTAMP '{CHURN_SPLIT}'
      AND ts < TIMESTAMP '{CHURN_END}')
GROUP BY user_id""",
})


# ---- Q7 two-nation volume, vocabulary growth, label × text join -----------

Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
_Q7_LO_US = int(pd.Timestamp("1996-01-01 00:00:00").value // 1000)
_Q7_MID_US = int(pd.Timestamp("1997-01-01 00:00:00").value // 1000)
_Q7_HI_US = int(pd.Timestamp("1998-01-01 00:00:00").value // 1000)


def q_q7_shipping(sf_dir: str) -> pa.Table:
    """TPC-H-Q7-style volume shipping between two nations by ship
    year: the lineitem side slims to (orderkey, suppkey, year, du)
    partials for the two-year window BEFORE the single distributed
    hash join against pruned orders; supplier→nation and
    customer→nation are broadcast int gathers (budget-checked like
    h_q5_volume), the pair filter keeps only the two directed
    nation pairs, and the rollup is a 4-group driver merge."""
    import ray as _ray
    ct = pq.read_table(f"{sf_dir}/customer.parquet",
                       columns=["c_custkey", "c_nationkey"])
    st = pq.read_table(f"{sf_dir}/supplier.parquet",
                       columns=["s_suppkey", "s_nationkey"])
    nt = pq.read_table(f"{sf_dir}/nation.parquet",
                       columns=["n_nationkey", "n_name"])
    names = dict(zip(nt.column("n_nationkey").to_numpy(),
                     nt.column("n_name").to_numpy(zero_copy_only=False)))
    keys = {v: k for k, v in names.items()}
    na, nb = keys[Q7_NATION_A], keys[Q7_NATION_B]

    def _keymap(k: np.ndarray, v: np.ndarray) -> np.ndarray:
        m = np.full(int(k.max()) + 1 if len(k) else 1, -1, np.int32)
        m[k] = v.astype(np.int32)
        return m

    ref = _ray.put((
        _keymap(ct.column("c_custkey").to_numpy(),
                ct.column("c_nationkey").to_numpy()),
        _keymap(st.column("s_suppkey").to_numpy(),
                st.column("s_nationkey").to_numpy())))

    def _li(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").cast(pa.int64()).to_numpy()
        keep = (ship >= _Q7_LO_US) & (ship < _Q7_HI_US)
        year = np.where(ship < _Q7_MID_US, 1996, 1997).astype(np.int64)
        return pa.table({
            "l_orderkey": batch.column("l_orderkey").filter(
                pa.array(keep)),
            "l_suppkey": batch.column("l_suppkey").filter(
                pa.array(keep)),
            "l_year": pa.array(year[keep], pa.int64()),
            "du": pa.array(_du_partial_cols(batch, keep), pa.int64())})

    raw = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"])
    nparts = shuffle_width(raw.count())
    li = raw.map_batches(_li, batch_format="pyarrow")
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    use_hash_shuffle(li, nparts)
    joined = li.join(orders, join_type="inner", num_partitions=nparts,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    class _PairPartial:
        def __init__(self, r):
            self.cmap, self.smap = _ray.get(r)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cn = self.cmap[batch.column("o_custkey").to_numpy()]
            sn = self.smap[batch.column("l_suppkey").to_numpy()]
            keep = ((sn == na) & (cn == nb)) | ((sn == nb) & (cn == na))
            g = pd.DataFrame({
                "sn": sn[keep], "cn": cn[keep],
                "l_year": batch.column("l_year").to_numpy()[keep],
                "du": batch.column("du").to_numpy()[keep],
                "n": 1,
            }).groupby(["sn", "cn", "l_year"], sort=False).agg(
                du=("du", "sum"), n=("n", "sum")).reset_index()
            return pa.table({
                "sn": pa.array(g["sn"].to_numpy().astype(np.int64),
                               pa.int64()),
                "cn": pa.array(g["cn"].to_numpy().astype(np.int64),
                               pa.int64()),
                "l_year": pa.array(g["l_year"].to_numpy(), pa.int64()),
                "du": pa.array(g["du"].to_numpy(), pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64),
                              pa.int64())})

    df = _named(collect_df(joined.map_batches(
        _PairPartial, fn_constructor_args=(ref,),
        batch_format="pyarrow", concurrency=(1, 8))),
        ["sn", "cn", "l_year", "du", "n"])
    if df.empty:
        return pa.table({"supp_nation": pa.array([], pa.string()),
                         "cust_nation": pa.array([], pa.string()),
                         "l_year": pa.array([], pa.int64()),
                         "revenue": pa.array([], pa.float64()),
                         "n_lines": pa.array([], pa.int64())})
    m = df.groupby(["sn", "cn", "l_year"], sort=True).agg(
        du=("du", lambda s: sum(int(v) for v in s)),
        n=("n", "sum")).reset_index()
    return pa.table({
        "supp_nation": pa.array([names[int(k)] for k in m["sn"]],
                                pa.string()),
        "cust_nation": pa.array([names[int(k)] for k in m["cn"]],
                                pa.string()),
        "l_year": pa.array(m["l_year"].to_numpy(), pa.int64()),
        "revenue": pa.array([float(int(v)) / 10000.0 for v in m["du"]],
                            pa.float64()),
        "n_lines": pa.array(m["n"].to_numpy().astype(np.int64),
                            pa.int64())})


VOCAB_BUCKET = 2


def q_vocab_growth(sf_dir: str) -> pa.Table:
    """Vocabulary-growth (Heaps-law) curve for corpus QA: how many
    NEW tokens each doc_id bucket contributes (token attributed to
    its minimum doc_id — deterministic under any scan order).
    Per-batch (token, min doc) partials → distributed
    groupby(token).Min → per-block bucket histogram partials → tiny
    driver merge; the driver never holds O(vocab) rows."""
    from ray.data.aggregate import Min
    docs = _docs(sf_dir)

    def _first_partial(t: pa.Table) -> pa.Table:
        toks = T._tokens_series(t.column("text"))
        ex = toks.explode().dropna()
        doc = t.column("doc_id").to_numpy()[
            ex.index.to_numpy(np.int64)]
        g = pd.DataFrame({"token": ex.to_numpy(), "doc": doc}) \
            .groupby("token", sort=False)["doc"].min().reset_index()
        return pa.table({
            "token": pa.array(g["token"].to_numpy(), pa.string()),
            "first_doc": pa.array(g["doc"].to_numpy().astype(np.int64),
                                  pa.int64())})

    agg = docs.map_batches(_first_partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Min("first_doc"))

    def _bucket_block(t: pa.Table) -> pa.Table:
        if t.num_columns != 2 or t.num_rows == 0:
            return pa.table({"bucket_lo": pa.array([], pa.int64()),
                             "new_tokens": pa.array([], pa.int64())})
        fd = t.column(1).to_numpy()
        b, c = np.unique((fd // VOCAB_BUCKET) * VOCAB_BUCKET,
                         return_counts=True)
        return pa.table({
            "bucket_lo": pa.array(b.astype(np.int64), pa.int64()),
            "new_tokens": pa.array(c.astype(np.int64), pa.int64())})

    df = _named(collect_df(agg.map_batches(_bucket_block,
                                           batch_format="pyarrow")),
                ["bucket_lo", "new_tokens"])
    if df.empty:
        return pa.table({"bucket_lo": pa.array([], pa.int64()),
                         "new_tokens": pa.array([], pa.int64())})
    m = df.groupby("bucket_lo", sort=True)["new_tokens"].sum() \
        .reset_index()
    return pa.table({
        "bucket_lo": pa.array(m["bucket_lo"].to_numpy().astype(
            np.int64), pa.int64()),
        "new_tokens": pa.array(m["new_tokens"].to_numpy().astype(
            np.int64), pa.int64())})


def q_label_text_stats(sf_dir: str) -> pa.Table:
    """Cross-modal alignment audit: token-count statistics of the
    TEXT corpus grouped by the EMBEDDING label (documents ⋈
    embeddings on doc_id = vec_id) — the per-class length check run
    before training on paired data.  Both sides slim to two columns
    before ONE distributed hash join; the joined stream folds to
    per-batch (label, n, sum, max) integer partials."""
    docs = _docs(sf_dir)

    def _tok(t: pa.Table) -> pa.Table:
        toks = T._tokens_series(t.column("text"))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(
                toks.str.len().to_numpy().astype(np.int64),
                pa.int64())})

    nparts = shuffle_width(docs.count())
    left = docs.map_batches(_tok, batch_format="pyarrow")
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "label"])
    use_hash_shuffle(left, nparts)
    joined = left.join(emb, join_type="inner", num_partitions=nparts,
                       on=("doc_id",), right_on=("vec_id",))

    def _stats_partial(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "label": t.column("label").to_numpy().astype(np.int64),
            "n_tokens": t.column("n_tokens").to_numpy(),
        }).groupby("label", sort=False)["n_tokens"] \
            .agg(["count", "sum", "max"]).reset_index()
        return pa.table({
            "label": pa.array(g["label"].to_numpy(), pa.int64()),
            "n_docs": pa.array(g["count"].to_numpy().astype(np.int64),
                               pa.int64()),
            "total_tokens": pa.array(g["sum"].to_numpy().astype(
                np.int64), pa.int64()),
            "max_tokens": pa.array(g["max"].to_numpy().astype(
                np.int64), pa.int64())})

    df = _named(collect_df(joined.map_batches(
        _stats_partial, batch_format="pyarrow")),
        ["label", "n_docs", "total_tokens", "max_tokens"])
    if df.empty:
        return pa.table({"label": pa.array([], pa.int64()),
                         "n_docs": pa.array([], pa.int64()),
                         "total_tokens": pa.array([], pa.int64()),
                         "max_tokens": pa.array([], pa.int64())})
    m = df.groupby("label", sort=True).agg(
        n_docs=("n_docs", "sum"), total_tokens=("total_tokens", "sum"),
        max_tokens=("max_tokens", "max")).reset_index()
    for c in m.columns:
        m[c] = m[c].astype(np.int64)
    return pa.Table.from_pandas(m, preserve_index=False)


EXTRA_QUERIES.update({
    "h_q7_shipping": q_q7_shipping,
    "d_vocab_growth": q_vocab_growth,
    "e_label_text_stats": q_label_text_stats,
})
EXTRA_ORACLE_SQL.update({
    "h_q7_shipping": f"""
WITH f AS (
  SELECT l.l_orderkey, l.l_suppkey,
    CASE WHEN l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         THEN 1996 ELSE 1997 END AS l_year,
    CAST(round(l.l_extendedprice * 100) AS BIGINT)
      * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS du
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
  CAST(f.l_year AS BIGINT) AS l_year,
  CAST(sum(CAST(f.du AS HUGEINT)) AS DOUBLE) / 10000.0 AS revenue,
  count(*) AS n_lines
FROM f
JOIN orders o ON f.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON f.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
WHERE (ns.n_name = '{Q7_NATION_A}' AND nc.n_name = '{Q7_NATION_B}')
   OR (ns.n_name = '{Q7_NATION_B}' AND nc.n_name = '{Q7_NATION_A}')
GROUP BY 1, 2, 3""",
    "d_vocab_growth": f"""
WITH lng AS (
  SELECT doc_id,
    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents),
f AS (SELECT token, min(doc_id) AS first_doc FROM lng GROUP BY token)
SELECT (first_doc // {VOCAB_BUCKET}) * {VOCAB_BUCKET} AS bucket_lo,
  count(*) AS new_tokens
FROM f GROUP BY 1""",
    "e_label_text_stats": """
SELECT CAST(e.label AS BIGINT) AS label, count(*) AS n_docs,
  CAST(sum(array_length(
    regexp_split_to_array(trim(lower(d.text)), '\\s+'))) AS BIGINT)
    AS total_tokens,
  max(array_length(regexp_split_to_array(trim(lower(d.text)), '\\s+')))
    AS max_tokens
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY 1""",
})


# ---- hive-partitioned sink roundtrip, completeness audit, kNN confusion ----

HIVE_LANG = "en"


def q_hive_roundtrip(sf_dir: str) -> pa.Table:
    """S-family sink/source pair: write the corpus as hive-partitioned
    Parquet (one directory per lang — the resumable layout every
    100-TB run needs: a failed run skips finished partitions), then
    read back ONLY the '{HIVE_LANG}' partition directory — path-level
    pruning, none of the other partitions' bytes leave storage — and
    fold it to exact integer partials."""
    import shutil
    out_dir = "/tmp/aop_hive_docs"
    shutil.rmtree(out_dir, ignore_errors=True)
    ray.data.read_parquet(f"{sf_dir}/documents.parquet") \
        .write_parquet(out_dir, partition_cols=["lang"])

    def _partial(t: pa.Table) -> pa.Table:
        nc = t.column("n_chars").to_numpy()
        return pa.table({
            "n_docs": pa.array([t.num_rows], pa.int64()),
            "total_chars": pa.array([int(nc.sum())], pa.int64()),
            "min_doc_id": pa.array(
                [int(t.column("doc_id").to_numpy().min())
                 if t.num_rows else 2**62], pa.int64())})

    df = collect_df(
        ray.data.read_parquet(f"{out_dir}/lang={HIVE_LANG}",
                              columns=["doc_id", "n_chars"])
        .map_batches(_partial, batch_format="pyarrow"))
    return pa.table({
        "lang": pa.array([HIVE_LANG], pa.string()),
        "n_docs": pa.array([int(df.iloc[:, 0].sum())], pa.int64()),
        "total_chars": pa.array(
            [sum(int(v) for v in df.iloc[:, 1])], pa.int64()),
        "min_doc_id": pa.array([int(df.iloc[:, 2].min())], pa.int64())})


def q_field_completeness(sf_dir: str) -> pa.Table:
    """Schema-completeness audit — the first scan any ingested corpus
    gets: per-field null/blank counts as exact integer per-batch
    partials (zero exchange, O(fields) driver rows)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text", "lang", "source",
                                        "n_chars"])
    import pyarrow.compute as pc

    def _partial(t: pa.Table) -> pa.Table:
        n = t.num_rows

        def bad_str(col):
            a = t.column(col)
            blank = pc.equal(pc.utf8_trim_whitespace(
                pc.fill_null(a, "")), "")
            return int(pc.sum(pc.cast(blank, pa.int64())).as_py() or 0)

        nc = t.column("n_chars")
        bad_nc = int(pc.sum(pc.cast(pc.or_kleene(
            pc.is_null(nc), pc.less(nc, 1)), pa.int64()))
            .as_py() or 0)
        fields = ["text", "lang", "source", "n_chars"]
        bad = [bad_str("text"), bad_str("lang"), bad_str("source"),
               bad_nc]
        return pa.table({
            "field": pa.array(fields, pa.string()),
            "n_bad": pa.array(bad, pa.int64()),
            "n_total": pa.array([n] * 4, pa.int64())})

    df = _named(collect_df(ds.map_batches(_partial,
                                          batch_format="pyarrow")),
                ["field", "n_bad", "n_total"])
    if df.empty:
        return pa.table({"field": pa.array([], pa.string()),
                         "n_bad": pa.array([], pa.int64()),
                         "n_total": pa.array([], pa.int64())})
    m = df.groupby("field", sort=True, as_index=False).sum()
    for c in ("n_bad", "n_total"):
        m[c] = m[c].astype(np.int64)
    return pa.Table.from_pandas(m, preserve_index=False)


class _KnnConfusionStage(_KnnLabelStage):
    """1-NN prediction + confusion partial in ONE pass: the input
    batch already carries the true label, so the evaluation needs no
    join — per-batch (true, pred, n) integer partials, O(labels²)
    driver merge."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        pred = _KnnLabelStage.__call__(self, batch)
        ids = batch.column("vec_id").to_numpy()
        keep = ids >= 100
        true = batch.column("label").to_numpy().astype(np.int64)[keep]
        g = pd.DataFrame({
            "true_label": true,
            "pred_label": pred.column("pred_label").to_numpy()
            .astype(np.int64),
            "n": 1}).groupby(["true_label", "pred_label"],
                             sort=False).sum().reset_index()
        return pa.table({
            "true_label": pa.array(g["true_label"].to_numpy(),
                                   pa.int64()),
            "pred_label": pa.array(g["pred_label"].to_numpy(),
                                   pa.int64()),
            "n": pa.array(g["n"].to_numpy().astype(np.int64),
                          pa.int64())})


def q_knn_confusion(sf_dir: str) -> pa.Table:
    """Label-quality evaluation: confusion matrix of the 1-NN
    predicted label vs the true label over the held-out vectors —
    rides the same broadcast-train-matrix scan as e_knn_label with
    the true label folded in batch-locally (no join, no second
    pass)."""
    import ray as _ray
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    tr = tbl.filter(pa.compute.less(tbl.column("vec_id"), 100))
    tr = tr.sort_by("vec_id")
    train_ref = _ray.put({"m": S._matrix(tr),
                          "labels": tr.column("label").to_numpy()})
    part = _emb(sf_dir).map_batches(
        _KnnConfusionStage, fn_constructor_args=(train_ref,),
        batch_format="pyarrow", concurrency=(1, 4))
    df = _named(collect_df(part), ["true_label", "pred_label", "n"])
    if df.empty:
        return pa.table({"true_label": pa.array([], pa.int64()),
                         "pred_label": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    m = df.groupby(["true_label", "pred_label"], sort=True)["n"] \
        .sum().reset_index()
    for c in m.columns:
        m[c] = m[c].astype(np.int64)
    return pa.Table.from_pandas(m, preserve_index=False)


def _knn_confusion_sql() -> str:
    pred = EXTRA_ORACLE_SQL["e_knn_label"].strip()
    return f"""
WITH p AS ({pred})
SELECT CAST(e.label AS BIGINT) AS true_label,
  CAST(p.pred_label AS BIGINT) AS pred_label, count(*) AS n
FROM p JOIN embeddings e ON p.vec_id = e.vec_id
GROUP BY 1, 2"""


EXTRA_QUERIES.update({
    "s_hive_roundtrip": q_hive_roundtrip,
    "d_field_completeness": q_field_completeness,
    "e_knn_confusion": q_knn_confusion,
})
EXTRA_ORACLE_SQL.update({
    "s_hive_roundtrip": f"""
SELECT lang, count(*) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS total_chars,
  min(doc_id) AS min_doc_id
FROM documents WHERE lang = '{HIVE_LANG}' GROUP BY lang""",
    "d_field_completeness": """
SELECT field, CAST(n_bad AS BIGINT) AS n_bad, n_total FROM (
  SELECT 'text' AS field,
    sum(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END)
      AS n_bad, count(*) AS n_total FROM documents
  UNION ALL
  SELECT 'lang',
    sum(CASE WHEN lang IS NULL OR trim(lang) = '' THEN 1 ELSE 0 END),
    count(*) FROM documents
  UNION ALL
  SELECT 'source',
    sum(CASE WHEN source IS NULL OR trim(source) = '' THEN 1 ELSE 0
        END), count(*) FROM documents
  UNION ALL
  SELECT 'n_chars',
    sum(CASE WHEN n_chars IS NULL OR n_chars < 1 THEN 1 ELSE 0 END),
    count(*) FROM documents)""",
    "e_knn_confusion": _knn_confusion_sql(),
})


# ---- grouped top-k rows, Q15 top supplier ----------------------------------

TOP3_K = 3


def _top3_kernel(batch: pa.Table, k: int = TOP3_K) -> pa.Table:
    """Per-user top-k rows under (cents desc, ts desc, event_id desc)
    — associative (top-k of per-batch top-ks == global top-k), so it
    serves as both the per-batch partial and the per-partition
    final.  One lexsort + per-group rank, no Python row loop."""
    if batch.num_rows == 0:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "event_id": pa.array([], pa.int64()),
                         "ts": pa.array([], pa.timestamp("us")),
                         "cents": pa.array([], pa.int64()),
                         "rnk": pa.array([], pa.int64())})
    uid = batch.column("user_id").to_numpy()
    ts = batch.column("ts").cast(pa.int64()).to_numpy()
    eid = batch.column("event_id").to_numpy()
    if "cents" in batch.column_names:
        cents = batch.column("cents").to_numpy()
    else:
        cents = np.rint(batch.column("value").to_numpy() * 100) \
            .astype(np.int64)
    order = np.lexsort((-eid, -ts, -cents, uid))
    u_s = uid[order]
    first = np.empty(len(u_s), np.bool_)
    first[0] = True
    first[1:] = u_s[1:] != u_s[:-1]
    idx = np.arange(len(u_s), dtype=np.int64)
    start = np.maximum.accumulate(np.where(first, idx, 0))
    rnk = idx - start + 1
    keep = rnk <= k
    sel = order[keep]
    return pa.table({
        "user_id": pa.array(uid[sel], pa.int64()),
        "event_id": pa.array(eid[sel], pa.int64()),
        "ts": pa.array(ts[sel], pa.int64()).cast(pa.timestamp("us")),
        "cents": pa.array(cents[sel], pa.int64()),
        "rnk": pa.array(rnk[keep], pa.int64())})


def q_top3_events(sf_dir: str) -> pa.Table:
    """Grouped top-K ROWS (each user's 3 highest-value events with
    their rank) — the generalization of g_best_event from argmax to
    row_number() <= K: the same associative kernel runs as per-batch
    partial and, after ONE hash exchange on user, as the block-local
    final; only K rows per user ever cross the wire."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)
    parted = ds.map_batches(_top3_kernel, batch_format="pyarrow") \
        .repartition(num_blocks=nparts, keys=["user_id"])
    out = parted.map_batches(_top3_kernel, batch_format="pyarrow",
                             batch_size=None)
    df = _named(collect_df(out),
                ["user_id", "event_id", "ts", "cents", "rnk"])
    schema = pa.schema([("user_id", pa.int64()),
                        ("event_id", pa.int64()),
                        ("ts", pa.timestamp("us")),
                        ("cents", pa.int64()),
                        ("rnk", pa.int64())])
    if df.empty:
        return schema.empty_table()
    return pa.Table.from_pandas(df, preserve_index=False).cast(schema)


Q15_LO = "1997-01-01 00:00:00"
Q15_HI = "1997-04-01 00:00:00"
_Q15_LO_US = int(pd.Timestamp(Q15_LO).value // 1000)
_Q15_HI_US = int(pd.Timestamp(Q15_HI).value // 1000)


def q_top_supplier(sf_dir: str) -> pa.Table:
    """TPC-H-Q15-style top supplier(s): the supplier(s) achieving the
    MAX quarterly revenue (all of them on ties — exact integers make
    the tie test sound, unlike Q15's float view).  Per-batch
    (suppkey, du) partials → ONE keyed exchange + block reduce →
    per-block (max, candidate rows) → driver final over O(blocks)
    rows — never O(suppliers)."""
    raw = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])
    nparts = shuffle_width(raw.count())

    def _partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").cast(pa.int64()).to_numpy()
        keep = (ship >= _Q15_LO_US) & (ship < _Q15_HI_US)
        g = pd.DataFrame({
            "l_suppkey": batch.column("l_suppkey").to_numpy()[keep],
            "du": _du_partial_cols(batch, keep),
        }).groupby("l_suppkey", sort=False)["du"].sum().reset_index()
        return pa.table({
            "l_suppkey": pa.array(g["l_suppkey"].to_numpy(),
                                  pa.int64()),
            "du": pa.array(g["du"].to_numpy(), pa.int64())})

    def _block_max(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"l_suppkey": pd.Series(dtype=np.int64),
                                 "du": pd.Series(dtype=np.int64)})
        g = df.groupby("l_suppkey", sort=False)["du"].sum() \
            .reset_index()
        return g[g["du"] == g["du"].max()]

    use_hash_shuffle(raw, nparts)
    blocks = _named(collect_df(
        raw.map_batches(_partial, batch_format="pyarrow")
        .repartition(num_blocks=nparts, keys=["l_suppkey"])
        .map_batches(_block_max, batch_format="pandas")),
        ["l_suppkey", "du"])
    empty = pa.table({"s_suppkey": pa.array([], pa.int64()),
                      "total_revenue": pa.array([], pa.float64())})
    if blocks.empty:
        return empty
    # suppkeys are partition-disjoint: per-block maxima are exact sums
    best = max(int(v) for v in blocks["du"])
    win = blocks[blocks["du"] == best].sort_values("l_suppkey")
    return pa.table({
        "s_suppkey": pa.array(win["l_suppkey"].to_numpy().astype(
            np.int64), pa.int64()),
        "total_revenue": pa.array(
            [float(int(v)) / 10000.0 for v in win["du"]],
            pa.float64())})


EXTRA_QUERIES.update({
    "g_top3_events": q_top3_events,
    "h_top_supplier": q_top_supplier,
})
EXTRA_ORACLE_SQL.update({
    "g_top3_events": f"""
SELECT user_id, event_id, ts, cents, rnk FROM (
  SELECT user_id, event_id, ts,
    CAST(round(value * 100) AS BIGINT) AS cents,
    CAST(row_number() OVER (
      PARTITION BY user_id
      ORDER BY CAST(round(value * 100) AS BIGINT) DESC, ts DESC,
               event_id DESC) AS BIGINT) AS rnk
  FROM events)
WHERE rnk <= {TOP3_K}""",
    "h_top_supplier": f"""
WITH r AS (
  SELECT l_suppkey AS s_suppkey,
    sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))
             AS HUGEINT)) AS du
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_LO}'
    AND l_shipdate < TIMESTAMP '{Q15_HI}'
  GROUP BY 1)
SELECT s_suppkey, CAST(du AS DOUBLE) / 10000.0 AS total_revenue
FROM r WHERE du = (SELECT max(du) FROM r)""",
})


# ---- cohort matrix, cross-source dup families, kNN label purity -----------

_WEEK_US = 604_800_000_000


def q_cohort_matrix(sf_dir: str) -> pa.Table:
    """Full cohort-retention triangle: distinct users per
    (cohort week = user's first week, active week) cell — the
    product-analytics matrix g_retention's week+1 scalar summarizes.
    Per-batch (user, week) dedupe partials → ONE hash exchange on
    user (each user's full week set lands in one block, so cohort
    assignment and the cell counts need no second exchange) → tiny
    driver merge over O(weeks² × blocks) rows."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)

    def _uw_partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy()
        wk = t.column("ts").cast(pa.int64()).to_numpy() // _WEEK_US
        pairs = np.unique(np.stack([uid, wk], axis=1), axis=0)
        return pa.table({
            "user_id": pa.array(pairs[:, 0], pa.int64()),
            "wk": pa.array(pairs[:, 1], pa.int64())})

    def _cells_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"cohort_week": pa.array([], pa.int64()),
                             "active_week": pa.array([], pa.int64()),
                             "n_users": pa.array([], pa.int64())})
        pairs = np.unique(np.stack(
            [t.column("user_id").to_numpy(),
             t.column("wk").to_numpy()], axis=1), axis=0)
        uid, wk = pairs[:, 0], pairs[:, 1]
        ul, inv = np.unique(uid, return_inverse=True)
        cw = np.full(len(ul), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(cw, inv, wk)
        cells = np.stack([cw[inv], wk], axis=1)
        uc, cnt = np.unique(cells, axis=0, return_counts=True)
        return pa.table({
            "cohort_week": pa.array(uc[:, 0], pa.int64()),
            "active_week": pa.array(uc[:, 1], pa.int64()),
            "n_users": pa.array(cnt.astype(np.int64), pa.int64())})

    parted = ds.map_batches(_uw_partial, batch_format="pyarrow") \
        .repartition(num_blocks=nparts, keys=["user_id"])
    df = _named(collect_df(parted.map_batches(
        _cells_block, batch_format="pyarrow", batch_size=None)),
        ["cohort_week", "active_week", "n_users"])
    if df.empty:
        return pa.table({"cohort_week": pa.array([], pa.int64()),
                         "active_week": pa.array([], pa.int64()),
                         "n_users": pa.array([], pa.int64())})
    m = df.groupby(["cohort_week", "active_week"], sort=True)[
        "n_users"].sum().reset_index()
    for c in m.columns:
        m[c] = m[c].astype(np.int64)
    return pa.Table.from_pandas(m, preserve_index=False)


def q_dup_sources(sf_dir: str) -> pa.Table:
    """Cross-source duplicate families (mirror detection): for every
    prefix-duplicate family (same first-{PREFIX_DUP_LEN} normalized
    chars — the d_prefix_dup key), how many docs and how many
    DISTINCT sources — families spanning sources are crawl mirrors,
    within one source re-posts.  Per-batch (prefix, source) partials
    (min doc, rows) → ONE exchange on the prefix → block rollup;
    only duplicated families reach the driver, keyed by their
    representative doc — the text itself never leaves the exchange."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"])
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(ds, nparts)

    def _partial(t: pa.Table) -> pa.Table:
        norm = pa.compute.utf8_slice_codeunits(
            T.normalize_expr(t.column("text")), 0, PREFIX_DUP_LEN)
        g = pd.DataFrame({
            "text_norm": norm.to_pandas(),
            "source": t.column("source").to_pandas(),
            "doc_id": t.column("doc_id").to_numpy(),
        }).groupby(["text_norm", "source"], sort=False).agg(
            doc_id=("doc_id", "min"), n=("doc_id", "size")) \
            .reset_index()
        return pa.table({
            "text_norm": pa.array(g["text_norm"], pa.string()),
            "source": pa.array(g["source"], pa.string()),
            "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
            "n": pa.array(g["n"].to_numpy().astype(np.int64),
                          pa.int64())})

    def _family_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "rep_doc_id": pd.Series(dtype=np.int64),
                "n_docs": pd.Series(dtype=np.int64),
                "n_sources": pd.Series(dtype=np.int64)})
        g = df.groupby("text_norm", sort=False).agg(
            rep_doc_id=("doc_id", "min"), n_docs=("n", "sum"),
            n_sources=("source", "nunique")).reset_index()
        g = g[g["n_docs"] >= 2]
        return g[["rep_doc_id", "n_docs", "n_sources"]].astype(np.int64)

    parted = ds.map_batches(_partial, batch_format="pyarrow") \
        .repartition(num_blocks=nparts, keys=["text_norm"])
    df = _named(collect_df(parted.map_batches(
        _family_block, batch_format="pandas", batch_size=None)),
        ["rep_doc_id", "n_docs", "n_sources"])
    if df.empty:
        return pa.table({"rep_doc_id": pa.array([], pa.int64()),
                         "n_docs": pa.array([], pa.int64()),
                         "n_sources": pa.array([], pa.int64())})
    return pa.Table.from_pandas(df.astype(np.int64).sort_values(
        "rep_doc_id").reset_index(drop=True), preserve_index=False)


def q_knn_purity(sf_dir: str) -> pa.Table:
    """Label purity of the kNN graph per class: of each label's
    outgoing top-5 edges, how many land on a same-label neighbor —
    the embedding-quality score a semantic-dedup / classifier
    deployment checks first.  Rides the exact kNN build (LSH/IVF
    swap in at scale) plus one broadcast label gather; the single
    division per label is deterministic."""
    edges = q_knn_graph(sf_dir).to_pandas()
    lt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "label"])
    vid = lt.column("vec_id").to_numpy()
    lab = lt.column("label").to_numpy().astype(np.int64)
    lut = np.full(int(vid.max()) + 1 if len(vid) else 1, -1, np.int64)
    lut[vid] = lab
    ql = lut[edges["query_id"].to_numpy()]
    nl = lut[edges["neighbor_id"].to_numpy()]
    g = pd.DataFrame({"label": ql, "same": (ql == nl).astype(np.int64),
                      "n": 1}).groupby("label", sort=True).agg(
        n_edges=("n", "sum"), n_same=("same", "sum")).reset_index()
    return pa.table({
        "label": pa.array(g["label"].to_numpy(), pa.int64()),
        "n_edges": pa.array(g["n_edges"].to_numpy().astype(np.int64),
                            pa.int64()),
        "n_same": pa.array(g["n_same"].to_numpy().astype(np.int64),
                           pa.int64()),
        "purity": pa.array(
            g["n_same"].to_numpy().astype(np.float64)
            / g["n_edges"].to_numpy().astype(np.float64),
            pa.float64())})


def _knn_purity_sql() -> str:
    graph = EXTRA_ORACLE_SQL["e_knn_graph"].strip()
    return f"""
WITH g AS ({graph})
SELECT CAST(ea.label AS BIGINT) AS label, count(*) AS n_edges,
  CAST(sum(CASE WHEN ea.label = eb.label THEN 1 ELSE 0 END) AS BIGINT)
    AS n_same,
  CAST(sum(CASE WHEN ea.label = eb.label THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) AS purity
FROM g
JOIN embeddings ea ON g.query_id = ea.vec_id
JOIN embeddings eb ON g.neighbor_id = eb.vec_id
GROUP BY 1"""


EXTRA_QUERIES.update({
    "g_cohort_matrix": q_cohort_matrix,
    "d_dup_sources": q_dup_sources,
    "e_knn_purity": q_knn_purity,
})
EXTRA_ORACLE_SQL.update({
    "g_cohort_matrix": """
WITH uw AS (
  SELECT DISTINCT user_id,
    CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS wk
  FROM events),
c AS (SELECT user_id, min(wk) AS cw FROM uw GROUP BY 1)
SELECT c.cw AS cohort_week, uw.wk AS active_week, count(*) AS n_users
FROM uw JOIN c ON uw.user_id = c.user_id
GROUP BY 1, 2""",
    "d_dup_sources": f"""
WITH n AS (
  SELECT doc_id, source,
    substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
           1, {PREFIX_DUP_LEN}) AS tn
  FROM documents)
SELECT min(doc_id) AS rep_doc_id, count(*) AS n_docs,
  count(DISTINCT source) AS n_sources
FROM n GROUP BY tn HAVING count(*) >= 2""",
    "e_knn_purity": _knn_purity_sql(),
})


# ---- key-skew profile, out-of-order audit, model-score filter --------------


def q_key_skew(sf_dir: str) -> pa.Table:
    """Key-skew profiler per event_type over the user_id key — the
    diagnostic that decides salting/bucketing before any keyed
    exchange (north-rule: skew handled explicitly).  Exact integer
    sufficient statistics (distinct keys, events, max per-key count,
    Σcount² — the inverse-Simpson numerator) via per-batch pair
    partials → ONE hash exchange by user_id → bounded per-type block
    partials → tiny driver merge; the only floats are the two final
    divisions (top-key share, effective key count)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    part = ds.map_batches(E.skew_pair_partial, batch_format="pyarrow")
    nparts = shuffle_width(ds.count())
    use_hash_shuffle(part, nparts)
    parted = part.repartition(num_blocks=nparts, keys=["user_id"])
    blk = parted.map_batches(E.skew_block_stats, batch_format="pyarrow",
                             batch_size=None)
    df = _named(collect_df(blk), ["event_type", "n_keys", "n_events",
                                  "max_count", "sum_sq"])
    if df.empty:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "n_keys": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "max_count": pa.array([], pa.int64()),
            "sum_sq": pa.array([], pa.int64()),
            "top_share": pa.array([], pa.float64()),
            "eff_keys": pa.array([], pa.float64())})
    out = df.groupby("event_type", sort=True).agg(
        n_keys=("n_keys", "sum"), n_events=("n_events", "sum"),
        max_count=("max_count", "max"),
        sum_sq=("sum_sq", "sum")).reset_index()
    ne = out["n_events"].to_numpy(np.int64).astype(np.float64)
    out["top_share"] = out["max_count"].to_numpy(np.int64) / ne
    out["eff_keys"] = ne * ne / out["sum_sq"].to_numpy(np.int64)
    for c in ("n_keys", "n_events", "max_count", "sum_sq"):
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def q_ooo_ratio(sf_dir: str, width: int | None = None) -> pa.Table:
    """Out-of-order (watermark) audit per event_type: how many events
    arrive (in event_id ingest order) with a timestamp behind the
    running max of everything already ingested, and the worst lateness
    — the statistic that sizes a streaming window's allowed-lateness.
    The running max is inherently sequential, so it is distributed as
    a prefix computation (the pack-offsets pattern): (1) per-batch
    (type, event_id-range bucket) max-ts partials → bounded driver
    prefix table; (2) ONE hash exchange by bucket → exact block-local
    seeded cummax.  Result is bucket-width-invariant (test-pinned)."""
    import ray as _ray
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "event_type", "ts"])
    n_rows = int(ds.count())
    if width is None:
        # keep the driver prefix table bounded (~types × ≤64k buckets)
        width = max(E.OOO_BUCKET_IDS, -(-n_rows // 65_536))
    part = ds.map_batches(lambda b: E.ooo_bucket_partial(b, width),
                          batch_format="pyarrow")
    pdf = _named(collect_df(part), ["event_type", "bucket", "max_ts"])
    prefix: dict[tuple[str, int], int] = {}
    if not pdf.empty:
        pdf = pdf.groupby(["event_type", "bucket"], sort=True) \
            .agg(max_ts=("max_ts", "max")).reset_index()
        for et, grp in pdf.groupby("event_type", sort=False):
            b = grp["bucket"].to_numpy(np.int64)
            m = np.maximum.accumulate(grp["max_ts"].to_numpy(np.int64))
            # prefix[b_k] = max over buckets strictly BEFORE b_k
            for i in range(1, len(b)):
                prefix[(et, int(b[i]))] = int(m[i - 1])
    ref = _ray.put(prefix)

    def _bucketed(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").cast(pa.int64()).to_numpy()
        return t.append_column(
            "bucket", pa.array(eid // np.int64(width), pa.int64()))

    nparts = shuffle_width(n_rows)
    keyed = ds.map_batches(_bucketed, batch_format="pyarrow")
    use_hash_shuffle(keyed, nparts)
    parted = keyed.repartition(num_blocks=nparts, keys=["bucket"])
    blk = parted.map_batches(
        lambda b: E.ooo_block_audit(b, width, _ray.get(ref)),
        batch_format="pyarrow", batch_size=None)
    df = _named(collect_df(blk), ["event_type", "n_events", "n_late",
                                  "max_late_us"])
    if df.empty:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
            "n_late": pa.array([], pa.int64()),
            "max_late_us": pa.array([], pa.int64()),
            "late_share": pa.array([], pa.float64())})
    out = df.groupby("event_type", sort=True).agg(
        n_events=("n_events", "sum"), n_late=("n_late", "sum"),
        max_late_us=("max_late_us", "max")).reset_index()
    out["late_share"] = (out["n_late"].to_numpy(np.int64)
                         / out["n_events"].to_numpy(np.int64)
                         .astype(np.float64))
    for c in ("n_events", "n_late", "max_late_us"):
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def q_model_filter(sf_dir: str) -> pa.Table:
    """Model-based curation filter over the corpus: a seeded linear
    scorer (token-hash-derived weights — the deterministic stand-in
    for a fastText-style quality classifier) run as an actor-pool
    batched-inference stage; zero shuffle, exact integer scores."""
    docs = _docs(sf_dir)
    out = docs.map_batches(T.ModelScoreStage, batch_format="pyarrow",
                           concurrency=(1, 8))
    df = _named(collect_df(out), ["doc_id", "n_tokens", "score", "kept"])
    if df.empty:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "score": pa.array([], pa.int64()),
                         "kept": pa.array([], pa.bool_())})
    df = df.sort_values("doc_id", ignore_index=True)
    df["kept"] = df["kept"].astype(bool)
    return pa.Table.from_pandas(df, preserve_index=False)


def _model_filter_sql() -> str:
    from asserts_otel_processor_ray.stages.text_analysis import (
        MODEL_A1, MODEL_A2, MODEL_B1, MODEL_W_SPAN)
    half = (MODEL_W_SPAN - 1) // 2
    return f"""
WITH toks AS (
  SELECT doc_id,
    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS x
  FROM documents),
h0 AS (SELECT doc_id, {_TOKHASH_SQL} AS th FROM toks),
h1 AS (SELECT doc_id,
         CAST((CAST(th AS HUGEINT) * {MODEL_A1} + {MODEL_B1})
              % 2305843009213693951 AS BIGINT) AS h FROM h0),
h2 AS (SELECT doc_id, xor(h, h >> 31) AS h FROM h1),
h3 AS (SELECT doc_id,
         CAST((CAST(h AS HUGEINT) * {MODEL_A2})
              % 2305843009213693951 AS BIGINT) AS h FROM h2),
h AS (SELECT doc_id, xor(h, h >> 29) AS h FROM h3),
s AS (
  SELECT doc_id, count(*) AS n_tokens,
    CAST(sum(h % {MODEL_W_SPAN} - {half}) AS BIGINT) AS score
  FROM h GROUP BY doc_id)
SELECT doc_id, n_tokens, score, score >= 0 AS kept FROM s"""


EXTRA_QUERIES.update({
    "g_key_skew": q_key_skew,
    "g_ooo_ratio": q_ooo_ratio,
    "d_model_filter": q_model_filter,
})
EXTRA_ORACLE_SQL.update({
    "g_key_skew": """
WITH c AS (
  SELECT event_type, user_id, count(*) AS c
  FROM events GROUP BY 1, 2)
SELECT event_type, count(*) AS n_keys,
  CAST(sum(c) AS BIGINT) AS n_events,
  CAST(max(c) AS BIGINT) AS max_count,
  CAST(sum(c * c) AS BIGINT) AS sum_sq,
  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_share,
  CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)
    / CAST(sum(c * c) AS DOUBLE) AS eff_keys
FROM c GROUP BY 1""",
    "g_ooo_ratio": """
WITH w AS (
  SELECT event_type, epoch_us(ts) AS ts,
    max(epoch_us(ts)) OVER (
      PARTITION BY event_type ORDER BY event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
  FROM events)
SELECT event_type, count(*) AS n_events,
  CAST(sum(CASE WHEN ts < prevmax THEN 1 ELSE 0 END) AS BIGINT)
    AS n_late,
  CAST(COALESCE(max(CASE WHEN ts < prevmax THEN prevmax - ts END), 0)
       AS BIGINT) AS max_late_us,
  CAST(sum(CASE WHEN ts < prevmax THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) AS late_share
FROM w GROUP BY 1""",
    "d_model_filter": _model_filter_sql(),
})


# ---- Q12-style priority line counts, median absolute deviation -------------

_Q12_LO_US = int(pd.Timestamp("1996-01-01").value // 1000)
_Q12_HI_US = int(pd.Timestamp("1997-01-01").value // 1000)
_Q12_HIGH = ("1-URGENT", "2-HIGH")


def q_q12_priority(sf_dir: str) -> pa.Table:
    """TPC-H-Q12-style shipping-priority audit (l_linestatus stands in
    for the ship mode this schema lacks): lines shipped in 1996, split
    into high- vs low-priority counts by the order's priority.  Scale
    shape: lineitem is filtered + pre-reduced per batch to
    (l_orderkey, l_linestatus, n) BEFORE the one big-big exchange (a
    native hash join against the 2-column orders projection); the
    conditional rollup is a per-batch integer partial after the join,
    merged on the driver at O(|statuses|) rows."""
    nparts = default_shuffle_blocks()
    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linestatus", "l_shipdate"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"])
    use_hash_shuffle(line, nparts)

    def _pre(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").cast(pa.int64()).to_numpy()
        keep = (ship >= _Q12_LO_US) & (ship < _Q12_HI_US)
        f = t.filter(pa.array(keep)).select(
            ["l_orderkey", "l_linestatus"])
        gb = f.group_by(["l_orderkey", "l_linestatus"]).aggregate(
            [([], "count_all")])
        return gb.rename_columns(["l_orderkey", "l_linestatus", "n"])

    pre = line.map_batches(_pre, batch_format="pyarrow")
    joined = pre.join(orders, join_type="inner", num_partitions=nparts,
                      on=("l_orderkey",), right_on=("o_orderkey",))

    def _rollup(t: pa.Table) -> pa.Table:
        pri = t.column("o_orderpriority").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy().astype(np.int64)
        hi = np.isin(pri, _Q12_HIGH)
        df = pd.DataFrame({
            "l_linestatus": t.column("l_linestatus").to_numpy(
                zero_copy_only=False),
            "high_line_count": np.where(hi, n, 0),
            "low_line_count": np.where(hi, 0, n),
        }).groupby("l_linestatus", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    df = collect_df(joined.map_batches(_rollup, batch_format="pyarrow"))
    if df.empty:
        return pa.table({
            "l_linestatus": pa.array([], pa.string()),
            "high_line_count": pa.array([], pa.int64()),
            "low_line_count": pa.array([], pa.int64())})
    out = df.groupby("l_linestatus", sort=True, as_index=False).sum()
    for c in ("high_line_count", "low_line_count"):
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def _median_from_counts(df: pd.DataFrame, vcol: str) -> float:
    """Discrete median from a (value, n) histogram — 1-based rank
    ceil(n/2) under the g_quantiles convention ((50·n+99)//100)."""
    d = df.sort_values(vcol)
    cum = np.cumsum(d["n"].to_numpy().astype(np.int64))
    n = int(cum[-1])
    rank = (50 * n + 99) // 100
    return float(d[vcol].to_numpy()[np.searchsorted(cum, rank, "left")])


def q_mad(sf_dir: str) -> pa.Table:
    """Robust dispersion per event_type: exact median and median
    absolute deviation.  Two value-count-histogram passes (the
    g_quantiles reduction, composed): (1) per-type median from a
    distributed (type, value) count groupby; (2) the medians broadcast
    into a second streaming pass computing |value − median| counts →
    per-type MAD.  No global sort; the only floats are the subtraction
    and abs, identical IEEE ops in the SQL mirror."""
    import ray as _ray
    from ray.data.aggregate import Sum

    def _counts(ds):
        part = ds.map_batches(E.value_count_partial,
                              batch_format="pyarrow")
        agg = part.groupby(["event_type", "value"]).aggregate(
            Sum("partial_n"))
        return agg.map_batches(
            lambda t: (t.rename_columns(["event_type", "value", "n"])
                       if t.num_columns == 3 else t),
            batch_format="pyarrow")

    ev = _events(sf_dir)
    c1 = collect_df(_counts(ev))
    if c1.empty:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n_events": pa.array([], pa.int64()),
                         "med": pa.array([], pa.float64()),
                         "mad": pa.array([], pa.float64())})
    meds = {et: _median_from_counts(g, "value")
            for et, g in c1.groupby("event_type", sort=False)}
    ref = _ray.put(meds)

    def _adev(t: pa.Table) -> pa.Table:
        m = _ray.get(ref)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy()
        med = np.array([m[x] for x in pd.unique(et)])
        codes = pd.Categorical(et, categories=pd.unique(et)).codes
        return pa.table({
            "event_type": t.column("event_type"),
            "value": pa.array(np.abs(v - med[codes]), pa.float64())})

    c2 = collect_df(_counts(ev.map_batches(_adev,
                                           batch_format="pyarrow")))
    rows = []
    for et, g in c2.groupby("event_type", sort=True):
        rows.append((et, int(g["n"].sum()), meds[et],
                     _median_from_counts(g, "value")))
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "n_events": pa.array([r[1] for r in rows], pa.int64()),
        "med": pa.array([r[2] for r in rows], pa.float64()),
        "mad": pa.array([r[3] for r in rows], pa.float64())})


EXTRA_QUERIES.update({
    "h_q12_priority": q_q12_priority,
    "g_mad": q_mad,
})
EXTRA_ORACLE_SQL.update({
    "h_q12_priority": f"""
SELECT l_linestatus,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE epoch_us(l_shipdate) >= {_Q12_LO_US}
  AND epoch_us(l_shipdate) < {_Q12_HI_US}
GROUP BY 1""",
    "g_mad": """
WITH r AS (
  SELECT event_type, value,
    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM events),
med AS (
  SELECT event_type,
    max(CASE WHEN rn = (50 * n + 99) // 100 THEN value END) AS med
  FROM r GROUP BY 1),
a AS (
  SELECT e.event_type, abs(e.value - m.med) AS av
  FROM events e JOIN med m USING (event_type)),
r2 AS (
  SELECT event_type, av,
    row_number() OVER (PARTITION BY event_type ORDER BY av) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM a)
SELECT r2.event_type, CAST(max(r2.n) AS BIGINT) AS n_events,
  max(m.med) AS med,
  max(CASE WHEN rn = (50 * n + 99) // 100 THEN av END) AS mad
FROM r2 JOIN med m USING (event_type) GROUP BY 1""",
})


MAD_OUT_K = 3.0


def q_mad_outliers(sf_dir: str, k: float = MAD_OUT_K) -> pa.Table:
    """Robust outlier detection per event_type: events whose value
    sits more than k MADs from the type's median (the robust sibling
    of g_spikes' z-scores — immune to the outliers it hunts).  Rides
    q_mad's two value-count passes for the (median, MAD) table (tiny,
    broadcast), then ONE stateless streaming pass with per-batch
    integer partials; the comparison |v − med| > k·MAD is the same
    IEEE float ops in the SQL mirror."""
    import ray as _ray
    stats = q_mad(sf_dir).to_pandas()
    if stats.empty:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n_events": pa.array([], pa.int64()),
                         "n_outliers": pa.array([], pa.int64()),
                         "out_share": pa.array([], pa.float64())})
    sm = {r.event_type: (r.med, r.mad) for r in stats.itertuples()}
    ref = _ray.put(sm)

    def _flag(t: pa.Table) -> pa.Table:
        m = _ray.get(ref)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy()
        uniq = pd.unique(et)
        med = np.array([m[x][0] for x in uniq])
        mad = np.array([m[x][1] for x in uniq])
        codes = pd.Categorical(et, categories=uniq).codes
        out = np.abs(v - med[codes]) > k * mad[codes]
        df = pd.DataFrame({"event_type": et, "out": out}) \
            .groupby("event_type", sort=False).agg(
                n_events=("out", "size"),
                n_outliers=("out", "sum")).reset_index()
        return pa.Table.from_pandas(df, preserve_index=False)

    part = _events(sf_dir).map_batches(_flag, batch_format="pyarrow")
    df = collect_df(part)
    out = df.groupby("event_type", sort=True, as_index=False).sum()
    for c in ("n_events", "n_outliers"):
        out[c] = out[c].astype(np.int64)
    out["out_share"] = (out["n_outliers"].to_numpy(np.int64)
                        / out["n_events"].to_numpy(np.int64)
                        .astype(np.float64))
    return pa.Table.from_pandas(out, preserve_index=False)


EXTRA_QUERIES.update({"g_mad_outliers": q_mad_outliers})
EXTRA_ORACLE_SQL.update({"g_mad_outliers": f"""
WITH r AS (
  SELECT event_type, value,
    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM events),
med AS (
  SELECT event_type,
    max(CASE WHEN rn = (50 * n + 99) // 100 THEN value END) AS med
  FROM r GROUP BY 1),
a AS (
  SELECT e.event_type, abs(e.value - m.med) AS av
  FROM events e JOIN med m USING (event_type)),
r2 AS (
  SELECT event_type, av,
    row_number() OVER (PARTITION BY event_type ORDER BY av) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM a),
mad AS (
  SELECT event_type,
    max(CASE WHEN rn = (50 * n + 99) // 100 THEN av END) AS mad
  FROM r2 GROUP BY 1)
SELECT e.event_type, count(*) AS n_events,
  CAST(sum(CASE WHEN abs(e.value - m.med) > {MAD_OUT_K} * d.mad
           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
  CAST(sum(CASE WHEN abs(e.value - m.med) > {MAD_OUT_K} * d.mad
           THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
    AS out_share
FROM events e JOIN med m USING (event_type)
JOIN mad d USING (event_type)
GROUP BY 1"""})
