"""Training-data operators: unit semantics + DuckDB-oracle parity at
sf0.001 (the driver runs the same comparisons at sf0.01)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


# ---- unit semantics ------------------------------------------------------

def test_minhash_similar_docs_share_signatures():
    from asserts_otel_processor_ray.stages.dedup import (
        minhash_signatures_batch)
    base = "the quick brown fox jumps over the lazy dog " * 5
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": [base, base + "extra tail", "completely different words "
                 "about database engines and query planners " * 3],
    })
    sigs = minhash_signatures_batch(t).to_pandas()
    cols = [c for c in sigs.columns if c.startswith("mh")]
    agree01 = (sigs.loc[0, cols] == sigs.loc[1, cols]).mean()
    agree02 = (sigs.loc[0, cols] == sigs.loc[2, cols]).mean()
    assert agree01 > 0.5            # near-dups share most minhashes
    assert agree02 < 0.2            # unrelated docs share few


def test_simhash_hamming_tracks_similarity():
    from asserts_otel_processor_ray.stages.dedup import simhash_batch
    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": [base, base + " iota", "one two three four five six "
                 "seven eight nine ten " * 3],
    })
    s = simhash_batch(t).to_pandas()
    v = [int(x, 16) for x in s["simhash"]]
    ham01 = bin(v[0] ^ v[1]).count("1")
    ham02 = bin(v[0] ^ v[2]).count("1")
    assert ham01 < ham02
    assert ham01 <= 8


def test_lsh_candidates_superset_of_near_pairs():
    from asserts_otel_processor_ray.stages.dedup import (
        candidate_pairs, lsh_band_keys, minhash_signatures_batch)
    base = "red orange yellow green blue indigo violet " * 6
    texts = [base, base + " tail", "unrelated thing entirely " * 8]
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": texts})
    sigs = minhash_signatures_batch(t).to_pandas()
    cand = candidate_pairs(lsh_band_keys(sigs))
    pairs = set(zip(cand["doc_a"], cand["doc_b"]))
    assert (0, 1) in pairs


def test_bruteforce_ann_exact():
    from asserts_otel_processor_ray.stages.similarity import (
        _normalize)
    rng = np.random.default_rng(3)
    m = rng.standard_normal((50, 8))
    q = m[:2] + rng.standard_normal((2, 8)) * 0.01
    sims = _normalize(q) @ _normalize(m).T
    assert sims[0].argmax() == 0 and sims[1].argmax() == 1


def test_sessionize_gap_semantics():
    from asserts_otel_processor_ray.stages.events import sessionize_batch
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([0, 1_000_000 * 100, 1_000_000 * 5000,
                        1_000_000 * 10], pa.timestamp("us")),
        "event_type": ["a"] * 4,
        "value": [0.0] * 4,
        "props": [""] * 4,
    })
    out = sessionize_batch(t, gap_s=1800.0).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("session_id")
    assert u1["n_events"].tolist() == [2, 1]   # 5000s gap breaks
    assert out[out["user_id"] == 2]["session_id"].tolist() == [0]


def test_media_stub_deterministic():
    from asserts_otel_processor_ray.stages.multimodal import (
        MediaFeatureStage, documents_as_media)
    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": ["hello world"]})
    stage = MediaFeatureStage()
    out1 = stage(documents_as_media(t))
    out2 = stage(documents_as_media(t))
    assert out1.equals(out2)
    assert out1.column("n_bytes")[0].as_py() == len(b"hello world")
    feat = out1.column("feature")[0].as_py()
    assert len(feat) == 8 and all(0 <= f <= 1 for f in feat)


def test_char_ngram_hashes_match_bruteforce():
    """char_ngram_hashes == per-gram polynomial over codepoints (the
    definition the SQL oracle implements)."""
    from asserts_otel_processor_ray.stages.text_analysis import (
        _BASE, _MOD, char_ngram_hashes)
    texts = ["  Hello World  ", "abc", "", "a", "naïve café naïve"]
    t = pa.table({"text": pa.array(texts, pa.string())})
    hashes, docs = char_ngram_hashes(t.column("text"), w=5)
    got = {}
    for h, d in zip(hashes.tolist(), docs.tolist()):
        got.setdefault(d, []).append(h)

    def poly(s):
        acc = 0
        for ch in s:
            acc = (acc * _BASE + ord(ch)) % _MOD
        return acc

    for d, raw in enumerate(texts):
        s = raw.strip().lower()
        if not s:
            assert d not in got
            continue
        if len(s) < 5:
            expect = [poly(s)]
        else:
            expect = [poly(s[i:i + 5]) for i in range(len(s) - 4)]
        assert sorted(got[d]) == sorted(expect), d


def test_ngram_pairs_block_counts_cooccurrence():
    from asserts_otel_processor_ray.stages.dedup import (
        ngram_long_batch, ngram_pairs_block)
    t = pa.table({
        "doc_id": pa.array([7, 8, 9], pa.int64()),
        "text": ["shared prefix words here", "shared prefix words there",
                 "zqxj wvkp mlnb"],
    })
    df = ngram_long_batch(t).to_pandas()
    p = ngram_pairs_block(df, max_df=128)
    pairs = set(zip(p["doc_a"], p["doc_b"]))
    assert (7, 8) in pairs
    row = p[(p["doc_a"] == 7) & (p["doc_b"] == 8)].iloc[0]
    # intersection bounded by min set size; union sizes ride along
    assert 0 < row["inter"] <= min(row["sa"], row["sb"])


def test_dedup_clusters_transitive(ray_session):
    """a~b and b~c (but a≁c directly) must land in ONE cluster with
    the min doc as representative — the union-find is transitive, not
    pairwise."""
    import ray.data as rd
    from asserts_otel_processor_ray.stages.dedup import (
        minhash_pairs_distributed)
    base = "the quick brown fox jumps over the lazy dog again and again "
    t = pa.table({
        "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
        "text": [base * 3,
                 base * 3 + "one small tail here",
                 base * 3 + "one small tail here and a second tail too",
                 "entirely unrelated words about query planners " * 4],
    })
    pairs = minhash_pairs_distributed(rd.from_arrow(t), threshold=0.4)
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (10, 11) in got and (11, 12) in got
    # replicate q_dedup_clusters' union-find on these pairs
    parent = {}
    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        return r
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(set(pairs["doc_a"]) | set(pairs["doc_b"]))
    clusters = {n: find(int(n)) for n in nodes}
    assert clusters[11] == 10 and clusters[12] == 10
    assert 13 not in clusters


def test_sample_hash_rate_and_determinism():
    from asserts_otel_processor_ray.stages.events import sample_hash_batch
    t = pa.table({"event_id": pa.array(range(100_000), pa.int64())})
    s1 = sample_hash_batch(t)
    s2 = sample_hash_batch(t)
    assert s1.equals(s2)
    rate = s1.num_rows / t.num_rows
    assert 0.10 < rate < 0.15          # ≈ 1/8


def test_frame_sample_explode_shape():
    """One media row explodes to min(8, n_frames) evenly-spaced frames;
    short payloads still yield one frame."""
    from asserts_otel_processor_ray.stages.multimodal import (
        FrameSampleStage, documents_as_media)
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["x" * 1000, "tiny"],       # 15 frames vs 1 frame
    })
    out = FrameSampleStage()(documents_as_media(t)).to_pandas()
    g1 = out[out["media_id"] == 1]
    g2 = out[out["media_id"] == 2]
    assert len(g1) == 8 and g1["n_frames"].iloc[0] == 15
    assert list(g1["frame_idx"]) == [j * 15 // 8 for j in range(8)]
    assert len(g2) == 1 and g2["frame_idx"].iloc[0] == 0
    assert list(g1["frame_rank"]) == list(range(1, 9))


def test_resize_aspect_math():
    """Fit-into-box preserves aspect via integer math; small images
    pass through."""
    from asserts_otel_processor_ray.stages.multimodal import (
        ResizeStage, documents_as_media)
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["x" * 500, "x" * 100],
    })
    out = ResizeStage()(documents_as_media(t)).to_pandas()
    r = out.set_index("media_id")
    for mid in (1, 2):
        w, h = int(r.loc[mid, "in_w"]), int(r.loc[mid, "in_h"])
        m = max(w, h)
        if m > 256:
            assert r.loc[mid, "out_w"] == max(1, w * 256 // m)
            assert r.loc[mid, "out_h"] == max(1, h * 256 // m)
            assert max(r.loc[mid, "out_w"], r.loc[mid, "out_h"]) == 256
        else:
            assert (r.loc[mid, "out_w"], r.loc[mid, "out_h"]) == (w, h)


def test_bpe_token_count_semantics():
    from asserts_otel_processor_ray.stages.text_analysis import (
        bpe_token_count_batch)
    t = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": ["Hello world, 42 cats!"],
    })
    out = bpe_token_count_batch(t).to_pandas()
    # "Hello", " world", ",", " 42", " cats", "!" → 6 BPE-ish tokens
    assert out["n_bpe_tokens"].iloc[0] == 6
    assert out["n_ws_runs"].iloc[0] == 3


def test_asof_join_block_semantics():
    """Backward-inclusive as-of pick, per-user isolation, ts-tie →
    min event_id, and NULLs when no prior right event exists."""
    from asserts_otel_processor_ray.stages.events import asof_join_block
    ts = pa.array(np.array([100, 200, 200, 300, 50, 400], "datetime64[us]"),
                  pa.timestamp("us"))
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "ts": ts,
        "user_id": pa.array([7, 7, 7, 7, 8, 8], pa.int64()),
        "event_type": ["view", "view", "view", "purchase",
                       "purchase", "purchase"],
        "value": pa.array([1.0, 2.0, 3.0, 99.0, 98.0, 97.0],
                          pa.float64()),
    })
    out = asof_join_block(t).to_pandas().set_index("event_id")
    # user 7's purchase at 300 → tie at ts=200 resolves to event 2
    assert out.loc[4, "view_event_id"] == 2
    assert out.loc[4, "view_value"] == 2.0
    # user 8 has no views at all → NULL join (never user 7's views)
    assert pd.isna(out.loc[5, "view_event_id"])
    assert pd.isna(out.loc[6, "view_event_id"])


def test_new_op_kernels_handle_degenerate_batches():
    """Empty batches and empty/whitespace texts must not crash the new
    per-batch kernels (the streaming executor feeds whatever block
    boundaries produce)."""
    from asserts_otel_processor_ray.stages.dedup import ngram_long_batch
    from asserts_otel_processor_ray.stages.events import (
        asof_join_block, sample_hash_batch, value_count_partial)
    from asserts_otel_processor_ray.stages.text_analysis import (
        doc_freq_partial)
    # empty events batch
    ev_empty = pa.table({
        "event_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "user_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64()),
    })
    assert asof_join_block(ev_empty).num_rows == 0
    assert sample_hash_batch(ev_empty).num_rows == 0
    assert value_count_partial(ev_empty).num_rows == 0
    # docs with empty / whitespace-only / short texts
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["", "   ", "ab"],
    })
    lng = ngram_long_batch(docs)
    # empty/ws-only docs contribute nothing; "ab" yields its whole-string hash
    assert lng.column("doc_id").to_pylist() == [2]
    assert doc_freq_partial(docs).num_rows >= 1  # "" token from split


def test_quantiles_from_counts_matches_sorted_rank():
    from asserts_otel_processor_ray.stages.events import (
        QUANTILE_PCTS, quantiles_from_counts)
    rng = np.random.default_rng(7)
    vals = np.round(rng.normal(50, 20, size=1000), 2)
    vc = pd.Series(vals).value_counts()
    df = pd.DataFrame({"event_type": "x", "value": vc.index.to_numpy(),
                       "n": vc.to_numpy()})
    out = quantiles_from_counts(df)
    srt = np.sort(vals)
    n = len(vals)
    for p in QUANTILE_PCTS:
        rank = (p * n + 99) // 100
        assert out[f"p{p}"].iloc[0] == srt[rank - 1]
    assert int(out["n_events"].iloc[0]) == n


# ---- DuckDB-oracle parity (same harness the driver runs) -----------------

def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype("string")
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
        if df[c].dtype == np.float64:
            df[c] = df[c].round(9)
        if str(df[c].dtype) in ("int32", "int8", "uint32", "uint64"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for name in ["documents", "embeddings", "events", "orders",
                 "customer", "nation", "lineitem", "supplier", "part"]:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM "
                f"read_parquet('{SF}/{name}.parquet')")
    return con


CHECKED = ["d_exact_dedup", "d_token_stats", "d_quality", "d_langid",
           "d_token_jaccard", "d_ngram_jaccard", "d_dedup_clusters",
           "d_doc_freq", "d_tfidf_top",
           "d_fingerprint", "d_simhash",
           "d_simhash_pairs", "d_minhash_pairs", "e_ann_topk",
           "e_ann_lsh", "e_ann_ivf", "e_ann_ivf_indexed",
           "e_lsh_buckets", "e_knn_label",
           "e_embedding_near_dup", "g_sessionize", "g_window_dedup",
           "g_topk_users", "g_sample_hash", "g_quantiles",
           "g_asof_join", "m_media_features", "m_frame_sample",
           "m_resize", "d_bpe_tokens", "h_nation_orders",
           "d_repetition", "d_decontaminate", "g_source_cap",
           "g_rolling_count", "e_cluster_medoid", "h_pricing",
           "d_stratified_sample", "d_pack_offsets", "d_dedup_keep",
           "d_curation", "g_funnel", "e_quantize", "d_chunk",
           "g_props_extract", "g_distinct_users", "h_q3_topk",
           "d_unigram_lm", "g_semi_join", "g_tumbling", "g_retention",
           "d_redact", "d_shard_assign", "d_zscore",
           "s_jsonl", "s_csv_events", "g_hopping", "d_percentile_filter",
           "d_mixture_sample", "d_cooccur", "g_kmv_distinct",
           "e_knn_graph", "g_rollup", "g_lag_stats", "d_pivot",
           "g_bloom_semi", "g_new_users", "e_dim_stats",
           "d_term_drift", "h_q6_revenue", "h_returned_top",
           "e_gram", "g_best_event", "h_supp_distinct",
           "h_q19_revenue", "e_label_centroids", "e_outliers",
           "d_minhash_recall", "g_churned_users", "h_q7_shipping",
           "d_vocab_growth", "e_label_text_stats", "s_hive_roundtrip",
           "d_field_completeness", "e_knn_confusion", "g_top3_events",
           "h_top_supplier", "g_cohort_matrix", "d_dup_sources",
           "e_knn_purity", "g_key_skew", "g_ooo_ratio", "d_model_filter", "h_q12_priority", "g_mad", "g_mad_outliers"]


@pytest.mark.parametrize("name", CHECKED)
def test_extra_query_matches_oracle(name, ducks, ray_session):
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        EXTRA_ORACLE_SQL, EXTRA_QUERIES)
    a = _norm(EXTRA_QUERIES[name](SF).to_pandas())
    b = _norm(ducks.sql(EXTRA_ORACLE_SQL[name]).df())
    assert set(a.columns) == set(b.columns)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_ann_lsh_recall_vs_exact(ray_session):
    """The LSH-pruned ANN path must recover most of the exact top-5
    neighbor sets on the synthetic embeddings (recall pinned ≥ 0.8 so a
    banding regression is caught)."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_ann_lsh, q_ann_topk)
    exact = q_ann_topk(SF).to_pandas()
    approx = q_ann_lsh(SF).to_pandas()
    e = exact.groupby("query_id")["neighbor_id"].apply(set)
    a = approx.groupby("query_id")["neighbor_id"].apply(set)
    hits = sum(len(e[q] & a.get(q, set())) for q in e.index)
    total = sum(len(v) for v in e.values)
    assert hits / total >= 0.8


def test_ann_ivf_kmeans_recall_vs_exact(ray_session):
    """The production IVF path — kmeans_fit-trained centroids, probing
    4 of 16 lists (25% scan) — must recover most of the exact top-5
    neighbor sets (recall pinned ≥ 0.6; trained centroids match the
    seeded ones at HALF the scan fraction on this data)."""
    import pyarrow.parquet as pq
    import asserts_otel_processor_ray.stages.similarity as S
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        _emb, q_ann_topk)
    tbl = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qt = tbl.filter(pa.compute.less(tbl.column("vec_id"), 10))
    qids = qt.column("vec_id").to_numpy()
    dim = len(qt.column("embedding")[0])
    cent = S.kmeans_fit(_emb(SF), k=16, dim=dim, iters=5)
    approx = S.ann_topk_ivf(
        _emb(SF), S._matrix(qt), qids, k=5, dim=dim,
        exclude_ids=frozenset(int(i) for i in qids),
        nprobe=4, centroids=cent)
    exact = q_ann_topk(SF).to_pandas()
    e = exact.groupby("query_id")["neighbor_id"].apply(set)
    a = approx.groupby("query_id")["neighbor_id"].apply(set)
    hits = sum(len(e[q] & a.get(q, set())) for q in e.index)
    total = sum(len(v) for v in e.values)
    assert hits / total >= 0.6


def test_kmeans_fit_matches_local_lloyds(ray_session):
    """Distributed kmeans_fit (per-batch partial sums → driver reduce)
    must match a single-matrix numpy Lloyd's byte-for-byte in
    assignments and to float tolerance in centroids, regardless of how
    Ray splits the blocks."""
    import ray
    import asserts_otel_processor_ray.stages.similarity as S
    rng = np.random.default_rng(42)
    k, dim, n, iters = 4, 8, 300, 5
    blobs = S._normalize(rng.standard_normal((k, dim)))
    m = np.repeat(blobs, n // k, axis=0) + 0.25 * rng.standard_normal(
        (n, dim))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(m), pa.list_(pa.float64())),
    })).repartition(7)
    got = S.kmeans_fit(ds, k=k, dim=dim, iters=iters, seed=1234)

    cent = S._normalize(np.random.default_rng(1234)
                        .standard_normal((k, dim)))
    mn = S._normalize(m)
    for _ in range(iters):
        asn = (mn @ cent.T).argmax(axis=1)
        new = cent.copy()
        for c in range(k):
            s = mn[asn == c].sum(axis=0)
            norm = np.linalg.norm(s)
            if norm > 0:
                new[c] = s / norm
        cent = new
    np.testing.assert_allclose(got, cent, atol=1e-9)
    assert ((mn @ got.T).argmax(axis=1) == (mn @ cent.T).argmax(axis=1)).all()


def test_verify_bucket_vectorized_matches_bruteforce():
    """The merge-based in-bucket Jaccard must equal the per-pair
    set-ops definition."""
    from asserts_otel_processor_ray.stages.dedup import verify_bucket_df
    rng = np.random.default_rng(7)
    shingles = [rng.choice(50, size=rng.integers(3, 12),
                           replace=False).astype(np.int64)
                for _ in range(12)]
    g = pd.DataFrame({"doc_id": np.arange(12, dtype=np.int64),
                      "shingles": shingles})
    out = verify_bucket_df(g, threshold=0.2)
    got = {(int(a), int(b)): j for a, b, j in
           zip(out["doc_a"], out["doc_b"], out["jaccard"])}
    want = {}
    for i in range(12):
        for j in range(i + 1, 12):
            sa, sb = set(shingles[i].tolist()), set(shingles[j].tolist())
            jac = len(sa & sb) / len(sa | sb)
            if jac >= 0.2:
                want[(i, j)] = jac
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_minhash_hot_bucket_guard(ray_session):
    """A degenerate bucket (500 near-identical docs) must be skipped by
    the default max_bucket guard — bounded verify work, logged skips —
    while small honest buckets still verify."""
    import ray.data
    from asserts_otel_processor_ray.stages.dedup import (
        minhash_pairs_distributed)
    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 4
    texts = [boiler + f"tail{i % 2}" for i in range(500)]
    # two honest near-dups with distinct vocabulary
    honest = ("unique vocabulary about distributed query planners "
              "and arrow kernels streaming shuffles " * 3)
    texts += [honest, honest + " tiny suffix"]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": texts}))
    pairs, stats = minhash_pairs_distributed(
        docs, threshold=0.5, return_stats=True)
    assert stats["skipped_buckets"] >= 1
    assert stats["max_skipped_size"] > 256
    # the honest pair (500, 501) survives outside the hot bucket
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (500, 501) in got
    # nothing from the skipped bucket leaks through as a marker row
    assert (pairs["doc_a"] >= 0).all()


def test_simhash_hot_bucket_guard(ray_session):
    """SimHash sibling of the MinHash guard: a degenerate 16-bit chunk
    bucket (500 near-identical docs) must be skipped — no O(|bucket|²)
    triu materialization — while honest near-dups still verify."""
    import ray.data
    from asserts_otel_processor_ray.stages.dedup import (
        simhash_pairs_distributed)
    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 4
    texts = [boiler + f"tail{i % 2}" for i in range(500)]
    honest = ("unique vocabulary about distributed query planners "
              "and arrow kernels streaming shuffles " * 3)
    texts += [honest, honest + " suffix"]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": texts}))
    pairs, stats = simhash_pairs_distributed(
        docs, max_hamming=3, return_stats=True)
    assert stats["skipped_buckets"] >= 1
    assert stats["max_skipped_size"] > 256
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (500, 501) in got
    assert (pairs["doc_a"] >= 0).all()
    # uncapped run on the same input finds a superset (guard only skips)
    full = simhash_pairs_distributed(docs, max_hamming=3, max_bucket=None)
    assert got <= set(zip(full["doc_a"], full["doc_b"]))


def test_embedding_near_dup_recall_and_guard(ray_session):
    """The banded near-dup path (ids-only shuffle + join-gathered
    verify) must match the exact all-pairs result at the gate data
    (recall 1.0 with 16 bands x 4 bits on this seed), and its
    hot-bucket guard must skip-and-log rather than blow up."""
    import ray.data
    from asserts_otel_processor_ray.stages.similarity import (
        embedding_near_dup, near_dup_pairs_exact)
    ds = ray.data.read_parquet(SF + "/embeddings.parquet")
    exact = near_dup_pairs_exact(ds, threshold=0.45)
    got, stats = embedding_near_dup(ds, threshold=0.45, dim=64,
                                    return_stats=True)
    assert stats["skipped_buckets"] == 0
    exact_pairs = set(zip(exact["vec_a"], exact["vec_b"]))
    got_pairs = set(zip(got["vec_a"], got["vec_b"]))
    assert got_pairs == exact_pairs  # recall 1.0 AND no false positives
    # degenerate-cap run: buckets over the cap are skipped and counted,
    # the surviving output is a subset
    capped, cstats = embedding_near_dup(ds, threshold=0.45, dim=64,
                                        max_bucket=8, return_stats=True)
    assert cstats["skipped_buckets"] > 0
    assert cstats["max_skipped_size"] > 8
    assert set(zip(capped["vec_a"], capped["vec_b"])) <= got_pairs


def test_ann_gather_matches_full(ray_session, monkeypatch):
    """The candidate-column gather path (taken when candidates are
    sparse) must return exactly the same (query_id, neighbor_id, rank)
    frame as the full-matmul+mask path — same float64 dot products per
    pair, so identical ranks (VERDICT r4 item 1)."""
    import pyarrow.parquet as pq
    import ray.data
    import asserts_otel_processor_ray.stages.similarity as S
    tbl = pq.read_table(SF + "/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qt = tbl.filter(pa.compute.less(tbl.column("vec_id"), 3))
    qids = qt.column("vec_id").to_numpy()
    qm = S._matrix(qt)
    dim = qm.shape[1]
    ds = ray.data.read_parquet(SF + "/embeddings.parquet")
    ex = frozenset(int(i) for i in qids)
    # few queries -> sparse candidate columns -> gather path
    monkeypatch.setattr(S, "GATHER_MAX_DENSITY", 1.0)
    g_lsh = S.ann_topk_lsh(ds, qm, qids, k=5, dim=dim, exclude_ids=ex)
    g_ivf = S.ann_topk_ivf(ds, qm, qids, k=5, dim=dim, exclude_ids=ex)
    monkeypatch.setattr(S, "GATHER_MAX_DENSITY", 0.0)  # force full path
    f_lsh = S.ann_topk_lsh(ds, qm, qids, k=5, dim=dim, exclude_ids=ex)
    f_ivf = S.ann_topk_ivf(ds, qm, qids, k=5, dim=dim, exclude_ids=ex)
    pd.testing.assert_frame_equal(g_lsh, f_lsh)
    pd.testing.assert_frame_equal(g_ivf, f_ivf)
    assert len(g_lsh) > 0 and len(g_ivf) > 0


def test_ivf_indexed_matches_flat(ray_session, tmp_path):
    """ann_topk_ivf over an ivf_build layout (reading ONLY probed list
    directories) must equal the index-free path, and the layout must be
    one hive directory per list with the lid column preserved."""
    import os
    import pyarrow.parquet as pq
    import ray.data
    import asserts_otel_processor_ray.stages.similarity as S
    tbl = pq.read_table(SF + "/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qt = tbl.filter(pa.compute.less(tbl.column("vec_id"), 10))
    qids = qt.column("vec_id").to_numpy()
    qm = S._matrix(qt)
    dim = qm.shape[1]
    ds = ray.data.read_parquet(SF + "/embeddings.parquet")
    ex = frozenset(int(i) for i in qids)
    flat = S.ann_topk_ivf(ds, qm, qids, k=5, dim=dim, exclude_ids=ex)
    idx = str(tmp_path / "idx")
    S.ivf_build(ds, dim, idx)
    dirs = sorted(os.listdir(idx))
    assert all(d.startswith("list_id=") for d in dirs)
    indexed = S.ann_topk_ivf(None, qm, qids, k=5, dim=dim,
                             exclude_ids=ex, index_path=idx)
    pd.testing.assert_frame_equal(indexed, flat)
    # nprobe=2: fewer lists probed -> fewer directories read; results
    # stay a valid top-k (subset semantics not asserted — recall is
    # covered by test_ann_ivf_kmeans_recall_vs_exact)
    narrow = S.ann_topk_ivf(None, qm, qids, k=5, dim=dim,
                            exclude_ids=ex, index_path=idx, nprobe=2)
    assert len(narrow) > 0


def test_tfidf_join_path_matches_broadcast(ray_session):
    """tf-idf's fully distributed token-join path (the beyond-budget
    scale path) must equal the bounded-broadcast path exactly."""
    import ray
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        tfidf_top)
    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])
    a = _norm(tfidf_top(docs).to_pandas())
    b = _norm(tfidf_top(docs, broadcast_budget=0).to_pandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_unigram_join_path_matches_broadcast(ray_session):
    """The commonness scorer's fully distributed token-join path (the
    beyond-budget scale path) must equal the bounded-broadcast path
    exactly — same treatment as tf-idf."""
    import ray
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        unigram_mass)
    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])
    a = _norm(unigram_mass(docs).to_pandas())
    b = _norm(unigram_mass(docs, broadcast_budget=0).to_pandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_props_extract_rejects_missing_k():
    """A props row without an integer 'k' must raise (the oracle's
    CAST would fail on it too) rather than silently skewing sums."""
    import pyarrow as pa
    from asserts_otel_processor_ray.stages.events import (
        props_extract_partial)
    bad = pa.table({"event_type": ["view"], "props": ['{"z": 1}']})
    with pytest.raises(ValueError, match="without an integer 'k'"):
        props_extract_partial(bad)
    good = props_extract_partial(
        pa.table({"event_type": ["view", "view", "click"],
                  "props": ['{"k": 3}', '{"k": -2}', '{"k": 10}']}))
    d = good.to_pandas().set_index("event_type")
    assert d.loc["view", "sum_k"] == 1 and d.loc["view", "max_k"] == 3
    assert d.loc["click", "n_events"] == 1


def test_tfidf_min_df_reconstruction(ray_session):
    """Hapax tokens (df == 1) are EXCLUDED from the broadcast slice and
    reconstructed exactly as df=1 at scoring time; a budget equal to
    the df>=2 vocabulary size therefore suffices, and both paths score
    hapax-bearing docs identically."""
    import ray
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        tfidf_top)
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["alpha beta gamma", "alpha beta", "alpha unique1",
                 "beta unique2 unique2", "gamma gamma alpha",
                 "unique3 alpha beta"],
    })
    docs = ray.data.from_pandas(df).repartition(3)
    # df>=2 vocabulary = {alpha(6), beta(4), gamma(2)} → budget 3 keeps
    # the broadcast path; unique1/2/3 must come back with doc_freq 1
    a = tfidf_top(docs, broadcast_budget=3).to_pandas()
    hapax = a[a["token"].str.startswith("unique")]
    assert set(hapax["token"]) == {"unique1", "unique2", "unique3"}
    assert (hapax["doc_freq"] == 1).all()
    # hapaxes beat common tokens within their doc: tf*N/1 is maximal
    assert (hapax["rank"] == 1).all()
    b = tfidf_top(docs, broadcast_budget=0).to_pandas()  # join path
    pd.testing.assert_frame_equal(_norm(a), _norm(b), check_dtype=False)
    # over-tight budget below the df>=2 slice also switches paths
    c = tfidf_top(docs, broadcast_budget=2).to_pandas()
    pd.testing.assert_frame_equal(_norm(a), _norm(c), check_dtype=False)


def test_connected_components_distributed_matches_union_find(ray_session):
    """Distributed hash-to-min CC must equal the driver union-find on a
    graph with a LONG chain (diameter 200 ≫ the 50-round budget — only
    pointer jumping converges), a clique, a disjoint pair, duplicate
    edges, and non-contiguous ids."""
    import ray
    from asserts_otel_processor_ray.stages.dedup import (
        connected_components_distributed)
    chain = [(1000 + i, 1000 + i + 1) for i in range(200)]
    clique = [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    extra = [(3, 70000), (3, 70000), (70000, 3)]   # dupes + reversed
    edges = pd.DataFrame(chain + clique + extra,
                         columns=["doc_a", "doc_b"]).astype(np.int64)
    got = (connected_components_distributed(
        ray.data.from_pandas(edges).repartition(7), num_partitions=5)
        .sort_values("node", ignore_index=True))
    # reference union-find (same as the driver path)
    parent = {}
    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        return r
    for a, b in edges.itertuples(index=False):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(set(edges["doc_a"]) | set(edges["doc_b"]))
    want = pd.DataFrame({"node": nodes,
                         "label": [find(n) for n in nodes]})
    pd.testing.assert_frame_equal(got, want.astype(np.int64),
                                  check_dtype=False)


def test_dedup_clusters_distributed_path_matches_driver(ray_session):
    """Forcing the beyond-budget distributed CC path (pair_budget=0)
    must reproduce the driver union-find clustering bit-for-bit on the
    real minhash pair pipeline — and the driver never holds the pair
    set on that path."""
    import ray
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        dedup_clusters)
    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])
    a = dedup_clusters(docs).to_pandas()
    b = dedup_clusters(docs, pair_budget=0).to_pandas()
    assert len(a) > 0          # the sf0.001 corpus has near-dups
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_embedding_near_dup_join_path_matches_broadcast(ray_session):
    """The beyond-budget join-gather chain must emit the identical
    pair set as the bounded-matrix broadcast fast path."""
    import ray
    import asserts_otel_processor_ray.stages.similarity as S
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    dim = len(ds.take(1)[0]["embedding"])
    a = S.embedding_near_dup(ds, threshold=0.45, dim=dim)
    b = S.embedding_near_dup(ds, threshold=0.45, dim=dim,
                             broadcast_budget_bytes=0)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


# ---- round-5 operator kernels -------------------------------------------

def test_rolling_count_block_matches_bruteforce():
    """RANGE-frame semantics incl. ts peers and the run-stride trick
    (users whose windows would bleed across runs)."""
    from asserts_otel_processor_ray.stages.events import (
        rolling_count_block)
    rng = np.random.default_rng(7)
    n = 400
    ts = rng.integers(0, 10_000, n) * 1_000_000          # 0..10000 s
    ts[50:60] = ts[50]                                   # forced peers
    user = rng.integers(0, 5, n)
    batch = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(user, pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
    })
    out = rolling_count_block(batch, window_s=1800.0).to_pandas()
    w = 1800 * 1_000_000
    for _, r in out.sample(60, random_state=0).iterrows():
        uts = ts[user == r.user_id]
        cur = r.ts.value // 1000 if hasattr(r.ts, "value") else int(r.ts)
        expect = int(((uts >= cur - w) & (uts <= cur)).sum())
        assert r.n_window == expect
    # empty batch keeps schema
    empty = rolling_count_block(batch.slice(0, 0))
    assert empty.num_rows == 0 and "n_window" in empty.column_names


def test_repetition_ratio_semantics():
    from asserts_otel_processor_ray.stages.text_analysis import (
        repetition_batch)
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b a b a b", "a b c d e", "x"], pa.string()),
    })
    out = repetition_batch(batch, w=2).to_pandas().set_index("doc_id")
    # doc 1: grams ab ba ab ba ab -> 5 total, 2 distinct
    assert out.loc[1, "n_grams"] == 5 and out.loc[1, "n_distinct"] == 2
    assert out.loc[1, "rep_ratio"] == 1.0 - 2.0 / 5.0
    assert out.loc[2, "rep_ratio"] == 0.0
    # single-token doc: one whole-run shingle, no repetition
    assert out.loc[3, "n_grams"] == 1 and out.loc[3, "rep_ratio"] == 0.0


def test_decontaminate_membership(ray_session):
    """Docs sharing a 3-gram with the benchmark slice are flagged with
    the right hit counts; benchmark docs themselves are excluded."""
    import ray as _ray
    from asserts_otel_processor_ray.stages.text_analysis import (
        DecontaminateStage, bench_grams_partial)
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),       # 0 = benchmark
        "text": pa.array(["the quick brown fox jumps",
                          "lazy quick brown fox here",   # shares 2 grams
                          "nothing in common at all"], pa.string()),
    })
    g = bench_grams_partial(batch, w=3, mod=97)["gram"].to_numpy()
    ref = _ray.put(np.asarray(g, np.uint64))
    out = DecontaminateStage(ref, w=3, mod=97)(batch).to_pandas()
    assert list(out["doc_id"]) == [1]
    assert out.loc[0, "n_hit"] == 1          # shared: "quick brown fox"
    assert out.loc[0, "n_grams"] == 3
    assert out.loc[0, "contaminated_frac"] == 1.0 / 3.0


def test_source_cap_partial_final_equivalence():
    """Two-phase cap == single-pass cap on a concatenated frame."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        _source_cap_block)
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"doc_id": rng.permutation(300),
                       "source": [f"s{i % 7}" for i in range(300)]})
    whole = _source_cap_block(df, 10)
    parts = [_source_cap_block(p, 10)
             for p in np.array_split(df.sample(frac=1, random_state=1), 5)]
    two_phase = _source_cap_block(pd.concat(parts), 10)
    a = whole.sort_values(["source", "doc_id"]).reset_index(drop=True)
    b = two_phase.sort_values(["source", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_cluster_medoid_partial_merge():
    """Partial-per-batch + driver merge == single-batch answer."""
    from asserts_otel_processor_ray.stages.similarity import (
        IVFIndex, _matrix, _normalize, cluster_medoid_partial)
    rng = np.random.default_rng(11)
    m = rng.standard_normal((200, 8)).astype(np.float32)
    idx = IVFIndex(8, nlist=4, seed=1234)

    def tbl(lo, hi):
        return pa.table({
            "vec_id": pa.array(np.arange(lo, hi), pa.int64()),
            "embedding": pa.array([list(map(float, r))
                                   for r in m[lo:hi]],
                                  pa.list_(pa.float32())),
        })

    whole = cluster_medoid_partial(tbl(0, 200), idx.centroids).to_pandas()
    parts = pd.concat([
        cluster_medoid_partial(tbl(0, 90), idx.centroids).to_pandas(),
        cluster_medoid_partial(tbl(90, 200), idx.centroids).to_pandas()])
    merged = (parts.sort_values(["list_id", "best_cos", "vec_id"],
                                ascending=[True, False, True],
                                kind="mergesort")
              .drop_duplicates("list_id"))
    assert list(merged["vec_id"]) == list(whole["vec_id"])
    tot = parts.groupby("list_id")["n_vectors"].sum()
    assert (tot.to_numpy() == whole.set_index("list_id")
            .loc[tot.index, "n_vectors"].to_numpy()).all()


def test_pricing_partial_exact_integers():
    """Integer-cents partials are exact: splitting a batch changes no
    aggregate bit."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        _pricing_partial)
    rng = np.random.default_rng(5)
    n = 1000
    batch = pa.table({
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], n)),
        "l_shipdate": pa.array(
            (np.datetime64("1995-01-01") +
             rng.integers(0, 2000, n).astype("timedelta64[D]"))
            .astype("datetime64[us]"), pa.timestamp("us")),
        "l_quantity": pa.array(rng.integers(1, 50, n).astype(float)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(100, 10000, n), 2)),
        "l_discount": pa.array(np.round(rng.uniform(0, .1, n), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0, .08, n), 2)),
    })
    whole = (_pricing_partial(batch).to_pandas()
             .groupby(["l_returnflag", "l_linestatus"]).sum())
    split = (pd.concat([_pricing_partial(batch.slice(0, 300)).to_pandas(),
                        _pricing_partial(batch.slice(300)).to_pandas()])
             .groupby(["l_returnflag", "l_linestatus"]).sum())
    pd.testing.assert_frame_equal(whole, split.loc[whole.index])


def test_pack_offsets_bucket_width_invariance(ray_session):
    """The distributed prefix sum's bucket width is an internal knob:
    a 16-doc bucket layout (many buckets, multi-bucket blocks) must
    produce bitwise the same offsets as the default 4096."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_pack_offsets)
    a = (q_pack_offsets(SF).to_pandas()
         .sort_values("doc_id", ignore_index=True))
    b = (q_pack_offsets(SF, bucket_docs=16).to_pandas()
         .sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(a, b)
    # offsets are a strict running sum of token counts in doc order
    assert (a["start_offset"].to_numpy()[1:]
            == (a["start_offset"] + a["n_tokens"]).to_numpy()[:-1]).all()


def test_stratified_sample_partial_final_equivalence():
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        _strat_partial)
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"doc_id": rng.permutation(500).astype(np.int64),
                       "lang": [f"l{i % 4}" for i in range(500)]})
    whole = _strat_partial(df, 3)
    parts = pd.concat([_strat_partial(p, 3)
                       for p in np.array_split(df, 7)])
    two_phase = _strat_partial(parts, 3)
    a = whole.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    b = two_phase.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_curation_reason_precedence(ray_session):
    """First failing rule wins; benchmark docs always excluded."""
    import ray as _ray
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        _CurationStage)
    filler = " ".join(f"w{i}" for i in range(30))
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([filler,                    # benchmark (id 0)
                          "tiny doc",                # too_short
                          "x y " * 30], pa.string()),  # repetitive
    })
    ref = _ray.put(np.array([], np.uint64))
    out = _CurationStage(ref)(batch).to_pandas().set_index("doc_id")
    assert out.loc[0, "reject_reason"] == "benchmark"
    assert out.loc[1, "reject_reason"] == "too_short"
    assert out.loc[2, "reject_reason"] == "repetitive"
    assert (out["keep"] == 0).all()


def test_funnel_block_ordered_semantics():
    """Funnel stages must be reached IN ORDER: a purchase before the
    first qualifying click does not count."""
    from asserts_otel_processor_ray.stages.events import funnel_block
    S = 1_000_000
    rows = [
        # user 1: view@10, click@20, purchase@30 -> stage 3
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # user 2: purchase@5 BEFORE view@10/click@20 -> stage 2
        (2, 5, "purchase"), (2, 10, "view"), (2, 20, "click"),
        # user 3: click@5 before view@10 -> stage 1 (view only)
        (3, 5, "click"), (3, 10, "view"),
        # user 4: no view -> stage 0
        (4, 10, "click"), (4, 20, "purchase"),
        # user 5: same-ts chain (ties inclusive) -> stage 3
        (5, 7, "view"), (5, 7, "click"), (5, 7, "purchase"),
    ]
    batch = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] * S for r in rows],
                                dtype="datetime64[us]"),
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    out = funnel_block(batch).to_pandas().set_index("user_id")["stage"]
    assert out.to_dict() == {1: 3, 2: 2, 3: 1, 4: 0, 5: 3}


def test_quantize_batch_semantics():
    from asserts_otel_processor_ray.stages.similarity import (
        quantize_batch)
    batch = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[1.0, -2.0, 0.5], [0.0, 0.0, 0.0]],
                              pa.list_(pa.float32())),
    })
    out = quantize_batch(batch).to_pandas().set_index("vec_id")
    # amax=2 -> scale=2/127; q = rint(x*127/2) = [64, -127, 32]
    assert out.loc[0, "qmax"] == 64 and out.loc[0, "qmin"] == -127
    assert out.loc[0, "qsum"] == 64 - 127 + 32
    assert out.loc[1, "scale"] == 0.0 and out.loc[1, "qsum"] == 0


def test_chunk_batch_window_math():
    from asserts_otel_processor_ray.stages.text_analysis import (
        chunk_batch)
    b = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": [" ".join(["w"] * 300), "short doc here"]})
    out = chunk_batch(b).to_pandas()
    d1 = out[out["doc_id"] == 1]
    assert d1["start_tok"].tolist() == [0, 96, 192]
    assert d1["end_tok"].tolist() == [128, 224, 300]
    # every token is covered and consecutive chunks overlap by 32
    assert d1["end_tok"].iloc[-1] == 300
    d2 = out[out["doc_id"] == 2]
    assert len(d2) == 1 and d2["n_chunk_tokens"].iloc[0] == 3


def test_rolling_count_wide_span_many_users_no_overflow():
    """Regression: many users x a multi-year ts span used to overflow
    the run*stride searchsorted key (int64 wrap -> garbage counts);
    the chunked sweep must return exact counts."""
    from asserts_otel_processor_ray.stages.events import (
        rolling_count_block)
    n_users = 200_000
    span_us = 3 * 365 * 24 * 3600 * 1_000_000          # ~3 years
    user = np.repeat(np.arange(n_users, dtype=np.int64), 2)
    # two events per user: one at each span edge -> window never
    # bridges them, every count must be exactly 1
    ts = np.tile(np.array([0, span_us], np.int64), n_users)
    batch = pa.table({
        "event_id": pa.array(np.arange(len(user)), pa.int64()),
        "user_id": pa.array(user, pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
    })
    out = rolling_count_block(batch, window_s=1800.0)
    assert (out.column("n_window").to_numpy() == 1).all()


# ---- empty / degenerate input robustness (round-5 review findings) --------

_EVENTS_SCHEMA = pa.schema([
    ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
    ("user_id", pa.int64()), ("event_type", pa.string()),
    ("value", pa.float64()), ("props", pa.string()),
])


def _write_events(path, rows=None):
    import pyarrow.parquet as pq
    if rows is None:
        t = _EVENTS_SCHEMA.empty_table()
    else:
        t = pa.table(rows, schema=_EVENTS_SCHEMA)
    pq.write_table(t, f"{path}/events.parquet")


def test_semi_join_no_buyers(ray_session, tmp_path):
    """A stream with zero purchase events must yield an empty result,
    not an IndexError probing an empty broadcast key array."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_semi_join)
    _write_events(tmp_path, {
        "event_id": [1, 2], "ts": np.array([0, 1], "datetime64[us]"),
        "user_id": [10, 11], "event_type": ["view", "click"],
        "value": [1.0, 2.0], "props": ['{"k": 1}', '{"k": 2}'],
    })
    out = q_semi_join(str(tmp_path))
    assert out.num_rows == 0
    assert out.column_names == ["event_type", "distinct_users",
                                "n_events"]


def test_event_queries_on_empty_table(ray_session, tmp_path):
    """Zero-row events input: every round-5 event operator must return
    a typed empty table (collect_df yields a column-less frame there —
    the positional renames used to raise)."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_hopping, q_kmv_distinct, q_props_extract, q_retention,
        q_semi_join, q_tumbling)
    _write_events(tmp_path)
    for fn, cols in [
        (q_props_extract, ["event_type", "sum_k", "max_k", "n_events"]),
        (q_retention, ["week_bucket", "n_active", "n_retained"]),
        (q_semi_join, ["event_type", "distinct_users", "n_events"]),
        (q_tumbling, ["event_type", "day", "n_events", "max_value"]),
        (q_hopping, ["event_type", "window_start", "n_events",
                     "max_value"]),
        (q_kmv_distinct, ["event_type", "kth_hash", "n_kept",
                          "est_distinct"]),
    ]:
        out = fn(str(tmp_path))
        assert out.num_rows == 0, fn.__name__
        assert out.column_names == cols, fn.__name__


def test_redact_batch_semantics():
    from asserts_otel_processor_ray.stages.text_analysis import (
        REDACT_TOKEN, redact_batch)
    b = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["the customer met a supplier",
                           "particle is not a part match for parts",
                           "no entities here"]})
    out = redact_batch(b).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_redactions"] == 2
    assert out.loc[1, "redacted"] == \
        f"the {REDACT_TOKEN} met a {REDACT_TOKEN}"
    # \b guards: "particle"/"parts" must NOT match, bare "part" must
    assert out.loc[2, "n_redactions"] == 1
    assert out.loc[2, "redacted"] == \
        f"particle is not a {REDACT_TOKEN} match for parts"
    assert out.loc[3, "n_redactions"] == 0
    assert out.loc[3, "redacted"] == "no entities here"


def test_shard_positions_dense_and_stable():
    """Positions are 0..k-1 dense per shard and ordered by (h, doc_id)
    regardless of input row order."""
    from asserts_otel_processor_ray.stages.text_analysis import (
        shard_assign_partial, shard_positions_block)
    ids = np.arange(1000, dtype=np.int64)
    keyed = shard_assign_partial(
        pa.table({"doc_id": pa.array(ids, pa.int64())})).to_pandas()
    out = shard_positions_block(keyed.sample(frac=1.0, random_state=7))
    for shard, grp in out.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(len(grp)))
    # permutation-invariant: same assignment from sorted input
    out2 = shard_positions_block(keyed)
    a = out.sort_values("doc_id", ignore_index=True)
    b = out2.sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_zscore_constant_group_is_zero(ray_session, tmp_path):
    import pyarrow.parquet as pq
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_zscore)
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["a", "b", "c", "d"],
        "lang": ["en", "en", "fr", "fr"],
        "source": ["s"] * 4,
        "n_chars": pa.array([10, 10, 5, 15], pa.int64()),
    })
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    out = q_zscore(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[1, "zscore"] == 0.0 and out.loc[2, "zscore"] == 0.0
    # fr: mean=10, var=25, std=5 -> z = (5-10)/5 = -1, (15-10)/5 = +1
    assert out.loc[3, "zscore"] == -1.0 and out.loc[4, "zscore"] == 1.0


def test_jsonl_source_is_dropin_transcript_schema(ray_session):
    """The JSONL reader must emit the exact canonical transcript
    schema so its Dataset is drop-in input for run_pipeline."""
    from asserts_otel_processor_ray.schema import TRANSCRIPT_SCHEMA
    from asserts_otel_processor_ray.sources.textio import (
        read_transcripts_jsonl)
    ds = read_transcripts_jsonl()
    assert ds.schema().base_schema == TRANSCRIPT_SCHEMA
    assert ds.count() > 0


def test_hopping_every_event_in_k_windows(ray_session):
    """Hopping windows with length == K hops: Σ n_events over all
    windows must be exactly K × the event count."""
    import pyarrow.parquet as pq
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        HOP_K, q_hopping)
    n = pq.read_metadata(f"{SF}/events.parquet").num_rows
    out = q_hopping(SF).to_pandas()
    assert out["n_events"].sum() == HOP_K * n
    # window starts align to the hop grid
    us = out["window_start"].astype("int64")
    assert (us % (6 * 3600 * 1_000_000) == 0).all()


def test_percentile_filter_threshold_semantics(ray_session, tmp_path):
    """Discrete p90 over 1..10: rank = ceil(0.9*10) = 9 → threshold 9
    → exactly {9, 10} survive."""
    import pyarrow.parquet as pq
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_percentile_filter)
    t = pa.table({
        "doc_id": pa.array(range(1, 11), pa.int64()),
        "text": ["x"] * 10,
        "lang": ["en"] * 10,
        "source": ["s"] * 10,
        "n_chars": pa.array(range(1, 11), pa.int64()),
    })
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    out = q_percentile_filter(str(tmp_path)).to_pandas()
    assert sorted(out["n_chars"]) == [9, 10]


def test_mixture_sample_factor_semantics():
    """factor 20/8 = 2.5x: every doc gets >= 2 copies, ~half get 3;
    factor 4/8 = 0.5x: docs get 0 or 1 copies, ~half survive; copy
    indices are dense 0..k-1 and the explode is deterministic."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        mixture_sample_batch)
    n = 4000
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": ["up"] * (n // 2) + ["down"] * (n // 2),
    })
    f = {"up": 20, "down": 4}
    out = mixture_sample_batch(t, f).to_pandas()
    out2 = mixture_sample_batch(t, f).to_pandas()
    pd.testing.assert_frame_equal(out, out2)
    k = out.groupby("doc_id").size()
    up = k.reindex(range(n // 2), fill_value=0)
    down = k.reindex(range(n // 2, n), fill_value=0)
    assert set(up.unique()) <= {2, 3} and 0.4 < (up == 3).mean() < 0.6
    assert set(down.unique()) <= {0, 1} and 0.4 < down.mean() < 0.6
    for d, grp in out.groupby("doc_id"):
        assert sorted(grp["copy_idx"]) == list(range(len(grp)))
        if d >= 20:
            break


def test_cooccur_partial_counts_distinct_pairs():
    """Pair counts are DOC-distinct (a doc contributes a pair once no
    matter how often the tokens repeat), ordered a<b."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        _cooccur_partial)
    b = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["x y x y x", "y z"]})
    out = _cooccur_partial(b).to_pandas()
    got = {(r.ta, r.tb): r.partial_n for r in out.itertuples()}
    assert got == {("x", "y"): 1, ("y", "z"): 1}


def test_kmv_estimate_accuracy(ray_session, tmp_path):
    """KMV with K=64 estimates 10,000 distinct users within ~±25%
    (std err ≈ 1/√(K−2) ≈ 12.7%), and is exact below K."""
    import pyarrow.parquet as pq
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_kmv_distinct)
    n = 10_000
    t = pa.table({
        "event_id": pa.array(range(n + 10), pa.int64()),
        "ts": pa.array(np.zeros(n + 10, "datetime64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array(list(range(n)) + list(range(10)),
                            pa.int64()),
        "event_type": ["big"] * n + ["small"] * 10,
        "value": pa.array(np.zeros(n + 10), pa.float64()),
        "props": ['{"k": 1}'] * (n + 10),
    })
    pq.write_table(t, f"{tmp_path}/events.parquet")
    out = q_kmv_distinct(str(tmp_path)).to_pandas().set_index(
        "event_type")
    assert out.loc["small", "est_distinct"] == 10.0   # exact below K
    big = out.loc["big", "est_distinct"]
    assert 7_500 < big < 12_500


def test_write_shuffled_materializes_training_order(ray_session,
                                                    tmp_path):
    """write_shuffled's per-shard parquet must hold every doc exactly
    once, in exactly the (shard, pos) order q_shard_assign computes."""
    import ray.data
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_shard_assign, write_shuffled)
    out = f"{tmp_path}/shuffled"
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    write_shuffled(ds, out)
    assign = q_shard_assign(SF).to_pandas()
    import glob

    import pyarrow.parquet as pq
    seen = 0
    for d in sorted(glob.glob(f"{out}/shard=*")):
        shard = int(d.rsplit("=", 1)[1])
        files = sorted(glob.glob(f"{d}/*.parquet"))
        got = pd.concat([pq.read_table(f).to_pandas() for f in files],
                        ignore_index=True)
        want = assign[assign["shard"] == shard].sort_values("pos")
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), shard
        assert set(got.columns) >= {"doc_id", "text"}
        seen += len(got)
    assert seen == len(assign)


def test_bruteforce_topk_tie_break_under_duplicates():
    """A batch holding more identical vectors than k must keep the
    smallest neighbor ids, not an argpartition-arbitrary subset (the
    semantic-dedup corpus norm)."""
    import ray as _ray
    from asserts_otel_processor_ray.stages.similarity import (
        BruteForceTopK)
    vec = [1.0, 2.0, 3.0]
    ids = list(range(100, 108))
    batch = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([vec] * len(ids),
                              pa.list_(pa.float32())),
    })
    stage = BruteForceTopK(np.array([vec]), np.array([0]), k=5)
    out = stage(batch).to_pandas()
    assert out["neighbor_id"].tolist() == [100, 101, 102, 103, 104]


def test_shard_attach_rejects_column_collision():
    from asserts_otel_processor_ray.stages.text_analysis import (
        shard_attach)
    b = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "h": pa.array([9], pa.int64())})
    with pytest.raises(ValueError, match="rename"):
        shard_attach(b)


def test_rollup_levels_consistent(ray_session):
    """The three rollup granularities must be internally consistent:
    leaf counts sum to each type's row, type rows sum to the grand
    total, and max aggregates dominate their children."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        ROLLUP_ALL, q_rollup)
    out = q_rollup(SF).to_pandas()
    leaf = out[(out["event_type"] != ROLLUP_ALL) & (out["day_us"] >= 0)]
    lvl1 = out[(out["event_type"] != ROLLUP_ALL) & (out["day_us"] == -1)]
    lvl0 = out[out["event_type"] == ROLLUP_ALL]
    assert len(lvl0) == 1
    assert lvl0["n_events"].iloc[0] == leaf["n_events"].sum()
    per_type = leaf.groupby("event_type")["n_events"].sum()
    got = lvl1.set_index("event_type")["n_events"]
    assert got.sort_index().equals(per_type.sort_index())
    assert lvl0["max_value"].iloc[0] == leaf["max_value"].max()


def test_lag_stats_block_semantics():
    """Gaps are consecutive diffs under (ts, event_id) order; a
    single-event user reports zero gaps; ts ties yield zero-length
    gaps, not negatives."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        _lag_stats_block)
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [7, 7, 7, 8, 9],
        "ts": [100, 400, 400, 50, 0],
    })
    out = _lag_stats_block(df.sample(frac=1.0, random_state=3)) \
        .set_index("user_id")
    assert out.loc[7, "gap_sum_us"] == 300 and out.loc[7, "max_gap_us"] == 300
    assert out.loc[7, "first_ts"] == 100 and out.loc[7, "last_ts"] == 400
    assert out.loc[8, "gap_sum_us"] == 0 and out.loc[8, "n_events"] == 1
    assert out.loc[9, "max_gap_us"] == 0


def test_pivot_row_sums_match_lang_counts(ray_session, ducks):
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        PIVOT_SOURCES, q_pivot)
    out = q_pivot(SF).to_pandas().set_index("lang")
    want = ducks.sql(
        "SELECT lang, count(*) n FROM documents GROUP BY lang").df() \
        .set_index("lang")["n"]
    got = out[PIVOT_SOURCES].sum(axis=1)
    assert got.sort_index().astype(int).equals(
        want.sort_index().astype(int))


def test_bloom_semi_no_false_negatives(ray_session):
    """Bloom membership can only ADD events (false positives) relative
    to the exact semi-join — never lose a true buyer's event."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_bloom_semi, q_semi_join)
    bloom = q_bloom_semi(SF).to_pandas().set_index("event_type")
    exact = q_semi_join(SF).to_pandas().set_index("event_type")
    for et, row in exact.iterrows():
        assert bloom.loc[et, "maybe_buyer_events"] >= row["n_events"], et


def test_new_users_sum_is_distinct_users(ray_session, ducks):
    """Every user is new exactly once: Σ n_new_users == distinct
    users, regardless of day bucketing."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_new_users)
    out = q_new_users(SF).to_pandas()
    want = ducks.sql(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert out["n_new_users"].sum() == want


def test_basket_pairs_block_kernel():
    """The vectorized per-size pair template matches an explicit
    per-order enumeration, dups within an order collapse, and the
    packed key round-trips."""
    import itertools
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        _BASKET_PK_BASE, _basket_pairs_block)
    rng = np.random.RandomState(7)
    orders = np.repeat(np.arange(40), rng.randint(1, 8, 40))
    parts = rng.randint(1, 25, len(orders))
    df = pd.DataFrame({"l_orderkey": orders, "l_partkey": parts})
    got = _basket_pairs_block(df)
    want = {}
    for _, grp in df.groupby("l_orderkey"):
        for a, b in itertools.combinations(
                sorted(set(grp["l_partkey"])), 2):
            want[a * int(_BASKET_PK_BASE) + b] = \
                want.get(a * int(_BASKET_PK_BASE) + b, 0) + 1
    assert dict(zip(got["pk"], got["partial_c"])) == want
    # fail-loud outside the packable range (ADVICE r4 pattern)
    bad = pd.DataFrame({"l_orderkey": [1, 1],
                        "l_partkey": [2, int(_BASKET_PK_BASE) + 3]})
    with pytest.raises(ValueError):
        _basket_pairs_block(bad)


def test_anti_join_complements_orders(ray_session, ducks):
    """Anti-join size == customers − customers-with-orders, and no
    returned customer appears in orders."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_anti_join)
    out = q_anti_join(SF).to_pandas()
    n_cust, n_with = ducks.sql(
        "SELECT (SELECT count(*) FROM customer), "
        "count(DISTINCT o_custkey) FROM orders").fetchone()
    assert len(out) == n_cust - n_with
    buyers = set(ducks.sql(
        "SELECT DISTINCT o_custkey FROM orders").df()["o_custkey"])
    assert not (set(out["c_custkey"]) & buyers)


def test_ttr_bounds(ray_session):
    """0 < ttr <= 1 and n_types <= n_tokens on every document."""
    from asserts_otel_processor_ray.pipelines.extra_queries import q_ttr
    out = q_ttr(SF).to_pandas()
    assert len(out) > 0
    assert (out["n_types"] <= out["n_tokens"]).all()
    assert ((out["ttr"] > 0) & (out["ttr"] <= 1.0)).all()


def test_value_histogram_preserves_total(ray_session, ducks):
    """Binning loses no rows: Σ n_events == count(events)."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        HIST_NBINS, q_value_histogram)
    out = q_value_histogram(SF).to_pandas()
    total = ducks.sql("SELECT count(*) FROM events").fetchone()[0]
    assert out["n_events"].sum() == total
    assert out["bin"].between(0, HIST_NBINS - 1).all()


def test_ntile_bucket_matches_duckdb(ducks):
    """_ntile_bucket reproduces ANSI ntile(k) for every n in 1..25,
    including n < k (one row per bucket) and ragged remainders."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        _ntile_bucket)
    for n in range(1, 26):
        want = ducks.sql(
            f"SELECT ntile(4) OVER (ORDER BY r) FROM range({n}) t(r)"
        ).df().iloc[:, 0].to_numpy(np.int64)
        got = _ntile_bucket(np.arange(n, dtype=np.int64), n, 4)
        assert (got == want).all(), n


def test_edit_distance_kernel_matches_duckdb(ducks):
    """Vectorized row-DP Levenshtein == DuckDB levenshtein over fuzzed
    pairs plus the degenerate shapes (empty/one-sided/equal)."""
    from asserts_otel_processor_ray.stages.dedup import (
        edit_distances_vectorized)
    rng = np.random.RandomState(3)
    alph = list("abcde ")
    pairs = [("".join(rng.choice(alph, rng.randint(0, 20))),
              "".join(rng.choice(alph, rng.randint(0, 20))))
             for _ in range(200)]
    pairs += [("", ""), ("abc", ""), ("", "xyz"), ("same", "same")]
    got = edit_distances_vectorized(
        np.array([p[0] for p in pairs]),
        np.array([p[1] for p in pairs]), 32)
    want = np.array([ducks.execute(
        "SELECT levenshtein(?, ?)", [x, y]).fetchone()[0]
        for x, y in pairs])
    assert (got == want).all()


def test_user_mode_majority(ray_session, ducks):
    """The mode count is the max per-user count and every user
    appears exactly once."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_user_mode)
    out = q_user_mode(SF).to_pandas()
    assert out["user_id"].is_unique
    want = ducks.sql(
        "SELECT user_id, max(n) FROM (SELECT user_id, event_type, "
        "count(*) AS n FROM events GROUP BY 1,2) GROUP BY 1").df()
    want.columns = ["user_id", "max_n"]
    m = out.merge(want, on="user_id")
    assert (m["n"] == m["max_n"]).all()


def test_cube_grand_total(ray_session, ducks):
    """CUBE's four granularities are mutually consistent: each slice
    sums to the grand total."""
    from asserts_otel_processor_ray.pipelines.extra_queries import q_cube
    out = q_cube(SF).to_pandas()
    total = ducks.sql("SELECT count(*) FROM events").fetchone()[0]
    grand = out[out["event_type"].isna() & out["weekday"].isna()]
    assert len(grand) == 1 and grand["n_events"].iloc[0] == total
    leaf = out[out["event_type"].notna() & out["weekday"].notna()]
    assert leaf["n_events"].sum() == total
    by_t = out[out["event_type"].notna() & out["weekday"].isna()]
    by_w = out[out["event_type"].isna() & out["weekday"].notna()]
    assert by_t["n_events"].sum() == total == by_w["n_events"].sum()


def test_q4_exists_equals_max_reduction(ray_session, ducks):
    """EXISTS(shipdate > orderdate+60d) == max-shipdate reduction:
    totals agree with a direct DuckDB count."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_q4_priority)
    out = q_q4_priority(SF).to_pandas()
    want = ducks.sql(
        "SELECT count(DISTINCT o_orderkey) FROM orders o JOIN lineitem l "
        "ON l.l_orderkey = o.o_orderkey "
        "WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY"
    ).fetchone()[0]
    assert out["n_orders"].sum() == want


def test_embed_clusters_ids_are_members(ray_session):
    """Every cluster id is the min vec_id of its own cluster and a
    member of it (component-min labeling invariant)."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_embed_clusters)
    out = q_embed_clusters(SF).to_pandas()
    assert len(out) > 0
    m = out.groupby("cluster_id")["vec_id"].min()
    assert (m.index.to_numpy() == m.to_numpy()).all()


def test_pq_codes_shape_and_determinism(ray_session):
    """Every vector gets exactly one in-range code per subspace, and
    the encoding is deterministic across runs (seeded codebooks)."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_pq_codes)
    from asserts_otel_processor_ray.stages.similarity import PQ_KSUB, PQ_M
    a = q_pq_codes(SF).to_pandas().sort_values(
        ["vec_id", "subspace"], ignore_index=True)
    assert a["code"].between(0, PQ_KSUB - 1).all()
    per_vec = a.groupby("vec_id").size()
    assert (per_vec == PQ_M).all()
    b = q_pq_codes(SF).to_pandas().sort_values(
        ["vec_id", "subspace"], ignore_index=True)
    assert a.equals(b)


def test_lang_confusion_diagonal_dominant(ray_session, ducks):
    """Totals match the corpus and the matrix row sums equal per-lang
    doc counts."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_lang_confusion)
    out = q_lang_confusion(SF).to_pandas()
    want = ducks.sql(
        "SELECT lang, count(*) FROM documents GROUP BY 1").df()
    want.columns = ["lang", "n"]
    rows = out.groupby("lang")["n_docs"].sum().reset_index()
    m = rows.merge(want, on="lang", how="outer")
    assert (m["n_docs"] == m["n"]).all()


def test_attribution_touch_precedes_purchase(ray_session, ducks):
    """Every attributed touch strictly precedes its purchase in
    (ts, event_id) order and is never itself a purchase."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_attribution)
    out = q_attribution(SF).to_pandas()
    assert len(out) > 0
    assert (out["touch_type"] != "purchase").all()
    ev = ducks.sql(
        "SELECT event_id, epoch_us(ts) AS us FROM events").df() \
        .set_index("event_id")["us"]
    pu = ev.reindex(out["purchase_id"]).to_numpy()
    tu = ev.reindex(out["touch_id"]).to_numpy()
    assert ((tu < pu) | ((tu == pu)
            & (out["touch_id"].to_numpy()
               < out["purchase_id"].to_numpy()))).all()


def test_transitions_conserve_events(ray_session, ducks):
    """Σ transition counts == total events − distinct users (each
    user's first event has no predecessor)."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_transitions)
    out = q_transitions(SF).to_pandas()
    tot, users = ducks.sql(
        "SELECT count(*), count(DISTINCT user_id) FROM events").fetchone()
    assert out["n"].sum() == tot - users


def test_bigrams_partial_adjacency():
    """The per-batch bigram partial never crosses document
    boundaries."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_bigrams)  # noqa: F401 — import exercises registration
    import pyarrow as pa_
    from asserts_otel_processor_ray.stages import text_analysis as T_
    t = pa_.table({"doc_id": [1, 2], "text": ["a b", "c d"]})
    toks = T_._tokens_series(t.column("text"))
    ex = toks.explode()
    rows = ex.index.to_numpy()
    w = ex.to_numpy()
    same = rows[1:] == rows[:-1]
    big = [f"{x} {y}" for x, y, s in zip(w[:-1], w[1:], same) if s]
    assert big == ["a b", "c d"]


def test_order_sizes_totals(ray_session, ducks):
    """Σ n_lines·n_orders == lineitem rows; Σ n_orders == orders with
    lines."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_order_sizes)
    out = q_order_sizes(SF).to_pandas()
    nl, no = ducks.sql("SELECT count(*), count(DISTINCT l_orderkey) "
                       "FROM lineitem").fetchone()
    assert (out["n_lines"] * out["n_orders"]).sum() == nl
    assert out["n_orders"].sum() == no


def test_stickiness_bounds_and_day1(ray_session, ducks):
    """dau <= wau (window contains the day), stickiness in (0, 1],
    and Σ over isolated single-day users stays consistent with the
    distinct-user total."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_stickiness)
    out = q_stickiness(SF).to_pandas()
    assert len(out) > 0
    assert (out["dau"] <= out["wau"]).all()
    assert ((out["stickiness"] > 0) & (out["stickiness"] <= 1.0)).all()
    want_days = ducks.sql(
        "SELECT count(DISTINCT epoch_us(ts) // 86400000000) FROM events"
    ).fetchone()[0]
    assert len(out) == want_days


def test_session_sizes_totals(ray_session, ducks):
    """Σ n_events·n_sessions == total events."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_session_sizes)
    out = q_session_sizes(SF).to_pandas()
    total = ducks.sql("SELECT count(*) FROM events").fetchone()[0]
    assert (out["n_events"] * out["n_sessions"]).sum() == total


def test_top_customers_exact(ray_session, ducks):
    """Two-phase top-K over partition-disjoint keys == global top-K."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        TOPCUST_K, q_top_customers)
    out = q_top_customers(SF).to_pandas()
    want = ducks.sql(
        f"SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1 "
        f"ORDER BY n DESC, o_custkey LIMIT {TOPCUST_K}").df()
    assert out["c_custkey"].tolist() == want["o_custkey"].tolist()
    assert out["n_orders"].tolist() == want["n"].tolist()


def test_len_deciles_monotone(ray_session, ducks):
    """Nine cut points, nondecreasing, each an existing n_chars
    value."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_len_deciles)
    out = q_len_deciles(SF).to_pandas()
    assert len(out) == 9
    assert (np.diff(out["n_chars"].to_numpy()) >= 0).all()
    vals = set(ducks.sql(
        "SELECT DISTINCT n_chars FROM documents").df()["n_chars"])
    assert set(out["n_chars"]) <= vals


def test_norm_histogram_totals(ray_session, ducks):
    """Binning loses no vectors."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_norm_histogram)
    out = q_norm_histogram(SF).to_pandas()
    total = ducks.sql("SELECT count(*) FROM embeddings").fetchone()[0]
    assert out["n_vectors"].sum() == total


def test_dup_rate_totals(ray_session, ducks):
    """Per-source doc totals match and 0 <= dup_rate < 1."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_dup_rate)
    out = q_dup_rate(SF).to_pandas()
    want = ducks.sql("SELECT source, count(*) AS n FROM documents "
                     "GROUP BY 1").df()
    m = out.merge(want, on="source")
    assert (m["n_docs"] == m["n"]).all()
    assert ((out["dup_rate"] >= 0) & (out["dup_rate"] < 1)).all()
    assert (out["n_distinct"] <= out["n_docs"]).all()


def test_custdist_covers_all_customers(ray_session, ducks):
    """Σ custdist == customer count (the zero-order cohort is in)."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_custdist)
    out = q_custdist(SF).to_pandas()
    n_cust = ducks.sql("SELECT count(*) FROM customer").fetchone()[0]
    assert out["custdist"].sum() == n_cust


def test_winsorize_bounds(ray_session, ducks):
    """Clipped mean sits inside the raw min/max and totals match."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_winsorize)
    out = q_winsorize(SF).to_pandas()
    lo, hi, n = ducks.sql(
        "SELECT min(n_chars), max(n_chars), count(*) FROM documents"
    ).fetchone()
    assert out["n_docs"].sum() == n
    assert out["mean_clipped"].between(lo, hi).all()


def test_novelty_first_doc_is_fully_novel(ray_session):
    """The corpus-min doc_id owns all its shingles; novelty bounds
    hold everywhere."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_novelty)
    out = q_novelty(SF).to_pandas()
    assert len(out) > 0
    assert ((out["novelty"] >= 0) & (out["novelty"] <= 1)).all()
    assert (out["n_novel"] <= out["n_shingles"]).all()
    first = out.loc[out["doc_id"].idxmin()]
    assert first["n_novel"] == first["n_shingles"]


def test_ann_recall_matches_pinned_recall(ray_session):
    """Mean recall@5 here equals the recall the LSH tests pin
    (1.0 at gate data), and never exceeds 1."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_ann_recall)
    out = q_ann_recall(SF).to_pandas()
    assert (out["recall"] <= 1.0).all()
    assert out["recall"].mean() >= 0.8


def test_ivf_sizes_cover_corpus(ray_session, ducks):
    """Every vector lands in exactly one list."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_ivf_sizes)
    out = q_ivf_sizes(SF).to_pandas()
    total = ducks.sql("SELECT count(*) FROM embeddings").fetchone()[0]
    assert out["n_vectors"].sum() == total
    assert out["list_id"].between(0, 15).all()


def test_conversion_lag_nonnegative(ray_session, ducks):
    """First purchase cannot precede the first event; buyer count
    matches."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_conversion_lag)
    out = q_conversion_lag(SF).to_pandas()
    assert (out["lag_days"] >= 0).all()
    buyers = ducks.sql(
        "SELECT count(DISTINCT user_id) FROM events "
        "WHERE event_type = 'purchase'").fetchone()[0]
    assert out["n_users"].sum() == buyers


def test_bool_search_is_conjunctive(ray_session, ducks):
    """Result ⊆ each single-term result set."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        SEARCH_TERMS, q_bool_search)
    out = set(q_bool_search(SF).to_pandas()["doc_id"])
    for w in SEARCH_TERMS:
        single = set(ducks.sql(
            "SELECT doc_id FROM documents WHERE list_contains("
            f"regexp_split_to_array(trim(lower(text)), '\\s+'), '{w}')"
        ).df()["doc_id"])
        assert out <= single


def test_ab_split_stable_and_total(ray_session, ducks):
    """Assignment is a pure function of user_id (two runs identical)
    and both arms together cover every event."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_ab_split)
    a = q_ab_split(SF).to_pandas()
    b = q_ab_split(SF).to_pandas()
    assert a.equals(b)
    total = ducks.sql("SELECT count(*) FROM events").fetchone()[0]
    assert a["n_events"].sum() == total
    assert set(a["arm"]) <= {0, 1}


def test_user_journey_totals(ray_session, ducks):
    """Journeys partition users: the full (uncapped) count equals the
    distinct-user total; the capped result is a prefix of it."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_user_journey)
    out = q_user_journey(SF).to_pandas()
    users = ducks.sql(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert out["n_users"].sum() <= users
    assert (out["n_users"].to_numpy()[:-1]
            >= out["n_users"].to_numpy()[1:]).all()


def test_incremental_dedup_no_reference_text(ray_session, ducks):
    """No surviving new doc shares normalized text with the reference
    half, and every dropped odd doc does."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_incremental_dedup)
    out = set(q_incremental_dedup(SF).to_pandas()["doc_id"])
    norm = ducks.sql(
        "SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', "
        "'g')) AS tn FROM documents").df()
    ref = set(norm.loc[norm["doc_id"] % 2 == 0, "tn"])
    odd = norm[norm["doc_id"] % 2 == 1]
    survived = odd[odd["doc_id"].isin(out)]
    dropped = odd[~odd["doc_id"].isin(out)]
    assert not (set(survived["tn"]) & ref)
    assert set(dropped["tn"]) <= ref


def test_region_orders_totals(ray_session, ducks):
    """Five regions, totals equal the order count."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_region_orders)
    out = q_region_orders(SF).to_pandas()
    total = ducks.sql("SELECT count(*) FROM orders").fetchone()[0]
    assert out["n_orders"].sum() == total
    assert len(out) == 5


def test_promo_revenue_paths_match(ray_session):
    """Broadcast-gather and distributed-join paths of the Q14 analog
    produce the identical single-row frame."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_promo_revenue)
    a = q_promo_revenue(SF).to_pandas()
    b = q_promo_revenue(SF, force_join=True).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert 0.0 <= a["promo_share_pct"].iloc[0] <= 100.0


def test_q5_volume_totals(ray_session, ducks):
    """Every output nation is real, revenue is positive, and the line
    count equals the co-located join cardinality."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        Q5_HI, Q5_LO, q_q5_volume)
    out = q_q5_volume(SF).to_pandas()
    assert len(out) <= 25 and (out["revenue"] > 0).all()
    total = ducks.sql(f"""
        SELECT count(*) FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey = s.s_nationkey
          AND o.o_orderdate >= TIMESTAMP '{Q5_LO}'
          AND o.o_orderdate < TIMESTAMP '{Q5_HI}'""").fetchone()[0]
    assert out["n_lines"].sum() == total


def test_moving_avg_matches_pandas_rolling(ray_session, ducks):
    """The distributed ROWS-frame kernel equals pandas' rolling mean
    (computed on exact cents) for every user."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_moving_avg)
    out = q_moving_avg(SF).to_pandas().set_index("event_id")["mov_avg"]
    ev = ducks.sql(
        "SELECT event_id, ts, user_id, value FROM events").df()
    ev["cents"] = np.rint(ev["value"] * 100).astype(np.int64)
    ev = ev.sort_values(["user_id", "ts", "event_id"],
                        kind="mergesort")
    exp = ev.groupby("user_id", sort=False)["cents"] \
        .rolling(4, min_periods=1).sum().reset_index(drop=True)
    nwin = ev.groupby("user_id", sort=False).cumcount().clip(upper=3) + 1
    want = exp.to_numpy() / (100.0 * nwin.to_numpy())
    got = out.reindex(ev["event_id"]).to_numpy()
    assert np.array_equal(got, want)


def test_dup_gram_coverage_bounds_and_exact_dups(ray_session, ducks):
    """Coverage is a valid fraction, and exact-duplicate documents
    (normalized text shared with another doc) have coverage 1.0 —
    every one of their shingles occurs in >= 2 docs."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_dup_gram_coverage)
    out = q_dup_gram_coverage(SF).to_pandas()
    assert ((out["dup_coverage"] >= 0) & (out["dup_coverage"] <= 1)).all()
    assert (out["n_dup"] <= out["n_grams"]).all()
    dups = ducks.sql("""
        WITH n AS (SELECT doc_id,
            trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS tn
          FROM documents)
        SELECT doc_id FROM n
        WHERE tn IN (SELECT tn FROM n GROUP BY tn HAVING count(*) > 1)
        """).df()["doc_id"]
    if len(dups):
        sub = out.set_index("doc_id").loc[dups, "dup_coverage"]
        assert (sub == 1.0).all()


def test_spikes_above_mean(ray_session, ducks):
    """Every flagged minute's count strictly exceeds its type's mean
    count over observed minutes (z > 2 implies above mean)."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_spikes)
    out = q_spikes(SF).to_pandas()
    means = ducks.sql("""
        WITH m AS (SELECT event_type,
            CAST(epoch_us(ts) // 60000000 AS BIGINT) AS minute,
            count(*) AS c FROM events GROUP BY 1, 2)
        SELECT event_type, avg(c) AS mu FROM m GROUP BY 1""").df() \
        .set_index("event_type")["mu"]
    assert (out["z"] > 2.0).all()
    for _, r in out.iterrows():
        assert r["n_events"] > means[r["event_type"]]


def test_big_orders_matches_direct_having(ray_session, ducks):
    """The distributed HAVING filter returns exactly the orders DuckDB
    finds, with correct totals."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        BIG_ORDER_QTY, q_big_orders)
    out = q_big_orders(SF).to_pandas()
    want = ducks.sql(f"""
        SELECT l_orderkey, sum(CAST(round(l_quantity) AS BIGINT)) AS tq
        FROM lineitem GROUP BY 1
        HAVING sum(CAST(round(l_quantity) AS BIGINT)) > {BIG_ORDER_QTY}
        """).df().set_index("l_orderkey")["tq"]
    assert set(out["o_orderkey"]) == set(want.index)
    got = out.set_index("o_orderkey")["total_qty"]
    assert (got.sort_index() == want.sort_index()).all()


def test_containment_dominates_jaccard(ray_session):
    """Containment >= jaccard for every pair both metrics emit (the
    min-size denominator can only grow the score), and every emitted
    jaccard pair reappears in the containment set at a lower-or-equal
    threshold."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_containment_pairs, q_ngram_jaccard)
    c = q_containment_pairs(SF).to_pandas().set_index(
        ["doc_a", "doc_b"])["containment"]
    j = q_ngram_jaccard(SF).to_pandas().set_index(
        ["doc_a", "doc_b"])["jaccard"]
    assert ((c >= 0.6) & (c <= 1.0 + 1e-12)).all()
    shared = c.index.intersection(j.index)
    assert (c[shared] >= j[shared] - 1e-12).all()
    assert set(j[j >= 0.6].index) <= set(c.index)


def test_range_join_matches_bruteforce(ray_session, ducks):
    """The searchsorted interval-join kernel equals a brute-force
    per-purchase window scan."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        RANGE_JOIN_WINDOW_S, q_range_join)
    out = q_range_join(SF).to_pandas().set_index("event_id")
    ev = ducks.sql("SELECT event_id, ts, user_id, event_type, value "
                   "FROM events").df()
    ev["tsus"] = ev["ts"].astype("int64")
    clicks = ev[ev["event_type"] == "click"]
    w = RANGE_JOIN_WINDOW_S * 1_000_000
    for _, p in ev[ev["event_type"] == "purchase"].head(200).iterrows():
        m = clicks[(clicks["user_id"] == p["user_id"])
                   & (clicks["tsus"] >= p["tsus"] - w)
                   & (clicks["tsus"] < p["tsus"])]
        r = out.loc[p["event_id"]]
        assert r["n_clicks"] == len(m)
        assert r["click_value_sum"] == np.rint(
            m["value"] * 100).astype(np.int64).sum() / 100.0


def test_hub_degree_mass_conservation(ray_session):
    """Σ(in_degree × n_vectors) equals the edge count (every kNN edge
    lands on exactly one neighbor)."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_hub_degree, q_knn_graph)
    edges = q_knn_graph(SF).to_pandas()
    hist = q_hub_degree(SF).to_pandas()
    assert (hist["in_degree"] * hist["n_vectors"]).sum() == len(edges)


def test_hourly_heatmap_totals(ray_session, ducks):
    """Heatmap cells tile the stream: totals match, hours in [0, 24)."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_hourly_heatmap)
    out = q_hourly_heatmap(SF).to_pandas()
    total = ducks.sql("SELECT count(*) FROM events").fetchone()[0]
    assert out["n_events"].sum() == total
    assert out["hour"].between(0, 23).all()


def test_turn_dedup_matches_duckdb(ray_session):
    """Top-k repeated turns equal DuckDB's over the sf0.001 transcript
    fixture (the oracle registered with the driver is pinned to the
    sf0.01 path, so pytest checks the parametric path here)."""
    import duckdb
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        TURN_DEDUP_K, q_turn_dedup)
    from asserts_otel_processor_ray.sources.synthetic import (
        ensure_transcripts)
    out = q_turn_dedup(SF).to_pandas()
    path = ensure_transcripts(SF)
    want = duckdb.sql(f"""
        WITH t AS (SELECT text, count(*) AS n_occurrences,
            count(DISTINCT conv_id) AS n_convs
          FROM read_parquet('{path}/*.parquet') GROUP BY text)
        SELECT text, n_occurrences, n_convs FROM (
          SELECT *, row_number() OVER (
            ORDER BY n_occurrences DESC, text) AS rn
          FROM t) WHERE rn <= {TURN_DEDUP_K}""").df()
    for c in ("n_occurrences", "n_convs"):
        want[c] = want[c].astype(np.int64)
    pd.testing.assert_frame_equal(out.reset_index(drop=True), want)


def test_prefix_dup_consistent_with_exact_dedup(ray_session, ducks):
    """Every exact-duplicate group is contained in some prefix group
    (same normalized text ⇒ same prefix), and group sizes cover all
    docs sharing that prefix."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        PREFIX_DUP_LEN, q_prefix_dup)
    out = q_prefix_dup(SF).to_pandas()
    assert (out["n_docs"] >= 2).all()
    want = ducks.sql(f"""
        WITH p AS (SELECT doc_id,
            substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                   1, {PREFIX_DUP_LEN}) AS prefix
          FROM documents)
        SELECT prefix, count(*) AS n FROM p
        GROUP BY prefix HAVING count(*) >= 2""").df()
    assert dict(zip(out["prefix"], out["n_docs"])) == dict(
        zip(want["prefix"], want["n"].astype(np.int64)))


def test_gram_matches_numpy_and_is_batch_invariant(ray_session):
    """The distributed Gram partials must add to the single-process
    quantized Xᵀ X regardless of block layout."""
    import pyarrow.parquet as pq
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        GRAM_SCALE, q_gram)
    out = q_gram(SF).to_pandas()
    m = np.array(pq.read_table(f"{SF}/embeddings.parquet")
                 .column("embedding").to_pylist(), dtype=np.float64)
    q = np.floor(m * GRAM_SCALE).astype(np.int64)
    g = q.T @ q
    iu, ju = np.triu_indices(g.shape[0])
    want = {(i + 1, j + 1): int(g[i, j]) for i, j in zip(iu, ju)}
    got = {(int(r.dim_i), int(r.dim_j)): int(r.gram)
           for r in out.itertuples()}
    assert got == want
    assert (out["n"] == m.shape[0]).all()


def test_argmax_last_total_order():
    """Ties on cents fall to the later ts, then the larger event_id —
    and the kernel is associative (partial-of-partials == whole)."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        _argmax_last)
    uid = np.array([7, 7, 7, 9], np.int64)
    ts = np.array([10, 20, 20, 5], np.int64)
    eid = np.array([1, 2, 3, 4], np.int64)
    cents = np.array([50, 50, 50, 1], np.int64)
    sel = _argmax_last(uid, ts, eid, cents)
    picked = sorted(zip(uid[sel], eid[sel]))
    assert picked == [(7, 3), (9, 4)]   # ts tie → larger event_id
    half1 = _argmax_last(uid[:2], ts[:2], eid[:2], cents[:2])
    half2 = _argmax_last(uid[2:], ts[2:], eid[2:], cents[2:])
    muid = np.concatenate([uid[:2][half1], uid[2:][half2]])
    mts = np.concatenate([ts[:2][half1], ts[2:][half2]])
    meid = np.concatenate([eid[:2][half1], eid[2:][half2]])
    mc = np.concatenate([cents[:2][half1], cents[2:][half2]])
    sel2 = _argmax_last(muid, mts, meid, mc)
    assert sorted(zip(muid[sel2], meid[sel2])) == picked


def test_label_centroids_match_numpy(ray_session):
    """The quantized-sum cosine must equal the single-process numpy
    computation over the same quantization (exact ints end-to-end)."""
    import math
    import pyarrow.parquet as pq
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        GRAM_SCALE, q_label_centroids)
    out = q_label_centroids(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["label", "embedding"])
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    lab = t.column("label").to_numpy().astype(np.int64)
    q = np.floor(m * GRAM_SCALE).astype(np.int64)
    sums = {int(l): q[lab == l].sum(axis=0, dtype=object)
            for l in np.unique(lab)}
    for r in out.itertuples():
        a, b = sums[int(r.label_a)], sums[int(r.label_b)]
        dot = int(np.dot(a, b))
        na = int(np.dot(a, a))
        nb = int(np.dot(b, b))
        want = float(dot) / (math.sqrt(float(na)) * math.sqrt(float(nb)))
        assert r.cos_sim == want
        assert -1.0 <= r.cos_sim <= 1.0


def test_minhash_recall_bounds_and_hit_consistency(ray_session):
    """Composed dedup-eval metric: counts reconcile and the LSH
    candidate set recovers most exact near-dup pairs on this data."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_minhash_recall)
    r = q_minhash_recall(SF).to_pandas().iloc[0]
    assert 0 <= r.n_hit <= min(r.n_true, r.n_pred)
    assert 0.0 <= r.precision <= 1.0 and 0.0 <= r.recall <= 1.0
    if r.n_true:
        assert r.recall >= 0.6


def test_outliers_flag_only_low_cosine(ray_session):
    """Every flagged vector sits strictly below τ, and no unflagged
    vector does (recomputed single-process)."""
    import math
    import pyarrow.parquet as pq
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        GRAM_SCALE, OUTLIER_TAU, q_embed_outliers)
    out = q_embed_outliers(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet")
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    lab = t.column("label").to_numpy().astype(np.int64)
    vid = t.column("vec_id").to_numpy()
    q = np.floor(m * GRAM_SCALE).astype(np.int64)
    flagged = set()
    for l in np.unique(lab):
        rows = lab == l
        s = [int(v) for v in q[rows].sum(axis=0)]
        sn = math.sqrt(float(sum(x * x for x in s)))
        for i in np.where(rows)[0]:
            dot = float(int(np.dot(q[i], np.array(s, object))))
            qn = math.sqrt(float(int(np.dot(q[i], q[i]))))
            if dot / (qn * sn) < OUTLIER_TAU:
                flagged.add(int(vid[i]))
    assert set(out["vec_id"]) == flagged
    assert (out["cos_sim"] < OUTLIER_TAU).all()


def test_vocab_growth_sums_to_vocab(ray_session, ducks):
    """Bucket counts must partition the vocabulary: every token is
    attributed to exactly one first-doc bucket."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_vocab_growth)
    out = q_vocab_growth(SF).to_pandas()
    vocab = ducks.sql(r"""SELECT count(DISTINCT token) FROM (
        SELECT unnest(regexp_split_to_array(trim(lower(text)),
                                            '\s+')) AS token
        FROM documents)""").fetchone()[0]
    assert int(out["new_tokens"].sum()) == int(vocab)
    assert (out["new_tokens"] > 0).all()


def test_hive_roundtrip_writes_one_dir_per_lang(ray_session, ducks):
    """The sink must lay out one partition directory per lang and the
    pruned read-back must touch only the selected one."""
    import os
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_hive_roundtrip)
    q_hive_roundtrip(SF)
    langs = {r[0] for r in ducks.sql(
        "SELECT DISTINCT lang FROM documents").fetchall()}
    dirs = {d.split("=", 1)[1] for d in os.listdir("/tmp/aop_hive_docs")
            if d.startswith("lang=")}
    assert dirs == langs


def test_knn_confusion_mass_matches_heldout(ray_session, ducks):
    """Confusion-matrix mass = number of held-out vectors, and its
    diagonal+off-diagonal reconcile with e_knn_label's predictions."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_knn_confusion)
    out = q_knn_confusion(SF).to_pandas()
    n_held = ducks.sql(
        "SELECT count(*) FROM embeddings WHERE vec_id >= 100"
    ).fetchone()[0]
    assert int(out["n"].sum()) == int(n_held)
    assert (out["n"] > 0).all()


def test_top3_kernel_associative_and_ranked():
    """Grouped top-k kernel: ranks are 1..k per user in the total
    order, and kernel(kernel(half1)+kernel(half2)) == kernel(whole)."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        _top3_kernel)
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "event_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "ts": pa.array([5, 6, 7, 8, 9], pa.int64()).cast(
            pa.timestamp("us")),
        "value": pa.array([1.0, 3.0, 3.0, 2.0, 7.0], pa.float64())})
    whole = _top3_kernel(t).to_pandas().sort_values(
        ["user_id", "rnk"]).reset_index(drop=True)
    # user 1: 3.00 ties → later ts first (event 12 then 11), then 2.00
    assert list(whole[whole.user_id == 1]["event_id"]) == [12, 11, 13]
    assert list(whole[whole.user_id == 1]["rnk"]) == [1, 2, 3]
    h1 = _top3_kernel(t.slice(0, 2))
    h2 = _top3_kernel(t.slice(2))
    merged = _top3_kernel(pa.concat_tables([h1, h2])).to_pandas() \
        .sort_values(["user_id", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(whole, merged)


def test_cohort_matrix_consistent_with_retention(ray_session):
    """The matrix's column sums (distinct users active per week) must
    equal g_retention's n_active, and no cell precedes its cohort."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_cohort_matrix, q_retention)
    m = q_cohort_matrix(SF).to_pandas()
    r = q_retention(SF).to_pandas()
    assert (m["active_week"] >= m["cohort_week"]).all()
    col = m.groupby("active_week")["n_users"].sum()
    want = dict(zip(r["week_bucket"], r["n_active"]))
    assert dict(col) == want


def test_knn_purity_bounds(ray_session):
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_knn_purity)
    p = q_knn_purity(SF).to_pandas()
    assert (p["n_same"] <= p["n_edges"]).all()
    assert ((p["purity"] >= 0) & (p["purity"] <= 1)).all()


def test_key_skew_consistent_with_distinct_users(ray_session, ducks):
    """n_keys per type == exact COUNT(DISTINCT user_id); shares and
    effective-key counts sit in their algebraic bounds."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_key_skew)
    s = q_key_skew(SF).to_pandas()
    want = dict(ducks.sql(
        "SELECT event_type, count(DISTINCT user_id) FROM events "
        "GROUP BY 1").fetchall())
    assert dict(zip(s["event_type"], s["n_keys"])) == want
    assert ((s["eff_keys"] <= s["n_keys"] + 1e-9)
            & (s["eff_keys"] >= 1.0 - 1e-9)).all()
    assert ((s["top_share"] > 0) & (s["top_share"] <= 1)).all()


def test_ooo_ratio_bucket_width_invariant(ray_session):
    """The distributed prefix decomposition must be exact: any bucket
    width gives the same audit as any other."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_ooo_ratio)
    a = q_ooo_ratio(SF, width=64).to_pandas()
    b = q_ooo_ratio(SF, width=100_000_000).to_pandas()  # 1 bucket
    pd.testing.assert_frame_equal(a, b)


def test_ooo_block_audit_seeded_prefix():
    """A bucket's running max must be seeded by earlier buckets' max
    (prefix dict), not restart at -inf."""
    from asserts_otel_processor_ray.stages.events import ooo_block_audit
    t = pa.table({
        "event_id": pa.array([10, 11], pa.int64()),
        "event_type": ["a", "a"],
        "ts": pa.array([5, 6], pa.int64()).cast(pa.timestamp("us")),
    })
    # without prefix: nothing late; with prefix max 100: both late
    no = ooo_block_audit(t, 4, {}).to_pydict()
    assert no["n_late"] == [0]
    yes = ooo_block_audit(t, 4, {("a", 2): 100}).to_pydict()
    assert yes["n_late"] == [2] and yes["max_late_us"] == [95]


def test_model_filter_score_matches_reference_math(ray_session):
    """Recompute one doc's score token-by-token with the plain-Python
    reference of the hash chain; the kept flag must be score >= 0."""
    import hashlib
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        q_model_filter)
    from asserts_otel_processor_ray.stages.text_analysis import (
        _MOD, MODEL_A1, MODEL_A2, MODEL_B1, MODEL_W_SPAN)
    import duckdb as _dd
    out = q_model_filter(SF).to_pandas()
    assert (out["kept"] == (out["score"] >= 0)).all()
    row = out.iloc[0]
    text = _dd.sql(
        f"SELECT text FROM read_parquet('{SF}/documents.parquet') "
        f"WHERE doc_id = {int(row['doc_id'])}").fetchone()[0]
    score = 0
    for tok in text.strip().lower().split():
        h = int.from_bytes(
            hashlib.md5(tok.encode()).digest()[:8], "big") % _MOD
        h = (h * MODEL_A1 + MODEL_B1) % _MOD
        h ^= h >> 31
        h = (h * MODEL_A2) % _MOD
        h ^= h >> 29
        score += h % MODEL_W_SPAN - (MODEL_W_SPAN - 1) // 2
    assert score == int(row["score"])


def test_latency_quantiles_shape(ray_session):
    """Percentiles are monotone and n_turns reconciles with the
    decided turn count (full value parity is the e2e oracle test)."""
    from asserts_otel_processor_ray.pipelines.queries import (
        artifacts, q_latency_quantiles)
    sf = "/tmp/graft_sf/sf0.0003"
    q = q_latency_quantiles(sf).to_pandas()
    assert (q["p50_us"] <= q["p90_us"]).all()
    assert (q["p90_us"] <= q["p99_us"]).all()
    assert int(q["n_turns"].sum()) == \
        artifacts(sf)["decided_tbl"].num_rows


def test_q12_counts_reconcile(ray_session, ducks):
    """high + low line counts == total 1996-shipped join cardinality."""
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        _Q12_HI_US, _Q12_LO_US, q_q12_priority)
    out = q_q12_priority(SF).to_pandas()
    total = ducks.sql(
        f"SELECT count(*) FROM lineitem JOIN orders "
        f"ON l_orderkey = o_orderkey "
        f"WHERE epoch_us(l_shipdate) >= {_Q12_LO_US} "
        f"AND epoch_us(l_shipdate) < {_Q12_HI_US}").fetchone()[0]
    assert int((out["high_line_count"] + out["low_line_count"]).sum()) \
        == int(total)


def test_mad_median_semantics(ray_session):
    """MAD must be the discrete median of |value − median| — pinned
    against a brute-force pandas recompute of one event type."""
    import pyarrow.parquet as pq
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        _median_from_counts, q_mad)
    out = q_mad(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    et = out["event_type"].iloc[0]
    v = np.sort(ev.loc[ev.event_type == et, "value"].to_numpy())
    n = len(v)
    med = v[(50 * n + 99) // 100 - 1]
    av = np.sort(np.abs(v - med))
    mad = av[(50 * n + 99) // 100 - 1]
    row = out[out.event_type == et].iloc[0]
    assert row["med"] == med and row["mad"] == mad
    assert int(row["n_events"]) == n


def test_mad_outliers_consistent_with_mad(ray_session):
    """Outlier shares are in [0, 1); a zero-MAD type would flag every
    off-median value, so reconcile counts against a brute recompute."""
    import pyarrow.parquet as pq
    from asserts_otel_processor_ray.pipelines.extra_queries import (
        MAD_OUT_K, q_mad, q_mad_outliers)
    out = q_mad_outliers(SF).to_pandas()
    stats = q_mad(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    m = stats.set_index("event_type")
    for _, r in out.iterrows():
        v = ev.loc[ev.event_type == r["event_type"], "value"].to_numpy()
        med, mad = m.loc[r["event_type"], ["med", "mad"]]
        want = int((np.abs(v - med) > MAD_OUT_K * mad).sum())
        assert int(r["n_outliers"]) == want
