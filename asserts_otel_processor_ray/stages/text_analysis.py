"""Text-analysis operators for large-scale training-data pipelines:
tokenization stats, quality scoring, language-ID heuristic, document
fingerprinting and exact dedup keys.

All stages are vectorized batch transforms over the ``documents`` table
(doc_id, text, lang, source, n_chars); per-row Python appears only in
the (bounded-vocabulary) token-dictionary build.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# small English-ish stopword list (quality + langid markers share it)
STOPWORDS = ("a", "an", "and", "or", "of", "to", "in", "is", "it", "the")

# marker-token sets per language for the n-gram/marker heuristic; the
# operator is generic — sets are configuration, not semantics.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": STOPWORDS,
    "es": ("el", "la", "los", "las", "y", "es"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "zh": ("de", "shi", "le", "bu", "wo"),
}
LANG_ORDER = tuple(sorted(LANG_MARKERS))  # deterministic tie-break order


def normalize_expr(text: pa.ChunkedArray | pa.Array):
    """lower → collapse whitespace → trim (the exact-dedup key)."""
    t = pc.utf8_lower(text)
    t = pc.replace_substring_regex(t, r"\s+", " ")
    return pc.utf8_trim_whitespace(t)


def exact_dedup_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combine for exact dedup: min doc_id + count per
    normalized text (hash-partition + per-group first at scale)."""
    norm = normalize_expr(batch.column("text"))
    t = pa.table({"text_norm": norm, "doc_id": batch.column("doc_id")})
    gb = t.group_by(["text_norm"]).aggregate(
        [("doc_id", "min"), ([], "count_all")])
    return gb.rename_columns(["text_norm", "doc_id", "dup_count"])


def _tokens_series(text: pa.ChunkedArray | pa.Array) -> pd.Series:
    """lowercased whitespace tokens per row (arrow split, zero loops)."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.utf8_trim_whitespace(text)), r"\s+")
    return toks.to_pandas()


def token_stats_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    trimmed = pc.utf8_trim_whitespace(text)
    toks = pc.split_pattern_regex(trimmed, r"\s+")
    n_tokens = pc.list_value_length(toks).cast(pa.int64())
    no_ws = pc.replace_substring_regex(text, r"\s", "")
    chars_no_ws = pc.utf8_length(no_ws).cast(pa.int64())
    avg_len = pc.divide(chars_no_ws.cast(pa.float64()),
                        n_tokens.cast(pa.float64()))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": n_tokens,
        "chars_no_ws": chars_no_ws,
        "avg_token_len": avg_len,
    })


def quality_batch(batch: pa.Table,
                  toks: pd.Series | None = None) -> pa.Table:
    """Quality heuristics: length, stopword ratio, type-token ratio and
    a blended score (deterministic arithmetic, shared with the oracle).
    ``toks``: optional precomputed _tokens_series (the composite
    curation stage tokenizes once and shares it)."""
    doc_id = batch.column("doc_id").to_numpy()
    if toks is None:
        toks = _tokens_series(batch.column("text"))
    n_tokens = toks.str.len().to_numpy().astype(np.int64)
    ex = toks.explode()
    doc_of = ex.index.to_numpy()
    stop = ex.isin(STOPWORDS).to_numpy()
    n_stop = np.bincount(doc_of, weights=stop,
                         minlength=len(doc_id)).astype(np.int64)
    n_distinct = (pd.Series(ex.to_numpy(), index=doc_of)
                  .groupby(level=0).nunique()
                  .reindex(range(len(doc_id)), fill_value=0)
                  .to_numpy().astype(np.int64))
    nt = n_tokens.astype(np.float64)
    stop_ratio = n_stop / nt
    ttr = n_distinct / nt
    length_score = np.minimum(np.maximum(nt / 100.0, 0.0), 1.0)
    score = 0.4 * length_score + 0.3 * (1.0 - stop_ratio) + 0.3 * ttr
    return pa.table({
        "doc_id": pa.array(doc_id, pa.int64()),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_stopwords": pa.array(n_stop, pa.int64()),
        "n_distinct": pa.array(n_distinct, pa.int64()),
        "stopword_ratio": pa.array(stop_ratio, pa.float64()),
        "type_token_ratio": pa.array(ttr, pa.float64()),
        "quality_score": pa.array(score, pa.float64()),
    })


def langid_batch(batch: pa.Table) -> pa.Table:
    """Marker-token language scores; prediction = first language (in
    LANG_ORDER) achieving the maximal score, 'und' when all zero."""
    doc_id = batch.column("doc_id").to_numpy()
    toks = _tokens_series(batch.column("text"))
    ex = toks.explode()
    doc_of = ex.index.to_numpy()
    n = len(doc_id)
    scores = np.zeros((len(LANG_ORDER), n), dtype=np.int64)
    for i, lang in enumerate(LANG_ORDER):
        hit = ex.isin(LANG_MARKERS[lang]).to_numpy()
        scores[i] = np.bincount(doc_of, weights=hit, minlength=n)
    best = scores.max(axis=0)
    pred_idx = scores.argmax(axis=0)  # first max in LANG_ORDER
    langs = np.asarray(LANG_ORDER)
    pred = np.where(best > 0, langs[pred_idx], "und")
    cols = {"doc_id": pa.array(doc_id, pa.int64()),
            "pred_lang": pa.array(pred.astype("U"), pa.string())}
    for i, lang in enumerate(LANG_ORDER):
        cols[f"score_{lang}"] = pa.array(scores[i], pa.int64())
    return pa.table(cols)


# ---- fingerprinting ------------------------------------------------------

_MOD = (1 << 61) - 1
_BASE = 1_000_003

# native-uint64 arithmetic mod the Mersenne prime 2^61-1 (the standard
# limb-split trick): all operands stay < 2^61, so a 128-bit product is
# rebuilt from 32-bit limbs and reduced via 2^64 ≡ 8 (mod 2^61-1) —
# no object-dtype Python bigints anywhere in the hot path.  Measured
# ≥10× on the signature stage vs the previous np.object_ kernel while
# producing bit-identical values (pinned by tests/test_extra_ops.py's
# oracle rows and the parity test in tests/test_mersenne_kernel.py).
_U64 = np.uint64
_P61 = _U64(_MOD)
_MASK32 = _U64(0xFFFFFFFF)


def _fold61(r: np.ndarray) -> np.ndarray:
    """Reduce values < 2^63 to canonical residues mod 2^61-1."""
    r = (r & _P61) + (r >> _U64(61))
    r = (r & _P61) + (r >> _U64(61))
    return np.where(r >= _P61, r - _P61, r)


def _mulmod61(x: np.ndarray, y) -> np.ndarray:
    """(x * y) mod (2^61 - 1), element-wise uint64; x, y < 2^61."""
    x = np.asarray(x, np.uint64)
    y = np.uint64(y) if np.isscalar(y) or np.ndim(y) == 0 \
        else np.asarray(y, np.uint64)
    xl, xh = x & _MASK32, x >> _U64(32)
    yl, yh = y & _MASK32, y >> _U64(32)
    ll = xl * yl                      # < 2^64, exact
    mid = xl * yh + xh * yl           # < 2^62 (high limbs < 2^29)
    hh = xh * yh                      # < 2^58
    t = (ll >> _U64(32)) + (mid & _MASK32)
    lo = (ll & _MASK32) | ((t & _MASK32) << _U64(32))
    hi = hh + (mid >> _U64(32)) + (t >> _U64(32))   # < 2^58
    # product = hi·2^64 + lo ≡ 8·hi + lo (mod 2^61-1)
    r = (lo & _P61) + (lo >> _U64(61)) + (hi << _U64(3))
    return _fold61(r)


def _addmod61(x: np.ndarray, y) -> np.ndarray:
    """(x + y) mod (2^61 - 1); x, y < 2^61 so the sum fits uint64."""
    r = np.asarray(x, np.uint64) + (
        np.uint64(y) if np.isscalar(y) or np.ndim(y) == 0
        else np.asarray(y, np.uint64))
    return _fold61(r)


def _hex16(vals: np.ndarray) -> np.ndarray:
    """uint64 → 16-char lowercase hex, vectorized (big-endian bytes →
    hexlify → fixed-width string view; no per-row format())."""
    import binascii
    if len(vals) == 0:
        return np.array([], dtype="U16")
    b = binascii.hexlify(np.ascontiguousarray(
        vals.astype(">u8")).tobytes())
    return np.frombuffer(b, dtype="S16").astype("U16")


def token_hashes(ex: pd.Series, cache: dict | None = None) -> np.ndarray:
    """64-bit-ish deterministic hash per token (dictionary over the
    distinct vocabulary, so no per-row hashing at scale).

    ``cache``: optional persistent token→hash dict (an actor-held
    vocabulary cache) — only tokens not already present are md5'd, so
    the per-unique-token Python loop amortizes across batches.

    Per-row work is a single numpy gather (factorize codes → unique
    hashes); only the distinct vocabulary touches Python/md5."""
    codes, uniq = pd.factorize(ex.to_numpy(), use_na_sentinel=False)
    if cache is None:
        uh = np.fromiter(
            (int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
             % _MOD for t in uniq),
            dtype=np.uint64, count=len(uniq))
    else:
        uh = np.empty(len(uniq), dtype=np.uint64)
        for i, t in enumerate(uniq):
            v = cache.get(t)
            if v is None:
                v = int.from_bytes(
                    hashlib.md5(t.encode()).digest()[:8], "big") % _MOD
                cache[t] = v
            uh[i] = v
    return uh[codes]


def _rolling_poly(h: np.ndarray, doc_of: np.ndarray, lens: np.ndarray,
                  w: int) -> tuple[np.ndarray, np.ndarray]:
    """Windowed polynomial hash (base _BASE, mod 2^61-1) over per-doc
    value runs, native uint64 end-to-end.  ``h`` is the concatenation
    of every doc's value run, ``doc_of`` its doc index per element and
    ``lens`` the per-doc run lengths.  Docs shorter than ``w`` (but
    non-empty) contribute their single whole-run hash.

    Returns (hashes, doc_index)."""
    n = len(h)
    if n == 0:
        return np.array([], np.uint64), np.array([], np.int64)
    # windowed polynomial: sum h[i+j] * BASE^(w-1-j) mod MOD, vectorized
    nw = max(0, n - w + 1)
    acc = np.zeros(nw, dtype=np.uint64)
    for j in range(w):
        acc = _addmod61(_mulmod61(acc, _BASE), h[j:nw + j])
    win_doc = doc_of[:nw]
    ok = win_doc == doc_of[w - 1:]          # window within one doc
    hashes = acc[ok]
    docs = win_doc[ok]
    # short docs (< w values): whole-run hash — same rolling polynomial,
    # vectorized per length class (≤ w-1 classes, no per-doc loop)
    short = (lens > 0) & (lens < w)
    if short.any():
        offsets = np.r_[0, np.cumsum(lens)]
        extra_h, extra_d = [], []
        for length in np.unique(lens[short]):
            d_l = np.flatnonzero(short & (lens == length))
            starts = offsets[d_l]
            acc2 = np.zeros(len(d_l), dtype=np.uint64)
            for j in range(int(length)):
                acc2 = _addmod61(_mulmod61(acc2, _BASE), h[starts + j])
            extra_h.append(acc2)
            extra_d.append(d_l)
        hashes = np.r_[hashes, np.concatenate(extra_h)]
        docs = np.r_[docs, np.concatenate(extra_d)]
    return hashes.astype(np.uint64), docs.astype(np.int64)


def shingle_hashes(toks: pd.Series, w: int = 3,
                   cache: dict | None = None
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Rolling polynomial hash over w-token shingles, native uint64
    mod-(2^61-1) arithmetic end-to-end.

    Returns (hashes, doc_index) for all shingles of all docs (docs
    shorter than w contribute their single whole-doc hash).
    """
    ex = toks.explode()
    doc_of = ex.index.to_numpy()
    h = token_hashes(ex, cache)
    lens = toks.str.len().to_numpy().astype(np.int64)
    return _rolling_poly(h, doc_of, lens, w)


def char_ngram_hashes(text: pa.ChunkedArray | pa.Array, w: int = 5
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Rolling polynomial hash over w-character grams of
    trim(lower(text)) — the char-n-gram analog of shingle_hashes.

    Fully vectorized: the normalized strings already live back-to-back
    in the Arrow values buffer, so the batch text is read straight out
    of that buffer (no per-row Python strings, no ``"".join``) and
    viewed as a uint32 codepoint array (utf-32); gram hashing is the
    same native uint64 mod-(2^61-1) window kernel with zero per-row
    Python.  Docs shorter than ``w`` chars contribute their whole-string
    hash; empty docs contribute nothing.

    Returns (hashes, doc_index)."""
    norm = pc.utf8_trim_whitespace(pc.utf8_lower(text))
    norm = pc.fill_null(norm, "")
    lens = pc.utf8_length(norm).to_numpy(zero_copy_only=False).astype(
        np.int64)
    arr = (norm.combine_chunks() if isinstance(norm, pa.ChunkedArray)
           else norm)
    odt = (np.int64 if pa.types.is_large_string(arr.type) else np.int32)
    offs = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset:arr.offset + len(arr) + 1]
    raw = memoryview(arr.buffers()[2])[int(offs[0]):int(offs[-1])] \
        if len(offs) else b""
    # utf-8 values buffer → one codepoint array for the whole batch
    # (decoding the concatenation == concatenating the decodings)
    cp = np.frombuffer(bytes(raw).decode("utf-8").encode("utf-32-le"),
                       dtype="<u4").astype(np.uint64)
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return _rolling_poly(cp, doc_of, lens, w)


# BPE-ish pre-tokenizer pattern (GPT-2-style, lookahead-free so RE2 —
# which Arrow AND DuckDB both embed — accepts it verbatim): a token is
# an optionally-space-prefixed letter run, digit run, or punctuation
# run, else a whitespace run.
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """Token counting under the BPE-ish regex (vs the whitespace count
    of token_stats): one vectorized RE2 count per row — Arrow's
    count_substring_regex and DuckDB's regexp_extract_all share the
    RE2 engine, so the oracle is exact."""
    text = batch.column("text")
    n = pc.count_substring_regex(text, BPE_PATTERN).cast(pa.int64())
    ws = pc.count_substring_regex(text, r"\s+").cast(pa.int64())
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_bpe_tokens": n,
        "n_ws_runs": ws,
    })


def doc_freq_partial(batch: pa.Table) -> pa.Table:
    """Per-batch document-frequency partial: for every token, the
    number of batch docs containing it (distinct per doc).  The
    distributed groupby(token).sum final yields the corpus vocabulary
    df table — the classic training-data vocab build."""
    toks = _tokens_series(batch.column("text"))
    ex = toks.explode()
    df = pd.DataFrame({"doc": ex.index.to_numpy(),
                       "token": ex.to_numpy()}).drop_duplicates()
    c = df.groupby("token", sort=False).size().reset_index(
        name="partial_df")
    return pa.table({
        "token": pa.array(c["token"].to_numpy(), pa.string()),
        "partial_df": pa.array(c["partial_df"].to_numpy(), pa.int64()),
    })


def term_count_partial(batch: pa.Table) -> pa.Table:
    """Per-batch corpus term-count partial: total occurrences (WITH
    multiplicity — vs doc_freq_partial's distinct-per-doc counts) of
    every token in the batch.  The distributed groupby(token).sum
    final is the corpus unigram table a count-based language model /
    commonness scorer needs."""
    toks = _tokens_series(batch.column("text"))
    vc = toks.explode().value_counts()  # NaN (empty list) drops
    return pa.table({
        "token": pa.array(vc.index.to_numpy(), pa.string()),
        "partial_c": pa.array(vc.to_numpy().astype(np.int64),
                              pa.int64()),
    })


def tf_long_batch(batch: pa.Table) -> pa.Table:
    """Per-batch (doc_id, token, tf) long rows — exact term frequency
    per document (documents never span batches, so per-batch counting
    is exact).  Feeds the distributed tf-idf join path."""
    doc_id = batch.column("doc_id").to_numpy()
    toks = _tokens_series(batch.column("text"))
    ex = toks.explode()
    tf = (pd.DataFrame({"d": ex.index.to_numpy(), "t": ex.to_numpy()})
          .groupby(["d", "t"], sort=False).size()  # NaN (empty doc) drops
          .reset_index(name="tf"))
    return pa.table({
        "doc_id": pa.array(doc_id[tf["d"].to_numpy()], pa.int64()),
        "token": pa.array(tf["t"].to_numpy(), pa.string()),
        "tf": pa.array(tf["tf"].to_numpy().astype(np.int64), pa.int64()),
    })


def fingerprint_batch(batch: pa.Table, w: int = 3,
                      cache: dict | None = None) -> pa.Table:
    """Document fingerprint = min rolling-hash shingle (winnowing-style,
    deterministic)."""
    doc_id = batch.column("doc_id").to_numpy()
    toks = _tokens_series(batch.column("text"))
    hashes, docs = shingle_hashes(toks, w, cache)
    fp = np.full(len(doc_id), np.iinfo(np.uint64).max, dtype=np.uint64)
    np.minimum.at(fp, docs, hashes)
    return pa.table({
        "doc_id": pa.array(doc_id, pa.int64()),
        "fingerprint": pa.array(_hex16(fp), pa.string()),
    })


class FingerprintStage:
    """Actor-pool form of fingerprint_batch: the md5 token→hash
    vocabulary cache persists across batches, so repeated tokens are
    hashed once per actor, not once per batch."""

    def __init__(self, w: int = 3):
        self.w = w
        self.cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        return fingerprint_batch(batch, self.w, self.cache)


def _distinct_shingles(batch: pa.Table, w: int,
                       cache: dict | None = None,
                       toks: pd.Series | None = None
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(hashes, doc_index, totals): per-doc DISTINCT w-token shingle
    hashes (lexsort + boundary diff — no Python per doc) plus the
    per-doc TOTAL (non-distinct) shingle count."""
    if toks is None:
        toks = _tokens_series(batch.column("text"))
    hashes, docs = shingle_hashes(toks, w, cache)
    totals = np.bincount(docs, minlength=batch.num_rows).astype(np.int64)
    if len(hashes) == 0:
        return hashes, docs, totals
    order = np.lexsort((hashes, docs))
    h, d = hashes[order], docs[order]
    keep = np.r_[True, (h[1:] != h[:-1]) | (d[1:] != d[:-1])]
    return h[keep], d[keep], totals


def repetition_batch(batch: pa.Table, w: int = 2,
                     cache: dict | None = None,
                     toks: pd.Series | None = None) -> pa.Table:
    """Repetition-ratio quality signal: share of repeated w-token
    shingles per document (1 - distinct/total) — the classic
    "duplicate n-gram fraction" filter for boilerplate-heavy web text.
    Pure per-document map_batches: no shuffle at any scale."""
    doc_id = batch.column("doc_id").to_numpy()
    h, d, totals = _distinct_shingles(batch, w, cache, toks)
    distinct = np.bincount(d, minlength=batch.num_rows).astype(np.int64)
    safe = np.maximum(totals, 1)
    rep = 1.0 - distinct.astype(np.float64) / safe.astype(np.float64)
    return pa.table({
        "doc_id": pa.array(doc_id, pa.int64()),
        "n_grams": pa.array(totals, pa.int64()),
        "n_distinct": pa.array(distinct, pa.int64()),
        "rep_ratio": pa.array(rep, pa.float64()),
    })


class RepetitionStage:
    """Actor-pool repetition_batch with a persistent vocab cache."""

    def __init__(self, w: int = 2):
        self.w = w
        self.cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        return repetition_batch(batch, self.w, self.cache)


def bench_grams_partial(batch: pa.Table, w: int = 3, mod: int = 97,
                        cache: dict | None = None) -> pa.Table:
    """Benchmark-side decontamination partial: the distinct w-token
    shingle hashes of this batch's BENCHMARK docs (doc_id % mod == 0).
    The benchmark/eval set is small by construction (its grams are the
    broadcast side), so the driver-side unique over these partials is
    bounded — the standard decontamination shape."""
    ids = batch.column("doc_id").to_numpy()
    sel = ids % mod == 0
    if not sel.any():
        return pa.table({"gram": pa.array([], pa.int64())})
    h, _, _ = _distinct_shingles(batch.filter(pa.array(sel)), w, cache)
    return pa.table({"gram": pa.array(np.unique(h).astype(np.int64),
                                      pa.int64())})


class DecontaminateStage:
    """Corpus-side decontamination: per-doc distinct w-gram hashes
    membership-tested (sorted searchsorted) against the ray.put
    broadcast of the benchmark gram set; emits docs with >= 1 hit.
    Setup (broadcast fetch + sort) happens once per actor."""

    def __init__(self, grams_ref, w: int = 3, mod: int = 97):
        import ray
        self.grams = np.sort(np.asarray(ray.get(grams_ref),
                                        dtype=np.uint64))
        self.w, self.mod = w, mod
        self.cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        sel = ids % self.mod != 0
        batch = batch.filter(pa.array(sel))
        ids = ids[sel]
        nd, nh = decontam_counts(batch, self.grams, self.w, self.cache)
        keep = nh >= 1
        frac = nh[keep].astype(np.float64) / np.maximum(nd[keep], 1)
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_grams": pa.array(nd[keep], pa.int64()),
            "n_hit": pa.array(nh[keep], pa.int64()),
            "contaminated_frac": pa.array(frac, pa.float64()),
        })

def decontam_counts(batch: pa.Table, sorted_grams: np.ndarray,
                    w: int = 3, cache: dict | None = None,
                    toks: pd.Series | None = None
                    ) -> tuple[np.ndarray, np.ndarray]:
    """(n_distinct_grams, n_benchmark_hits) per batch row: the shared
    membership kernel of DecontaminateStage and the composite curation
    pipeline.  ``sorted_grams`` must be sorted uint64."""
    h, d, _ = _distinct_shingles(batch, w, cache)
    nd = np.bincount(d, minlength=batch.num_rows).astype(np.int64)
    if len(sorted_grams):
        pos = np.searchsorted(sorted_grams, h)
        pos[pos == len(sorted_grams)] = len(sorted_grams) - 1
        hit = sorted_grams[pos] == h
    else:
        hit = np.zeros(len(h), bool)
    nh = np.bincount(d[hit], minlength=batch.num_rows).astype(np.int64)
    return nd, nh


def chunk_batch(batch: pa.Table, size: int = 128,
                stride: int = 96) -> pa.Table:
    """Overlapping-window document chunking (the RAG / training-window
    split): windows of ``size`` tokens every ``stride`` tokens, last
    window clipped; docs shorter than ``size`` emit one chunk.  Pure
    one-to-many map_batches explode — no shuffle at any scale."""
    ids = batch.column("doc_id").to_numpy()
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(batch.column("text")), r"\s+")
    nt = pc.list_value_length(toks).cast(pa.int64()).to_numpy()
    nch = np.where(nt <= size, 1,
                   (nt - size + stride - 1) // stride + 1).astype(np.int64)
    doc_rep = np.repeat(ids, nch)
    nt_rep = np.repeat(nt, nch)
    # chunk index within doc: global arange minus each doc's start
    ends = np.cumsum(nch)
    k = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) \
        - np.repeat(ends - nch, nch)
    start = k * stride
    end = np.minimum(start + size, nt_rep)
    return pa.table({
        "doc_id": pa.array(doc_rep, pa.int64()),
        "chunk_idx": pa.array(k, pa.int64()),
        "start_tok": pa.array(start, pa.int64()),
        "end_tok": pa.array(end, pa.int64()),
        "n_chunk_tokens": pa.array(end - start, pa.int64()),
    })


# ---- PII-style redaction ----------------------------------------------------
#
# The curation pass that REWRITES the corpus: replace every match of an
# entity/PII pattern with a placeholder and count how many were hit per
# document.  One vectorized RE2 scan + one vectorized RE2 replace per
# batch — a pure map, zero shuffle, the 100-TB shape is
# read → redact_batch → write_parquet.  The pattern set below targets
# the synthetic corpus's "entity" words so the operator actually fires
# in tests; swap REDACT_PATTERN for email/phone/SSN alternations in a
# real deployment (both Arrow and DuckDB speak RE2, so the oracle
# stays byte-for-byte).

REDACT_PATTERN = r"\b(customer|supplier|part)\b"
REDACT_TOKEN = "<ENT>"


def redact_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_redactions (non-overlapping match count), redacted
    text.  count_substring_regex and DuckDB's regexp_extract_all both
    count non-overlapping RE2 matches left-to-right, so the oracle's
    len() agrees exactly."""
    text = batch.column("text")
    n = pc.count_substring_regex(text, REDACT_PATTERN)
    red = pc.replace_substring_regex(text, REDACT_PATTERN, REDACT_TOKEN)
    return pa.table({
        "doc_id": batch.column("doc_id").cast(pa.int64()),
        "n_redactions": n.cast(pa.int64()),
        "redacted": red,
    })


# ---- deterministic global shuffle (shard + position assignment) ------------
#
# Training-data loaders need a reproducible corpus-wide shuffle.  At
# scale the assignment IS the shuffle: give every document a seeded
# pseudo-random key h, a shard (h mod n_shards) and a dense position
# within its shard ordered by (h, doc_id) — then writing each shard's
# rows in position order materializes the shuffled corpus without any
# global sort (ONE hash exchange by shard; positions are assigned
# block-locally because a keyed repartition co-locates each shard).

SHARD_A = 685_525_442_799_944_203   # < 2^61-1, odd; decorrelated from
SHARD_B = 331_723_068_736_801_151   # the sampling constants
SHARD_N = 16


def shard_assign_partial(batch: pa.Table,
                         n_shards: int = SHARD_N) -> pa.Table:
    """Per-batch shard keying: h = (doc_id·A + B) mod 2^61-1,
    shard = h mod n_shards.  Pure map; the position assignment needs
    the one keyed exchange."""
    doc_id = batch.column("doc_id").to_numpy()
    if len(doc_id) and doc_id.min() < 0:
        raise ValueError("negative doc_id: floored vs truncated "
                         "modulo would diverge from the SQL oracle")
    dm = (doc_id % np.int64(_MOD)).astype(np.uint64)
    h = _addmod61(_mulmod61(dm, SHARD_A), SHARD_B)
    return pa.table({
        "doc_id": pa.array(doc_id, pa.int64()),
        "h": pa.array(h.astype(np.int64), pa.int64()),
        "shard": pa.array((h % np.uint64(n_shards)).astype(np.int64),
                          pa.int64()),
    })


def shard_positions_block(df: pd.DataFrame) -> pd.DataFrame:
    """Block kernel after repartition(keys=['shard']): each shard's
    rows are block-local, so sorting by (h, doc_id) within shard and
    numbering densely is the globally exact position (grouping by
    shard inside the block tolerates several shards per block)."""
    if df.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                             "shard": pd.Series(dtype=np.int64),
                             "pos": pd.Series(dtype=np.int64)})
    d = df.sort_values(["shard", "h", "doc_id"],
                       kind="mergesort").reset_index(drop=True)
    pos = d.groupby("shard", sort=False).cumcount().to_numpy(np.int64)
    return pd.DataFrame({"doc_id": d["doc_id"].to_numpy(np.int64),
                         "shard": d["shard"].to_numpy(np.int64),
                         "pos": pos})


def mix_hash61(x: np.ndarray, a1, b1, a2) -> np.ndarray:
    """Avalanche-mixed 61-bit hash (murmur-finalizer style: affine →
    xorshift → multiply → xorshift).  The plain affine map is fine
    when only low-order uniformity matters (sampling, sharding) but
    its output over sequential ids is an arithmetic progression mod
    M whose MINIMUM order statistics are structured (three-distance
    theorem) — order-statistic consumers (KMV sketches) need this
    mixed form.  Exactly mirrored in SQL via xor()/>> on BIGINT."""
    h = _addmod61(_mulmod61(x.astype(np.uint64), a1), b1)
    h = h ^ (h >> np.uint64(31))
    h = _mulmod61(h, a2)
    return h ^ (h >> np.uint64(29))


def shard_attach(batch: pa.Table, n_shards: int = SHARD_N) -> pa.Table:
    """Append (h, shard) to a payload batch (any schema with doc_id) —
    the full-row sibling of shard_assign_partial, used by the
    materializing write path.  Fails fast on column collisions (a
    duplicate field name would otherwise only explode in the sort
    AFTER the shuffle exchange has been paid)."""
    clash = {"h", "shard"} & set(batch.column_names)
    if clash:
        raise ValueError(f"payload already has column(s) {sorted(clash)};"
                         " rename them before write_shuffled")
    keyed = shard_assign_partial(batch.select(["doc_id"]), n_shards)
    return batch.append_column("h", keyed.column("h")) \
                .append_column("shard", keyed.column("shard"))


def shard_order_block(t: pa.Table) -> pa.Table:
    """Block kernel after repartition(keys=['shard']): emit the
    block's rows in (shard, h, doc_id) order — within a shard this IS
    the shuffled training order — and drop the scratch hash."""
    out = t.sort_by([("shard", "ascending"), ("h", "ascending"),
                     ("doc_id", "ascending")])
    return out.drop_columns(["h"])


# ---- seeded-linear-model scoring filter (batched "inference") -------------
#
# The plumbing of a model-based quality filter (fastText/classifier-style
# curation) with a deterministic, SQL-mirrorable "model": each token's
# weight is derived from its avalanche-mixed 61-bit hash, so the score is
# an exact integer the DuckDB oracle reproduces term-for-term.  The stage
# is the actor-pool shape a real model gets: weights/vocab state lives in
# __init__ (once per actor), __call__ is one vectorized pass per batch.

MODEL_A1 = 693_820_154_511_196_443     # < 2^61-1, odd
MODEL_B1 = 147_563_902_841_776_207
MODEL_A2 = 921_450_873_664_519_817
MODEL_W_SPAN = 2001                    # weights in [-1000, 1000]
MODEL_KEEP_MIN = 0                     # keep docs with score >= 0


class ModelScoreStage:
    """Actor-pool batch scorer: token-hash-derived linear model.

    __init__ "loads the model" once per actor (here: the mix constants
    plus a persistent token→hash vocabulary cache, the same amortization
    the fingerprint/minhash stages use); __call__ scores a batch with
    one factorize + one gather + one segment-sum — no per-row Python."""

    def __init__(self, a1: int = MODEL_A1, b1: int = MODEL_B1,
                 a2: int = MODEL_A2):
        self._a1, self._b1, self._a2 = a1, b1, a2
        self._vocab: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "score": pa.array([], pa.int64()),
                             "kept": pa.array([], pa.bool_())})
        toks = _tokens_series(batch.column("text"))
        lens = toks.map(len).to_numpy().astype(np.int64)
        flat = pd.Series(np.concatenate(toks.to_numpy()))
        h = token_hashes(flat, cache=self._vocab)
        mixed = mix_hash61(h, self._a1, self._b1, self._a2)
        w = (mixed % np.uint64(MODEL_W_SPAN)).astype(np.int64) \
            - (MODEL_W_SPAN - 1) // 2
        starts = np.r_[0, lens.cumsum()[:-1]]
        score = np.add.reduceat(w, starts)
        score[lens == 0] = 0
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "n_tokens": pa.array(lens, pa.int64()),
            "score": pa.array(score.astype(np.int64), pa.int64()),
            "kept": pa.array(score >= MODEL_KEEP_MIN, pa.bool_()),
        })
