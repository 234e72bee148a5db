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


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality heuristics: length, stopword ratio, type-token ratio and
    a blended score (deterministic arithmetic, shared with the oracle).
    """
    doc_id = batch.column("doc_id").to_numpy()
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


def token_hashes(ex: pd.Series) -> np.ndarray:
    """64-bit-ish deterministic hash per token (dictionary over the
    distinct vocabulary, so no per-row hashing at scale)."""
    uniq = pd.unique(ex.to_numpy())
    table = {
        t: int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        % _MOD
        for t in uniq}
    return ex.map(table).to_numpy().astype(np.uint64)


def shingle_hashes(toks: pd.Series, w: int = 3
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Rolling polynomial hash over w-token shingles.

    Returns (hashes, doc_index) for all shingles of all docs (docs
    shorter than w contribute their single whole-doc hash).
    """
    ex = toks.explode()
    doc_of = ex.index.to_numpy()
    h = token_hashes(ex)
    n = len(h)
    if n == 0:
        return np.array([], np.uint64), np.array([], np.int64)
    # windowed polynomial: sum h[i+j] * BASE^(w-1-j) mod MOD, vectorized
    acc = np.zeros(max(0, n - w + 1), dtype=np.object_)
    for j in range(w):
        acc = (acc * _BASE + h[j:n - w + 1 + j].astype(object)) % _MOD
    win_doc = doc_of[:n - w + 1]
    ok = win_doc == doc_of[w - 1:]          # window within one doc
    hashes = acc[ok].astype(np.uint64)
    docs = win_doc[ok]
    # short docs (< w tokens): whole-doc hash
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


def fingerprint_batch(batch: pa.Table, w: int = 3) -> pa.Table:
    """Document fingerprint = min rolling-hash shingle (winnowing-style,
    deterministic)."""
    doc_id = batch.column("doc_id").to_numpy()
    toks = _tokens_series(batch.column("text"))
    hashes, docs = shingle_hashes(toks, w)
    fp = np.full(len(doc_id), np.iinfo(np.uint64).max, dtype=np.uint64)
    np.minimum.at(fp, docs, hashes)
    return pa.table({
        "doc_id": pa.array(doc_id, pa.int64()),
        "fingerprint": pa.array([format(x, "016x") for x in fp],
                                pa.string()),
    })
