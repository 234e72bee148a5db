"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by actor-pool ``map_batches`` stages.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked deterministic stub (sha256-derived pseudo-features);
everything Ray-side — schema, batch sizing, actor signature, output
layout — is real.  Swapping ``_decode_stub`` for a PIL/ffmpeg call is
the only change needed on a cluster with codecs installed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),      # image | audio | video
    ("payload", pa.binary()),          # opaque encoded bytes
    ("meta_width", pa.int32()),
    ("meta_height", pa.int32()),
])

FEATURE_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),
    ("n_bytes", pa.int64()),
    ("payload_sha8", pa.string()),     # first 8 hex chars of sha256
    ("feature", pa.list_(pa.float32())),
])


def _decode_stub(payload: bytes) -> np.ndarray:
    """STUB decode/feature-extract: a real deployment replaces this with
    image decode + model inference.  Deterministic: 8 float32 features
    derived from the sha256 digest."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest[:32], dtype=np.uint8).astype(np.float32)
    return (raw.reshape(8, 4).mean(axis=1) / 255.0).astype(np.float32)


class MediaFeatureStage:
    """Actor-pool stage: decode + featurize a batch of media payloads.

    Use with small ``batch_size`` (large binary payloads) and
    ``concurrency=(min, max)``:

        ds.map_batches(MediaFeatureStage, batch_size=64,
                       concurrency=(2, 8), batch_format="pyarrow")
    """

    def __init__(self):
        # model load / codec init happens ONCE per actor here
        self._decode = _decode_stub

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = [self._decode(p) for p in payloads]
        sha8 = [hashlib.sha256(p).hexdigest()[:8] for p in payloads]
        return pa.table({
            "media_id": batch.column("media_id"),
            "media_type": batch.column("media_type"),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            "payload_sha8": pa.array(sha8, pa.string()),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32())),
        }, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("n_frames", pa.int64()),
    ("frame_idx", pa.int64()),
    ("frame_rank", pa.int64()),        # 1..k within the media row
    ("frame_sig", pa.int64()),         # stub frame fingerprint
])

FRAME_BYTES = 64      # stub: 1 "frame" per 64 payload bytes
FRAME_SAMPLE_K = 8    # evenly-spaced frames sampled per media


class FrameSampleStage:
    """Actor-pool stage: video frame sampling — each media row expands
    to up to ``k`` evenly-spaced frame rows (the one-to-many explode
    shape a video pipeline needs; small ``batch_size``, codec init once
    per actor).

    The container has no video codecs, so frame decode is a
    clearly-marked deterministic stub: n_frames = max(n_bytes//64, 1),
    sampled indices = floor(j·n_frames/k), and the frame "signature"
    is integer arithmetic on (frame_idx, media_id) — a real deployment
    replaces the signature with a decoded-frame feature while keeping
    the explode layout and schema."""

    def __init__(self, k: int = FRAME_SAMPLE_K):
        self.k = k                     # codec/model init once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mid = batch.column("media_id").to_numpy()
        n_bytes = pc.binary_length(
            batch.column("payload")).to_numpy().astype(np.int64)
        n_frames = np.maximum(n_bytes // FRAME_BYTES, 1)
        k = np.minimum(self.k, n_frames)
        rep_mid = np.repeat(mid, k)
        rep_nf = np.repeat(n_frames, k)
        # j = 0..k_i-1 per media, vectorized
        offs = np.r_[0, np.cumsum(k)]
        j = np.arange(offs[-1], dtype=np.int64) - np.repeat(offs[:-1], k)
        frame_idx = (j * rep_nf) // np.repeat(k, k)
        frame_sig = (frame_idx * np.int64(1_000_003) + rep_mid) \
            % np.int64((1 << 61) - 1)
        return pa.table({
            "media_id": pa.array(rep_mid, pa.int64()),
            "n_frames": pa.array(rep_nf, pa.int64()),
            "frame_idx": pa.array(frame_idx, pa.int64()),
            "frame_rank": pa.array(j + 1, pa.int64()),
            "frame_sig": pa.array(frame_sig, pa.int64()),
        }, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("in_w", pa.int64()),
    ("in_h", pa.int64()),
    ("out_w", pa.int64()),
    ("out_h", pa.int64()),
    ("scale_den", pa.int64()),         # scale = target/scale_den
])


class ResizeStage:
    """Actor-pool stage: fit each image into a target×target box
    preserving aspect ratio (integer arithmetic, so the oracle is
    exact).  Decode/re-encode is the documented stub — the container
    has no codecs — so the input dims are derived deterministically
    from the payload length; a real deployment reads them from the
    decoded image and emits resized bytes with the same schema."""

    TARGET = 256

    def __init__(self, target: int = TARGET):
        self.target = np.int64(target)   # codec init once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mid = batch.column("media_id").to_numpy()
        n_bytes = pc.binary_length(
            batch.column("payload")).to_numpy().astype(np.int64)
        # stub "decoded" dims — deterministic from payload length
        w = 64 + n_bytes % 512
        h = 64 + (n_bytes * 7919) % 512
        m = np.maximum(w, h)
        big = m > self.target
        out_w = np.where(big, np.maximum(1, w * self.target // m), w)
        out_h = np.where(big, np.maximum(1, h * self.target // m), h)
        return pa.table({
            "media_id": pa.array(mid, pa.int64()),
            "in_w": pa.array(w, pa.int64()),
            "in_h": pa.array(h, pa.int64()),
            "out_w": pa.array(out_w, pa.int64()),
            "out_h": pa.array(out_h, pa.int64()),
            "scale_den": pa.array(np.where(big, m, self.target),
                                  pa.int64()),
        }, schema=RESIZE_SCHEMA)


def documents_as_media(batch: pa.Table) -> pa.Table:
    """Adapter used by tests/queries: treat document text bytes as an
    opaque payload so the media plumbing can be exercised without
    codecs."""
    import pyarrow.compute as pc
    text = batch.column("text")
    payload = text.cast(pa.binary())
    n = batch.num_rows
    return pa.table({
        "media_id": batch.column("doc_id").cast(pa.int64()),
        "media_type": pa.array(["image"] * n, pa.string()),
        "payload": payload,
        "meta_width": pa.array(
            pc.utf8_length(text).cast(pa.int32())),
        "meta_height": pa.array(np.ones(n, np.int32), pa.int32()),
    }, schema=MEDIA_SCHEMA)
