"""JSONL / CSV transcript-and-event sources (S-family widening).

The reference ingests its span stream from collector receivers
(assertsprocessor/testdata fixtures are the JSON shape); production
log pipelines additionally land raw drops as JSONL and CSV.  These
readers bring both formats onto the engine's tables via Ray Data's
native distributed file readers (``read_json`` / ``read_csv`` — many
files → many read tasks, streaming, no driver materialization), with
one vectorized cast batch to the canonical arrow schema.

Fixtures: a deterministic seeded generator writes multi-file fixtures
under /tmp once per process lifetime (content-addressed by the
generator version), so the correctness queries are reproducible and
sf-independent — the same pattern as the Jaeger fixture pair.
"""

from __future__ import annotations

import csv
import json
import os

import numpy as np
import pyarrow as pa

from asserts_otel_processor_ray.schema import TRANSCRIPT_SCHEMA

_FIX_VERSION = 1
JSONL_DIR = f"/tmp/graft_jsonl_fixture_v{_FIX_VERSION}"
CSV_DIR = f"/tmp/graft_csv_fixture_v{_FIX_VERSION}"

_ROLES = ("user", "assistant", "tool")
_TOOLS = ("payments#gateway", "search#indexer", "auth", "catalog", "")
_WORDS = ("status=200", "status=503", "url=/api/v1/items", "retry",
          "ok done", "timeout waiting", "cache hit", "cache miss")


def ensure_jsonl_fixture(n_convs: int = 300, n_files: int = 4) -> str:
    """Write a deterministic multi-file JSONL transcript fixture
    (seed 7): one JSON object per line, ts as integer epoch-µs (JSON
    has no timestamp type — the reader casts).  Idempotent."""
    done = os.path.join(JSONL_DIR, ".done")
    if os.path.exists(done):
        return JSONL_DIR
    os.makedirs(JSONL_DIR, exist_ok=True)
    rng = np.random.default_rng(7)
    files = [open(os.path.join(JSONL_DIR, f"part-{i}.jsonl"), "w")
             for i in range(n_files)]
    base_us = 1_700_000_000_000_000
    for c in range(n_convs):
        n_turns = int(rng.integers(1, 8))
        t0 = base_us + int(rng.integers(0, 3_600_000_000))
        f = files[c % n_files]
        for i in range(n_turns):
            rec = {
                "conv_id": f"conv-{c:05d}",
                "turn_idx": i,
                "role": _ROLES[int(rng.integers(0, len(_ROLES)))],
                "text": " ".join(
                    _WORDS[int(rng.integers(0, len(_WORDS)))]
                    for _ in range(int(rng.integers(1, 5)))),
                "tool": _TOOLS[int(rng.integers(0, len(_TOOLS)))],
                "ts": t0 + i * int(rng.integers(1_000, 2_000_000)),
            }
            f.write(json.dumps(rec) + "\n")
    for f in files:
        f.close()
    open(done, "w").close()
    return JSONL_DIR


def jsonl_cast_batch(batch: pa.Table) -> pa.Table:
    """JSONL arrow batch → canonical transcript schema (int µs →
    timestamp, int64 turn_idx → int32); column order pinned."""
    return pa.table({
        "conv_id": batch.column("conv_id").cast(pa.string()),
        "turn_idx": batch.column("turn_idx").cast(pa.int32()),
        "role": batch.column("role").cast(pa.string()),
        "text": batch.column("text").cast(pa.string()),
        "tool": batch.column("tool").cast(pa.string()),
        "ts": batch.column("ts").cast(pa.int64()).cast(
            pa.timestamp("us")),
    }, schema=TRANSCRIPT_SCHEMA)


def read_transcripts_jsonl(path: str | None = None):
    """JSONL transcript source: Ray-native distributed read_json over
    the directory (one task per file at scale) + one vectorized cast
    batch.  Returns a Dataset in the canonical transcript schema —
    drop-in input for run_pipeline."""
    import ray.data
    if path is None:
        path = ensure_jsonl_fixture()
    ds = ray.data.read_json(path, file_extensions=["jsonl"])
    return ds.map_batches(jsonl_cast_batch, batch_format="pyarrow")


def ensure_csv_fixture(n_rows: int = 20_000, n_files: int = 4) -> str:
    """Write a deterministic multi-file CSV event fixture (seed 11)
    with a header row per file.  Idempotent."""
    done = os.path.join(CSV_DIR, ".done")
    if os.path.exists(done):
        return CSV_DIR
    os.makedirs(CSV_DIR, exist_ok=True)
    rng = np.random.default_rng(11)
    types = ("view", "click", "purchase", "refund")
    per = n_rows // n_files
    for i in range(n_files):
        with open(os.path.join(CSV_DIR, f"part-{i}.csv"), "w",
                  newline="") as f:
            w = csv.writer(f)
            w.writerow(["event_id", "user_id", "event_type", "amount"])
            for j in range(per):
                w.writerow([
                    i * per + j,
                    int(rng.integers(0, 2_000)),
                    types[int(rng.integers(0, len(types)))],
                    # integer cents as text → exact aggregation
                    int(rng.integers(0, 100_000)),
                ])
    open(done, "w").close()
    return CSV_DIR


def read_events_csv(path: str | None = None):
    """CSV event source: Ray-native distributed read_csv (header
    inference per file, one task per file at scale)."""
    import ray.data
    if path is None:
        path = ensure_csv_fixture()
    return ray.data.read_csv(path, file_extensions=["csv"])
