"""Per-partition lineage manifest + stage checkpoints (resume support).

The reference is lossy on crash (in-memory queues, SURVEY.md §4); the
batch engine is resumable: heavy stage outputs are written as
partitioned Parquet with a ``_lineage/manifest.jsonl`` recording, per
stage, the config hash and one row per written file (rows + bytes).  A
rerun with the same config hash skips completed stages entirely and
re-reads their Parquet; a partially-written stage has no completion
marker and is recomputed (its temp dir is replaced atomically).

Granularity: stage-level restart with per-file (partition) lineage and
row-count metrics.  Finer-grained partition-skip needs a run-stable
partitioning of the sort output, which sample-based range partitioning
does not give; the manifest records everything needed to add it.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

MANIFEST_DIR = "_lineage"
MANIFEST = "manifest.jsonl"


class Lineage:
    def __init__(self, root: str):
        self.root = root
        self.dir = os.path.join(root, MANIFEST_DIR)
        self.path = os.path.join(self.dir, MANIFEST)
        os.makedirs(self.dir, exist_ok=True)
        self._records: list[dict] = []
        if os.path.exists(self.path):
            with open(self.path) as f:
                self._records = [json.loads(line) for line in f
                                 if line.strip()]

    def _append(self, rec: dict) -> None:
        rec = dict(rec, wall_time=time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        self._records.append(rec)

    def stage_complete(self, stage: str, config_hash: str) -> bool:
        return any(r.get("kind") == "complete"
                   and r.get("stage") == stage
                   and r.get("config_hash") == config_hash
                   for r in self._records)

    def record_partition(self, stage: str, config_hash: str, path: str,
                         rows: int, nbytes: int) -> None:
        self._append({"kind": "partition", "stage": stage,
                      "config_hash": config_hash,
                      "path": os.path.relpath(path, self.root),
                      "rows": rows, "bytes": nbytes})

    def mark_complete(self, stage: str, config_hash: str,
                      total_rows: int, **meta) -> None:
        self._append({"kind": "complete", "stage": stage,
                      "config_hash": config_hash,
                      "total_rows": total_rows, **meta})

    def partitions(self, stage: str, config_hash: str) -> list[dict]:
        return [r for r in self._records
                if r.get("kind") == "partition"
                and r.get("stage") == stage
                and r.get("config_hash") == config_hash]


def stage_dir(root: str, stage: str) -> str:
    return os.path.join(root, stage)


MEM_PREFIX = "mem-"


def is_weak_fingerprint(fp: str) -> bool:
    """True when the fingerprint cannot distinguish two different
    inputs reliably (in-memory Datasets) — callers must refuse
    checkpoint RESTORE for such inputs (write-side lineage within one
    run is still fine)."""
    return fp.startswith(MEM_PREFIX)


def input_fingerprint(source) -> str:
    """Digest of the input's identity (file paths + size + mtime) so a
    checkpoint keyed on config alone cannot serve stale output when the
    same config is rerun against different data.  Accepts a path (file
    or directory of parquet) or a Dataset (uses its input_files()).

    An in-memory Dataset (from_arrow/from_pandas → input_files() == [])
    has no file identity; the fingerprint mixes schema + row count and
    carries the MEM_PREFIX marker, and is_weak_fingerprint() tells
    callers to refuse restoring a checkpoint against it (two different
    in-memory tables with equal schema and count would otherwise share
    a lineage key and serve each other's stale results)."""
    import hashlib

    if isinstance(source, str):
        if os.path.isdir(source):
            files = sorted(glob.glob(
                os.path.join(source, "**", "*.parquet"), recursive=True))
        else:
            files = [source]
    else:
        try:
            files = sorted(source.input_files())
        except Exception:
            files = []
        if not files:
            try:
                ident = f"{source.schema()}|{source.count()}"
            except Exception:
                ident = "unknown"
            return MEM_PREFIX + hashlib.sha256(
                ident.encode()).hexdigest()[:12]
    h = hashlib.sha256()
    for f in files:
        try:
            st = os.stat(f)
            h.update(f"{f}|{st.st_size}|{st.st_mtime_ns}\n".encode())
        except OSError:
            h.update(f"{f}|?\n".encode())
    return h.hexdigest()[:12]


def checkpoint_dataset(ds: "ray.data.Dataset", root: str, stage: str,
                       config_hash: str,
                       lineage: Lineage | None = None) -> str:
    """Write a dataset as the checkpoint of `stage` (atomic replace),
    record per-file lineage, mark complete.  Returns the stage dir."""
    lineage = lineage or Lineage(root)
    out = stage_dir(root, stage)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = tempfile.mkdtemp(dir=root,
                           prefix=f".{stage.replace(os.sep, '_')}-tmp-")
    ds.write_parquet(tmp)
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.rename(tmp, out)
    total = 0
    for f in sorted(glob.glob(os.path.join(out, "*.parquet"))):
        md = pq.read_metadata(f)
        total += md.num_rows
        lineage.record_partition(stage, config_hash, f, md.num_rows,
                                 os.path.getsize(f))
    lineage.mark_complete(stage, config_hash, total)
    return out


def restore_dataset(root: str, stage: str,
                    config_hash: str) -> "ray.data.Dataset | None":
    """Dataset over a completed checkpoint, or None when absent/stale."""
    lineage = Lineage(root)
    if not lineage.stage_complete(stage, config_hash):
        return None
    out = stage_dir(root, stage)
    if not os.path.isdir(out):
        return None
    return ray.data.read_parquet(out)


def checkpoint_table(tbl: pa.Table, root: str, stage: str,
                     config_hash: str,
                     lineage: Lineage | None = None) -> str:
    """Checkpoint a (small) driver-side Arrow table."""
    lineage = lineage or Lineage(root)
    out = stage_dir(root, stage)
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "part-00000.parquet")
    pq.write_table(tbl, path)
    lineage.record_partition(stage, config_hash, path, tbl.num_rows,
                             os.path.getsize(path))
    lineage.mark_complete(stage, config_hash, tbl.num_rows)
    return out
