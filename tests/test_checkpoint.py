"""Lineage manifest + stage checkpoint/resume (state/checkpoint.py)."""

import glob
import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def tmp_root(tmp_path):
    return str(tmp_path)


def test_lineage_roundtrip(tmp_root):
    from asserts_otel_processor_ray.state.checkpoint import Lineage
    lin = Lineage(tmp_root)
    assert not lin.stage_complete("s", "h")
    lin.record_partition("s", "h", os.path.join(tmp_root, "f.parquet"),
                         10, 100)
    lin.mark_complete("s", "h", 10)
    assert lin.stage_complete("s", "h")
    assert not lin.stage_complete("s", "other-hash")
    # reload from disk
    lin2 = Lineage(tmp_root)
    assert lin2.stage_complete("s", "h")
    assert lin2.partitions("s", "h")[0]["rows"] == 10


def test_checkpoint_table_and_restore(tmp_root, ray_session):
    from asserts_otel_processor_ray.state.checkpoint import (
        checkpoint_dataset, checkpoint_table, restore_dataset)
    import ray.data
    tbl = pa.table({"a": [1, 2, 3]})
    checkpoint_table(tbl, tmp_root, "small", "h1")
    files = glob.glob(os.path.join(tmp_root, "small", "*.parquet"))
    assert pq.read_table(files[0]).equals(tbl)

    ds = ray.data.from_arrow(pa.table({"x": list(range(100))}))
    checkpoint_dataset(ds, tmp_root, "big", "h1")
    restored = restore_dataset(tmp_root, "big", "h1")
    assert restored is not None
    assert restored.count() == 100
    assert restore_dataset(tmp_root, "big", "h2") is None

    manifest = os.path.join(tmp_root, "_lineage", "manifest.jsonl")
    kinds = [json.loads(line)["kind"] for line in open(manifest)]
    assert "partition" in kinds and "complete" in kinds


def test_pipeline_resume(tmp_root, ray_session):
    from asserts_otel_processor_ray.config import default_config
    from asserts_otel_processor_ray.pipelines.pipeline import run_pipeline
    from asserts_otel_processor_ray.sources.synthetic import (
        ensure_transcripts)
    path = ensure_transcripts("/x/sf0.0003")
    out = os.path.join(tmp_root, "out")
    ck = os.path.join(tmp_root, "ck")
    cfg = default_config()
    r1 = run_pipeline(path, cfg, out_dir=out, checkpoint_dir=ck,
                      with_aggregates=False)
    r2 = run_pipeline(path, cfg, out_dir=out, checkpoint_dir=ck,
                      with_aggregates=False)
    assert r1.winner_map == r2.winner_map
    assert sorted(r1.sink_paths) == sorted(r2.sink_paths)
    # the decided checkpoint is marked complete with per-file lineage,
    # keyed on config hash + input identity
    from asserts_otel_processor_ray.state.checkpoint import (
        Lineage, input_fingerprint)
    lin = Lineage(ck)
    h = cfg.config_hash() + "-" + input_fingerprint(path)
    assert lin.stage_complete("decided", h)
    assert len(lin.partitions("decided", h)) >= 1


def test_in_memory_input_never_served_stale_checkpoint(tmp_root,
                                                       ray_session):
    """ADVICE r2: two DIFFERENT in-memory datasets with the same config
    (and even the same schema + row count) must not share a restorable
    lineage key — run_pipeline must recompute, not serve the first
    run's 'decided' checkpoint."""
    import numpy as np
    import ray.data

    from asserts_otel_processor_ray.config import default_config
    from asserts_otel_processor_ray.pipelines.pipeline import run_pipeline
    from asserts_otel_processor_ray.sources.synthetic import (
        ensure_transcripts)
    from asserts_otel_processor_ray.state.checkpoint import (
        input_fingerprint, is_weak_fingerprint)

    path = ensure_transcripts("/x/sf0.0003")
    tbl = pq.read_table(glob.glob(os.path.join(path, "*.parquet"))[0])
    ds1 = ray.data.from_arrow(tbl)
    # same schema, same count, different content: drop every error
    # marker so the winner set must differ
    import pyarrow.compute as pc
    t2 = tbl.set_column(
        tbl.schema.get_field_index("text"),
        "text",
        pc.replace_substring_regex(tbl.column("text"),
                                   r"status=[45]\d\d", "status=200"))
    ds2 = ray.data.from_arrow(t2)

    f1, f2 = input_fingerprint(ds1), input_fingerprint(ds2)
    assert is_weak_fingerprint(f1) and is_weak_fingerprint(f2)

    ck = os.path.join(tmp_root, "ck")
    cfg = default_config()
    r1 = run_pipeline(ds1, cfg, checkpoint_dir=ck,
                      with_aggregates=False)
    r2 = run_pipeline(ds2, cfg, checkpoint_dir=ck,
                      with_aggregates=False)
    # ds2 has no error traces at all — serving ds1's checkpoint would
    # reproduce ds1's error winners
    assert any(v == "error" for v in r1.winner_map.values())
    assert not any(v == "error" for v in r2.winner_map.values())


def test_input_fingerprint_tracks_data_identity(tmp_path):
    """Same config + different input data must produce a different
    lineage key (ADVICE r1: stale-checkpoint hazard)."""
    import pyarrow.parquet as pq
    from asserts_otel_processor_ray.state.checkpoint import (
        input_fingerprint)
    d = tmp_path / "in"
    d.mkdir()
    pq.write_table(pa.table({"a": [1, 2]}), d / "p0.parquet")
    f1 = input_fingerprint(str(d))
    assert f1 == input_fingerprint(str(d))  # stable
    pq.write_table(pa.table({"a": [1, 2, 3]}), d / "p0.parquet")
    f2 = input_fingerprint(str(d))
    assert f1 != f2  # rewritten file → new identity
    pq.write_table(pa.table({"a": [9]}), d / "p1.parquet")
    assert input_fingerprint(str(d)) != f2  # added file → new identity
