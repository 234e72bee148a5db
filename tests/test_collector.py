"""Sharded partial collector: deterministic shard routing, no
single-actor funnel, round-trip fidelity."""

import numpy as np
import pyarrow as pa


def _keys(n):
    # realistic block keys: (first_conv, first_turn, last_conv,
    # last_turn, nrows)
    return [(f"conv-{i:05d}", 0, f"conv-{i + 3:05d}", 7, 1000 + i)
            for i in range(n)]


def test_shard_of_deterministic_and_balanced():
    from asserts_otel_processor_ray.state.collector import shard_of
    keys = _keys(512)
    n = 8
    shards = [shard_of(k, n) for k in keys]
    # deterministic (retried task on another worker → same shard)
    assert shards == [shard_of(k, n) for k in keys]
    counts = np.bincount(shards, minlength=n)
    # no funnel: every shard sees work, max share well under 2x fair
    assert (counts > 0).all()
    assert counts.max() <= 2 * (512 // n)


def test_sharded_roundtrip_and_overwrite(ray_session):
    import ray

    from asserts_otel_processor_ray.state.collector import (
        add_many_sharded, drain_tables_sharded, make_collectors,
        shard_of)
    collectors = make_collectors(4)
    keys = _keys(64)
    items = [("seg", k, pa.table({"i": [i]})) for i, k in enumerate(keys)]
    ray.get(add_many_sharded(collectors, items))
    # retry semantics: re-delivery overwrites the same key on the same
    # shard — no duplicates
    ray.get(add_many_sharded(collectors, items[:10]))
    tbls = drain_tables_sharded(collectors, "seg")
    vals = sorted(t.column("i")[0].as_py() for t in tbls)
    assert vals == list(range(64))
    # every shard actually stored something (no funnel end-to-end)
    per_shard = [len(ray.get(c.tables.remote("seg"))) for c in collectors]
    assert all(n > 0 for n in per_shard)
    assert sum(per_shard) == 64
    want = [shard_of(k, 4) for k in keys]
    got = np.bincount(want, minlength=4).tolist()
    assert per_shard == got
