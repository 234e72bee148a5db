"""Pins the engine behavior the block kernels rely on: a hash
``repartition(keys=...)`` emits each partition as exactly ONE block, so
every occurrence of a key is visible to a single ``map_batches(...,
batch_size=None)`` call.  ``minhash verify_block``, ``ngram_pairs_block``
and ``asof_join_block`` would silently drop pairs / asof matches if a
future Ray version streamed or split large partitions — this test fails
loudly in that case instead (see ADVICE round 4, dedup.py:373)."""

import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray


def _key_block_map(n_rows: int, n_keys: int, num_blocks: int,
                   hot_key_rows: int = 0) -> pd.DataFrame:
    def tag_blocks(t: pa.Table) -> pa.Table:
        # per-block (key, block_id, rows) partial — one call per block
        # (defined in-closure so Ray workers get it by value)
        bid = uuid.uuid4().hex
        df = pd.DataFrame({"k": t.column("k").to_pandas()})
        c = df.groupby("k", sort=False).size().reset_index(name="rows")
        return pa.table({
            "k": pa.array(c["k"].to_numpy(), pa.int64()),
            "block": pa.array([bid] * len(c), pa.string()),
            "rows": pa.array(c["rows"].to_numpy(), pa.int64()),
        })

    rng = np.random.default_rng(11)
    k = rng.integers(0, n_keys, size=n_rows).astype(np.int64)
    if hot_key_rows:
        k = np.concatenate(
            [k, np.zeros(hot_key_rows, dtype=np.int64)])
    src = pd.DataFrame({"k": k, "v": np.arange(len(k), dtype=np.int64)})
    ds = ray.data.from_pandas(src).repartition(16)  # forced multi-block in
    from ray.data.context import ShuffleStrategy
    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ds.context.max_hash_shuffle_aggregators = 8
    parted = ds.repartition(num_blocks=num_blocks, keys=["k"])
    tagged = parted.map_batches(tag_blocks, batch_format="pyarrow",
                                batch_size=None)
    out = pd.concat([t.to_pandas() for t in
                     ray.get(tagged.to_arrow_refs())],
                    ignore_index=True)
    expect = src.groupby("k").size()
    return out, expect


@pytest.mark.parametrize("n_keys,num_blocks", [(50, 5), (7, 32)])
def test_hash_repartition_one_block_per_key(ray_session, n_keys,
                                            num_blocks):
    out, expect = _key_block_map(20_000, n_keys, num_blocks)
    per_key = out.groupby("k").agg(blocks=("block", "nunique"),
                                   rows=("rows", "sum"))
    # every key lands in exactly one block...
    assert (per_key["blocks"] == 1).all(), \
        per_key[per_key["blocks"] > 1]
    # ...and that block sees ALL of the key's rows (per-key completeness)
    assert per_key["rows"].sort_index().equals(expect.sort_index())
    assert set(per_key.index) == set(expect.index)


def test_hash_repartition_hot_key_not_split(ray_session):
    """A hot key far larger than its siblings must still arrive whole
    in one block (the layout hot-bucket guards assume when they cap)."""
    out, expect = _key_block_map(5_000, 40, 8, hot_key_rows=200_000)
    hot = out[out["k"] == 0]
    assert hot["block"].nunique() == 1
    assert int(hot["rows"].sum()) == int(expect.loc[0])
