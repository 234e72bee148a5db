"""Admission-cap partials stay bounded under adversarial
request-context cardinality (T5's reason to exist): each block's
partial is ≤ limit rows per entity, and the two-phase result equals the
brute-force global computation."""

import numpy as np
import pandas as pd
import pyarrow as pa

from asserts_otel_processor_ray.pipelines.pipeline import _seg_cap_partial
from asserts_otel_processor_ray.stages.topk import (
    PAIR_SEP,
    allowed_pairs_from_df,
)

LIMIT = 100


def _block(entity: str, n_requests: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    reqs = [f"/ctx/{seed}/{i}" for i in range(n_requests)]
    first = [f"{rng.integers(0, 10**12):020d}|c{seed}-{i}"
             for i in range(n_requests)]
    return pa.table({
        "entity_key": pa.array([entity] * n_requests),
        "seg_request": pa.array(reqs),
        "seg_first_seen": pa.array(first),
        "is_seg_main": pa.array([True] * n_requests),
    })


def test_partial_bounded_at_100k_contexts():
    # one block carrying 100k distinct request contexts for one entity
    t = _block("e#svc", 100_000, seed=1)
    part = _seg_cap_partial(t, LIMIT)
    assert part.num_rows == LIMIT          # not O(distinct contexts)


def test_two_phase_equals_bruteforce_across_blocks():
    blocks = [_block("e#svc", 5_000, seed=s) for s in range(6)]
    blocks.append(_block("other#svc", 3_000, seed=99))
    partials = [_seg_cap_partial(t, LIMIT) for t in blocks]
    # driver merge sees ≤ blocks × entities × limit rows
    merged = pd.concat([p.to_pandas() for p in partials],
                       ignore_index=True)
    assert len(merged) <= len(blocks) * 2 * LIMIT
    got = allowed_pairs_from_df(merged, "entity_key", "seg_request",
                                "seg_first_seen", LIMIT)

    # brute force over the concatenated raw rows
    raw = pd.concat([t.to_pandas() for t in blocks], ignore_index=True)
    idx = raw.groupby(["entity_key", "seg_request"])[
        "seg_first_seen"].idxmin()
    firsts = raw.loc[idx].sort_values("seg_first_seen",
                                      kind="mergesort")
    capped = firsts.groupby("entity_key", sort=False).head(LIMIT)
    want = frozenset((capped["entity_key"] + PAIR_SEP
                      + capped["seg_request"]).tolist())
    assert got == want
    assert len(got) == 2 * LIMIT


def test_block_key_distinguishes_middle_blocks_of_hot_conv():
    """A conversation spanning 3+ sorted blocks makes every middle
    block consist of that conversation alone; two equal-sized middle
    blocks MUST NOT share a collector key (regression: silent edge-row
    loss via keyed overwrite whenever sort sampling produced equal
    middle blocks)."""
    from asserts_otel_processor_ray.state.collector import block_key
    t1 = pa.table({"conv_id": pa.array(["X"] * 48),
                   "turn_idx": pa.array(list(range(0, 48)), pa.int32())})
    t2 = pa.table({"conv_id": pa.array(["X"] * 48),
                   "turn_idx": pa.array(list(range(48, 96)), pa.int32())})
    assert block_key(t1) != block_key(t2)
    assert block_key(t1) == block_key(t1)


def test_hot_pair_min_survives_local_cap():
    """A pair whose global min first-seen sits in one block must be
    admitted even when other blocks saw it later (semilattice proof in
    the docstring, pinned here)."""
    early = pa.table({
        "entity_key": ["e"], "seg_request": ["/hot"],
        "seg_first_seen": ["0" * 20 + "|c0"],
        "is_seg_main": [True]})
    # a block where /hot appears late, behind LIMIT earlier pairs
    n = LIMIT + 50
    late = pa.table({
        "entity_key": ["e"] * n,
        "seg_request": [f"/r{i}" for i in range(n - 1)] + ["/hot"],
        "seg_first_seen": [f"{i + 1:020d}|c{i}" for i in range(n)],
        "is_seg_main": [True] * n,
    })
    partials = [_seg_cap_partial(t, LIMIT) for t in (early, late)]
    merged = pd.concat([p.to_pandas() for p in partials],
                       ignore_index=True)
    got = allowed_pairs_from_df(merged, "entity_key", "seg_request",
                                "seg_first_seen", LIMIT)
    assert f"e{PAIR_SEP}/hot" in got
