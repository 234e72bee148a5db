"""The distributed pre-reduce of drained partials (taken when their
total row count exceeds DRIVER_PARTIAL_ROW_BUDGET — the 10⁵+-block
regime at 100 TB) must produce the same cap set, the same winners and
the same final histogram as the bounded driver-side merge."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from asserts_otel_processor_ray.config import default_config
from asserts_otel_processor_ray.pipelines import pipeline as P
from asserts_otel_processor_ray.stages.aggregate import (
    histogram_label_columns,
    latency_histogram_final_tbl,
)
from asserts_otel_processor_ray.stages.topk import allowed_pairs_from_df


def _mk_winhist_blocks(cfg, window: bool, n_blocks=7, seed=3):
    """Synthetic per-block partial tables with the exact shape
    _winner_partials_fn emits: item/ncand rows (+window) concatenated
    permissively with hist rows."""
    rng = np.random.default_rng(seed)
    label_cols = histogram_label_columns(cfg)
    blocks = []
    for bi in range(n_blocks):
        n_it = int(rng.integers(3, 9))
        it = {
            "kind": ["item"] * n_it,
            "conv_id": [f"c{bi}_{i}" for i in range(n_it)],
            "entity": rng.choice(["e1", "e2", "e3"], n_it).tolist(),
            "request": rng.choice(["r1", "r2"], n_it).tolist(),
            "qtype": rng.choice(["error", "slow"], n_it).tolist(),
            "latency": rng.random(n_it).round(4).tolist(),
            "arrival_key": [f"{bi:04d}{i:04d}|c{bi}_{i}"
                            for i in range(n_it)],
            "bucket": [-1] * n_it,
        }
        it["sample_type"] = it["qtype"]
        n_nc = int(rng.integers(2, 6))
        nc = {
            "kind": ["ncand"] * n_nc,
            "conv_id": [f"n{bi}_{i}" for i in range(n_nc)],
            "entity": rng.choice(["e1", "e2"], n_nc).tolist(),
            "request": rng.choice(["r1", "r2"], n_nc).tolist(),
            "qtype": ["slow"] * n_nc,
            "sample_type": ["normal"] * n_nc,
            "latency": rng.random(n_nc).round(4).tolist(),
            "arrival_key": [f"{bi:04d}{i:04d}|n{bi}_{i}"
                            for i in range(n_nc)],
            "bucket": rng.integers(0, 3, n_nc).tolist(),
        }
        win = pd.concat([pd.DataFrame(it), pd.DataFrame(nc)],
                        ignore_index=True)
        if window:
            win["window"] = rng.integers(0, 2, len(win))
        win_tbl = pa.Table.from_pandas(win, preserve_index=False)
        n_h = int(rng.integers(2, 5))
        h = {
            "namespace": rng.choice(["ns1", "ns2"], n_h).tolist(),
            "service": rng.choice(["s1", "s2"], n_h).tolist(),
            "span_kind": ["SERVER"] * n_h,
            "status_code": ["OK"] * n_h,
            "le": rng.choice([0.25, 1.0, np.inf], n_h).tolist(),
            "bucket_count": rng.integers(1, 10, n_h).tolist(),
            "latency_sum_us": rng.integers(1, 1_000_000, n_h).tolist(),
            "latency_count": rng.integers(1, 10, n_h).tolist(),
        }
        for lc in label_cols:
            h[lc] = [""] * n_h
        h["kind"] = ["hist"] * n_h
        hist_tbl = pa.Table.from_pandas(pd.DataFrame(h),
                                        preserve_index=False)
        blocks.append(pa.concat_tables([win_tbl, hist_tbl],
                                       promote_options="permissive"))
    return blocks


def _winners_key(winners):
    return sorted((w["conv_id"], w["sample_type"], w["entity"],
                   w["request"], w["qtype"]) for w in winners)


def _hist_sorted(tbl):
    df = tbl.to_pandas()
    return df.reindex(sorted(df.columns), axis=1).sort_values(
        sorted(df.columns), ignore_index=True)


@pytest.mark.parametrize("window", [False, True])
def test_reduce_winhist_distributed_matches_driver(
        ray_session, monkeypatch, window):
    cfg = default_config()
    blocks = _mk_winhist_blocks(cfg, window)
    win_d, hist_d = P._reduce_winhist(blocks, cfg, capture_hist=True,
                                      window=window)
    monkeypatch.setattr(P, "DRIVER_PARTIAL_ROW_BUDGET", 0)
    win_x, hist_x = P._reduce_winhist(blocks, cfg, capture_hist=True,
                                      window=window)
    if window:
        key_cols = ["window"]
        for w in sorted(set(win_d.column("window").to_pylist())):
            import pyarrow.compute as pc
            dd = win_d.filter(pc.equal(win_d.column("window"), w))
            dx = win_x.filter(pc.equal(win_x.column("window"), w))
            assert _winners_key(P._finish_winners(dd.to_pandas(), cfg)) \
                == _winners_key(P._finish_winners(dx.to_pandas(), cfg))
    else:
        assert _winners_key(P._finish_winners(win_d.to_pandas(), cfg)) \
            == _winners_key(P._finish_winners(win_x.to_pandas(), cfg))
    fd = latency_histogram_final_tbl(hist_d, cfg)
    fx = latency_histogram_final_tbl(hist_x, cfg)
    pd.testing.assert_frame_equal(_hist_sorted(fd), _hist_sorted(fx),
                                  check_dtype=False)


def test_cap_partials_distributed_matches_driver(ray_session,
                                                 monkeypatch):
    rng = np.random.default_rng(11)
    tbls = []
    for bi in range(9):
        n = int(rng.integers(3, 8))
        tbls.append(pa.table({
            "entity_key": pa.array(
                rng.choice(["a", "b", "c"], n).tolist()),
            "seg_request": pa.array(
                rng.choice(["q1", "q2", "q3"], n).tolist()),
            "seg_first_seen": pa.array(
                [f"{int(v):020d}" for v in rng.integers(0, 10**6, n)]),
        }))
    args = ("entity_key", "seg_request", "seg_first_seen", 2)
    driver = allowed_pairs_from_df(P._cap_partials_df(tbls), *args)
    monkeypatch.setattr(P, "DRIVER_PARTIAL_ROW_BUDGET", 0)
    dist = allowed_pairs_from_df(P._cap_partials_df(tbls), *args)
    assert driver == dist and len(driver) > 0
