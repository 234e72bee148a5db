"""Trace assembly + sampling-decision golden vectors, ported from
assertsprocessor/sampler_test.go and priority_queue_test.go."""

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

from asserts_otel_processor_ray.config import PipelineConfig
from asserts_otel_processor_ray.functions.keys import entity_key_string
from asserts_otel_processor_ray.stages.classify import (
    assemble_batch,
    decide_batch,
)
from asserts_otel_processor_ray.stages.topk import PAIR_SEP, topk_order

CFG = PipelineConfig(sampling_latency_threshold_seconds=0.5)


def make_batch(rows: list[dict]) -> pa.Table:
    """rows: conv, turn, role-ish kind, ts_s offsets, etc."""
    def col(name, default):
        return [r.get(name, default) for r in rows]
    n = len(rows)
    return pa.table({
        "conv_id": pa.array(col("conv", "c1"), pa.string()),
        "turn_idx": pa.array(col("turn", 0), pa.int32()),
        "ts": pa.array([int(t * 1e6) for t in col("ts", 0.0)],
                       pa.timestamp("us")),
        "kind": pa.array(col("kind", "Server"), pa.string()),
        "is_root": pa.array([r.get("turn", 0) == 0 for r in rows],
                            pa.bool_()),
        "has_error": pa.array(col("err", False), pa.bool_()),
        "latency_threshold_s": pa.array(col("thr", 0.5), pa.float64()),
        "asserts_error_type": pa.array(col("etype", None), pa.string()),
        "asserts_request_context": pa.array(col("ctx", "/req"),
                                            pa.string()),
        "namespace": pa.array(col("ns", "ns"), pa.string()),
        "service": pa.array(col("svc", "svc"), pa.string()),
        "entity_key": pa.array(
            [entity_key_string("dev", "site", r.get("ns", "ns"),
                               r.get("svc", "svc")) for r in rows],
            pa.string()),
    })


def run(rows, cfg=CFG, allowed=None):
    a = assemble_batch(make_batch(rows), cfg)
    if allowed is None:
        ent = a.column("entity_key").to_numpy(zero_copy_only=False)
        req = a.column("seg_request").to_numpy(zero_copy_only=False)
        allowed = frozenset(
            e + PAIR_SEP + r for e, r in zip(ent, req))
    return decide_batch(a, cfg, frozenset(allowed))


def trace_rows(d):
    t = d.filter(d.column("is_trace_row"))
    return t.to_pylist()


def test_latency_next_turn_minus_turn():
    d = run([
        {"conv": "c", "turn": 0, "ts": 0.0},
        {"conv": "c", "turn": 1, "ts": 0.2},
        {"conv": "c", "turn": 2, "ts": 0.9},
    ])
    lat = {r["turn_idx"]: r["latency_s"] for r in d.to_pylist()}
    assert abs(lat[0] - 0.2) < 1e-9
    assert abs(lat[1] - 0.7) < 1e-9
    assert lat[2] == 0.0  # last turn


def test_error_beats_slow_per_turn():
    # sampler.go:81-110: error checked first
    d = run([
        {"turn": 0, "ts": 0.0, "err": True},   # slow AND error
        {"turn": 1, "ts": 5.0},
    ])
    rows = {r["turn_idx"]: r for r in d.to_pylist()}
    assert rows[0]["turn_cand"] == "error"
    tr = trace_rows(d)[0]
    assert tr["trace_sample_type"] == "error"


def test_first_candidate_wins_trace_but_later_marks_remain():
    # first (scan-order) hit samples the trace; later hits still get
    # span-level attrs (sampler.go:89,102)
    d = run([
        {"turn": 0, "ts": 0.0},               # root, slow (next at 2.0)
        {"turn": 1, "ts": 2.0, "err": True},  # error, but trace already slow
        {"turn": 2, "ts": 2.1},
    ])
    rows = {r["turn_idx"]: r for r in d.to_pylist()}
    assert rows[0]["turn_cand"] == "slow"
    assert rows[1]["turn_cand"] == "error"
    assert rows[1]["turn_sample_type"] == "error"
    tr = trace_rows(d)[0]
    assert tr["trace_sample_type"] == "slow"


def test_client_error_suppression():
    # sampler.go:195-198 (M9)
    cfg = PipelineConfig(sampling_latency_threshold_seconds=0.5,
                         ignore_client_errors=True)
    d = run([
        {"turn": 0, "ts": 0.0, "err": True, "etype": "client_errors"},
        {"turn": 1, "ts": 0.1},
    ], cfg=cfg)
    rows = {r["turn_idx"]: r for r in d.to_pylist()}
    assert rows[0]["turn_cand"] is None   # not error (ignored), not slow
    assert trace_rows(d)[0]["trace_sample_type"] is None


def test_server_error_not_suppressed():
    cfg = PipelineConfig(sampling_latency_threshold_seconds=0.5,
                         ignore_client_errors=True)
    d = run([
        {"turn": 0, "ts": 0.0, "err": True, "etype": "server_errors"},
        {"turn": 1, "ts": 0.1},
    ], cfg=cfg)
    assert trace_rows(d)[0]["trace_sample_type"] == "error"


def test_segment_latency_and_request_from_main_span():
    # segment latency = main (root) span latency (sampler.go:184-193)
    d = run([
        {"turn": 0, "ts": 0.0, "ctx": "/root-req"},
        {"turn": 1, "ts": 0.3, "kind": "Client", "ctx": "/exit-req",
         "err": True},
        {"turn": 2, "ts": 0.4},
    ])
    tr = trace_rows(d)[0]
    assert tr["trace_sample_type"] == "error"
    assert tr["trace_request"] == "/root-req"
    assert abs(tr["trace_latency"] - 0.3) < 1e-9


def test_scan_order_root_entry_exit_internal():
    d = run([
        {"turn": 0, "ts": 0.0, "kind": "Internal"},       # root
        {"turn": 1, "ts": 0.1, "kind": "Client"},         # exit
        {"turn": 2, "ts": 0.2, "kind": "Server"},         # entry
        {"turn": 3, "ts": 0.3, "kind": "Internal"},       # internal
    ])
    by_rank = {r["scan_rank"]: r["turn_idx"] for r in d.to_pylist()}
    assert [by_rank[i] for i in range(4)] == [0, 2, 1, 3]


def test_segments_by_first_appearance():
    d = run([
        {"turn": 0, "ts": 0.0, "svc": "a"},
        {"turn": 1, "ts": 0.1, "svc": "b"},
        {"turn": 2, "ts": 0.2, "svc": "a"},
        {"turn": 3, "ts": 0.3, "svc": "c"},
    ])
    seg = {r["turn_idx"]: r["seg_order"] for r in d.to_pylist()}
    assert seg == {0: 0, 2: 0, 1: 1, 3: 2}


def test_cap_disallows_segment():
    ek = entity_key_string("dev", "site", "ns", "svc")
    d = run([
        {"turn": 0, "ts": 0.0, "err": True},
        {"turn": 1, "ts": 0.1},
    ], allowed=frozenset({ek + PAIR_SEP + "/other"}))
    rows = {r["turn_idx"]: r for r in d.to_pylist()}
    assert rows[0]["turn_sample_type"] is None
    tr = trace_rows(d)[0]
    assert tr["trace_sample_type"] is None
    assert not tr["is_ncand"]  # normal sampling also capped


def test_normal_candidate_when_healthy():
    d = run([
        {"turn": 0, "ts": 0.0},
        {"turn": 1, "ts": 0.1},
    ])
    tr = trace_rows(d)[0]
    assert tr["trace_sample_type"] is None
    assert tr["is_ncand"]
    assert tr["ncand_request"] == "/req"


# ---- top-K heap parity (priority_queue_test.go) -------------------------

def _items(lats):
    return pd.DataFrame({
        "latency": lats,
        "arrival_key": [f"{i:020d}|c{i}" for i in range(len(lats))],
        "conv_id": [f"c{i}" for i in range(len(lats))],
    })


def go_heap(lats, k):
    """Literal port of TraceQueue.pushUnsafe (priority_queue.go:44-58)."""
    heap: list[tuple[float, int]] = []
    for i, lat in enumerate(lats):
        if len(heap) == k:
            pop = heapq.heappop(heap)
            if pop[0] > lat:
                heapq.heappush(heap, pop)
                continue
        heapq.heappush(heap, (lat, i))
    return sorted(x[0] for x in heap)


def test_push_priority_eviction_rejection():
    # TestPush/TestPriority/TestEviction/TestRejection
    assert topk_order(_items([0.3]), 1)["latency"].tolist() == [0.3]
    assert sorted(topk_order(_items([0.3, 0.2]), 2)["latency"]) == [0.2, 0.3]
    assert sorted(topk_order(_items([0.3, 0.2, 0.4]), 2)["latency"]) \
        == [0.3, 0.4]
    assert sorted(topk_order(_items([0.3, 0.2, 0.1]), 2)["latency"]) \
        == [0.2, 0.3]


def test_heap_parity_random_distinct():
    rng = np.random.default_rng(7)
    for trial in range(50):
        n = int(rng.integers(1, 20))
        k = int(rng.integers(1, 6))
        lats = rng.permutation(n).astype(float).tolist()
        ours = sorted(topk_order(_items(lats), k)["latency"].tolist())
        assert ours == go_heap(lats, k), (lats, k)


def test_tie_newer_arrival_wins():
    # heap replace-on-tie: pop.latency > item.latency is FALSE on a tie,
    # so the incumbent is dropped and the newcomer enters
    # (priority_queue.go:49-57)
    df = topk_order(_items([0.3, 0.3, 0.3]), 2)
    assert sorted(df["conv_id"]) == ["c1", "c2"]
