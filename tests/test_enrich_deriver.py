"""EntityThresholdDeriver ≡ EnrichStage on entity_key / threshold.

The sort payload drops entity_key + latency_threshold_s
(pipelines/pipeline.py:slim_columns) and the assemble scan re-derives
them with EntityThresholdDeriver.attach.  These tests pin the contract
that the re-derive is bitwise-equal to the canonical enrich computation
for every lookup path (request override → service default → config
default) including null request contexts and empty batches."""

import numpy as np
import pyarrow as pa

from asserts_otel_processor_ray.config import default_config
from asserts_otel_processor_ray.functions.keys import entity_key_string
from asserts_otel_processor_ray.stages.enrich import EntityThresholdDeriver


def _mk(ns, svc, ctx):
    return pa.table({
        "namespace": pa.array(ns, pa.string()),
        "service": pa.array(svc, pa.string()),
        "asserts_request_context": pa.array(ctx, pa.string()),
    })


def test_attach_covers_all_threshold_paths():
    cfg = default_config()
    # chat/assistant has a request-level AND a service-level override;
    # payments/api only service-level; web/front only the config default
    t = _mk(["chat", "chat", "payments", "web"],
            ["assistant", "assistant", "api", "front"],
            ["/api/chat", "/other", "/x", None])
    out = EntityThresholdDeriver(cfg).attach(t)
    eks = out.column("entity_key").to_pylist()
    assert eks[0] == entity_key_string(cfg.env, cfg.site,
                                       "chat", "assistant")
    assert eks[2] == entity_key_string(cfg.env, cfg.site,
                                       "payments", "api")
    thr = out.column("latency_threshold_s").to_pylist()
    assert thr == [1.5, 0.8, 0.25,
                   cfg.sampling_latency_threshold_seconds]


def test_attach_matches_enrich_stage_bitwise():
    # randomized ns/svc/ctx mix, deterministic seed
    rng = np.random.default_rng(7)
    cfg = default_config()
    nss = rng.choice(["chat", "payments", "web", "etl"], 500)
    svcs = rng.choice(["assistant", "api", "front"], 500)
    ctxs = rng.choice(["/api/chat", "/other", "", "/x"], 500).astype(object)
    ctxs[rng.random(500) < 0.1] = None
    t = _mk(list(nss), list(svcs), list(ctxs))
    d = EntityThresholdDeriver(cfg)
    out = d.attach(t)

    # reference computation: scalar per-row lookups (thresholds.go:34-55)
    for i in range(t.num_rows):
        ek = entity_key_string(cfg.env, cfg.site, nss[i], svcs[i])
        ctx = ctxs[i] if ctxs[i] is not None else ""
        thr = d.request_thresholds.get(ek + "#" + ctx)
        if thr is None:
            thr = d.service_thresholds.get(ek, d.default_threshold)
        assert out.column("entity_key")[i].as_py() == ek
        assert out.column("latency_threshold_s")[i].as_py() == thr


def test_attach_empty_batch():
    out = EntityThresholdDeriver(default_config()).attach(_mk([], [], []))
    assert out.num_rows == 0
    assert out.schema.field("entity_key").type == pa.string()
    assert out.schema.field("latency_threshold_s").type == pa.float64()
