"""sample_traces=false pass-through mode (processor.go:70-74)."""

from asserts_otel_processor_ray.config import default_config
from asserts_otel_processor_ray.pipelines.pipeline import run_pipeline
from asserts_otel_processor_ray.sources.synthetic import ensure_transcripts


def test_passthrough_forwards_all_enriched_turns(ray_session, tmp_path):
    path = ensure_transcripts("/x/sf0.0003")
    cfg = default_config()
    cfg.sample_traces = False
    res = run_pipeline(path, cfg, out_dir=str(tmp_path))
    assert res.winners == [] and res.winner_map == {}
    assert "passthrough" in res.sink_paths
    rows = res.routed.count()
    # every parsed turn (post-M1 service filter) flows through enriched
    cfg2 = default_config()
    from asserts_otel_processor_ray.pipelines.pipeline import (
        build_enriched, read_transcripts)
    expected = build_enriched(read_transcripts(path), cfg2).count()
    assert rows == expected
    # histogram still captured (captureMetrics is independent of
    # sampling)
    assert res.aggregates["latency_hist"].num_rows > 0
