"""Prometheus text exposition (functions/promtext.py) — family/label
naming per assertsprocessor/metrics.go:24-106 + metric_helper.go:18-26,
golden vectors modeled on metric_helper_test.go:40-59."""

import pyarrow as pa

from asserts_otel_processor_ray.functions.promtext import render_promtext


def _agg_tables():
    trace_count = pa.table({
        "asserts_env": ["dev"], "asserts_site": ["us-west-2"],
        "trace_count_total": pa.array([42], pa.int64())})
    sampled = pa.table({
        "asserts_env": ["dev", "dev"],
        "asserts_site": ["us-west-2", "us-west-2"],
        "sample_type": ["error", "slow"],
        "trace_sampled_count_total": pa.array([7, 3], pa.int64())})
    span_count = pa.table({
        "asserts_env": ["dev"], "asserts_site": ["us-west-2"],
        "namespace": ["ride-services"], "service": ["payment"],
        "span_count_total": pa.array([99], pa.int64())})
    hist = pa.table({
        "asserts_env": ["dev", "dev"],
        "asserts_site": ["us-west-2", "us-west-2"],
        "namespace": ["ride-services", "ride-services"],
        "service": ["payment", "payment"],
        "span_kind": ["Client", "Client"],
        "status_code": ["Ok", "Ok"],
        "asserts_request_context": ["GetItem", "GetItem"],
        "le": pa.array([0.25, 1.0], pa.float64()),
        "bucket_count": pa.array([5, 2], pa.int64()),
        "latency_sum": pa.array([0.9, 1.4], pa.float64()),
        "latency_count": pa.array([5, 2], pa.int64())})
    return {"trace_count": trace_count, "trace_sampled_count": sampled,
            "span_count": span_count, "latency_hist": hist}


def test_counter_families_and_labels():
    text = render_promtext(_agg_tables())
    assert "# TYPE asserts_trace_count_total counter" in text
    assert ('asserts_trace_count_total{asserts_env="dev",'
            'asserts_site="us-west-2"} 42') in text
    assert ('asserts_trace_sampled_count_total{asserts_env="dev",'
            'asserts_site="us-west-2",sample_type="error"} 7') in text
    assert ('asserts_span_count_total{asserts_env="dev",'
            'asserts_site="us-west-2",namespace="ride-services",'
            'service="payment"} 99') in text


def test_histogram_cumulative_buckets():
    text = render_promtext(_agg_tables(), buckets=[0.25, 0.5, 1.0])
    assert "# TYPE otel_span_latency_seconds histogram" in text

    def bucket_val(le):
        ln = [l for l in text.splitlines()
              if l.startswith("otel_span_latency_seconds_bucket")
              and f'le="{le}"' in l]
        assert len(ln) == 1
        return int(ln[0].rsplit(" ", 1)[1])

    # cumulative: 5 at 0.25, still 5 at 0.5, 7 at 1.0 and +Inf
    assert bucket_val("0.25") == 5
    assert bucket_val("0.5") == 5
    assert bucket_val("1") == 7
    assert bucket_val("+Inf") == 7
    assert "otel_span_latency_seconds_count" in text
    sum_line = [ln for ln in text.splitlines()
                if ln.startswith("otel_span_latency_seconds_sum")][0]
    assert sum_line.endswith(" 2.3")


def test_render_is_deterministic_and_sorted():
    a = render_promtext(_agg_tables(), buckets=[0.25, 1.0])
    b = render_promtext(_agg_tables(), buckets=[0.25, 1.0])
    assert a == b
    lines = [ln for ln in a.splitlines()
             if ln.startswith("asserts_trace_sampled_count_total{")]
    assert lines == sorted(lines)  # series sorted by label values


def test_pipeline_aggregates_render(ray_session, tmp_path):
    """End-to-end: real PipelineResult.aggregates render without error
    and expose every family."""
    from asserts_otel_processor_ray.config import default_config
    from asserts_otel_processor_ray.pipelines.pipeline import run_pipeline
    from asserts_otel_processor_ray.sources.synthetic import (
        ensure_transcripts)
    path = ensure_transcripts("/x/sf0.0003")
    cfg = default_config()
    res = run_pipeline(path, cfg)
    text = render_promtext(res.aggregates,
                           buckets=cfg.latency_histogram_buckets)
    for fam in ["asserts_trace_count_total",
                "asserts_trace_sampled_count_total",
                "asserts_span_count_total",
                "asserts_span_sampled_count_total",
                "otel_span_latency_seconds_bucket"]:
        assert fam in text
