"""Ray-Data-native batch log/telemetry pipeline with the query and
data-processing capabilities of asserts/asserts-otel-processor.

The reference (``/root/reference``, Go, an OpenTelemetry collector trace
processor) enriches spans via per-service regex rule tables, classifies
traces error/slow/normal, retains a bounded top-K per (service, request)
and aggregates latency histograms.  This package re-expresses those
semantics as a batch Ray Data pipeline over Parquet *transcript* tables
``(conv_id, turn_idx, role, text, tool, ts)`` where a conversation plays
the role of a trace and a turn plays the role of a span.

Everything here is built on public Ray Data / Apache Arrow APIs only.
"""

from asserts_otel_processor_ray.config import PipelineConfig, default_config

__all__ = ["PipelineConfig", "default_config"]
__version__ = "0.1.0"
