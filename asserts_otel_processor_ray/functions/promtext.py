"""Prometheus text exposition of the aggregate tables (S4 parity).

The reference serves its counter/histogram families over `/metrics`
(assertsprocessor/metrics_exporter.go:22-56); the batch engine's
equivalent is a deterministic text rendering of the A1-A4 Parquet/Arrow
aggregate tables, matching the reference's family and label naming
(assertsprocessor/metrics.go:24-106, metric_helper.go:18-26):

* asserts_trace_count_total          (asserts_env, asserts_site)
* asserts_trace_sampled_count_total  (+ sample_type)
* asserts_span_count_total           (namespace, service)
* asserts_span_sampled_count_total   (namespace, service)
* otel_span_latency_seconds          histogram (cumulative buckets,
  +Inf, _sum, _count) over the sorted label set

Series are sorted by label values so the output is byte-stable.
"""

from __future__ import annotations

import math

import pyarrow as pa


def _esc(v: str) -> str:
    return (str(v).replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n"))


def _labels(row: dict, names: list[str]) -> str:
    inner = ",".join(f'{k}="{_esc(row.get(k) or "")}"'
                     for k in sorted(names))
    return "{" + inner + "}"


def _fmt_num(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _fmt_le(v: float) -> str:
    if math.isinf(v):
        return "+Inf"
    return f"{v:g}"


def _counter_lines(tbl: pa.Table, family: str, help_text: str,
                   value_col: str) -> list[str]:
    lines = [f"# HELP {family} {help_text}",
             f"# TYPE {family} counter"]
    label_names = [c for c in tbl.column_names if c != value_col]
    rows = sorted(tbl.to_pylist(),
                  key=lambda r: tuple(str(r.get(k) or "")
                                      for k in sorted(label_names)))
    for r in rows:
        lines.append(
            f"{family}{_labels(r, label_names)} "
            f"{_fmt_num(r[value_col])}")
    return lines


def render_promtext(aggregates: dict[str, "pa.Table"],
                    buckets: list[float] | None = None) -> str:
    """Render the pipeline's aggregate tables in Prometheus text
    exposition format.  ``aggregates`` is PipelineResult.aggregates
    (trace_count / trace_sampled_count / span_count /
    span_sampled_count / latency_hist); absent keys are skipped.
    ``buckets`` = configured histogram edges (emits every configured
    bucket cumulatively, plus +Inf, like a real registry would)."""
    out: list[str] = []
    counters = [
        ("trace_count", "asserts_trace_count_total",
         "Total Trace Counter", "trace_count_total"),
        ("trace_sampled_count", "asserts_trace_sampled_count_total",
         "Sampled Trace Counter", "trace_sampled_count_total"),
        ("span_count", "asserts_span_count_total",
         "Total Span Counter", "span_count_total"),
        ("span_sampled_count", "asserts_span_sampled_count_total",
         "Sampled Span Counter", "span_sampled_count_total"),
    ]
    for key, family, help_text, col in counters:
        tbl = aggregates.get(key)
        if isinstance(tbl, pa.Table) and tbl.num_rows:
            out.extend(_counter_lines(tbl, family, help_text, col))

    hist = aggregates.get("latency_hist")
    if isinstance(hist, pa.Table) and hist.num_rows:
        family = "otel_span_latency_seconds"
        out.append(f"# HELP {family} ")
        out.append(f"# TYPE {family} histogram")
        label_names = [c for c in hist.column_names
                       if c not in ("le", "bucket_count", "latency_sum",
                                    "latency_count")]
        series: dict[tuple, dict] = {}
        for r in hist.to_pylist():
            key = tuple(str(r.get(k) or "") for k in sorted(label_names))
            s = series.setdefault(key, {"row": r, "buckets": {},
                                        "sum": 0.0, "count": 0})
            s["buckets"][float(r["le"])] = s["buckets"].get(
                float(r["le"]), 0) + int(r["bucket_count"])
            s["sum"] += float(r["latency_sum"] or 0.0)
            s["count"] += int(r["latency_count"])
        edges = list(buckets) if buckets else sorted(
            e for s in series.values() for e in s["buckets"]
            if not math.isinf(e))
        for key in sorted(series):
            s = series[key]
            r = s["row"]
            for e in [*edges, math.inf]:
                cum_e = sum(c for le, c in s["buckets"].items()
                            if le <= e)
                lbl = dict(zip(sorted(label_names), key))
                lbl["le"] = _fmt_le(e)
                inner = ",".join(
                    f'{k}="{_esc(v)}"'
                    for k, v in sorted(lbl.items()))
                out.append(f"{family}_bucket{{{inner}}} {cum_e}")
            base = _labels(r, label_names)
            out.append(f"{family}_sum{base} {repr(float(s['sum']))}")
            out.append(f"{family}_count{base} {s['count']}")
    return "\n".join(out) + ("\n" if out else "")
