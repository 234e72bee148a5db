"""CLI entry point — the batch analog of running the collector binary.

    python -m asserts_otel_processor_ray run \
        --input /path/to/transcripts_parquet \
        --out /tmp/out [--config cfg.yaml] [--checkpoint /tmp/ck]

    python -m asserts_otel_processor_ray convert-jaeger \
        --input trace1.json trace2.json --out /tmp/transcripts

Owns its Ray session (guarded init) — the driver-contract module
(__ray_entry__.py) never does.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="asserts_otel_processor_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="run the full pipeline")
    run.add_argument("--input", required=True,
                     help="transcript parquet file/dir")
    run.add_argument("--out", required=True, help="output directory")
    run.add_argument("--config", help="YAML pipeline config")
    run.add_argument("--checkpoint", help="checkpoint/lineage directory")
    run.add_argument("--num-cpus", type=int, default=None)
    run.add_argument("--window-seconds", type=float, default=None,
                     help="incremental-flush mode: one flush per "
                          "event-time window of this many seconds "
                          "(default: single flush)")
    run.add_argument("--promtext", action="store_true",
                     help="also write metrics.prom (Prometheus text "
                          "exposition of the aggregate tables)")

    conv = sub.add_parser("convert-jaeger",
                          help="convert Jaeger JSON to transcript parquet")
    conv.add_argument("--input", nargs="+", required=True)
    conv.add_argument("--out", required=True)

    args = ap.parse_args(argv)

    if args.cmd == "convert-jaeger":
        import os

        import pyarrow.parquet as pq

        from asserts_otel_processor_ray.sources.jaeger import (
            read_jaeger_json)
        tbl = read_jaeger_json(args.input)
        os.makedirs(args.out, exist_ok=True)
        out = f"{args.out}/transcripts.parquet"
        pq.write_table(tbl, out)
        print(json.dumps({"rows": tbl.num_rows, "path": out}))
        return 0

    import ray
    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)
    try:
        from asserts_otel_processor_ray.config import (
            PipelineConfig, default_config)
        from asserts_otel_processor_ray.pipelines.pipeline import (
            run_pipeline)
        cfg = (PipelineConfig.from_yaml(args.config) if args.config
               else default_config())
        def write_promtext(aggregates: dict) -> str:
            import glob as _g
            import os

            import pyarrow as pa
            import pyarrow.parquet as pq

            from asserts_otel_processor_ray.functions.promtext import (
                render_promtext)
            aggs = {}
            for k, v in aggregates.items():
                if isinstance(v, str):
                    fs = sorted(_g.glob(os.path.join(v, "*.parquet")))
                    if fs:
                        aggs[k] = pa.concat_tables(
                            [pq.read_table(f) for f in fs])
                elif isinstance(v, pa.Table):
                    aggs[k] = v
            path = os.path.join(args.out, "metrics.prom")
            with open(path, "w") as f:
                f.write(render_promtext(
                    aggs, buckets=cfg.latency_histogram_buckets))
            return path

        if args.window_seconds:
            from asserts_otel_processor_ray.pipelines.pipeline import (
                run_pipeline_windowed)
            res = run_pipeline_windowed(
                args.input, cfg, out_dir=args.out,
                window_seconds=args.window_seconds,
                with_aggregates=args.promtext)
            summary = {
                "windows": sorted(res["winners_by_window"]),
                "winners": {w: len(v) for w, v
                            in res["winners_by_window"].items()},
                "skipped": res["skipped"],
            }
            if args.promtext:
                summary["promtext"] = write_promtext(res["aggregates"])
            print(json.dumps(summary))
            return 0
        res = run_pipeline(args.input, cfg, out_dir=args.out,
                           checkpoint_dir=args.checkpoint)
        if args.promtext:
            res.sink_paths["metrics.prom"] = write_promtext(
                res.aggregates)
        summary = {
            "winners": len(res.winners),
            "sinks": res.sink_paths,
            "aggregates": {k: str(v) for k, v in res.aggregates.items()},
        }
        print(json.dumps(summary))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
