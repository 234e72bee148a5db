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
        res = run_pipeline(args.input, cfg, out_dir=args.out,
                           checkpoint_dir=args.checkpoint)
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
