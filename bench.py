#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default: run the headline parse→enrich→route→aggregate pipeline over the
transcripts of $GRAFT_SF_DIR (default /root/testdata/sf0.1) with
ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32) and print ONE JSON line.

--scaling: run the identical job twice in fresh processes at N=8 and
4N=32 CPUs on the same input and report both throughputs plus the
scaling efficiency (BASELINE.json two-cluster-size criterion, evidenced
by two parallelism levels in this single-node sandbox).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def run_once(sf_dir: str, num_cpus: int) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray
    # default object store (42.9% of RAM) spills at larger scale
    # factors with <12 MB/s write throughput; give it 55% instead
    try:
        import psutil
        store = int(psutil.virtual_memory().total * 0.55)
    except Exception:
        store = 64 * 1024 ** 3
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR", object_store_memory=store)
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    from asserts_otel_processor_ray.config import default_config
    from asserts_otel_processor_ray.pipelines.pipeline import run_pipeline
    from asserts_otel_processor_ray.sources.synthetic import (
        ensure_transcripts)
    import pyarrow.parquet as pq
    import glob

    path = ensure_transcripts(sf_dir)  # cached; excluded from timing
    n_turns = sum(pq.read_metadata(f).num_rows
                  for f in glob.glob(path + "/*.parquet"))
    # warm the worker pool (process startup is cluster-boot cost, not
    # pipeline throughput)
    ray.data.range(10_000).map_batches(lambda b: b).materialize()
    out_dir = f"/tmp/bench_out_{num_cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)

    cfg = default_config()
    timings: dict[str, float] = {}
    t0 = time.time()
    res = run_pipeline(path, cfg, out_dir=None)
    timings["decide_and_winners"] = time.time() - t0

    t1 = time.time()
    routed_rows = res.routed.count()
    timings["route"] = time.time() - t1

    t2 = time.time()
    import pyarrow as pa
    agg_rows = {}
    for name, agg in res.aggregates.items():
        agg_rows[name] = (agg.num_rows if isinstance(agg, pa.Table)
                          else agg.count())
    timings["aggregates"] = time.time() - t2

    total = time.time() - t0
    ray.shutdown()
    return {
        "sf_dir": sf_dir,
        "num_cpus": num_cpus,
        "n_turns": n_turns,
        "routed_rows": routed_rows,
        "agg_rows": agg_rows,
        "total_sec": round(total, 3),
        "turns_per_sec": round(n_turns / total, 1),
        "queries": {k: round(v, 3) for k, v in timings.items()},
    }


def main() -> None:
    args = sys.argv[1:]
    if "--once" in args:
        cpus = NUM_CPUS
        if "--cpus" in args:
            cpus = int(args[args.index("--cpus") + 1])
        print(json.dumps(run_once(SF_DIR, cpus)))
        return

    if "--scaling" in args:
        # the scaling criterion wants a compute-dominated job (a real
        # cluster run is exactly that); default to a larger synthetic
        # input than the per-round bench unless the caller overrides
        scaling_dir = os.environ.get("GRAFT_SCALING_SF_DIR",
                                     "/root/testdata/sf4")
        # generate the input in the parent so neither timed child pays
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from asserts_otel_processor_ray.sources.synthetic import (
            ensure_transcripts)
        ensure_transcripts(scaling_dir)
        results = {}
        for cpus in (8, 32):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--once",
                 "--cpus", str(cpus)],
                capture_output=True, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
                env={**os.environ, "GRAFT_SF_DIR": scaling_dir})
            line = proc.stdout.strip().splitlines()[-1]
            results[cpus] = json.loads(line)
        tp8 = results[8]["turns_per_sec"]
        tp32 = results[32]["turns_per_sec"]
        eff = (tp32 / tp8) / 4.0
        out = {
            "metric": "scaling efficiency N=8 → 4N=32 cpus",
            "value": round(eff, 3),
            "unit": "ratio",
            "sf": scaling_dir,
            "throughput_n8_turns_per_sec": tp8,
            "throughput_n32_turns_per_sec": tp32,
            "total_sec_n8": results[8]["total_sec"],
            "total_sec_n32": results[32]["total_sec"],
            "gate": ">=0.8",
        }
        print(json.dumps(out))
        return

    # default: one headline run in-process, driver-contract JSON line
    r = run_once(SF_DIR, NUM_CPUS)
    out = {
        "metric": "end-to-end parse→enrich→route→aggregate wall time",
        "value": r["total_sec"],
        "unit": "sec",
        "queries": r["queries"],
        "sf": SF_DIR,
        "num_cpus": r["num_cpus"],
        "n_turns": r["n_turns"],
        "turns_per_sec": r["turns_per_sec"],
        "routed_rows": r["routed_rows"],
    }
    print(json.dumps(out, ensure_ascii=False))


if __name__ == "__main__":
    main()
