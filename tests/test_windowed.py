"""K4 incremental flush (run_pipeline_windowed): per-window winners
equal the single-flush run over that window's conversations, and resume
skips finished windows (reference cadence: sampler.go:215-276)."""

import glob
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

WINDOW_S = 600.0   # 10-minute flush windows over the synthetic stream


@pytest.fixture(scope="module")
def windowed_run(ray_session, tmp_path_factory):
    from asserts_otel_processor_ray.config import default_config
    from asserts_otel_processor_ray.pipelines.pipeline import (
        run_pipeline_windowed)
    from asserts_otel_processor_ray.sources.synthetic import (
        ensure_transcripts)
    path = ensure_transcripts("/x/sf0.0003")
    out = str(tmp_path_factory.mktemp("windowed"))
    cfg = default_config()
    res = run_pipeline_windowed(path, cfg, out_dir=out,
                                window_seconds=WINDOW_S)
    return path, out, cfg, res


def _conv_windows(path: str) -> pd.Series:
    tbl = pa.concat_tables([pq.read_table(f, columns=["conv_id", "ts"])
                            for f in glob.glob(path + "/*.parquet")])
    df = tbl.to_pandas()
    arr = df.groupby("conv_id")["ts"].min().astype("int64")
    return arr // int(WINDOW_S * 1_000_000)


def test_multiple_windows_produced(windowed_run):
    _, _, _, res = windowed_run
    assert len(res["winners_by_window"]) >= 2


def test_window_equals_single_flush_of_window_convs(windowed_run):
    """Winners of one window == single-flush run over an input filtered
    to that window's conversations (admission caps are uncontended at
    this scale, so global vs subset caps agree)."""
    import ray.data
    from asserts_otel_processor_ray.pipelines.pipeline import run_pipeline
    path, _, cfg, res = windowed_run
    conv_win = _conv_windows(path)
    w = sorted(res["winners_by_window"])[1]
    convs = set(conv_win[conv_win == w].index)

    tbl = pa.concat_tables([pq.read_table(f)
                            for f in glob.glob(path + "/*.parquet")])
    sub = tbl.filter(pa.compute.is_in(
        tbl.column("conv_id"),
        value_set=pa.array(sorted(convs), pa.string())))
    single = run_pipeline(ray.data.from_arrow(sub), cfg,
                          with_aggregates=False)

    got = {(r["conv_id"], r["sample_type"])
           for r in res["winners_by_window"][w]}
    want = {(r["conv_id"], r["sample_type"]) for r in single.winners}
    assert got == want and len(got) > 0


def test_winner_windows_match_conv_arrival(windowed_run):
    path, _, _, res = windowed_run
    conv_win = _conv_windows(path)
    for w, winners in res["winners_by_window"].items():
        for r in winners:
            assert conv_win[r["conv_id"]] == w


def test_resume_skips_complete_windows(windowed_run, ray_session):
    from asserts_otel_processor_ray.config import default_config
    from asserts_otel_processor_ray.pipelines.pipeline import (
        run_pipeline_windowed)
    path, out, cfg, res = windowed_run
    manifest = os.path.join(out, "_lineage", "manifest.jsonl")
    n_before = sum(1 for _ in open(manifest))
    res2 = run_pipeline_windowed(path, cfg, out_dir=out,
                                 window_seconds=WINDOW_S)
    # every (window, sink) stage skipped; no new lineage records
    assert sorted(res2["skipped"]) == sorted(res2["sink_paths"])
    assert sum(1 for _ in open(manifest)) == n_before


def test_resume_recomputes_only_missing_window(windowed_run, ray_session):
    from asserts_otel_processor_ray.config import default_config
    from asserts_otel_processor_ray.pipelines.pipeline import (
        run_pipeline_windowed)
    import shutil
    path, out, cfg, res = windowed_run
    windows = sorted(res["winners_by_window"])
    w_kill = windows[-1]
    kill_prefix = f"window={w_kill:06d}/"
    # simulate a crash before the last window's flush completed:
    # remove its sink dirs and lineage records
    manifest = os.path.join(out, "_lineage", "manifest.jsonl")
    keep = [ln for ln in open(manifest)
            if kill_prefix not in json.loads(ln).get("stage", "")]
    with open(manifest, "w") as f:
        f.writelines(keep)
    shutil.rmtree(os.path.join(out, f"window={w_kill:06d}"))
    finished = os.path.join(out, f"window={windows[0]:06d}")
    mtimes = {p: os.path.getmtime(p)
              for p in glob.glob(finished + "/*/*.parquet")}

    res3 = run_pipeline_windowed(path, cfg, out_dir=out,
                                 window_seconds=WINDOW_S)
    assert os.path.isdir(os.path.join(out, f"window={w_kill:06d}"))
    for stage in res3["skipped"]:
        assert kill_prefix not in stage
    # the finished window's files were not rewritten
    assert mtimes == {p: os.path.getmtime(p)
                      for p in glob.glob(finished + "/*/*.parquet")}


def test_windowed_aggregates_match_single_flush(windowed_run,
                                                ray_session,
                                                tmp_path_factory):
    """A1/A3/A4 are winner-independent (one cumulative registry in the
    reference regardless of flush cadence): the windowed run's
    trace_count / span_count / latency_hist must equal the single-flush
    run's, byte for byte.  (A2/A5-sampled differ by design: windowed
    mode flushes winners per window.)"""
    from asserts_otel_processor_ray.config import default_config
    from asserts_otel_processor_ray.pipelines.pipeline import (
        run_pipeline, run_pipeline_windowed)
    path, _, cfg, _ = windowed_run
    out = str(tmp_path_factory.mktemp("windowed_agg"))
    wres = run_pipeline_windowed(path, cfg, out_dir=out,
                                 window_seconds=WINDOW_S,
                                 with_aggregates=True)
    sres = run_pipeline(path, cfg, with_aggregates=True)

    def _tbl(v):
        if isinstance(v, str):
            return pa.concat_tables(
                [pq.read_table(f)
                 for f in sorted(glob.glob(v + "/*.parquet"))])
        return v

    for name in ("trace_count", "span_count", "latency_hist"):
        got = _tbl(wres["aggregates"][name]).to_pandas()
        want = _tbl(sres.aggregates[name]).to_pandas()
        cols = list(want.columns)
        got = got[cols].sort_values(cols).reset_index(drop=True)
        want = want.sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
