"""The three partitioning plans (none / sort / hash) must produce
value-identical decided tables and identical winner sets; the "none"
plan must be auto-selected only when parquet statistics prove the
input is conversation-clustered, and its runtime guard must reject
unclustered blocks."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from asserts_otel_processor_ray.config import default_config
from asserts_otel_processor_ray.pipelines.pipeline import (
    build_decided_ex,
    parquet_conv_clustered,
    read_transcripts,
    select_winners,
)
from asserts_otel_processor_ray.sources.synthetic import ensure_transcripts

SF_DIR = "/tmp/graft_sf/sf0.0003"


def _decided_df(path, shuffle, **kw):
    cfg = default_config()
    b = build_decided_ex(read_transcripts(path), cfg, num_partitions=8,
                         shuffle=shuffle, **kw)
    df = b.decided.to_pandas().sort_values(
        ["conv_id", "turn_idx"], ignore_index=True)
    df = df.reindex(sorted(df.columns), axis=1)
    winners = select_winners(b.decided, cfg)
    return df, sorted(b.allowed), winners


def test_modes_value_identical(ray_session):
    path = ensure_transcripts(SF_DIR)
    base, allowed0, win0 = _decided_df(path, "sort")
    for mode in ("none", "hash"):
        df, allowed, win = _decided_df(path, mode)
        assert list(df.columns) == list(base.columns), mode
        pd.testing.assert_frame_equal(df, base, check_dtype=False), mode
        assert allowed == allowed0, mode
        assert win == win0, mode


def test_auto_picks_none_for_clustered(ray_session):
    path = ensure_transcripts(SF_DIR)
    assert parquet_conv_clustered(path)
    # auto with a clustered source_path must equal the explicit modes
    df_auto, _, _ = _decided_df(path, "auto", source_path=path)
    df_none, _, _ = _decided_df(path, "none")
    pd.testing.assert_frame_equal(df_auto, df_none, check_dtype=False)


def _unclustered_copy(tmp_path) -> str:
    src = ensure_transcripts(SF_DIR)
    files = sorted(os.listdir(src))
    tbl = pa.concat_tables([pq.read_table(os.path.join(src, f))
                            for f in files])
    rng = np.random.default_rng(7)
    perm = rng.permutation(tbl.num_rows)
    out = str(tmp_path / "shuffled")
    os.makedirs(out, exist_ok=True)
    pq.write_table(tbl.take(pa.array(perm)),
                   os.path.join(out, "part-00000.parquet"),
                   row_group_size=512)
    return out


def test_unclustered_detected_and_guarded(ray_session, tmp_path):
    bad = _unclustered_copy(tmp_path)
    # plan-time: statistics refuse the no-exchange plan
    assert not parquet_conv_clustered(bad)
    # auto falls back to sort and still matches the clustered run's
    # values (same rows, different physical layout)
    good, _, _ = _decided_df(ensure_transcripts(SF_DIR), "sort")
    df, _, _ = _decided_df(bad, "auto", source_path=bad)
    pd.testing.assert_frame_equal(df, good, check_dtype=False)
    # run-time: forcing shuffle="none" on unclustered input raises
    with pytest.raises(Exception, match="conversation-clustered"):
        _decided_df(bad, "none")


def _interior_straddle_copy(tmp_path) -> tuple[str, str]:
    """The ADVICE repro layout: a provably-clustered input where a
    straddling conv sits positionally INTERIOR in its block.  File 1
    row order = [c0..c(k-2), M-first-half, c(k-1)] with M = c(k), so
    file 1's stats are min=c0 / max=M but its LAST row's conv is
    c(k-1); file 2 = [M-second-half, c(k+1)..].  Position-based edge
    marking misses M in block 1 and silently decides it as two
    fragments; value-based marking routes it through edge repair."""
    src = ensure_transcripts(SF_DIR)
    tbl = pa.concat_tables([pq.read_table(os.path.join(src, f))
                            for f in sorted(os.listdir(src))])
    df = tbl.to_pandas().sort_values(["conv_id", "turn_idx"],
                                     ignore_index=True)
    convs = sorted(df["conv_id"].unique())
    assert len(convs) >= 8
    k = len(convs) // 2
    m = convs[k]
    mrows = df[df["conv_id"] == m]
    assert len(mrows) >= 2, "need a multi-row conv to straddle"
    half = len(mrows) // 2
    part1 = pd.concat([df[df["conv_id"].isin(convs[:k - 1])],
                       mrows.iloc[:half],
                       df[df["conv_id"] == convs[k - 1]]],
                      ignore_index=True)
    part2 = pd.concat([mrows.iloc[half:],
                       df[df["conv_id"].isin(convs[k + 1:])]],
                      ignore_index=True)
    out = str(tmp_path / "interior_straddle")
    os.makedirs(out, exist_ok=True)
    for i, p in enumerate((part1, part2)):
        pq.write_table(pa.Table.from_pandas(p, schema=tbl.schema,
                                            preserve_index=False),
                       os.path.join(out, f"part-{i:05d}.parquet"))
    return out, m


def test_interior_straddle_conv_repaired(ray_session, tmp_path):
    path, m = _interior_straddle_copy(tmp_path)
    # the stats chain still PROVES clustering (equality at the seam)
    assert parquet_conv_clustered(path)
    cfg = default_config()
    # force one block per file so conv m straddles two blocks while
    # being positionally interior in block 1
    ds = read_transcripts(path, num_blocks=2)
    b = build_decided_ex(ds, cfg, num_partitions=2, shuffle="none")
    got = b.decided.to_pandas().sort_values(
        ["conv_id", "turn_idx"], ignore_index=True)
    want, _, _ = _decided_df(path, "sort")
    got = got.reindex(sorted(got.columns), axis=1)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # and winner selection over the repaired table agrees too
    assert select_winners(b.decided, cfg) == _decided_df(path, "sort")[2]


def test_routed_equal_on_unclustered_source(ray_session, tmp_path):
    """Full run_pipeline on an unclustered copy must route the same
    rows as on the clustered original — exercises shuffle='sort'
    fallback AND the route join's conv-range slice degrading to wide
    slices on unclustered batches (still exact)."""
    from asserts_otel_processor_ray.pipelines.pipeline import run_pipeline
    cfg = default_config()
    a = run_pipeline(ensure_transcripts(SF_DIR), cfg).routed.to_pandas()
    b = run_pipeline(_unclustered_copy(tmp_path), cfg).routed.to_pandas()
    key = ["conv_id", "turn_idx"]
    a = a.sort_values(key, ignore_index=True)
    b = b.sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
