"""Boundary-conversation repair: the distributed
groupby(conv).map_groups path must be bitwise-equal to the driver-side
assemble of edge rows (build_decided_ex(boundary_mode=...))."""

import pandas as pd


def _decided_df(mode, ray_session):
    from asserts_otel_processor_ray.config import default_config
    from asserts_otel_processor_ray.pipelines.pipeline import (
        build_decided_ex, read_transcripts)
    from asserts_otel_processor_ray.sources.synthetic import (
        ensure_transcripts)
    path = ensure_transcripts("/x/sf0.0003")
    cfg = default_config()
    b = build_decided_ex(read_transcripts(path), cfg,
                         num_partitions=8, collect_agg=True,
                         boundary_mode=mode)
    df = (b.decided.to_pandas()
          .sort_values(["conv_id", "turn_idx"], ignore_index=True))
    return b, df


def test_distributed_boundary_equals_driver(ray_session):
    bd, dd = _decided_df("driver", ray_session)
    bx, dx = _decided_df("distributed", ray_session)
    pd.testing.assert_frame_equal(dd, dx)
    assert bd.allowed == bx.allowed
    # aggregate partials merge to the same finals
    for a, b in [(bd.counts_df, bx.counts_df)]:
        ga = (a.groupby(["kind", "namespace", "service"])
              ["partial_count"].sum().sort_index())
        gb = (b.groupby(["kind", "namespace", "service"])
              ["partial_count"].sum().sort_index())
        pd.testing.assert_series_equal(ga, gb)
