"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

The pipeline's primary input — the transcript table of
``BASELINE.json``'s input_hint — is synthesized deterministically per
sf_dir (seed 42) and cached under /tmp/graft_transcripts; the oracle
SQL reads the exact same parquet via read_parquet().  The TPC-H-ish
driver tables back the generic/training-data operators.

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() here or in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def entry() -> Any:
    """Flagship pipeline (parse→enrich→assemble→decide→route) on
    sf0.001; returns the routed turn table as a Ray Dataset."""
    from asserts_otel_processor_ray.pipelines.queries import artifacts
    art = artifacts(SF001)
    return art["routed"]


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from asserts_otel_processor_ray.pipelines.queries import CORE_QUERIES
    out: dict[str, Callable[[str], Any]] = {}
    out.update(CORE_QUERIES)
    try:
        from asserts_otel_processor_ray.pipelines.extra_queries import (
            EXTRA_QUERIES)
        out.update(EXTRA_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (run by the driver at sf=0.01)."""
    from asserts_otel_processor_ray.config import default_config
    from asserts_otel_processor_ray.pipelines.oracle_sql import (
        build_oracle_queries)
    from asserts_otel_processor_ray.sources.synthetic import (
        ensure_transcripts)
    path = ensure_transcripts(SF01)
    out = build_oracle_queries(
        default_config(), f"read_parquet('{path}/*.parquet')")
    try:
        from asserts_otel_processor_ray.pipelines.extra_queries import (
            EXTRA_ORACLE_SQL, ensure_source_fixtures)
        # the s_* oracle strings read fixed /tmp fixture paths — make
        # sure the files exist before DuckDB runs them
        ensure_source_fixtures()
        out.update(EXTRA_ORACLE_SQL)
    except ImportError:
        pass
    return out
