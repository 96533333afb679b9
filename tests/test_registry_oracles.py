"""Run every registered query against its DuckDB oracle (driver-gate mirror).

New operators get coverage automatically: register() with an oracle string and
this module picks the query up on the next run.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import compare

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_match(name, spark, sf_dir):
    compare(_QUERIES[name](spark, sf_dir), _ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0 and len(df.columns) > 0


def test_every_oracle_has_a_query():
    assert set(_ORACLES) <= set(_QUERIES)


def test_driver_window_holds_priority_queries():
    """The driver checks the first 50 registered queries in dict order; the
    priority surface (dedup core, LLM pipeline, ORC family, macros) must sit
    inside that window."""
    import columnar_aware_dedup_spark as pkg

    names = list(_QUERIES)
    assert len(pkg.DRIVER_PRIORITY) == 50
    assert names[: len(pkg.DRIVER_PRIORITY)] == pkg.DRIVER_PRIORITY


#: every rows-only (no-oracle) query must be on this list with its reason —
#: a new registration without an oracle is a test failure, not a silent skip.
R_ALLOWLIST = {
    "transfer_stats_rollup_approx": "sketch percentiles are engine-specific",
    "grouped_percentile_approx": "sketch percentiles are engine-specific",
    "orc_file_chunks": "binary ORC bytes; DuckDB cannot chunk files",
    "orc_reconstruction": "binary reassembly golden, pytest-verified",
    "orc_hierarchical_dedup": "binary ORC probe over generated fixtures",
    "orc_linked_reconstruction": "binary reassembly golden, pytest-verified",
    "parquet_file_chunks": "binary parquet bytes; DuckDB cannot chunk files",
    "parquet_reconstruction": "binary reassembly golden, pytest-verified",
    "multimodal_decode": "kernel output engine-specific (PIL/fake gated)",
    "multimodal_frame_sample": "kernel output engine-specific",
    "ivf_train_kmeans": "iterative float averages; recovery pytest-verified",
    "file_inventory": "no DuckDB directory scan",
    "file_parse_overhead": "wall-clock measurement",
}


def test_rows_only_queries_are_allowlisted():
    rows_only = set(_QUERIES) - set(_ORACLES)
    assert rows_only == set(R_ALLOWLIST), (
        "every no-oracle query needs an R_ALLOWLIST reason; "
        f"unexpected: {sorted(rows_only - set(R_ALLOWLIST))}, "
        f"stale: {sorted(set(R_ALLOWLIST) - rows_only)}"
    )


def test_rotation_r3_is_a_valid_window():
    """The prepared r03 rotation must stay consistent with the registry: 50
    unique registered names covering every query that still lacks a driver
    CORRECTNESS row from r01/r02."""
    import columnar_aware_dedup_spark as pkg

    assert len(pkg.ROTATION_R3) == 50
    assert len(set(pkg.ROTATION_R3)) == 50
    assert set(pkg.ROTATION_R3) <= set(_QUERIES)
