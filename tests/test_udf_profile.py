"""Focused tests for the r11 rewrite of ``apply_in_pandas_group``
(grouped-map applyInPandas -> mapInPandas partials + builtin combine):
the per-order profile must be EXACT regardless of how Arrow batching
slices an order's rows across partial rows."""

from __future__ import annotations

import pytest

from columnar_aware_dedup_spark.operators.udf import apply_in_pandas_group
from tests.conftest import SF_DIR, rows_equal


def _direct_sql(spark, sf_dir: str):
    from columnar_aware_dedup_spark.io import table

    table(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_udf_t")
    return spark.sql(
        """
        SELECT l_orderkey,
               CAST(COUNT(*) AS INT) AS n_lines,
               SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                 AS total_price_cents,
               MAX(l_linenumber) AS max_line
        FROM _li_udf_t GROUP BY l_orderkey
        """
    )


def test_profile_matches_direct_sql(spark):
    assert rows_equal(apply_in_pandas_group(spark, SF_DIR), _direct_sql(spark, SF_DIR))


@pytest.mark.parametrize("batch_rows", [7, 100])
def test_profile_exact_under_tiny_arrow_batches(spark, batch_rows):
    """Force Arrow batches far smaller than an order's line count so
    every order IS split across partial rows — the cross-batch combine
    (sum of counts / int64 cents / max) must still be exact."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(batch_rows))
    try:
        assert rows_equal(
            apply_in_pandas_group(spark, SF_DIR), _direct_sql(spark, SF_DIR)
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
