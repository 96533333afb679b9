"""User-defined function surface (SURVEY §2.10).

The reference's only extensibility is Java reflection on class names
(``main/ParquetClientMain.java:38-41``). The engine's extension points are
Arrow-batched pandas UDFs — one of each registered shape:

- scalar ``@pandas_udf``: vectorized per-row kernel (columns in, column out);
- ``mapInPandas`` whole-batch partials (``apply_in_pandas_group`` — since
  the r11 optimization the grouped profile runs as batch partials + a
  builtin combine, NOT grouped-map ``applyInPandas``; the batch grouped-map
  API itself stays exercised by
  ``tests/test_udf_profile.py::test_grouped_map_apply_in_pandas_surface``,
  and the stateful variant ``applyInPandasWithState`` runs in the
  streaming operators);
- grouped-agg ``@pandas_udf`` (``pandas_udf_grouped_agg``);
- ``mapInPandas`` is also exercised by the binary chunkers
  (:mod:`columnar_aware_dedup_spark.sources.chunkers`).

All queries here are *deterministic* and therefore oracle-checkable — the
UDF kernels recompute something SQL can express, proving the Arrow transfer
itself doesn't perturb values.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from columnar_aware_dedup_spark.io import table
from columnar_aware_dedup_spark.registry import register


def _net_price_kernel():
    """Vectorized net-price: identical arithmetic to the SQL expression, so
    results match bit-for-bit (both are double ops over the same values).

    Built lazily — ``pandas_udf`` return-type parsing needs an active
    SparkSession, which doesn't exist at import time.
    """

    @pandas_udf("double")
    def kernel(ext: pd.Series, disc: pd.Series) -> pd.Series:
        return ext * (1.0 - disc)

    return kernel


@register(
    "pandas_udf_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
ORDER BY l_orderkey, l_linenumber
""",
)
def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF in a pruned, filtered pipeline — the filter still
    pushes to the scan (UDF sits above it)."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= "1997-01-01"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _net_price_kernel()("l_extendedprice", "l_discount").alias("net_price"),
    ).orderBy("l_orderkey", "l_linenumber")


def _order_profile_partials(batches):
    """Per-BATCH vectorized partial profiles: one pandas ``groupby`` over
    each whole Arrow batch (guide §4.2 — hand batches to vectorized
    pandas, never one tiny frame per key), emitting at most one partial
    row per (order, batch). All three quantities are combine-associative
    (count/sum in exact int64 cents, max), so the builtin final aggregate
    downstream recovers the per-order profile exactly, in any row
    order."""
    for pdf in batches:
        cents = (pdf["l_extendedprice"] * 100).round().astype("int64")
        g = (
            pd.DataFrame(
                {
                    "l_orderkey": pdf["l_orderkey"],
                    "n_lines": 1,
                    "cents": cents,
                    "max_line": pdf["l_linenumber"],
                }
            )
            .groupby("l_orderkey", sort=False)
            .agg(
                n_lines=("n_lines", "sum"),
                cents=("cents", "sum"),
                max_line=("max_line", "max"),
            )
        )
        yield g.reset_index()


@register(
    "apply_in_pandas_group",
    oracle="""
SELECT l_orderkey,
       CAST(COUNT(*) AS INTEGER) AS n_lines,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS total_price_cents,
       CAST(MAX(l_linenumber) AS INTEGER) AS max_line
FROM lineitem
GROUP BY l_orderkey
ORDER BY l_orderkey
""",
)
def apply_in_pandas_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order revenue profile through a whole-batch pandas kernel.

    r11 (optimization, guide §2.3/§4.2): the original shape —
    ``groupBy(l_orderkey).applyInPandas(...)`` — invoked the Python
    kernel once per ORDER with a one-order pandas frame (~15 k calls at
    sf0.01; measured 95 s, the registry's worst row), after shuffling
    every lineitem row to its group. The kernel is combine-associative
    (count, exact int64-cent sum, max), so it now runs as ``mapInPandas``
    partials — one vectorized pandas ``groupby`` per Arrow batch, no
    pre-shuffle — with a builtin final aggregate over the at-most-one-
    row-per-(order, batch) partials: the map-side-aggregation design the
    guide prescribes over grouped-map UDFs. Only the three needed columns
    cross the Python boundary. Results are bit-identical (the oracle is
    unchanged; int64 accumulation is order-free). Grouped-map kernels
    remain right when per-group state is genuinely non-associative —
    the streaming ``applyInPandasWithState`` operators are that case."""
    li = table(spark, sf_dir, "lineitem")
    partials = li.select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    ).mapInPandas(
        _order_profile_partials,
        "l_orderkey long, n_lines long, cents long, max_line int",
    )
    return (
        partials.groupBy("l_orderkey")
        .agg(
            F.sum("n_lines").cast("int").alias("n_lines"),
            F.sum("cents").alias("total_price_cents"),
            F.max("max_line").alias("max_line"),
        )
        .orderBy("l_orderkey")
    )


def _weighted_mean_kernel():
    """Grouped-agg kernel: discount-weighted mean price in integer cents
    (sum of products / sum of weights — deterministic int64 accumulation,
    final division in double)."""

    @pandas_udf("double")
    def kernel(price: pd.Series, qty: pd.Series) -> float:
        cents = (price * 100).round().astype("int64")
        q = qty.round().astype("int64")
        num = int((cents * q).sum())
        den = int(q.sum())
        return float(num) / float(den) / 100.0

    return kernel


@register(
    "pandas_udf_grouped_agg",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
         / CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / 100.0
         AS qty_weighted_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def pandas_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF — the third pandas-UDF shape next to
    scalar and grouped-map: a whole group reduces to ONE value through an
    Arrow batch (custom aggregators — weighted means, trimmed stats,
    sketches — drop into this slot).

    Determinism discipline: the kernel accumulates in int64 cents x int64
    quantities so the sum is exact and order-free; only the final ratio is
    floating point — which is why it can be H-checked against SQL at all.
    Scale note: grouped-agg buffers one group per Arrow batch, so group
    cardinality (6 flags) and per-group size both matter; for unbounded
    groups prefer built-in aggregates or a two-phase partial design.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            _weighted_mean_kernel()("l_extendedprice", "l_quantity").alias(
                "qty_weighted_price"
            )
        )
        .orderBy("l_returnflag")
    )
