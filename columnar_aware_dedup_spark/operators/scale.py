"""Scale-technique operators: the 100 TB patterns, runnable and checked.

These queries exist to *prove* the engine's scale techniques preserve
semantics: each computes a result that must hash-match the straightforward
formulation's oracle, while its plan uses the technique (salting, two-phase
aggregation, correlated-subquery decorrelation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_aware_dedup_spark.functions.hashing import exact_sum_sql
from columnar_aware_dedup_spark.io import table
from columnar_aware_dedup_spark.registry import register

_SALT_BUCKETS = 16


@register(
    "salted_groupby",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {exact_sum_sql('l_quantity')} AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def salted_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation: salt -> partial agg -> de-salt -> final agg.

    (l_returnflag, l_linestatus) has ~6 distinct values — at 100 TB a direct
    groupBy would funnel everything through 6 reducers. Salting fans the
    first shuffle out 16x, then the tiny partial results re-aggregate. The
    oracle is the *unsalted* query: the decimal partial sums are associative,
    so the two-phase result is bit-identical.
    """
    li = table(spark, sf_dir, "lineitem").withColumn(
        "_salt", (F.crc32(F.col("l_orderkey").cast("string")) % _SALT_BUCKETS)
    )
    partial = li.groupBy("l_returnflag", "l_linestatus", "_salt").agg(
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("_psum"),
        F.count("*").alias("_pcnt"),
    )
    return (
        partial.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("_psum").cast("double").alias("sum_qty"),
            F.sum("_pcnt").cast("bigint").alias("n_rows"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "correlated_subquery",
    oracle="""
SELECT p_partkey, p_type, p_retailprice
FROM part p
WHERE p_retailprice > (SELECT 1.15 * AVG(p2.p_retailprice)
                       FROM part p2 WHERE p2.p_type = p.p_type)
ORDER BY p_partkey
""",
)
def correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q2/Q17 shape) — Catalyst
    decorrelates it into an aggregate + join; no per-row re-execution.

    avg() stays un-rounded on both sides: it feeds a strict inequality, and
    the compared values differ by >>1 ulp for every fixture row, so the
    predicate is stable even if the engines' division differs in the last
    bit.
    """
    table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, p_type, p_retailprice
        FROM part p
        WHERE p_retailprice > (SELECT 1.15 * AVG(p2.p_retailprice)
                               FROM part p2 WHERE p2.p_type = p.p_type)
        ORDER BY p_partkey
        """
    )


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: date-pruned scan + EXISTS semi-join + rollup."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-10-01")
    )
    li = table(spark, sf_dir, "lineitem")
    matched = o.join(
        li,
        (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        matched.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate (every predicate pushes to
    the parquet reader; the classic pushdown benchmark)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(28,6)"))
        .cast("double")
        .alias("revenue")
    )


def write_bucketed(df: DataFrame, name: str, key: str, n_buckets: int = 8) -> None:
    """Persist ``df`` as a parquet table bucketed AND sorted by ``key``.

    Bucketing is the co-location technique for repeated fact-fact joins at
    100 TB: two tables bucketed by the same key into the same bucket count
    join with ZERO shuffle exchanges (each task reads matching buckets), and
    the sortBy removes the join's sort as well. The write pays one shuffle
    once; every subsequent join on the key is exchange-free —
    ``tests/test_bucketed_join.py`` asserts the plan property.
    """
    (
        df.write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(name)
    )
