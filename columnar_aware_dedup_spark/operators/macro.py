"""Macro analytical queries: TPC-H-shaped multi-join pipelines and the
end-to-end training-data curation pipeline.

The reference's workload is TPC-DS *query results* shipped as ORC
(``/root/reference/README.md:57-58``); these queries are the engine-side
analogue — the multi-join/aggregate shapes that *produce* such results,
expressed declaratively so Catalyst picks broadcast vs shuffle joins and AQE
re-plans at runtime.

Scale notes per query are in the docstrings; the common discipline:
dimension tables broadcast, fact-fact joins shuffle on their keys, every
double aggregate goes through DECIMAL so partial/final aggregation order
cannot perturb the value (hash-parity with the single-threaded oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from columnar_aware_dedup_spark.functions.hashing import exact_sum_sql
from columnar_aware_dedup_spark.io import table
from columnar_aware_dedup_spark.registry import register

_REV_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))"


def _rev() -> F.Column:
    """Revenue term used by Q10/Q14/Q19: extendedprice * (1 - discount),
    exact. Built lazily — Column construction needs a live SparkContext,
    and this module imports at package-import time."""
    return (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )


@register(
    "q10_returned_item",
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter.

    Plan at scale: orders is date-pruned at the scan (predicate pushdown),
    then the orders->lineitem join shuffles on orderkey; customer joins on
    custkey; nation broadcasts. The decimal revenue sum makes the DESC
    ranking deterministic, so LIMIT 20 is stable (custkey tiebreak).
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_effect",
    oracle=f"""
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE CAST(0 AS DECIMAL(28,6)) END)
            AS DOUBLE) AS promo_revenue,
       {exact_sum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue,
       round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                                   ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
             / {exact_sum_sql('l_extendedprice * (1 - l_discount)')}, 6) AS promo_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1997-02-01'
""",
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one ship month.

    Plan at scale: lineitem date-pruned at the scan; part is the small side
    -> broadcast hash join, no shuffle of the fact table at all; conditional
    aggregation in one pass. Both sums are exact decimals, so the final
    double division is bit-deterministic.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-02-01")
    )
    p = table(spark, sf_dir, "part")
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
            F.lit(0).cast("decimal(28,6)")
        )
    ).cast("double")
    total = F.sum(_rev()).cast("double")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            promo.alias("promo_revenue"),
            total.alias("total_revenue"),
        )
        .withColumn(
            "promo_pct",
            F.round(
                F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 6
            ),
        )
    )


@register(
    "q18_large_volume",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > 300)
GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders (big-fact self-semi-join).

    Plan at scale: the HAVING subquery is a pre-aggregation of lineitem on
    its join key — Spark computes it once, semi-joins orders against it
    (no row explosion), and only the surviving orders re-join lineitem for
    the final per-order quantities. Both lineitem passes shuffle on
    l_orderkey, so AQE coalesces them onto the same partitioning.
    """
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("_q"))
        .filter(F.col("_q") > 300)
        .select("l_orderkey")
    )
    o = table(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    c = table(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_qty")
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q19_bracketed_or",
    oracle=f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#6'  AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 40)
""",
)
def q19_bracketed_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of bracketed predicates across the join.

    The OR spans both sides of the join, so it can't be pushed below it —
    but each disjunct's part-side half CAN be (Catalyst derives
    ``p_brand IN (...)`` as a join-side prefilter). part broadcasts; the
    residual OR evaluates post-join inside codegen.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#6")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


# -- end-to-end curation pipeline -------------------------------------------

#: quality gate for the curation pipeline: non-trivial docs only.
_MIN_CHARS = 50

_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)


@register(
    "pipeline_curate",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source, {_NORM_SQL} AS norm
  FROM documents
  WHERE n_chars >= {_MIN_CHARS}
), dedup AS (
  SELECT doc_id, source, norm
  FROM d
  WHERE norm <> ''
  QUALIFY row_number() OVER (PARTITION BY md5(norm) ORDER BY doc_id) = 1
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(norm, ' '))) AS BIGINT) AS total_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
FROM dedup
GROUP BY source
ORDER BY source
""",
)
def pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data curation pipeline as ONE declarative plan:
    quality-filter -> normalize -> exact-dedup (deterministic min-doc_id
    keeper) -> per-source corpus stats.

    Plan at scale: the filter and normalization are narrow maps fused into
    the scan stage; dedup is a single window over the text signature (one
    shuffle on md5(norm) — survivor selection without a groupBy + self-join
    re-shuffle); the final per-source rollup is a partial/final hash
    aggregate. Nothing leaves the JVM.
    """
    from columnar_aware_dedup_spark.operators.text import normalized

    d = normalized(spark, sf_dir).filter(
        (F.col("n_chars") >= _MIN_CHARS) & (F.col("norm") != "")
    )
    w = Window.partitionBy(F.md5("norm")).orderBy("doc_id")
    kept = (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size("toks")).cast("bigint").alias("total_tokens"),
            F.min("doc_id").cast("bigint").alias("first_doc_id"),
        )
        .orderBy("source")
    )
