"""Relational surface extensions: grouping sets, arg-min/max, discrete
percentiles, HAVING, as-of & range joins, first/last frames.

The as-of and range joins are the "operators Spark lacks" cases (SURVEY
§2.3 'absent' list): both are compositions of existing DataFrame ops —
an equi-join on the coarse key plus window rank-1 (as-of) and a broadcast
interval join (range) — no custom physical operator needed, which keeps
Catalyst/AQE fully in charge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from columnar_aware_dedup_spark.functions.hashing import exact_sum, exact_sum_sql
from columnar_aware_dedup_spark.io import table
from columnar_aware_dedup_spark.registry import register


@register(
    "grouping_sets_agg",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {exact_sum_sql('l_quantity')} AS sum_qty,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
""",
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() disambiguation markers."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               {exact_sum_sql('l_quantity')} AS sum_qty,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
        """
    )


@register(
    "argminmax_agg",
    oracle="""
SELECT c_nationkey,
       min_by(c_name, c_custkey) AS first_customer,
       max_by(c_name, c_custkey) AS last_customer,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
GROUP BY c_nationkey ORDER BY c_nationkey
""",
)
def argminmax_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by keyed on a UNIQUE ordering column (custkey) — arg-min
    with ties would be nondeterministic, so the engine's contract requires a
    total order."""
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.min_by("c_name", "c_custkey").alias("first_customer"),
            F.max_by("c_name", "c_custkey").alias("last_customer"),
            F.count("*").alias("n_customers"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "percentile_disc_median",
    oracle="""
SELECT l_returnflag,
       quantile_disc(l_extendedprice, 0.5) AS median_price_disc,
       quantile_disc(l_extendedprice, 0.9) AS p90_price_disc
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def percentile_disc_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (Spark percentile_disc == DuckDB quantile_disc;
    the *continuous* medians disagree on decimal inputs, so the engine
    exposes both and tests pin which is which)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)
                 AS median_price_disc,
               percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)
                 AS p90_price_disc
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


@register(
    "having_filter",
    oracle=f"""
SELECT o_custkey, {exact_sum_sql('o_totalprice')} AS total_spend,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING SUM(o_totalprice) > 1500000
ORDER BY o_custkey
""",
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            exact_sum("o_totalprice").alias("total_spend"),
            F.count("*").alias("n_orders"),
            F.sum("o_totalprice").alias("_raw"),
        )
        .filter(F.col("_raw") > 1500000)
        .drop("_raw")
        .orderBy("o_custkey")
    )


@register(
    "asof_join",
    oracle="""
SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS asof_orderkey,
       o.o_orderdate AS asof_orderdate
FROM events e
LEFT JOIN orders o
  ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
QUALIFY row_number() OVER (PARTITION BY e.event_id
                           ORDER BY o.o_orderdate DESC NULLS LAST,
                                    o.o_orderkey DESC) = 1
ORDER BY e.event_id
""",
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the latest order at-or-before its
    event time for the same customer.

    Spark composition: equi-join on the key (shuffle on user_id — bounded
    fan-out = orders per customer), inequality as join predicate, rank-1
    window to keep the latest. Scale note: for heavy per-key fan-out,
    pre-bucket both sides on the key so the join and window share one
    exchange.
    """
    e = table(spark, sf_dir, "events")
    o = table(spark, sf_dir, "orders")
    joined = e.join(
        o,
        (o.o_custkey == e.user_id) & (o.o_orderdate <= e.ts),
        "left",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc_nulls_last(), F.col("o_orderkey").desc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("o_orderkey").alias("asof_orderkey"),
            F.col("o_orderdate").alias("asof_orderdate"),
        )
        .orderBy("event_id")
    )


#: fixed value bands for the range join (engine-defined literal dimension).
_BANDS = [(i * 50.0, (i + 1) * 50.0, f"band_{i}") for i in range(8)]


@register(
    "range_join_bands",
    oracle=f"""
WITH bands(lo, hi, band) AS (VALUES {", ".join(f"({lo}, {hi}, '{b}')" for lo, hi, b in _BANDS)})
SELECT b.band, CAST(COUNT(*) AS BIGINT) AS n_events,
       {exact_sum_sql('e.value')} AS sum_value
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band ORDER BY b.band
""",
)
def range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: fact values into literal bands — broadcast
    nested-loop on a tiny build side, the right physical plan for interval
    dimensions."""
    e = table(spark, sf_dir, "events")
    bands = spark.createDataFrame(_BANDS, ["lo", "hi", "band"])
    return (
        e.join(
            F.broadcast(bands),
            (e.value >= F.col("lo")) & (e.value < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value").alias("sum_value"),
        )
        .orderBy("band")
    )


@register(
    "window_first_last",
    oracle="""
SELECT o_custkey, o_orderkey,
       first_value(o_orderdate) OVER w AS first_order_date,
       last_value(o_orderdate)  OVER w AS last_order_date,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_orderkey
""",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last_value over a full frame (total order => deterministic)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderdate").over(w).alias("first_order_date"),
            F.last("o_orderdate").over(w).alias("last_order_date"),
            F.count("*").over(w).alias("n_orders"),
        )
        .orderBy("o_orderkey")
    )
