"""Scalar/window/set-op function coverage, round 3 (SURVEY §2.12 tail).

Dialect notes pinned by probes (and enforced by the oracle gate): DuckDB
``CAST(double AS INT)`` *rounds* while Spark truncates — the engine exposes
explicit ``floor``/``trunc`` casts instead of raw double->int casts;
``stddev`` is rounded to 2 decimals (engines differ in final ulps of the
Welford accumulation), ``corr`` to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from columnar_aware_dedup_spark.functions.hashing import exact_sum
from columnar_aware_dedup_spark.io import table
from columnar_aware_dedup_spark.registry import register


@register(
    "window_ntile_dist",
    oracle="""
SELECT o_orderkey,
       CAST(ntile(4) OVER w AS INTEGER) AS price_quartile,
       round(percent_rank() OVER w, 6) AS price_pct_rank,
       round(cume_dist() OVER w, 6) AS price_cume_dist,
       lead(o_totalprice, 2, -1.0) OVER w AS price_2_ahead
FROM orders
WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderkey
""",
)
def window_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows (ntile/percent_rank/cume_dist) + lead-with-default
    over a global total order — WITHOUT a global-order window.

    ``ntile()/percent_rank()/cume_dist() OVER (ORDER BY ...)`` funnels the
    whole table through one partition (VERDICT r02 finding #3). Scale-safe
    two-pass formulation, the ``corpus_shuffle`` bucket-offset pattern over
    *range* buckets:

    1. bucket rows by ``approx_percentile`` boundaries of the order key
       (monotone in the key, so bucket-then-offset reproduces the global
       order; boundary values only affect load balance, never results);
    2. rank within bucket in parallel + per-bucket offsets from a tiny
       running sum -> exact global rank; the ordering key is unique
       (price, orderkey), so rank == row_number and the distribution
       functions are closed-form arithmetic over (rank, total);
    3. ``lead(2)`` within bucket; the <=2 rows at each bucket tail patch
       from the broadcast set of bucket heads (a global successor of a
       bucket-tail row is always within the first 2 rows of a later
       bucket), default -1.0 at the corpus end.

    The only single-partition steps touch <=64 boundary/offset rows at any
    scale; pinned by ``test_plans.test_ntile_has_no_global_order_window``.
    """
    n_buckets = 64
    probs = ", ".join(f"{i / n_buckets}" for i in range(1, n_buckets))
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    bounds = o.agg(
        F.expr(
            f"approx_percentile(o_totalprice, array({probs}), 1000)"
        ).alias("_bounds")
    )
    b = (
        o.join(F.broadcast(bounds))
        .withColumn("_b", F.expr("size(filter(_bounds, x -> x < o_totalprice))"))
        .drop("_bounds")
    )
    wb = Window.partitionBy("_b").orderBy("o_totalprice", "o_orderkey")
    local = b.withColumn("_lrn", F.row_number().over(wb)).withColumn(
        "_lead_local", F.lead("o_totalprice", 2).over(wb)
    )
    offsets = (
        b.groupBy("_b")
        .agg(F.count("*").alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    Window.partitionBy(F.lit(0))
                    .orderBy("_b")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_b", "_offset")
    )
    total = b.agg(
        F.count("*").cast("bigint").alias("_total"),
        (F.count("*") / 4).cast("bigint").alias("_q"),
        (F.count("*") % 4).cast("bigint").alias("_rem"),
    )
    g = (
        local.join(F.broadcast(offsets), "_b")
        .withColumn("_rn", (F.col("_offset") + F.col("_lrn")).cast("bigint"))
        .join(F.broadcast(total))
    )
    heads = g.filter(F.col("_lrn") <= 2).select(
        F.col("_rn").alias("_hrn"), F.col("o_totalprice").alias("_hprice")
    )
    g = g.join(F.broadcast(heads), F.col("_hrn") == F.col("_rn") + 2, "left")
    # SQL ntile(k): first (n % k) buckets take (n div k)+1 rows; integer
    # arithmetic only, so the boundary stays exact at any row count.
    quartile = F.expr(
        "CAST(CASE WHEN _rn <= (_q + 1) * _rem THEN (_rn + _q) DIV (_q + 1)"
        " ELSE _rem + (_rn - (_q + 1) * _rem + _q - 1) DIV _q END AS INT)"
    )
    return (
        g.select(
            "o_orderkey",
            quartile.alias("price_quartile"),
            F.round((F.col("_rn") - 1) / (F.col("_total") - 1), 6).alias(
                "price_pct_rank"
            ),
            F.round(F.col("_rn") / F.col("_total"), 6).alias("price_cume_dist"),
            F.coalesce("_lead_local", "_hprice", F.lit(-1.0)).alias(
                "price_2_ahead"
            ),
        )
        .orderBy("o_orderkey")
    )


@register(
    "stats_agg",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 2) AS price_stddev,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6) AS avg_discount
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates, rounded to engine-stable precision."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "qty_price_corr"
            ),
            # decimal-exact mean: plain AVG(double) can flip a round-to-6
            # boundary between engines (same class of bug the sf0.1 sweep
            # caught in event_gapfill_locf)
            F.round(exact_sum("l_discount") / F.count("*"), 6).alias(
                "avg_discount"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "union_all_counts",
    oracle="""
SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS occurrences
FROM (SELECT c_nationkey AS nationkey FROM customer
      UNION ALL SELECT s_nationkey FROM supplier)
GROUP BY nationkey ORDER BY nationkey
""",
)
def union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL preserves multiplicity (vs the distinct set_union)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return (
        c.unionAll(s)
        .groupBy("nationkey")
        .agg(F.count("*").alias("occurrences"))
        .orderBy("nationkey")
    )


@register(
    "intersect_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT ALL
SELECT s_nationkey FROM supplier
""",
)
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (min of multiplicities)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@register(
    "except_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT ALL
SELECT s_nationkey FROM supplier
""",
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (multiplicity subtraction) — the exact shape of
    the reference's miss-queue accounting
    (``orc/net/StripePlusColumnORCStreamer.java:136,176-192``)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@register(
    "posexplode_tokens",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           WHERE doc_id < 20)
SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS token
FROM t, unnest(generate_series(1, len(toks))) AS g(i)
ORDER BY doc_id, pos
""",
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: element + 0-based position (ordinal-preserving flatten)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .orderBy("doc_id", "pos")
    )


@register(
    "null_fns",
    oracle="""
SELECT n.n_nationkey,
       COALESCE(s.s_name, 'NO_SUPPLIER') AS supplier_or_default,
       NULLIF(n.n_regionkey, 0) AS region_nullif_zero,
       LEAST(n.n_nationkey, n.n_regionkey) AS least_key,
       GREATEST(n.n_nationkey, n.n_regionkey) AS greatest_key
FROM nation n LEFT JOIN supplier s ON n.n_nationkey = s.s_nationkey
ORDER BY n.n_nationkey, supplier_or_default
""",
)
def null_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    return (
        n.join(s, n.n_nationkey == s.s_nationkey, "left")
        .select(
            "n_nationkey",
            F.coalesce("s_name", F.lit("NO_SUPPLIER")).alias("supplier_or_default"),
            F.nullif("n_regionkey", F.lit(0)).alias("region_nullif_zero"),
            F.least("n_nationkey", "n_regionkey").alias("least_key"),
            F.greatest("n_nationkey", "n_regionkey").alias("greatest_key"),
        )
        .orderBy("n_nationkey", "supplier_or_default")
    )


@register(
    "like_rlike_pred",
    oracle="""
SELECT p_partkey, p_name,
       (p_name LIKE '%gold%') AS has_gold,
       (p_type LIKE 'STANDARD%') AS is_standard,
       regexp_matches(p_brand, '^Brand#[0-9]+$') AS brand_wellformed
FROM part
ORDER BY p_partkey
""",
)
def like_rlike_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            "p_name",
            F.col("p_name").like("%gold%").alias("has_gold"),
            F.col("p_type").like("STANDARD%").alias("is_standard"),
            F.col("p_brand").rlike("^Brand#[0-9]+$").alias("brand_wellformed"),
        )
        .orderBy("p_partkey")
    )


@register(
    "cast_fns",
    oracle="""
SELECT c_custkey,
       CAST(c_custkey AS VARCHAR) AS key_str,
       CAST(floor(c_acctbal) AS BIGINT) AS bal_floor_int,
       CAST(trunc(c_acctbal) AS BIGINT) AS bal_trunc_int,
       CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal_decimal,
       (c_acctbal > 0) AS is_positive
FROM customer ORDER BY c_custkey
""",
)
def cast_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-cast matrix. Raw double->int casts are deliberately absent: Spark
    truncates where DuckDB rounds, so the engine's contract requires explicit
    floor/trunc.

    ``bal_decimal`` exercises the DECIMAL(18,2) cast but ships the result as
    DOUBLE: the driver canonicalizer stringifies ``Decimal('123.40')`` with
    its trailing zero while DuckDB's decimal reaches pandas as float
    ``123.4`` — identical values, different representation, broken hash
    (CORRECTNESS_r03). H-query outputs must be representation-stable scalar
    types; ``tests/test_registry_oracles.py`` lints this."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_custkey").cast("string").alias("key_str"),
        F.floor("c_acctbal").cast("bigint").alias("bal_floor_int"),
        # Spark's trunc() is date-only; numeric truncation toward zero
        # spelled out (Spark's raw double->bigint cast truncates but DuckDB's
        # rounds, so neither engine's bare cast is portable).
        F.expr(
            "CAST(CASE WHEN c_acctbal >= 0 THEN floor(c_acctbal)"
            " ELSE ceil(c_acctbal) END AS BIGINT)"
        ).alias("bal_trunc_int"),
        F.col("c_acctbal").cast("decimal(18,2)").cast("double").alias("bal_decimal"),
        (F.col("c_acctbal") > 0).alias("is_positive"),
    ).orderBy("c_custkey")


@register(
    "limit_offset",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10 OFFSET 20
""",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(20)
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )
