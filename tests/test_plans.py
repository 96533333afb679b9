"""Physical-plan regression tests: the 100 TB story, enforced.

Each assertion pins a plan property that must survive scale-up: predicate
pushdown to the parquet scan, column pruning, broadcast of dimension sides,
heap-based top-k, and bounded shuffle counts in the dedup dataflow.
"""

from __future__ import annotations

from columnar_aware_dedup_spark.operators import dedup, relational
from columnar_aware_dedup_spark.plans import explain


def test_filter_pushdown(spark, sf_dir):
    df = relational.filter_pred(spark, sf_dir)
    assert explain.has_pushed_filter(df, "l_quantity"), explain.plan_string(df)
    assert explain.has_pushed_filter(df, "l_shipdate"), explain.plan_string(df)


def test_column_pruning(spark, sf_dir):
    df = relational.scan_project(spark, sf_dir)
    cols = explain.read_schema_columns(df)
    assert cols == {
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_discount",
    }, cols


def test_dim_join_broadcasts(spark, sf_dir):
    assert explain.has_broadcast_join(relational.join_inner(spark, sf_dir))
    assert explain.has_broadcast_join(relational.q5_local_supplier(spark, sf_dir))


def test_topk_is_take_ordered(spark, sf_dir):
    """orderBy().limit() must plan as a per-partition heap + merge, never a
    full sort (the scale-critical difference)."""
    assert explain.has_take_ordered(relational.orderby_limit_topk(spark, sf_dir))
    assert explain.has_take_ordered(relational.q3_shipping_priority(spark, sf_dir))


def test_flagship_shuffle_budget(spark, sf_dir):
    """classified_chunks = chunk agg + signature window (+ the snapshot tag
    join). More exchanges than that means a regression re-shuffling the
    full chunk table."""
    df = dedup.dedup_hit_miss(spark, sf_dir)
    n = explain.n_exchanges(df)
    assert n <= 4, f"flagship grew to {n} shuffles:\n{explain.plan_string(df)}"


def test_chunk_simulate_single_shuffle(spark, sf_dir):
    df = dedup.chunk_simulate(spark, sf_dir)
    n = explain.n_exchanges(df)
    assert n == 1, f"chunking must be one shuffle, got {n}"
