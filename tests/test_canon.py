"""Canonical-rendering parity: every fixture column must render to identical
strings in Spark and DuckDB, else every md5 signature downstream diverges."""

from __future__ import annotations

from pyspark.sql import functions as F

from columnar_aware_dedup_spark.functions.hashing import canon_col, canon_sql
from columnar_aware_dedup_spark.io import table
from tests.oracle import run_duckdb

# (table, column, dtype) — one representative per distinct physical type.
CASES = [
    ("lineitem", "l_orderkey", "bigint"),
    ("lineitem", "l_linenumber", "int"),
    ("lineitem", "l_quantity", "double"),
    ("lineitem", "l_extendedprice", "double"),
    ("lineitem", "l_discount", "double"),
    ("lineitem", "l_returnflag", "string"),
    ("lineitem", "l_shipdate", "timestamp"),
    ("orders", "o_orderdate", "timestamp"),
    ("events", "ts", "timestamp"),
    ("events", "value", "double"),
    ("documents", "text", "string"),
    ("customer", "c_acctbal", "double"),
]


def test_canon_parity(spark, sf_dir):
    bad = []
    for tbl, col, dtype in CASES:
        s = (
            table(spark, sf_dir, tbl)
            .select(F.md5(F.concat_ws(",", F.array_sort(F.collect_list(canon_col(col, dtype))))).alias("h"))
            .collect()[0][0]
        )
        expr = canon_sql(col, dtype)
        _, rows = run_duckdb(
            f"SELECT md5(string_agg(v, ',' ORDER BY v)) FROM "
            f"(SELECT {expr} AS v FROM {tbl} WHERE {col} IS NOT NULL)",
            sf_dir,
        )
        # Spark collect_list drops NULLs; mirror that in the oracle.
        if s != rows[0][0]:
            bad.append((tbl, col, dtype))
    assert not bad, f"canonical rendering diverges for {bad}"
