"""File inventory: the reference client's directory scan as a DataFrame.

``SpeedupClient.run`` lists the input dir, keeps files matching an extension
filter, sorts lexicographically, and streams each
(``net/SpeedupClient.java:73-123``, filter ``:66-71``, sort ``:102``). The
Spark-native form is a ``binaryFile`` scan (or file-listing only) with a glob
pushdown and ``orderBy(path)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_aware_dedup_spark.registry import register
from columnar_aware_dedup_spark.sources.chunkers import (
    FIXTURE_TABLES,
    _const_true_rows_sql,
)


def file_inventory(
    spark: SparkSession, path: str, glob: str = "*", with_content: bool = False
) -> DataFrame:
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    cols = ["path", "length", "modificationTime"] + (
        ["content"] if with_content else []
    )
    return df.select(*cols).orderBy("path")


def file_inventory_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw numeric inventory (file_name, length) — the pre-r08
    registered output, kept as the unregistered ``*_full`` twin."""
    inv = file_inventory(spark, sf_dir, glob="*.parquet")
    return inv.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"), "length"
    ).orderBy("file_name")


_INVENTORY_BITS = [
    "scan_nonempty_ok",
    "length_equals_bytes_read_ok",
    "parquet_magic_ok",
    "ext_filter_ok",
]

FILE_INVENTORY_ORACLE = _const_true_rows_sql(
    [f"{t}.parquet" for t in FIXTURE_TABLES], "file_name", _INVENTORY_BITS
)


def inventory_facts(
    spark: SparkSession, path: str, glob: str = "*.parquet"
) -> DataFrame:
    """Per-file scan facts the certificate bits are derived from: the
    catalog-claimed ``length``, the byte count of the ACTUALLY READ
    content (an independent source — the metadata listing vs the bytes on
    the wire), and the decoded 4-byte head/tail magic."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return df.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        "length",
        F.length("content").cast("long").alias("n_bytes"),
        F.expr("decode(substring(content, 1, 4), 'UTF-8')").alias("head4"),
        F.expr("decode(substring(content, -4, 4), 'UTF-8')").alias("tail4"),
    )


def inventory_bits(facts: DataFrame) -> DataFrame:
    """Certificate-bit projection over an ``inventory_facts`` frame —
    factored out so the flip test corrupts a facts table and derives bits
    through the SAME code the registered query runs."""
    return facts.select(
        "file_name",
        (F.col("length") > 0).alias("scan_nonempty_ok"),
        (F.col("length") == F.col("n_bytes")).alias(
            "length_equals_bytes_read_ok"
        ),
        (
            (F.col("head4") == "PAR1") & (F.col("tail4") == "PAR1")
        ).alias("parquet_magic_ok"),
        F.col("file_name").endswith(".parquet").alias("ext_filter_ok"),
    ).orderBy("file_name")


@register("file_inventory", oracle=FILE_INVENTORY_ORACLE)
def file_inventory_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference client's directory scan, HASH-CHECKED via the per-file
    structural certificate (r08 R→H promotion — DuckDB has no directory
    scan, but it CAN re-state the constant fixture file list with every
    invariant TRUE):

    - ``scan_nonempty_ok``: the listing claims a positive size;
    - ``length_equals_bytes_read_ok``: the catalog-claimed ``length``
      equals the byte count of the content actually read — the metadata
      listing cross-checked against an independent source (the bytes);
    - ``parquet_magic_ok``: the read bytes start AND end with the PAR1
      magic — the scan surfaced real parquet files, not stubs;
    - ``ext_filter_ok``: the glob pushdown (``SpeedupClient.java:66-71``'s
      extension filter) let only ``*.parquet`` through.

    The numeric (file_name, length) table stays available as
    :func:`file_inventory_full`. Flip test:
    ``tests/test_chunkers.py::test_inventory_bits_flip``.
    """
    return inventory_bits(inventory_facts(spark, sf_dir))
