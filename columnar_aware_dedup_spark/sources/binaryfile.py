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


@register("file_inventory")  # rows-only: DuckDB has no directory scan
def file_inventory_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inventory of the fixture dir (extension-filtered, path-ordered)."""
    inv = file_inventory(spark, sf_dir, glob="*.parquet")
    return inv.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"), "length"
    ).orderBy("file_name")
