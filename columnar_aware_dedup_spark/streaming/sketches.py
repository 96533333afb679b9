"""Continuous sketch maintenance: CMS cells and HLL registers over a
document stream — the streaming twin of ``token_heavy_hitters_cms`` /
``token_vocab_hll``.

Sketches earn their place at 100 TB precisely because they MERGE: CMS cells
add, HLL registers max — so a stream can maintain them append-only, the
postings-table design applied to sketch state. Each micro-batch derives the
cells/registers of its NEW documents only (anti-join on the seen-docs table
makes at-least-once delivery and checkpoint replays no-ops — CMS addition
is not idempotent, so replay protection is load-bearing here, unlike the
max-merged HLL where it is merely tidy) and appends the partials; readers
re-aggregate at serve time (SUM cells, MAX registers), and
``sources.store.compact_store`` folds the appends back to one row per cell
when the table grows. Exact equality with the batch-built sketch follows
from disjoint-doc additivity, and the two-waves-plus-replay test asserts
it cell-for-cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_aware_dedup_spark.operators.selection import (
    _CMS_D,
    _cms_bucket_spark,
    _HLL_REG_SPARK,
    _HLL_RHO_SPARK,
)
from columnar_aware_dedup_spark.operators.text import _NORM_SPARK
from columnar_aware_dedup_spark.sources.store import store_lock

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.explode(F.split(F.expr(_NORM_SPARK), " ")).alias("tok"),
    )


def batch_cms_cells(docs: DataFrame) -> DataFrame:
    """(d, b, n): the CMS cell counts of one batch of documents-schema rows
    — same geometry and seeds as ``token_heavy_hitters_cms``."""
    cells = _tokens(docs).select(
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"struct({d} AS d, ({_cms_bucket_spark(d)}) AS b)"
                    for d in range(_CMS_D)
                )
                + ")"
            )
        ).alias("c")
    )
    return (
        cells.select("c.d", "c.b")
        .groupBy("d", "b")
        .agg(F.count("*").alias("n"))
    )


def batch_hll_regs(docs: DataFrame) -> DataFrame:
    """(reg, mr): the HLL register maxima of one batch — same construction
    as ``token_vocab_hll`` (corpus-wide, not per source)."""
    return (
        _tokens(docs)
        .select(
            F.expr(_HLL_REG_SPARK).alias("reg"),
            F.expr(_HLL_RHO_SPARK).alias("rho"),
        )
        .groupBy("reg")
        .agg(F.max("rho").alias("mr"))
    )


def init_sketch_tables(spark: SparkSession, prefix: str) -> None:
    """Create the three empty state tables (seen docs, CMS cells, HLL
    register partials) under ``prefix``, replacing any previous state —
    including a leftover warehouse directory from a session whose metastore
    no longer lists the table (DROP TABLE can't see it, and ``saveAsTable``
    would fail with LOCATION_ALREADY_EXISTS)."""
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for suffix, schema in (
        ("seen", "doc_id long"),
        ("cms", "d int, b int, n long"),
        ("hll", "reg int, mr int"),
    ):
        name = f"{prefix}_{suffix}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name.lower()}", ignore_errors=True)
        spark.createDataFrame([], schema).write.format("parquet").mode(
            "overwrite"
        ).saveAsTable(name)


def merge_sketches(spark: SparkSession, docs: DataFrame, prefix: str) -> int:
    """Idempotently fold one batch into the sketch tables; returns the
    number of NEW documents absorbed. Already-seen documents are dropped
    whole before any cell is derived, so a replayed file adds zero counts."""
    with store_lock(spark, f"{prefix}_seen"):
        for suffix in ("seen", "cms", "hll"):
            spark.catalog.refreshTable(f"{prefix}_{suffix}")
        seen = spark.table(f"{prefix}_seen")
        fresh = docs.join(seen, "doc_id", "left_anti").persist()
        try:
            n = fresh.count()
            if n:
                batch_cms_cells(fresh).write.format("parquet").mode(
                    "append"
                ).insertInto(f"{prefix}_cms")
                batch_hll_regs(fresh).write.format("parquet").mode(
                    "append"
                ).insertInto(f"{prefix}_hll")
                fresh.select("doc_id").write.format("parquet").mode(
                    "append"
                ).insertInto(f"{prefix}_seen")
        finally:
            fresh.unpersist()
        return n


def served_cms(spark: SparkSession, prefix: str) -> DataFrame:
    """(d, b, n): the maintained sketch, appends re-aggregated at read."""
    return (
        spark.table(f"{prefix}_cms")
        .groupBy("d", "b")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )


def served_hll(spark: SparkSession, prefix: str) -> DataFrame:
    """(reg, mr): the maintained registers, max-merged at read."""
    return (
        spark.table(f"{prefix}_hll").groupBy("reg").agg(F.max("mr").alias("mr"))
    )


def start_sketcher(
    spark: SparkSession, docs_dir: str, prefix: str, checkpoint: str
) -> "object":
    """File-source stream over documents-schema parquet -> sketch merges.
    ``availableNow`` drains then stops; drop it for continuous tailing."""
    docs = spark.readStream.schema(_DOC_SCHEMA).parquet(docs_dir)

    def _merge(batch: DataFrame, _batch_id: int) -> None:
        merge_sketches(spark, batch, prefix)

    return (
        docs.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
