"""Continuous BM25-index maintenance: new documents stream in, their
dl-denormalized postings append to the term-bucketed index and the one-row
corpus stats advance by exact integer sums — the ranked-retrieval twin of
the postings maintainer (``streaming/indexer.py``), completing the house
rule that every persisted index has an idempotent delta path (the store
persistence the rule generalizes lives in the reference's receiver fields,
``orc/net/StripePlusColumnORCReceiver.java:41-44``, and the server receive
loop, ``net/SpeedupServer.java:66-81``).

Idempotence: the ``{table}_docs`` registry records EVERY indexed document
— including token-less ones, which carry no postings but do count into
the corpus size idf reads — and each batch anti-joins against it, so
at-least-once file delivery (or a checkpoint replay) can neither
double-count a document's postings nor inflate N/avgdl. The stats row is
advanced by adding the fresh batch's exact integer sums under the store
lock (sums, not averages, so increments compose without drift); serving
(``retrieval.bm25_from_index``) derives df from the bucket-pruned
postings at query time, so there is no per-term table to rewrite here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_aware_dedup_spark.operators.retrieval import (
    batch_bm25_postings,
    corpus_stats,
    doc_lengths,
)
from columnar_aware_dedup_spark.sources.store import store_lock

_POSTING_COLS = ["term", "doc_id", "tf", "dl"]


def merge_bm25_delta(
    spark: SparkSession, docs: DataFrame, table_name: str
) -> int:
    """Idempotently fold one batch of documents into the BM25 index;
    returns the number of NEW documents indexed.

    Replayed documents are dropped whole by the registry anti-join (a
    replayed file re-derives identical postings and lengths, so skipping
    the doc keeps tf, N, and avgdl all exact). Postings and registry rows
    append; the stats row is rewritten as old + batch (exact integer
    adds). Writers serialize on the store lock.
    """
    with store_lock(spark, table_name):
        for t in (table_name, table_name + "_docs", table_name + "_stats"):
            spark.catalog.refreshTable(t)
        seen = spark.table(table_name + "_docs").select("doc_id")
        # localCheckpoint, NOT persist: the anti-join's lineage reads the
        # registry table this merge appends to, and an insert invalidates
        # caches over the inserted table — a persisted `fresh` silently
        # recomputes as EMPTY after the registry append (observed: the
        # stats row went (old_n, NULL, NULL) because sum-of-empty is
        # NULL). Checkpointing severs the lineage so the batch's delta is
        # pinned before any write.
        fresh = docs.join(seen, "doc_id", "left_anti").localCheckpoint(
            eager=True
        )
        n = fresh.count()
        if not n:
            return 0
        batch_bm25_postings(fresh).select(*_POSTING_COLS).write.format(
            "parquet"
        ).mode("append").insertInto(table_name)
        registry_delta = doc_lengths(fresh)
        registry_delta.write.format("parquet").mode("append").insertInto(
            table_name + "_docs"
        )
        # one-row driver fold: the stats table cannot be overwritten by a
        # plan that reads it, so the merged row materializes driver-side
        # first — O(1) data, the store.py DESCRIBE-read class, not a
        # corpus collect.
        old = spark.table(table_name + "_stats")
        merged = (
            old.join(
                corpus_stats(registry_delta).select(
                    F.col("n_docs").alias("d_n"),
                    F.col("n_dl_docs").alias("d_ndl"),
                    F.col("dl_sum").alias("d_dl"),
                )
            )
            .select(
                (F.col("n_docs") + F.col("d_n")).alias("n_docs"),
                (F.col("n_dl_docs") + F.col("d_ndl")).alias("n_dl_docs"),
                (F.col("dl_sum") + F.col("d_dl")).alias("dl_sum"),
            )
            .collect()
        )
        spark.createDataFrame(
            merged, "n_docs long, n_dl_docs long, dl_sum long"
        ).write.format("parquet").mode("overwrite").saveAsTable(
            table_name + "_stats"
        )
        return n


def start_bm25_indexer(
    spark: SparkSession,
    docs_dir: str,
    table_name: str,
    checkpoint: str,
) -> "object":
    """File-source stream over documents-schema parquet -> BM25 merges.

    ``availableNow`` drains everything present then stops (the
    test/backfill trigger); a deployment drops the trigger for continuous
    tailing. The three index tables must exist (seed them with
    ``retrieval.write_bm25_index`` over the initial corpus, or empty
    frames in the same layout)."""
    docs = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .parquet(docs_dir)
    )

    def _merge(batch: DataFrame, _batch_id: int) -> None:
        merge_bm25_delta(spark, batch, table_name)

    return (
        docs.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
