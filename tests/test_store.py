"""Bucketed signature store: layout, idempotent merge, shuffle-free probe."""

from __future__ import annotations

from pyspark.sql import functions as F

from columnar_aware_dedup_spark.io import table
from columnar_aware_dedup_spark.operators.dedup import lineitem_chunks
from columnar_aware_dedup_spark.plans import explain
from columnar_aware_dedup_spark.sources import store

TABLE = "test_chunk_store"


def _chunks(spark, sf_dir):
    return lineitem_chunks(table(spark, sf_dir, "lineitem")).withColumn(
        "chunk_type", F.lit("Row")
    )


def test_store_roundtrip_and_merge(spark, sf_dir):
    chunks = _chunks(spark, sf_dir)
    half = chunks.filter(F.col("file_id") % 2 == 0)
    store.create_store(spark, half, TABLE, n_buckets=8)
    n0 = spark.table(TABLE).count()
    assert n0 == half.select("signature").distinct().count()

    # merging the same chunks again adds nothing (idempotent)
    assert store.merge_into_store(spark, half, TABLE) == 0
    # merging the full set adds only the new signatures
    added = store.merge_into_store(spark, chunks, TABLE)
    assert added > 0
    total = spark.table(TABLE).count()
    assert total == n0 + added
    assert (
        spark.table(TABLE).select("signature").distinct().count() == total
    ), "store must stay signature-unique"


def test_probe_results_match_unbucketed(spark, sf_dir):
    chunks = _chunks(spark, sf_dir)
    half = chunks.filter(F.col("file_id") % 2 == 0)
    store.create_store(spark, half, TABLE, n_buckets=8)
    classified = store.probe_store(spark, chunks, TABLE)
    # every chunk whose signature appears in the stored half must hit
    store_sigs = {r["signature"] for r in half.select("signature").distinct().collect()}
    for r in classified.collect():
        assert r["hit"] == (r["signature"] in store_sigs)


def test_probe_shuffles_only_incoming(spark, sf_dir):
    """The scale property: the bucketed store side joins without an
    exchange — only the incoming chunk table shuffles."""
    chunks = _chunks(spark, sf_dir)
    store.create_store(spark, chunks, TABLE, n_buckets=8)
    classified = store.probe_store(spark, chunks, TABLE)
    plan = explain.plan_string(classified, "formatted")
    n = explain.n_exchanges(classified)
    # incoming side: 1 (repartition inside lineitem_chunks) + 1 (join key);
    # the store side must contribute ZERO exchanges (bucket-aligned distinct
    # + join). More than 2 total means the bucket layout stopped being used.
    assert n <= 2, f"store side re-shuffled ({n} exchanges):\n{plan}"
