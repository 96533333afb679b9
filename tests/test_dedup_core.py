"""Flagship dedup-simulation correctness: oracle parity + semantic properties
(SURVEY §5.2.3 — the Spark rendering of the reference's README scenarios,
/root/reference/README.md:66-78)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from columnar_aware_dedup_spark.operators import dedup
from tests.oracle import compare


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"col", "hits", "misses", "dedup_bytes", "transfer_bytes"} <= set(
        df.columns
    )


def test_dedup_hit_miss_oracle(spark, sf_dir):
    compare(dedup.dedup_hit_miss(spark, sf_dir),
            entrymod.oracle_sql()["dedup_hit_miss"], sf_dir)


def test_small_chunk_policy_oracle(spark, sf_dir):
    compare(dedup.small_chunk_policy(spark, sf_dir),
            entrymod.oracle_sql()["small_chunk_policy"], sf_dir)


def test_dedup_hierarchical_oracle(spark, sf_dir):
    compare(dedup.dedup_hierarchical(spark, sf_dir),
            entrymod.oracle_sql()["dedup_hierarchical"], sf_dir)


def test_identical_retransfer_fully_dedups(spark, sf_dir):
    """Transfer f then copy-of-f => second pass is all hits (README.md:75-78)."""
    li = dedup.unpivot_lineitem(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    )
    chunks = dedup.chunk_table(li)
    classified = dedup.dedup_classify(chunks, chunks)
    assert classified.filter(~F.col("hit")).count() == 0


def test_disjoint_snapshots_no_dedup(spark, sf_dir):
    """Disjoint files => zero dedup."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    a = dedup.chunk_table(
        dedup.unpivot_lineitem(li.filter(F.col("l_orderkey") % 2 == 0))
    )
    b = dedup.chunk_table(
        dedup.unpivot_lineitem(
            # shift values so no chunk content coincides
            li.filter(F.col("l_orderkey") % 2 == 1).withColumn(
                "l_partkey", F.col("l_partkey") + 1000000
            )
        )
    ).filter(F.col("col") == "l_partkey")
    classified = dedup.dedup_classify(b, a)
    assert classified.filter(F.col("hit")).count() == 0


def test_snapshot_a_chunks_all_hit(spark, sf_dir):
    """Every store chunk reappears unchanged in the full snapshot => hit."""
    store = dedup.chunk_table(
        dedup.unpivot_lineitem(dedup.snapshot_a_lineitem(spark, sf_dir))
    )
    incoming = dedup.chunk_table(
        dedup.unpivot_lineitem(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    )
    # incoming restricted to store files must all hit
    hits = dedup.dedup_classify(
        incoming.join(store.select("file_id").distinct(), "file_id", "left_semi"),
        store,
    )
    assert hits.filter(~F.col("hit")).count() == 0


def test_bloom_prefilter_invariants(spark, sf_dir):
    """The Bloom audit's structural guarantees: one-sided error (a filter
    can never miss a real store hit), maybe ⊇ hits, and the realized fp
    accounting is internally consistent."""
    r = dedup.dedup_bloom_prefilter(spark, sf_dir).collect()[0]
    assert r["n_false_negatives"] == 0
    assert r["n_bloom_maybe"] >= r["n_exact_hits"]
    assert r["n_false_positives"] == r["n_bloom_maybe"] - r["n_exact_hits"]
    assert 0.0 <= r["fp_rate"] <= 1.0
    assert r["n_probe_sigs"] > r["n_exact_hits"]  # misses exist to audit
