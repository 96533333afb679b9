"""JSONL (newline-delimited JSON) document source.

LLM training corpora ship as sharded ``*.jsonl`` files far more often
than as parquet; this leg proves the engine ingests that shape with the
same dedup semantics as the parquet path. The fixture is the
``documents`` table re-materialized as four deterministic JSONL shards
(``doc_id % 4``, each shard sorted by ``doc_id``) through the shared
atomic fixture cache, so the oracle can restate the expected result from
the ``documents`` view directly.

Scale notes: the read is SCHEMA-PINNED (``spark.read.schema(...).json``)
— no schema-inference pre-pass over the corpus, which at 100 TB is a
full extra scan. JSONL is line-splittable, so each shard parallelizes
across executors like any text source; but JSON parsing is CPU-heavy
relative to columnar decode and reads every column regardless of
projection, so the 100 TB discipline is: ingest JSONL ONCE, convert to
parquet (``sources/store.py``), and run every downstream query on the
columnar copy. The registered row is the ingest-side census you run
before paying for that conversion.
"""

from __future__ import annotations

import os

import duckdb
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_aware_dedup_spark.operators.text import _NORM_SPARK, _NORM_SQL
from columnar_aware_dedup_spark.registry import register
from columnar_aware_dedup_spark.sources.orcfixtures import (
    _published_fixture_dir,
)

_N_SHARDS = 4

#: pinned read schema — matches the documents parquet columns; a schema
#: mismatch surfaces as NULL columns, which the dup counts would expose.
_DOC_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def jsonl_fixture_dir(sf_dir: str) -> str:
    """Build-once JSONL materialization of ``documents`` (4 shards)."""

    def _build(tmp: str) -> None:
        con = duckdb.connect()
        docs = f"read_parquet('{sf_dir}/documents.parquet')"
        for i in range(_N_SHARDS):
            con.execute(
                f"COPY (SELECT doc_id, text, lang, source, n_chars"
                f" FROM {docs} WHERE doc_id % {_N_SHARDS} = {i}"
                f" ORDER BY doc_id)"
                f" TO '{os.path.join(tmp, f'part-{i}.jsonl')}' (FORMAT JSON)"
            )
        con.close()

    return _published_fixture_dir(sf_dir, "cawd_jsonl_docs", _build)


def read_documents_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-pinned JSONL read of the sharded documents fixture."""
    return (
        spark.read.schema(_DOC_SCHEMA)
        .option("pathGlobFilter", "*.jsonl")
        .json(jsonl_fixture_dir(sf_dir))
    )


def all_jsonl_bit(files: list[str]) -> bool:
    """TRUE iff the plan's file listing is non-empty and every file is a
    ``.jsonl`` shard — the source-format guard bit, separated out so its
    falsifiability test feeds it a parquet scan's listing (flip test in
    ``tests/test_winnowing.py``)."""
    return bool(files) and all(f.endswith(".jsonl") for f in files)


@register(
    "jsonl_ingest_dedup",
    oracle=f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5({_NORM_SQL})) AS BIGINT) AS n_distinct_texts,
       CAST(count(*) - count(DISTINCT md5({_NORM_SQL})) AS BIGINT)
         AS n_dup_docs,
       TRUE AS read_from_jsonl
FROM documents
GROUP BY source
""",
)
def jsonl_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-dup census computed FROM THE JSONL SHARDS — the
    parquet path's ``text_exact_dedup`` semantics on the interchange
    format. ``read_from_jsonl`` is a fact about HOW the result was
    produced (the ``cross_format_dedup`` walker-bit pattern): TRUE only
    when every file the plan scanned is a ``.jsonl`` shard, computed
    driver-side from ``inputFiles()``; the oracle — which reads the
    parquet view — restates it as the expected constant."""
    df = read_documents_jsonl(spark, sf_dir)
    from_jsonl = all_jsonl_bit(df.inputFiles())
    sig = F.md5(F.expr(_NORM_SPARK))
    return (
        df.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct(sig).cast("bigint").alias("n_distinct_texts"),
            (F.count(F.lit(1)) - F.countDistinct(sig))
            .cast("bigint")
            .alias("n_dup_docs"),
        )
        .withColumn("read_from_jsonl", F.lit(from_jsonl))
    )
