"""Continuous-ingest dedup: the reference's client/server loop as Structured
Streaming (SURVEY §2.9 mapping).

The reference runs a long-lived TCP loop — client streams files as they
appear, server keeps an unbounded in-heap chunk store
(``net/SpeedupClient.java:44-64``, ``orc/dedup/NaiveORCChunkStore.java:15``).
Spark-native: a ``binaryFile`` file-source stream feeds the structural
chunker; each micro-batch probes a *persisted* signature store (parquet,
signature-keyed) and appends only misses — an idempotent anti-join merge in
``foreachBatch``. The store survives restarts and is bucketable by signature
at scale (vs. the reference's process-lifetime HashMap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_aware_dedup_spark.sources.chunkers import CHUNK_SCHEMA, _chunk_batches

#: store layout: signature + provenance, no content (signature-only probes).
_STORE_COLS = ["signature", "chunk_type", "size"]


def load_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Read the persisted store, empty-frame fallback for a missing one.

    Asks Spark (not the filesystem) whether the store exists: a store written
    with partitioning or a nonstandard file layout has no ``*.parquet``
    directly in the directory, and a string-match on entries would misread it
    as empty — silently re-transferring every signature on the next merge.
    """
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(store_path)  # schema inference is eager
    except AnalysisException:
        return spark.createDataFrame([], schema=CHUNK_SCHEMA).select(*_STORE_COLS)


def merge_chunks_into_store(
    chunks: DataFrame, store_path: str
) -> None:
    """Idempotent store merge: append signatures not already present.

    Anti-join against the current store, dedup within the batch, append.
    (With Delta/Iceberg this is MERGE; plain parquet append + anti-join gives
    the same at-least-once-safe semantics because re-appended duplicates are
    filtered on the next probe's distinct.)
    """
    spark = chunks.sparkSession
    store = load_store(spark, store_path).select("signature").distinct()
    new = (
        chunks.select(*_STORE_COLS)
        .dropDuplicates(["signature"])
        .join(store, "signature", "left_anti")
    )
    new.write.mode("append").parquet(store_path)


def start_ingest(
    spark: SparkSession,
    input_dir: str,
    store_path: str,
    checkpoint: str,
    glob: str = "*.parquet",
):
    """Stream files from ``input_dir`` into the chunk store (availableNow).

    Returns the StreamingQuery; callers ``awaitTermination()``. Restart-safe
    via checkpoint; store merge is idempotent, so at-least-once delivery is
    fine.
    """
    files = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", glob)
        .load(input_dir)
        .select("path", "content")
    )
    chunks = files.mapInPandas(_chunk_batches, CHUNK_SCHEMA)

    def _merge(batch: DataFrame, _batch_id: int) -> None:
        merge_chunks_into_store(batch, store_path)

    return (
        chunks.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _restore_conf(spark: SparkSession, key: str, prev: str | None) -> None:
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over events-schema parquet, ``ts`` normalized to
    the SAME type the batch reader (``io.table``) produces for the same
    fixture: TIMESTAMP (with local zone) in both branches — watermarks
    reject TIMESTAMP_NTZ, and the session tz is pinned UTC so the NTZ->LTZ
    cast is wall-clock-identity. Batch/stream equality tests therefore
    compare identical types with no implicit NTZ<->LTZ coercion (ADVICE
    r02).

    A stream needs a declared schema, so this performs a hidden *batch* read
    of the directory to probe the physical type. The legacy ``nanosAsLong``
    conf is scoped to that probe — restored on the micros path, left on only
    for the nanos branch, whose stream execution itself needs it.
    """
    from pyspark.sql.types import LongType

    try:
        prev = spark.conf.get(_NANOS_CONF)
    except Exception:
        prev = None
    spark.conf.set(_NANOS_CONF, "true")
    try:
        ts_is_long = isinstance(
            spark.read.parquet(events_dir).schema["ts"].dataType, LongType
        )
    except Exception:
        _restore_conf(spark, _NANOS_CONF, prev)
        raise
    ts_decl = "ts long" if ts_is_long else "ts timestamp_ntz"
    if not ts_is_long:
        _restore_conf(spark, _NANOS_CONF, prev)
    stream = spark.readStream.schema(
        f"event_id long, {ts_decl}, user_id long, event_type string,"
        " value double, props string"
    ).parquet(events_dir)
    if ts_is_long:
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def streaming_tumbling_counts(
    spark: SparkSession, events_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming variant of ``event_tumbling_window`` (same ``F.window``
    expression the batch oracle checks) with a late-data watermark.

    ``events_dir`` is a directory of events-schema parquet files (Spark's
    file stream source tails directories, not single files).
    """
    events = events_stream(spark, events_dir)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
