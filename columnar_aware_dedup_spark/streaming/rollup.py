"""Streaming hypertable rollup: chained windowed aggregations in ONE query.

The streaming twin of the batch ``event_hypertable_rollup``
(:mod:`columnar_aware_dedup_spark.operators.events`): the minute layer
aggregates raw events, the hour layer re-aggregates the minute layer's
*partials* — Spark's multiple-stateful-operator support (3.4+) lets both
levels live in one streaming query, with ``F.window`` over the finer
window column as the chaining construct.

Scale contract: state at the minute level is bounded by the watermark; the
hour level's input is the minute partials (~60x fewer rows than raw), so the
continuous aggregate reads the stream once — the same read-amplification
argument as the batch rollup, carried into 24/7 operation. Counts and
decimal sums are associative, so chained results are bit-identical to direct
hourly grouping (the test's batch comparison).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_hypertable_rollup(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """events stream -> hourly continuous aggregate via minute partials."""
    minute = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 minute").alias("w1"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("_dsum"),
        )
    )
    hour = minute.groupBy(
        F.window(F.col("w1"), "1 hour").alias("w2"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("_dsum").alias("_dsum"))
    return hour.select(
        F.col("w2.start").alias("bucket_start"),
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("_dsum").cast("double").alias("sum_value"),
    )
