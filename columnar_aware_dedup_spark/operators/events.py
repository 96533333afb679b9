"""Event-time operators over the ``events`` table (SURVEY §2.9).

The reference's only "streaming" is a long-lived TCP client/server loop with
no notion of event time (``net/SpeedupClient.java:44-64``,
``net/SpeedupServer.java:56-81``). Our engine exposes real event-time
semantics: tumbling/sliding/session windows, first-event dedup-with-state,
and a watermark-style late-data filter. Each is declared here in its
*batch-checkable* form (same functions Structured Streaming uses — ``F.window``
/ ``F.session_window`` work identically on batch DataFrames), so the DuckDB
oracle can hash-check it; the continuous variants live in
:mod:`columnar_aware_dedup_spark.streaming`.

Scale notes: window aggregation shuffles on (window, key) — at 100 TB the key
space is (hour x user) so AQE coalesces fine; session windows use Spark's
native session-window operator (sort-based within partition), not a
collect-to-driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from columnar_aware_dedup_spark.functions.hashing import exact_sum, exact_sum_sql
from columnar_aware_dedup_spark.io import table
from columnar_aware_dedup_spark.registry import register

#: DuckDB rendering of a Spark window start: floor epoch seconds to the slide.
def _bucket_start_sql(slide_s: int, offset_s: int = 0) -> str:
    return (
        f"make_timestamp((CAST(floor((epoch(ts) - {offset_s}) / {slide_s}) AS BIGINT)"
        f" * {slide_s} + {offset_s}) * 1000000)"
    )


@register(
    "event_tumbling_window",
    oracle=f"""
SELECT {_bucket_start_sql(3600)} AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {exact_sum_sql('value')} AS sum_value
FROM events
GROUP BY window_start, event_type
ORDER BY window_start, event_type
""",
)
def event_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregate (``F.window`` — streaming-identical)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), exact_sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "event_sliding_window",
    oracle=f"""
WITH assigned AS (
  SELECT {_bucket_start_sql(1800)} AS window_start, value FROM events
  UNION ALL
  SELECT {_bucket_start_sql(1800)} - INTERVAL 30 MINUTE AS window_start, value
  FROM events
)
SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n_events,
       {exact_sum_sql('value')} AS sum_value
FROM assigned GROUP BY window_start ORDER BY window_start
""",
)
def event_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 min: each event lands in 2 windows.

    The oracle materializes the window assignment explicitly (latest 30-min
    boundary <= ts, and the one before) — same set Spark's ``F.window``
    produces.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), exact_sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
        .orderBy("window_start")
    )


@register(
    "event_session_window",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events
),
islands AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 10 MINUTE AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {exact_sum_sql('value')} AS sum_value
FROM islands
GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
)
def event_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute-gap session windows per user (``F.session_window``).

    The oracle is the classic gaps-and-islands rewrite; Spark's session window
    end = last event + gap, mirrored as ``MAX(ts) + INTERVAL``.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), exact_sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "event_dedup_first",
    oracle="""
SELECT user_id, event_type, event_id, ts
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) = 1
""",
)
def event_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dedup-with-state analogue: keep the *first* event per
    (user, type). ``dropDuplicates`` keeps an arbitrary row; the engine's
    contract is first-by-event-time (what streaming dedup with a watermark
    yields), expressed as a rank-1 window."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


@register(
    "event_watermark_filter",
    oracle="""
SELECT event_id, ts, user_id
FROM events
WHERE ts >= (SELECT MAX(ts) - INTERVAL 1 HOUR FROM events)
ORDER BY event_id
""",
)
def event_watermark_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analogue of a 1-hour watermark: drop events older than
    max(event time) - 1h. In streaming this is ``withWatermark``; in batch a
    scalar-subquery filter (Spark broadcasts the 1-row aggregate)."""
    e = table(spark, sf_dir, "events")
    cutoff = e.agg((F.max("ts") - F.expr("INTERVAL 1 HOUR")).alias("cut"))
    return (
        e.join(F.broadcast(cutoff))
        .filter(F.col("ts") >= F.col("cut"))
        .select("event_id", "ts", "user_id")
        .orderBy("event_id")
    )


@register(
    "event_hypertable_rollup",
    oracle=f"""
SELECT 'minute' AS granularity, date_trunc('minute', ts) AS bucket_start,
       event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       {exact_sum_sql('value')} AS sum_value
FROM events GROUP BY bucket_start, event_type
UNION ALL
SELECT 'hour', date_trunc('hour', ts), event_type,
       CAST(COUNT(*) AS BIGINT), {exact_sum_sql('value')}
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'day', date_trunc('day', ts), event_type,
       CAST(COUNT(*) AS BIGINT), {exact_sum_sql('value')}
FROM events GROUP BY 2, 3
ORDER BY granularity, bucket_start, event_type
""",
)
def event_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: minute/hour/day rollups where
    each coarser level re-aggregates the FINER level's partials, not the raw
    table (the timescale continuous-aggregate trick).

    At 100 TB this reads the fact table once: the minute layer is the only
    scan+shuffle over raw events; hour re-aggregates ~60x fewer rows, day
    ~1440x fewer. Counts and decimal partial sums are associative, so the
    result is bit-identical to direct grouping — which is exactly what the
    oracle computes, proving the rewrite safe.
    """
    e = table(spark, sf_dir, "events")
    minute = e.groupBy(
        F.date_trunc("minute", "ts").alias("bucket_start"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,6)")).alias("_dsum"),
    )
    hour = minute.groupBy(
        F.date_trunc("hour", "bucket_start").alias("bucket_start"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("_dsum").alias("_dsum"))
    day = hour.groupBy(
        F.date_trunc("day", "bucket_start").alias("bucket_start"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("_dsum").alias("_dsum"))

    def _lvl(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("granularity"),
            "bucket_start",
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("_dsum").cast("double").alias("sum_value"),
        )

    return (
        _lvl(minute, "minute")
        .unionByName(_lvl(hour, "hour"))
        .unionByName(_lvl(day, "day"))
        .orderBy("granularity", "bucket_start", "event_type")
    )


# -- funnel analysis ----------------------------------------------------------

EVENT_FUNNEL_ORACLE = """
WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                 WHEN c.user_id IS NOT NULL THEN 2
                 ELSE 1 END AS INTEGER) AS stages_completed
FROM v LEFT JOIN c ON c.user_id = v.user_id
       LEFT JOIN p ON p.user_id = c.user_id
ORDER BY v.user_id
"""


@register("event_funnel", oracle=EVENT_FUNNEL_ORACLE)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: earliest view -> first click after it -> first
    purchase after that, per user — the staged-conversion shape event
    analytics runs constantly (strictly ordered, so a click before the
    first view does not count).

    Plan: three MIN aggregations chained by inequality-filtered equi-joins,
    everything keyed on user_id — one partitioning reused across all stages
    (co-partitioned joins after the first shuffle; at 100 TB, bucket the
    events table by user_id and no stage re-shuffles). No window over the
    raw event stream and no per-user sort: each stage is a partial-aggregated
    MIN, so state is one timestamp per user per stage.
    """
    e = table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.when(F.col("t_purchase").isNotNull(), 3)
            .when(F.col("t_click").isNotNull(), 2)
            .otherwise(1)
            .cast("int")
            .alias("stages_completed"),
        )
        .orderBy("user_id")
    )


COHORT_RETENTION_ORACLE = """
WITH first_seen AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week FROM events
  GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS INTEGER)
           AS week_offset
  FROM events e JOIN first_seen f ON f.user_id = e.user_id
)
SELECT cohort_week, week_offset,
       CAST(COUNT(*) AS BIGINT) AS active_users
FROM activity
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


@register("cohort_retention", oracle=COHORT_RETENTION_ORACLE)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, counted as
    active per week offset — the retention-matrix shape behind every growth
    dashboard (funnel's longitudinal companion).

    Plan: one MIN aggregation for cohort assignment, joined back (both sides
    keyed on user_id — co-partitioned after one shuffle), then a distinct +
    count over (cohort, offset) — low-cardinality final rollup. No window
    over the raw stream; at 100 TB the cohort table is the only per-user
    state and the fact scan stays single-pass.
    """
    e = table(spark, sf_dir, "events")
    # .cast("date"): DuckDB's date_trunc('week', ts) yields DATE, Spark's a
    # TIMESTAMP — pin both engines to DATE for hash parity.
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        e.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("bigint").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


# -- hypertable gap-fill + LOCF ---------------------------------------------

GAPFILL_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket_start, event_type,
         CAST(count(*) AS BIGINT) AS n,
         round(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6) AS avg_value
  FROM events GROUP BY bucket_start, event_type
), bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_start
  FROM bounds
), grid AS (
  SELECT s.bucket_start, t.event_type
  FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM events) t
)
SELECT g.bucket_start, g.event_type,
       COALESCE(h.n, 0) AS n_events,
       last_value(h.avg_value IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.bucket_start
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_avg
FROM grid g LEFT JOIN hourly h USING (bucket_start, event_type)
ORDER BY g.event_type, g.bucket_start
"""


@register("event_gapfill_locf", oracle=GAPFILL_ORACLE)
def event_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable gap-fill: a dense hourly (bucket x event_type) grid with
    zero-filled counts and last-observation-carried-forward averages — the
    ``time_bucket_gapfill`` + ``locf`` shape time-series stores expose, which
    plain GROUP BY can't produce (empty buckets simply don't exist in the
    grouped output).

    The dense spine is generated from the one-row (min, max) aggregate via
    ``sequence()`` and cross-joined with the distinct type list — both
    broadcast-sized regardless of data volume (the grid grows with the TIME
    RANGE, not the row count). The hourly aggregation is the only data-sized
    shuffle; the LOCF window partitions by event_type over the tiny grid.
    """
    e = table(spark, sf_dir, "events")
    # avg via the decimal-exact sum (functions.hashing discipline): plain
    # AVG(double) differs from DuckDB in the last ulp under Spark's partial
    # aggregation, which flipped one round-to-6 row at sf0.1.
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("bucket_start"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.round(exact_sum("value") / F.count("*"), 6).alias("avg_value"),
    )
    spine = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    ).select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("bucket_start")
    )
    types = e.select("event_type").distinct()
    grid = spine.join(F.broadcast(types))
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(F.broadcast(hourly), ["bucket_start", "event_type"], "left")
        .select(
            "bucket_start",
            "event_type",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
            F.last("avg_value", ignorenulls=True).over(w).alias("filled_avg"),
        )
        .orderBy("event_type", "bucket_start")
    )


# -- trailing-window anomaly detection --------------------------------------

#: trailing window (hours) used as the per-type baseline distribution.
_ANOMALY_LOOKBACK = 24
#: |z| at or above which an hour is flagged.
_ANOMALY_Z = 2.0

ANOMALY_ORACLE = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket_start, event_type,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY bucket_start, event_type
), sums AS (
  SELECT bucket_start, event_type, n_events,
         CAST(coalesce(sum(n_events) OVER w, 0) AS BIGINT) AS win_sum,
         CAST(coalesce(sum(n_events * n_events) OVER w, 0) AS BIGINT)
           AS win_sumsq,
         count(*) OVER w AS n_obs
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_start
               ROWS BETWEEN {_ANOMALY_LOOKBACK} PRECEDING AND 1 PRECEDING)
), scored AS (
  -- mu/sigma derived from EXACT integer window sums with the same
  -- operation order as streaming/anomaly.with_zscore — stddev_samp's
  -- engine-internal accumulation order is not portable at round(.,6)
  SELECT bucket_start, event_type, n_events, n_obs,
         CAST(win_sum AS DOUBLE) / n_obs AS mu,
         sqrt((CAST(win_sumsq AS DOUBLE)
               - CAST(win_sum AS DOUBLE) * win_sum / n_obs)
              / (n_obs - 1)) AS sigma
  FROM sums
)
SELECT bucket_start, event_type, n_events,
       round((n_events - mu) / sigma, 6) AS zscore,
       (abs((n_events - mu) / sigma) >= {_ANOMALY_Z}) AS is_anomaly
FROM scored
WHERE n_obs >= {_ANOMALY_LOOKBACK} AND sigma > 0
ORDER BY event_type, bucket_start
"""


@register("event_anomaly_zscore", oracle=ANOMALY_ORACLE)
def event_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly scores: each hour's event count z-scored
    against the preceding 24-hour distribution of its own type;
    hours without a full baseline (or a degenerate sigma) are excluded so
    the flag is well-defined on both engines.

    This is the streaming-monitor shape (rate spike / drop detection) run
    as a batch plan: one data-sized shuffle to hourly counts, then a
    per-type ordered window over the bucket grid — bounded by the time
    range, not the event volume, so the window never sees corpus-scale
    partitions. It IS the streaming twin's code path: the trailing window
    produces exact integer sums (``streaming.anomaly.anomaly_sums_batch``)
    and the z-score derives from them in the shared ``with_zscore``
    projection — ``stddev_samp`` is deliberately absent, since its
    engine-internal accumulation order is not portable at ``round(., 6)``
    (the same floating-aggregate class as the r03 ``event_gapfill_locf``
    AVG fix).
    """
    from columnar_aware_dedup_spark.streaming import anomaly

    e = table(spark, sf_dir, "events")
    return anomaly.with_zscore(anomaly.anomaly_sums_batch(e)).orderBy(
        "event_type", "bucket_start"
    )
