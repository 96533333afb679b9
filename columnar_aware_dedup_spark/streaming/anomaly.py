"""Streaming twin of the batch anomaly monitor (`event_anomaly_zscore`):
trailing-window rate statistics as ONE custom stateful operator.

Spark does not allow ``applyInPandasWithState`` after a streaming
aggregation (append-mode chain restriction), so the operator consumes the
RAW event stream and does its own hourly bucketing inside the state
function. Per event_type the state holds:

- ``pending``: counts for hours that may still receive events;
- ``hist``: the last 24 FINALIZED hourly counts (the z-score baseline).

An hour finalizes when a strictly later hour appears for the same key — the
newest-hour-per-key acts as the watermark. This assumes time-ordered arrival
across micro-batches (the kappa replay contract the tests exercise); a
production deployment swaps the max-hour rule for event-time timers
(``GroupStateTimeout.EventTimeTimeout``) to tolerate bounded lateness.

The operator emits INTEGER window sums (sum, sum-of-squares, count), not
floats: the z-score itself is derived by :func:`with_zscore`, the same
columnar Spark expression the batch twin uses — so batch/stream parity is
exact row equality, no float tolerance (the suite's standard contract).

Scale: state is keyed by event_type and bounded — |pending| ≤ out-of-order
horizon, |hist| ≤ 24 — so the state store holds O(keys) tiny rows no matter
the event volume; each micro-batch shuffles only its own rows once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: trailing baseline length (hours), matching the batch monitor.
LOOKBACK = 24
#: |z| at or above which an hour is flagged (shared with the batch twin).
Z_THRESHOLD = 2.0

_OUT_SCHEMA = (
    "bucket_start timestamp, event_type string, n_events long,"
    " win_sum long, win_sumsq long, n_obs int"
)
_STATE_SCHEMA = (
    "pending_hours array<long>, pending_counts array<long>, hist array<long>"
)


def _score_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    if state.exists:
        ph, pc, hist = state.get
        pending = dict(zip(ph, pc))
        hist = list(hist)
    else:
        pending, hist = {}, []
    batch = pd.concat(list(pdfs), ignore_index=True)
    hours = batch["ts"].dt.floor("h")
    epoch_h = (hours.astype("int64") // 3_600_000_000_000).astype("int64")
    for h, c in epoch_h.value_counts().items():
        pending[int(h)] = pending.get(int(h), 0) + int(c)
    out = []
    if pending:
        max_h = max(pending)
        for h in sorted(k for k in pending if k < max_h):
            n = pending.pop(h)
            out.append(
                (
                    pd.Timestamp(h * 3600, unit="s", tz="UTC"),
                    event_type,
                    n,
                    sum(hist),
                    sum(x * x for x in hist),
                    len(hist),
                )
            )
            hist.append(n)
            hist = hist[-LOOKBACK:]
    state.update(
        (sorted(pending), [pending[h] for h in sorted(pending)], hist)
    )
    yield pd.DataFrame(
        out,
        columns=[
            "bucket_start",
            "event_type",
            "n_events",
            "win_sum",
            "win_sumsq",
            "n_obs",
        ],
    )


def anomaly_sums_stream(events: DataFrame) -> DataFrame:
    """events stream -> finalized hourly counts + trailing integer sums.

    Requires a UTC session: ``_score_fn`` floors naive pandas timestamps to
    epoch hours assuming UTC and emits tz-aware UTC bucket starts, which
    matches the batch twin's ``date_trunc('hour')`` only because
    ``session.py`` pins ``spark.sql.session.timeZone=UTC`` — under any other
    session zone the stream's bucket_start silently shifts by the offset,
    so the requirement is asserted here rather than documented away."""
    session = events.sparkSession
    tz = session.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise ValueError(
            f"anomaly_sums_stream requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}): the stateful kernel buckets naive timestamps as "
            "UTC epoch hours"
        )
    return events.groupBy("event_type").applyInPandasWithState(
        _score_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def anomaly_sums_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the same integer columns via a keyed row-frame window."""
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("bucket_start"), "event_type"
    ).agg(F.count("*").alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_start")
        .rowsBetween(-LOOKBACK, -1)
    )
    return hourly.select(
        "bucket_start",
        "event_type",
        "n_events",
        F.coalesce(F.sum("n_events").over(w), F.lit(0)).alias("win_sum"),
        F.coalesce(
            F.sum(F.col("n_events") * F.col("n_events")).over(w), F.lit(0)
        ).alias("win_sumsq"),
        F.count("*").over(w).cast("int").alias("n_obs"),
    )


def with_zscore(df: DataFrame) -> DataFrame:
    """Shared scoring projection over the integer sums (batch AND stream):
    mu = s/n, var = (ss - s²/n)/(n-1), z = (x - mu)/sigma — identical Spark
    expressions on identical integers means identical doubles."""
    mu = F.col("win_sum").cast("double") / F.col("n_obs")
    var = (
        F.col("win_sumsq").cast("double")
        - F.col("win_sum").cast("double") * F.col("win_sum") / F.col("n_obs")
    ) / (F.col("n_obs") - 1)
    sigma = F.sqrt(var)
    z = (F.col("n_events") - mu) / sigma
    return (
        df.filter((F.col("n_obs") >= LOOKBACK) & (sigma > 0))
        .select(
            "bucket_start",
            "event_type",
            "n_events",
            F.round(z, 6).alias("zscore"),
            (F.abs(z) >= F.lit(Z_THRESHOLD)).alias("is_anomaly"),
        )
    )
