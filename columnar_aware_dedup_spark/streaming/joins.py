"""Stream-stream interval join: correlating two live event streams.

The reference correlates two live flows exactly once — the client's offer
stream against the server's ack stream over one TCP socket
(``orc/net/NaiveORCStreamer.java`` offer/ack loop). Spark-native, that
pattern is a watermarked stream-stream join: each side buffers only the
rows inside the interval condition's time bound, state is evicted by the
watermark, and the join emits exactly the pairs a batch interval join would.

Scale contract: per-key state is bounded by (watermark + interval width) of
events, sharded by the join key with the shuffle. Both inputs must carry
watermarks or state grows unboundedly — Spark refuses the append-mode query
otherwise, which is the right failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: match window: a 'click' follows an 'view' by at most this many seconds.
INTERVAL_S = 300


def _tagged(events: DataFrame, etype: str, alias: str) -> DataFrame:
    return (
        events.filter(F.col("event_type") == etype)
        .select(
            F.col("user_id").alias(f"{alias}_user"),
            F.col("event_id").alias(f"{alias}_id"),
            F.col("ts").alias(f"{alias}_ts"),
        )
    )


def interval_join_stream(
    views: DataFrame, clicks: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """view→click attribution pairs within INTERVAL_S, both sides streaming.

    Works identically for batch inputs (the condition is plain SQL), which is
    what the batch/streaming contract test exploits.
    """
    v = views.withWatermark("v_ts", watermark)
    c = clicks.withWatermark("c_ts", watermark)
    return v.join(
        c,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {INTERVAL_S} SECONDS")),
    ).select("v_user", "v_id", "v_ts", "c_id", "c_ts")


def interval_join_batch(views: DataFrame, clicks: DataFrame) -> DataFrame:
    """The batch twin: same condition, no watermarks."""
    return views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {INTERVAL_S} SECONDS")),
    ).select("v_user", "v_id", "v_ts", "c_id", "c_ts")


def split_views_clicks(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(views, clicks) slices of an events table/stream — the fixture's two
    most frequent event types play the roles."""
    return _tagged(events, "view", "v"), _tagged(events, "click", "c")
