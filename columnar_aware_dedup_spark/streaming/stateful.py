"""Custom stateful streaming operator: first-event dedup with explicit state.

The reference's only state is the server's unbounded in-heap chunk store
(``orc/dedup/NaiveORCChunkStore.java:15``) — process-local, never evicted,
lost on restart. The engine's stateful path is
``applyInPandasWithState``: per-key state lives in Spark's checkpointed state
store (RocksDB/HDFS-backed on a cluster), survives restarts, and can expire
via timeouts.

This operator is the streaming twin of the batch ``event_dedup_first`` query
(:mod:`columnar_aware_dedup_spark.operators.events`) — the test asserts the
two produce identical rows for a bounded input, which is the correctness
contract for every batch/streaming operator pair in this engine.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUTPUT_SCHEMA = "user_id long, event_type string, event_id long, ts timestamp"
_STATE_SCHEMA = "seen_types array<string>"


def _dedup_first_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit only the first event per (user, type), across micro-batches.

    State = the set of event types already emitted for this user. Within a
    batch, events are ordered by (ts, event_id) so 'first' is deterministic
    — the same total order the batch oracle uses.
    """
    (user_id,) = key
    seen: set[str] = set(state.get[0]) if state.exists else set()
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
    fresh = batch[~batch["event_type"].isin(seen)].drop_duplicates(
        "event_type", keep="first"
    )
    seen.update(fresh["event_type"])
    state.update((sorted(seen),))
    out = fresh[["user_id", "event_type", "event_id", "ts"]]
    yield out


def dedup_first_stateful(events: DataFrame) -> DataFrame:
    """events stream -> first event per (user, type), exactly once per key.

    Scale note: state is partitioned by user_id (the group key); the state
    store shards with the shuffle, so 100 TB of history costs only
    |distinct (user, type)| state rows.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _dedup_first_fn,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# chunk store as expiring streaming state
# ---------------------------------------------------------------------------

_STORE_OUTPUT_SCHEMA = (
    "signature string, file string, size long, hit boolean"
)
_STORE_STATE_SCHEMA = "seen boolean"

#: default chunk-store TTL (1 h of processing time).
DEFAULT_STORE_TTL_MS = 60 * 60 * 1000


def _make_store_probe_fn(ttl_ms: int):
    def _store_probe_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Probe one signature group against its state; the first arrival
        ever is the miss (transfer), everything after is a hit (dedup) —
        until the TTL evicts the signature and the next arrival transfers
        again."""
        if state.hasTimedOut:
            state.remove()
            return
        (signature,) = key
        seen = bool(state.get[0]) if state.exists else False
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["file", "chunk_idx"], kind="mergesort")
        hit = [True] * len(batch)
        if not seen and len(batch):
            hit[0] = False  # the first-ever arrival transfers
        out = pd.DataFrame(
            {
                "signature": signature,
                "file": batch["file"].to_numpy(),
                "size": batch["size"].to_numpy(),
                "hit": hit,
            }
        )
        state.update((True,))
        state.setTimeoutDuration(ttl_ms)
        yield out

    return _store_probe_fn


def chunk_store_stateful(
    chunks: DataFrame, ttl_ms: int = DEFAULT_STORE_TTL_MS
) -> DataFrame:
    """Streaming chunk-store probe with TTL eviction.

    The reference's server store is an unbounded process-lifetime HashMap
    (``orc/dedup/NaiveORCChunkStore.java:15`` — never evicted, lost on
    restart). Here the store IS Spark streaming state: keyed by signature,
    checkpointed (survives restarts), sharded with the shuffle, and expiring
    via processing-time timeout — at 100 TB the state size is bounded by the
    signatures seen within one TTL window, not by history.

    Input: a (possibly streaming) chunk table with ``file, chunk_idx,
    signature, size``. Output: one row per chunk with the hit/miss verdict.
    """
    return chunks.groupBy("signature").applyInPandasWithState(
        _make_store_probe_fn(ttl_ms),
        outputStructType=_STORE_OUTPUT_SCHEMA,
        stateStructType=_STORE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """Built-in streaming dedup: ``dropDuplicatesWithinWatermark``.

    The engine's third streaming-dedup flavor next to the custom
    ``applyInPandasWithState`` operators: Spark's native bounded-state dedup,
    which keeps a key in state only until the event-time watermark passes it
    — the framework-managed form of the TTL store above, and the right
    default for exactly-once event dedup at 100 TB (state size is bounded by
    keys within one watermark window, eviction handled by the engine).

    Contract (proven in ``tests/test_streaming.py``): for a bounded input
    replayed with duplicates, the output has exactly one row per key.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )
