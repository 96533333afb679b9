"""ORC fixture materialization + the linked stripe->subchunk chunker.

The reference is an ORC-first system (its flagship is the s+p ORC streamer,
``orc/net/StripePlusColumnORCStreamer.java``), but the driver fixtures are
parquet-only. This module materializes a deterministic two-snapshot ORC
workload from the parquet fixtures (driver-side, cached, fixture prep only —
the registered queries themselves are fully distributed binaryFile ->
mapInPandas dataflows):

- ``store/``: snapshot A (orders before the cutoff) as multi-stripe ORC;
- ``incoming/``: snapshot B written append-style (A's rows first, same sort,
  same writer parameters — so A's stripes are byte-identical prefixes, the
  re-transfer scenario of ``README.md:66-78``), a one-column-modified variant
  (stripe misses that still dedup at column level — the s+p fallback,
  ``StripePlusColumnORCStreamer.java:130-209``), and a brand-new file.

The *linked* chunker emits the reference's chunk-with-subchunks model
(``orc/dedup/StripePlusColumnORCChunkingAlgorithm.java:26-119``): one row per
stripe, signed over the stripe's data region
(``StripePlusColumnORCStreamer.java:110-118`` hashes stripeData), carrying an
``array<struct>`` of subchunks (index stream span, one span per column, the
stripe footer) — so a stripe hit can reconstruct index+data+footer from the
store (``orc/net/StripePlusColumnORCReceiver.java:103-122``) and a stripe
miss probes the subchunks.

Scale: chunking is one task per file (embarrassingly parallel); the probes
are signature equi-joins; nothing collects to the driver.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from columnar_aware_dedup_spark.functions.orcmeta import (
    column_spans,
    orc_column_stats_key,
    orc_stats_key,
    read_orc_structure,
)
from columnar_aware_dedup_spark.registry import register

#: snapshot cutoff shared with the row-level workload (operators/dedup.py).
_CUTOFF = "1998-01-01"

_STRIPE_SIZE = 64 * 1024

_SUB_SCHEMA = T.StructType(
    [
        T.StructField("column_name", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("size", T.LongType(), False),
        T.StructField("signature", T.StringType(), False),
        # r11: the per-column stats-pruning key (populated only when the
        # walk is asked for keys — ``with_stats_keys``; NULL otherwise and
        # for non-column subchunks, which are never pruned)
        T.StructField("stats_key", T.StringType(), True),
    ]
)

LINKED_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), False),
        T.StructField("chunk_idx", T.IntegerType(), False),
        T.StructField("chunk_type", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("size", T.LongType(), False),
        T.StructField("signature", T.StringType(), False),
        T.StructField("subchunks", T.ArrayType(_SUB_SCHEMA), True),
        # r11: the stripe-level stats-pruning key (same population rule as
        # the subchunk field)
        T.StructField("stats_key", T.StringType(), True),
    ]
)


# ---------------------------------------------------------------------------
# fixture materialization (driver-side, cached)
# ---------------------------------------------------------------------------

def _in_a_sql(od: str) -> str:
    """The snapshot-A membership predicate — ONE copy, so the four-file
    workload and the string-perturbed extra file can never disagree on
    what snapshot A is."""
    return (
        f"l_orderkey IN (SELECT o_orderkey FROM {od} "
        f"WHERE o_orderdate < TIMESTAMP '{_CUTOFF}')"
    )


def _published_fixture_dir(sf_dir: str, cache_name: str, build_fn) -> str:
    """Build-once atomic fixture cache under the system temp dir, keyed by
    ``cache_name``: each builder writes into its OWN ``mkdtemp`` directory
    (a shared ``base + ".tmp"`` let two concurrent first builds interleave
    writes into the same files and publish a corrupt cache behind a valid
    _SUCCESS marker), and ``os.replace`` publishes whole directories — the
    losing racer's finished tree is discarded, never merged. ONE copy of
    the publish protocol for every fixture family."""
    import shutil

    base = os.path.join(
        tempfile.gettempdir(),
        cache_name,
        os.path.basename(os.path.normpath(sf_dir)),
    )
    if os.path.exists(os.path.join(base, "_SUCCESS")):
        return base
    os.makedirs(os.path.dirname(base), exist_ok=True)
    tmp = tempfile.mkdtemp(
        prefix=os.path.basename(base) + ".", dir=os.path.dirname(base)
    )
    build_fn(tmp)
    open(os.path.join(tmp, "_SUCCESS"), "w").close()  # travels with rename
    try:
        os.replace(tmp, base)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost the publish race
        if not os.path.exists(os.path.join(base, "_SUCCESS")):
            raise
    return base


def _snapshot_fixture_dirs(
    sf_dir: str, cache_name: str, ext: str, write_fn
) -> tuple[str, str]:
    """Shared builder for the four-snapshot dedup workload in either format:
    store = snapshot A (orders before ``_CUTOFF``); incoming = append-layout
    B (A's rows first, same sort, so A's stripes/row-groups are
    byte-identical prefixes), one-column-modified A (``l_partkey + 7`` —
    re-compresses and shifts every downstream byte of that column), and
    brand-new content (an orders projection — full miss). ONE copy of the
    workload definition so the ORC report and its parquet twin can never
    desynchronize on what "the same workload in two formats" means.
    Published atomically through :func:`_published_fixture_dir`.
    """
    import duckdb

    def _build(tmp: str) -> None:
        os.makedirs(os.path.join(tmp, "store"), exist_ok=True)
        os.makedirs(os.path.join(tmp, "incoming"), exist_ok=True)
        con = duckdb.connect()
        li = f"read_parquet('{sf_dir}/lineitem.parquet')"
        od = f"read_parquet('{sf_dir}/orders.parquet')"
        in_a = _in_a_sql(od)
        sort = "ORDER BY l_orderkey, l_linenumber"

        def _write(sql: str, rel_path: str) -> None:
            write_fn(con.execute(sql).arrow(), os.path.join(tmp, rel_path))

        # store: snapshot A
        _write(
            f"SELECT * FROM {li} WHERE {in_a} {sort}", f"store/lineitem.{ext}"
        )
        # incoming 1: snapshot B, append layout (A's rows first, same sort)
        # so A's stripes/row-groups are byte-identical prefixes -> hits.
        _write(
            f"SELECT * FROM {li} ORDER BY (CASE WHEN {in_a} THEN 0 ELSE 1"
            " END), l_orderkey, l_linenumber",
            f"incoming/lineitem.{ext}",
        )
        # incoming 2: one column perturbed -> that column misses, others hit.
        _write(
            f"SELECT * REPLACE (l_partkey + 7 AS l_partkey) FROM {li}"
            f" WHERE {in_a} {sort}",
            f"incoming/lineitem_mod.{ext}",
        )
        # incoming 3: brand-new content -> full miss.
        _write(
            "SELECT o_orderkey, o_custkey, o_totalprice FROM "
            f"{od} ORDER BY o_orderkey",
            f"incoming/orders_new.{ext}",
        )
        con.close()

    base = _published_fixture_dir(sf_dir, cache_name, _build)
    return os.path.join(base, "store"), os.path.join(base, "incoming")


def orc_fixture_dirs(sf_dir: str) -> tuple[str, str]:
    """Materialize (store_dir, incoming_dir) of ORC files for ``sf_dir``
    (the four-snapshot workload — see :func:`_snapshot_fixture_dirs`)."""
    import pyarrow.orc as orc

    def _write(tbl, path):
        orc.write_table(tbl, path, stripe_size=_STRIPE_SIZE)

    return _snapshot_fixture_dirs(sf_dir, "cawd_orc_fixtures", "orc", _write)


#: parquet-twin row-group size: small enough that EVERY fixture file holds
#: several row groups at every SF (orders_new at sf0.001 is 1,500 rows —
#: the zone-map effectiveness bit needs >=2 groups to prune one and keep
#: one; page-level dedup also wants structure to find), fixed so snapshot
#: B's append layout reproduces snapshot A's row-group boundaries — A's
#: pages are then byte-identical in B and page signatures hit.
_ROW_GROUP_ROWS = 500


def parquet_fixture_dirs(sf_dir: str) -> tuple[str, str]:
    """Materialize (store_dir, incoming_dir) of PARQUET files for
    ``sf_dir`` — the SAME four-snapshot workload as :func:`orc_fixture_dirs`
    (one shared builder, so the two formats cannot drift), in the
    reference's other format
    (``parquet/dedup/NaiveParquetChunkingAlgorithm.java``). Fixed row-group
    boundaries make the append layout reproduce A's pages byte-for-byte, so
    the page-level structural chunker has real hits to find. Pages are
    written PLAIN (``use_dictionary=False``): dictionary-encoded data pages
    hold RLE index streams, and the all-distinct index pattern (0..n-1)
    recurs across UNRELATED columns — measured 15% of brand-new
    ``orders_new`` bytes "deduping" against the lineitem store purely on
    index-stream collisions. PLAIN pages carry the values themselves, so a
    signature hit means shared DATA, which is what the thesis measurement
    compares. The cache key carries the layout version."""
    import pyarrow.parquet as pq

    def _write(tbl, path):
        pq.write_table(
            tbl, path, row_group_size=_ROW_GROUP_ROWS, use_dictionary=False
        )

    return _snapshot_fixture_dirs(
        sf_dir, "cawd_parquet_fixtures_plain_rg500", "parquet", _write
    )


def _strmod_incoming_dir(
    sf_dir: str, cache_name: str, ext: str, write_fn
) -> str:
    """One EXTRA incoming file for the stats-pruned dedup certificates
    (r10, VERDICT r09 "Next round" #2): snapshot A with a STRING column
    perturbed value-for-value at constant byte length
    (``l_returnflag``: 'A' -> 'B') — every integer/double statistic stays
    identical to the store, so integer-only stats keys would make every
    region a hash candidate; string statistics shift in every region, so
    the extended keys prune ALL of it from footer metadata alone. Same
    byte lengths keep encoded stream sizes — and therefore stripe /
    row-group boundaries and the OTHER columns' physical bytes —
    identical to the store, which is also what lets the column-level
    fallback recover the unperturbed columns as signature hits. Kept in
    its OWN cache dir (not the four-file snapshot workload) so the many
    structural queries globbing the main incoming dir are untouched.
    Snapshot-A membership and the atomic publish come from the SAME
    single-copy helpers as the main builder (:func:`_in_a_sql`,
    :func:`_published_fixture_dir`), so the strmod file cannot
    desynchronize from the store it must byte-match column-for-column."""
    import duckdb

    def _build(tmp: str) -> None:
        os.makedirs(os.path.join(tmp, "incoming"), exist_ok=True)
        con = duckdb.connect()
        li = f"read_parquet('{sf_dir}/lineitem.parquet')"
        od = f"read_parquet('{sf_dir}/orders.parquet')"
        tbl = con.execute(
            "SELECT * REPLACE (replace(l_returnflag, 'A', 'B')"
            f" AS l_returnflag) FROM {li} WHERE {_in_a_sql(od)}"
            " ORDER BY l_orderkey, l_linenumber"
        ).arrow()
        write_fn(
            tbl, os.path.join(tmp, "incoming", f"lineitem_strmod.{ext}")
        )
        con.close()

    base = _published_fixture_dir(sf_dir, cache_name, _build)
    return os.path.join(base, "incoming")


def orc_strmod_incoming_dir(sf_dir: str) -> str:
    """The string-perturbed extra incoming file, ORC rendering (same
    writer parameters as :func:`orc_fixture_dirs` so boundaries match the
    store)."""
    import pyarrow.orc as orc

    def _write(tbl, path):
        orc.write_table(tbl, path, stripe_size=_STRIPE_SIZE)

    return _strmod_incoming_dir(sf_dir, "cawd_orc_strmod", "orc", _write)


def parquet_strmod_incoming_dir(sf_dir: str) -> str:
    """The string-perturbed extra incoming file, parquet rendering (same
    writer parameters as :func:`parquet_fixture_dirs`)."""
    import pyarrow.parquet as pq

    def _write(tbl, path):
        pq.write_table(
            tbl, path, row_group_size=_ROW_GROUP_ROWS, use_dictionary=False
        )

    return _strmod_incoming_dir(
        sf_dir, "cawd_parquet_strmod_plain_rg500", "parquet", _write
    )


# ---------------------------------------------------------------------------
# linked chunker (pure function over bytes)
# ---------------------------------------------------------------------------

def chunk_orc_stripes_linked(
    data: bytes, with_stats_keys: bool = False
) -> list[dict]:
    """ORC file -> stripe chunks with subchunk arrays + Footer + Regular.

    Stripe signature = md5 over the stripe's *data region* (the s+p probe
    hash); subchunks = index stream, per-column data spans, stripe footer —
    each with its own span signature. Covers [0, len) exactly (gap chunks are
    Regular), so reassembly is concatenation.

    ``with_stats_keys=True`` (r11) additionally attaches the stats-pruning
    keys from the SAME footer walk the zone-map family certifies
    (``functions/orcmeta.py::orc_stats_key`` / ``orc_column_stats_key``):
    the stripe chunk carries its per-column statistics-vector key, each
    column subchunk its per-column key — what the metadata-pruned
    hierarchical probe (``orc_hierarchical_pruned``) decides hash-or-skip
    from. Off by default so the other linked-chunk consumers' walks are
    byte-for-byte what they were (every emitted field is then NULL).
    """
    s = read_orc_structure(data)
    stripe_stats: list[list[dict]] = []
    if with_stats_keys:
        from columnar_aware_dedup_spark.functions.orcmeta import (
            read_stripe_column_stats,
        )

        stripe_stats = read_stripe_column_stats(data)

    def sig(start: int, size: int) -> str:
        return hashlib.md5(data[start : start + size]).hexdigest()

    chunks: list[dict] = []
    pos = 0
    for stripe_idx, st in enumerate(s.stripes):
        cst = (
            stripe_stats[stripe_idx]
            if stripe_idx < len(stripe_stats)
            else []
        )
        if st.offset > pos:
            chunks.append(
                {"chunk_type": "Regular", "start": pos, "size": st.offset - pos,
                 "signature": sig(pos, st.offset - pos), "subchunks": None,
                 "stats_key": None}
            )
        data_start = st.offset + st.index_length
        subs = [
            {"column_name": "index", "start": st.offset, "size": st.index_length,
             "signature": sig(st.offset, st.index_length), "stats_key": None}
        ]
        # per-column data spans, gap-filled so the subchunks cover the data
        # region exactly (stream kinds we don't span become 'pad' subchunks) —
        # reconstruction-from-store is then pure concatenation.
        cover = data_start
        for cid, c_start, c_size in sorted(
            column_spans(data, st, s.compression), key=lambda t: t[1]
        ):
            if c_start > cover:
                subs.append(
                    {"column_name": "pad", "start": cover, "size": c_start - cover,
                     "signature": sig(cover, c_start - cover), "stats_key": None}
                )
            subs.append(
                {"column_name": f"col{cid}", "start": c_start, "size": c_size,
                 "signature": sig(c_start, c_size),
                 "stats_key": orc_column_stats_key(cst, cid) if cst else None}
            )
            cover = c_start + c_size
        ftr_start = data_start + st.data_length
        if ftr_start > cover:
            subs.append(
                {"column_name": "pad", "start": cover, "size": ftr_start - cover,
                 "signature": sig(cover, ftr_start - cover), "stats_key": None}
            )
        subs.append(
            {"column_name": "stripe_footer", "start": ftr_start,
             "size": st.footer_length, "signature": sig(ftr_start, st.footer_length),
             "stats_key": None}
        )
        total = st.index_length + st.data_length + st.footer_length
        chunks.append(
            {"chunk_type": "Stripe", "start": st.offset, "size": total,
             "signature": sig(data_start, st.data_length),
             "subchunks": [c for c in subs if c["size"] > 0],
             "stats_key": orc_stats_key(cst) if cst else None}
        )
        pos = st.offset + total
    if s.footer_start > pos:
        chunks.append(
            {"chunk_type": "Regular", "start": pos, "size": s.footer_start - pos,
             "signature": sig(pos, s.footer_start - pos), "subchunks": None,
             "stats_key": None}
        )
    chunks.append(
        {"chunk_type": "Footer", "start": s.footer_start,
         "size": s.file_length - s.footer_start,
         "signature": sig(s.footer_start, s.file_length - s.footer_start),
         "subchunks": None, "stats_key": None}
    )
    for i, c in enumerate(chunks):
        c["chunk_idx"] = i
    return chunks


def linked_chunk_files(
    spark: SparkSession,
    path: str,
    glob: str = "*.orc",
    with_stats_keys: bool = False,
) -> DataFrame:
    """binaryFile scan -> linked chunk table (one parse task per file)."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in LINKED_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for c in chunk_orc_stripes_linked(
                    bytes(content), with_stats_keys=with_stats_keys
                ):
                    rows.append({"file": path_, **c})
            yield pd.DataFrame(rows, columns=cols)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_batches, LINKED_SCHEMA)


def _file_name(col: str = "file"):
    return F.element_at(F.split(col, "/"), -1).alias("file_name")


# ---------------------------------------------------------------------------
# registered queries (R: DuckDB cannot parse ORC bytes)
# ---------------------------------------------------------------------------

#: the constant two-snapshot fixture layout — what lets the ORC queries be
#: HASH-CHECKED even though DuckDB cannot parse ORC bytes: the oracle
#: re-states, per known file name, booleans the Spark side proves in-plan
#: on the real bytes (the trainer-certificate pattern, VERDICT r05 #5).
_INCOMING_FILES = ("lineitem.orc", "lineitem_mod.orc", "orders_new.orc")
_ALL_FILES = (
    "incoming/lineitem.orc",
    "incoming/lineitem_mod.orc",
    "incoming/orders_new.orc",
    "store/lineitem.orc",
)


ORC_CHUNKS_ORACLE = """
SELECT file_name, TRUE AS cover_contiguous_ok, TRUE AS bytes_sum_equals_span_ok,
       TRUE AS structure_parsed_ok, TRUE AS footer_ok
FROM (VALUES ('lineitem.orc'), ('lineitem_mod.orc'), ('orders_new.orc'))
     t(file_name)
ORDER BY file_name
"""


def orc_file_chunks_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type chunk census of the incoming ORC files (the unregistered
    twin keeping the raw counts: n_chunks / bytes / distinct signatures)."""
    from columnar_aware_dedup_spark.sources.chunkers import chunk_files

    _, incoming = orc_fixture_dirs(sf_dir)
    chunks = chunk_files(spark, incoming, glob="*.orc", orc_mode="columns")
    return (
        chunks.groupBy("chunk_type")
        .agg(
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum("size").cast("bigint").alias("bytes"),
            F.countDistinct("signature").alias("distinct_signatures"),
        )
        .orderBy("chunk_type")
    )


@register("orc_file_chunks", oracle=ORC_CHUNKS_ORACLE)
def orc_file_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stripe+column (s+p) chunking of the incoming ORC files, HASH-CHECKED
    via the per-file structural certificate: in-plan booleans prove the
    from-scratch ORC footer parse produced an exact, gap-free,
    footer-terminated cover with real per-column spans for every file.
    The per-type census stays as :func:`orc_file_chunks_full`."""
    from columnar_aware_dedup_spark.sources.chunkers import (
        chunk_files,
        cover_certificate,
    )

    _, incoming = orc_fixture_dirs(sf_dir)
    chunks = chunk_files(spark, incoming, glob="*.orc", orc_mode="columns")
    return cover_certificate(chunks, "Column", "Footer").select(
        _file_name("file"),
        "cover_contiguous_ok",
        "bytes_sum_equals_span_ok",
        "structure_parsed_ok",
        "footer_ok",
    )


ORC_RECON_ORACLE = """
SELECT file_name, TRUE AS chunked_ok, TRUE AS identical
FROM (VALUES ('incoming/lineitem.orc'), ('incoming/lineitem_mod.orc'),
             ('incoming/orders_new.orc'), ('store/lineitem.orc'))
     t(file_name)
ORDER BY file_name
"""


def orc_reconstruction_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file reconstruction verdicts with raw chunk counts (the
    unregistered census twin of :func:`orc_reconstruction`)."""
    from columnar_aware_dedup_spark.sources.chunkers import (
        chunk_orc_columns_bytes,
        reconstruct_files,
    )

    store, incoming = orc_fixture_dirs(sf_dir)
    files = spark.read.format("binaryFile").option("pathGlobFilter", "*.orc").load(
        [store, incoming]
    )
    two_level = F.concat_ws(
        "/",
        F.element_at(F.split("file", "/"), -2),
        F.element_at(F.split("file", "/"), -1),
    ).alias("file_name")
    return (
        reconstruct_files(files, chunker=chunk_orc_columns_bytes)
        .select(two_level, "n_chunks", "identical")
        .orderBy("file_name")
    )


@register("orc_reconstruction", oracle=ORC_RECON_ORACLE)
def orc_reconstruction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-exact chunk-cover identity for every fixture ORC file,
    HASH-CHECKED: ``identical`` proves in-task that reassembling the s+p
    chunks reproduces the original bytes; the oracle re-states the constant
    two-snapshot file layout with every bit TRUE (the ORC twin of
    ``parquet_reconstruction``; ``main/TestMain.java:48-59``)."""
    return orc_reconstruction_full(spark, sf_dir).select(
        "file_name",
        (F.col("n_chunks") >= 2).alias("chunked_ok"),
        "identical",
    )


def orc_hierarchical_dedup_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level s+p probe on real ORC bytes: stripe signatures first, only
    stripe *misses* fan out to subchunk probes; footers probed per file.

    The dataflow form of ``StripePlusColumnORCStreamer.java:110-209`` (a
    stripe hit at :121-129 skips all column work) over the materialized
    two-snapshot workload. Per-level hit/miss/byte rollup (the unregistered
    census twin of :func:`orc_hierarchical_dedup`), from the SHARED
    leveled probe with the stats-key machinery off — same signature joins,
    no key joins, the pre-r11 plan.
    """
    return _hier_rollup(_hier_leveled(spark, sf_dir, with_keys=False)).select(
        "level", "hits", "misses", "dedup_bytes", "transfer_bytes"
    )


def _hier_leveled(
    spark: SparkSession, sf_dir: str, with_keys: bool
) -> DataFrame:
    """The ONE three-level s+p probe behind the unpruned census and the
    metadata-pruned certificate (r11 review: two hand-mirrored copies
    could drift silently): per probed item, (level, size, hit, cand).
    ``with_keys=False`` runs the legacy keyless walk and marks every item
    a candidate (a pruner with no statistics hashes everything);
    ``with_keys=True`` additionally joins each level's store stats-key
    set and marks candidates as key-match-or-keyless."""
    store_dir, incoming_dir = orc_fixture_dirs(sf_dir)
    store = linked_chunk_files(spark, store_dir, with_stats_keys=with_keys)
    incoming = linked_chunk_files(
        spark, incoming_dir, with_stats_keys=with_keys
    )

    # store signatures at both granularities (the receiver indexes stripes
    # AND their subchunks — StripePlusColumnORCReceiver.java:198-226).
    store_stripe = store.filter(F.col("chunk_type") == "Stripe")
    store_sub = store_stripe.select(F.explode("subchunks").alias("s")).select(
        F.col("s.signature").alias("signature"),
        F.col("s.stats_key").alias("stats_key"),
    )
    store_footer = (
        store.filter(F.col("chunk_type") == "Footer")
        .select("signature")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )

    hit = F.col("_hit").isNotNull()
    cand = F.col("_cand").isNotNull() | F.col("stats_key").isNull()

    def keyed(probe: DataFrame, keys_of: DataFrame) -> DataFrame:
        if not with_keys:
            return probe.withColumn("cand", F.lit(True))
        key_set = (
            keys_of.select("stats_key")
            .filter(F.col("stats_key").isNotNull())
            .distinct()
            .withColumn("_cand", F.lit(1))
        )
        return probe.join(key_set, "stats_key", "left").withColumn(
            "cand", cand
        )

    inc_stripes = incoming.filter(F.col("chunk_type") == "Stripe")
    stripe_probe = keyed(
        inc_stripes.join(
            store_stripe.select("signature")
            .distinct()
            .withColumn("_hit", F.lit(1)),
            "signature",
            "left",
        ).withColumn("hit", hit),
        store_stripe,
    )
    sub_probe = keyed(
        stripe_probe.filter(~F.col("hit"))
        .select("file", F.explode("subchunks").alias("s"))
        .select(
            "file",
            F.col("s.signature").alias("signature"),
            F.col("s.size").alias("size"),
            F.col("s.stats_key").alias("stats_key"),
        )
        .join(
            store_sub.select("signature").distinct().withColumn(
                "_hit", F.lit(1)
            ),
            "signature",
            "left",
        )
        .withColumn("hit", hit),
        store_sub,
    )
    footer_probe = (
        incoming.filter(F.col("chunk_type") == "Footer")
        .join(store_footer, "signature", "left")
        .withColumn("hit", hit)
        # file footers carry no statistics vector — never pruned
        .withColumn("cand", F.lit(True))
    )
    return (
        stripe_probe.select(
            F.lit("stripe").alias("level"), "size", "hit", "cand"
        )
        .unionByName(
            sub_probe.select(
                F.lit("column").alias("level"), "size", "hit", "cand"
            )
        )
        .unionByName(
            footer_probe.select(
                F.lit("footer").alias("level"), "size", "hit", "cand"
            )
        )
    )


def _hier_rollup(leveled: DataFrame) -> DataFrame:
    """Per-level rollup of a (level, size, hit, cand) probe frame: the
    unpruned accounting columns plus the prune-audit columns."""
    zero = F.lit(0).cast("bigint")
    return (
        leveled.groupBy("level")
        .agg(
            F.sum(F.when(F.col("hit"), 1).otherwise(0))
            .cast("bigint")
            .alias("hits"),
            F.sum(F.when(~F.col("hit"), 1).otherwise(0))
            .cast("bigint")
            .alias("misses"),
            F.sum(F.when(F.col("hit"), F.col("size")).otherwise(0))
            .cast("bigint")
            .alias("dedup_bytes"),
            F.sum(F.when(~F.col("hit"), F.col("size")).otherwise(0))
            .cast("bigint")
            .alias("transfer_bytes"),
            F.sum("size").cast("bigint").alias("bytes_total"),
            F.coalesce(F.sum(F.when(F.col("cand"), F.col("size"))), zero)
            .cast("bigint")
            .alias("bytes_hashed"),
            F.coalesce(
                F.sum(F.when(F.col("hit") & F.col("cand"), F.col("size"))),
                zero,
            )
            .cast("bigint")
            .alias("dedup_bytes_pruned"),
            F.sum(F.when(F.col("hit") & ~F.col("cand"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_unsound"),
        )
        .orderBy("level")
    )


ORC_HIER_ORACLE = """
SELECT * FROM (VALUES
  ('column', TRUE,  TRUE, TRUE, TRUE),
  ('footer', FALSE, TRUE, TRUE, TRUE),
  ('stripe', TRUE,  TRUE, TRUE, TRUE))
  t(level, has_hits, has_misses, bytes_account_ok, hierarchy_ok)
ORDER BY level
"""


@register("orc_hierarchical_dedup", oracle=ORC_HIER_ORACLE)
def orc_hierarchical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The s+p hierarchical probe, HASH-CHECKED via the per-level workload
    certificate. The oracle re-states what the constant two-snapshot
    fixture GUARANTEES structurally:

    - stripe level: hits (snapshot B carries A's stripes as byte-identical
      prefixes) AND misses (the perturbed-column file + the new file);
    - column level: hits (the perturbed file's other columns still match)
      AND misses (the perturbed column itself) — the s+p fallback payoff;
    - footer level: NO hits (every file's footer differs) but misses;
    - ``bytes_account_ok``: (hits>0) == (dedup_bytes>0) and (misses>0) ==
      (transfer_bytes>0) per level (every probed chunk has positive size);
    - ``hierarchy_ok``: column-level probed bytes never exceed the
      stripe-level transfer bytes — columns are only probed UNDER stripe
      misses, the hierarchy's defining claim.

    Raw counts stay as :func:`orc_hierarchical_dedup_full`.

    The 3-row rollup is checkpointed before the self-join: without it the
    certificate's stripe-transfer side re-runs the whole chunk+probe
    pipeline a second time (measured 1.5x on the registered query).
    """
    full = orc_hierarchical_dedup_full(spark, sf_dir).localCheckpoint(
        eager=True
    )
    stripe_transfer = (
        full.filter(F.col("level") == "stripe")
        .select(F.col("transfer_bytes").alias("stripe_transfer"))
    )
    return full.join(F.broadcast(stripe_transfer)).select(
        "level",
        (F.col("hits") > 0).alias("has_hits"),
        (F.col("misses") > 0).alias("has_misses"),
        (
            ((F.col("hits") > 0) == (F.col("dedup_bytes") > 0))
            & ((F.col("misses") > 0) == (F.col("transfer_bytes") > 0))
        ).alias("bytes_account_ok"),
        F.when(
            F.col("level") == "column",
            F.col("dedup_bytes") + F.col("transfer_bytes")
            <= F.col("stripe_transfer"),
        )
        .otherwise(F.lit(True))
        .alias("hierarchy_ok"),
    )


def orc_hierarchical_pruned_full(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The s+p hierarchical probe CONSUMING the stats pruner at both
    levels (r11, VERDICT r10 "Next round" #4: ``orc_hierarchical_dedup``
    still hashed every column of a stripe-missed stripe, although the
    column-level prune set was computable from the same footer walk):
    the linked chunk walk now carries the stripe and per-column
    statistics-vector keys (``chunk_orc_stripes_linked(with_stats_keys=
    True)``), and each probe level marks, per item, whether a
    metadata-only pruner would even hash it — ``cand`` = its stats key
    matches SOME store key at that level, or it has no key (index/pad/
    stripe-footer subchunks and file footers are never pruned). The
    hit/miss accounting itself is UNCHANGED from
    :func:`orc_hierarchical_dedup_full` (this audit hashes everything to
    verify soundness; a production pruner hashes only candidates) — the
    per-level parity is pytest-pinned. Mirrors the reference's fallback
    flow (``orc/net/StripePlusColumnORCStreamer.java:130-209``) minus
    the wasted hashes.

    Returns per level: hits / misses / dedup_bytes / transfer_bytes
    (identical to the unpruned rollup — both roll up the SAME shared
    leveled probe, :func:`_hier_leveled`, keys on vs off; the per-level
    parity is additionally pytest-pinned) + bytes_total / bytes_hashed
    (candidates only) / dedup_bytes_pruned / n_unsound (pruned-but-hit —
    must be zero)."""
    return _hier_rollup(_hier_leveled(spark, sf_dir, with_keys=True))


#: per-level truths of the pruned hierarchical workload: hit/miss bits
#: and the accounting/hierarchy bits EXACTLY as ``ORC_HIER_ORACLE`` (the
#: prune must change nothing), plus: no pruned item anywhere was a hit
#: (soundness), the pruned path's dedup bytes equal the full probe's,
#: and bytes hashed < bytes probed at the stripe level (appended/new/
#: perturbed stripes prune) and the column level (the perturbed column
#: and the different-table columns prune) — but NOT the footer level:
#: file footers carry no statistics vector, a pruner must hash them all.
ORC_HIER_PRUNED_ORACLE = """
SELECT * FROM (VALUES
  ('column', TRUE,  TRUE, TRUE, TRUE, TRUE, TRUE, TRUE),
  ('footer', FALSE, TRUE, TRUE, TRUE, TRUE, TRUE, FALSE),
  ('stripe', TRUE,  TRUE, TRUE, TRUE, TRUE, TRUE, TRUE))
  t(level, has_hits, has_misses, bytes_account_ok, hierarchy_ok,
    prune_sound_ok, dedup_match_full_ok, hashed_lt_total_ok)
ORDER BY level
"""


@register("orc_hierarchical_pruned", oracle=ORC_HIER_PRUNED_ORACLE)
def orc_hierarchical_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The metadata-pruned s+p hierarchical probe, HASH-CHECKED (r11 —
    the end-to-end integration VERDICT r10 "Next round" #4 asked for):
    ``orc_hierarchical_dedup``'s per-level certificate bits UNCHANGED
    (the prune alters no hit/miss outcome — per-level numeric parity
    with the unpruned rollup is pytest-pinned in
    ``tests/test_orc_queries.py``), plus three prune bits per level:
    ``prune_sound_ok`` (nothing skipped was a hit), ``dedup_match_full_ok``
    (candidates alone account for every dedup byte), and
    ``hashed_lt_total_ok`` (the saving is real at the stripe AND column
    levels; footers have no statistics, so their row restates FALSE —
    the honest bound of metadata pruning). Raw numbers stay as
    :func:`orc_hierarchical_pruned_full`."""
    return hierarchical_pruned_bits(
        orc_hierarchical_pruned_full(spark, sf_dir).localCheckpoint(
            eager=True
        )
    )


def hierarchical_pruned_bits(full: DataFrame) -> DataFrame:
    """The certificate bits from a per-level pruned rollup — factored so
    the flip test (``tests/test_orc_queries.py::
    test_hierarchical_pruned_bits_flip``) drives fabricated rollups
    through the SAME derivation the registered query ships."""
    stripe_transfer = (
        full.filter(F.col("level") == "stripe")
        .select(F.col("transfer_bytes").alias("stripe_transfer"))
    )
    return full.join(F.broadcast(stripe_transfer)).select(
        "level",
        (F.col("hits") > 0).alias("has_hits"),
        (F.col("misses") > 0).alias("has_misses"),
        (
            ((F.col("hits") > 0) == (F.col("dedup_bytes") > 0))
            & ((F.col("misses") > 0) == (F.col("transfer_bytes") > 0))
        ).alias("bytes_account_ok"),
        F.when(
            F.col("level") == "column",
            F.col("dedup_bytes") + F.col("transfer_bytes")
            <= F.col("stripe_transfer"),
        )
        .otherwise(F.lit(True))
        .alias("hierarchy_ok"),
        (F.col("n_unsound") == 0).alias("prune_sound_ok"),
        (F.col("dedup_bytes_pruned") == F.col("dedup_bytes")).alias(
            "dedup_match_full_ok"
        ),
        (F.col("bytes_hashed") < F.col("bytes_total")).alias(
            "hashed_lt_total_ok"
        ),
    )


def orc_linked_reconstruction_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stripe-hit reconstruction from the store's linked subchunks.

    On a stripe hit the receiver rebuilds index+data+footer from its own
    store (``orc/net/StripePlusColumnORCReceiver.java:103-122``). Here: join
    incoming hit stripes to store stripes on the stripe signature, explode
    the STORE side's subchunks, and prove per stripe that the store-held
    cover is structurally identical (byte total + subchunk signature
    multiset) to what the client holds. Per-file verdicts.
    """
    store_dir, incoming_dir = orc_fixture_dirs(sf_dir)
    store = linked_chunk_files(spark, store_dir).filter(F.col("chunk_type") == "Stripe")
    incoming = linked_chunk_files(spark, incoming_dir).filter(
        F.col("chunk_type") == "Stripe"
    )

    def sub_digest(side: DataFrame, prefix: str) -> DataFrame:
        """(signature, stripe size, md5 over sorted subchunk sigs, byte sum)."""
        return (
            side.select(
                "file", "chunk_idx", "signature", "size",
                F.explode("subchunks").alias("s"),
            )
            .groupBy("file", "chunk_idx", "signature", "size")
            .agg(
                F.md5(
                    F.array_join(F.array_sort(F.collect_list("s.signature")), ",")
                ).alias(f"{prefix}_subsig"),
                F.sum("s.size").cast("bigint").alias(f"{prefix}_subbytes"),
            )
        )

    inc = sub_digest(incoming, "inc")
    sto = (
        sub_digest(store, "sto")
        .select("signature", "sto_subsig", "sto_subbytes")
        .distinct()
    )
    joined = inc.join(sto, "signature", "left").withColumn(
        "reconstructed_ok",
        F.col("sto_subsig").isNotNull()
        & (F.col("sto_subsig") == F.col("inc_subsig"))
        & (F.col("sto_subbytes") == F.col("inc_subbytes"))
        & (F.col("inc_subbytes") == F.col("size")),
    )
    return (
        joined.groupBy(_file_name())
        .agg(
            F.count("*").cast("bigint").alias("n_stripes"),
            F.sum(F.col("sto_subsig").isNotNull().cast("long"))
            .cast("bigint")
            .alias("n_hit"),
            F.sum(F.col("reconstructed_ok").cast("long"))
            .cast("bigint")
            .alias("n_reconstructed_ok"),
        )
        .orderBy("file_name")
    )


ORC_LINKED_ORACLE = """
SELECT * FROM (VALUES
  ('lineitem.orc',     TRUE,  TRUE, TRUE),
  ('lineitem_mod.orc', TRUE, FALSE, TRUE),
  ('orders_new.orc',   TRUE, FALSE, TRUE))
  t(file_name, has_stripes_ok, has_hits, hits_reconstruct_ok)
ORDER BY file_name
"""


@register("orc_linked_reconstruction", oracle=ORC_LINKED_ORACLE)
def orc_linked_reconstruction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stripe-hit reconstruction from the store's linked subchunks,
    HASH-CHECKED via the per-file workload certificate. The oracle
    re-states what the constant two-snapshot fixture guarantees:

    - ``has_hits``: snapshot B (``lineitem.orc``) re-sends A's stripes, so
      some of its stripes MUST hit the store; the perturbed file and the
      brand-new file must hit NOTHING at stripe granularity;
    - ``hits_reconstruct_ok``: every hit stripe's store-held subchunk
      cover is structurally identical to the client's (byte total +
      subchunk signature multiset + stripe size) — the receiver's rebuild
      contract (``orc/net/StripePlusColumnORCReceiver.java:103-122``).

    Raw stripe/hit counts stay as :func:`orc_linked_reconstruction_full`.
    """
    full = orc_linked_reconstruction_full(spark, sf_dir)
    return full.select(
        "file_name",
        (F.col("n_stripes") > 0).alias("has_stripes_ok"),
        (F.col("n_hit") > 0).alias("has_hits"),
        (F.col("n_hit") == F.col("n_reconstructed_ok")).alias(
            "hits_reconstruct_ok"
        ),
    )
