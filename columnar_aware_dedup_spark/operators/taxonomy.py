"""Full TransferStats taxonomy: the s+p wire protocol as byte arithmetic.

The reference accounts every protocol byte into a 21-type stat taxonomy
(``common/TransferStats.java:86-108``). Round 1 modeled only 4 of them
(``operators/stats.py``); this module models the 19 deterministic ones by
replaying the *exact* StripePlusColumn wire protocol
(``orc/net/StripePlusColumnORCStreamer.java:32-298``) as columnar arithmetic
over the two-snapshot row workload — no sockets, one Spark job:

- per special chunk the client sends a 24 B offer (4 B type + 20 B SHA-1,
  ``StripePlusColumnORCStreamer.java:111-118``) and the server answers a 4 B
  ack (``StripePlusColumnORCReceiver.java:61,99`` accounts each ack int as
  ExtraTransferBytes);
- a stripe hit dedups the whole stripe (``:124-131``); a miss sends a 4 B
  column count then probes each column: columns ≤ 2×SHA-1 bytes are not worth
  hashing (``:154``, SmallColumn) and cost a 4 B small-query marker; larger
  ones cost a 24 B offer and are ColumnHit/ColumnMiss with per-type
  attribution (``:176-184``);
- after the probe loop: ALL columns failed -> the whole stripe is resent as
  ``<size><index><size><data><size><footer>`` (12 B + payload, ``:216-238``,
  the only branch that counts StripeMiss); SOME failed -> each failed column
  is resent as ``<size><data>`` plus an 8 B index+footer frame (``:241-273``);
  NONE failed -> just the 8 B index+footer frame (``:275-293``);
- the file footer is negotiated like a stripe (24 B offer; miss resends
  4 B + footer, ``sendFooter`` ``:32-80``);
- per file the transfer opens with ``<4 B name-len><name><8 B file-len>``,
  accounted as ExtraTransferBytes (``net/SpeedupStreamer.java:25-41``).

Row model: one order = one single-stripe ORC file. The stripe's data region
is the 10 column chunks (stripe index/stripe-footer are zero-length — the
row model has no physical encodings); the file footer is the canonical
schema + row-count rendering, so files with equal layout dedup footers, like
real ORC footers.

TransferTime / ParsingOverhead are runtime *measurements* in the reference
(``common/TransferStats.java:92-97``); a wall clock is not
oracle-reproducible, so here they are explicit deterministic MODELS — a
linear bytes->milliseconds proxy (``TransferTime = ceil(TotalBytes /
{WIRE}B/ms)``, ``ParsingOverhead = ceil(FileBytes / {PARSE}B/ms)``, both
divisors powers of two so the double division is exact on both engines).
The measured wall-clock variant stays available as ``file_parse_overhead``
(R-checked). With them the taxonomy covers all 21 reference stat types.

Scale: three shuffles (chunk agg by file, signature window, stat rollup) and
every intermediate is narrow; the 19-way explode happens *after* per-file
aggregation (19 rows/file, not 19x chunks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from columnar_aware_dedup_spark.io import table
from columnar_aware_dedup_spark.operators.dedup import (
    _COL_TYPE_CASE,
    _KEYS_A_SQL,
    _chunks_sql,
    _long_sql,
    LINEITEM_VALUE_COLS,
    lineitem_chunks,
    snapshot_a_keys,
)
from columnar_aware_dedup_spark.registry import register

#: protocol constants (cited above).
SHA1_SIZE = 20          # StripePlusColumnORCChunkingAlgorithm.SHA1_SIZE
OFFER_BYTES = 4 + SHA1_SIZE   # <type-int><sha1>
ACK_BYTES = 4                 # server ack int
SMALL_COL_MAX = 2 * SHA1_SIZE  # ``colBytes.length > SHA1_SIZE * 2`` else SmallColumn
COL_COUNT_HDR = 4             # <n-columns-int> after a stripe miss
WHOLE_STRIPE_HDR = 12         # <size><size><size> framing of index+data+footer
IDX_FTR_HDR = 8               # <size><size> framing of index+footer
FILE_HDR_FIXED = 12           # <4 B name-len> + <8 B file-len>

#: bytes-per-millisecond divisors for the modeled time stats (powers of two:
#: double division by them is exact, keeping Spark/DuckDB bit-identical).
WIRE_BYTES_PER_MS = 128       # modeled client->server link for TransferTime
PARSE_BYTES_PER_MS = 1024     # modeled metadata-walk rate for ParsingOverhead

_SCHEMA_STR = ",".join(n for n, _ in LINEITEM_VALUE_COLS)

#: (stat_type, unit) in the reference enum order (TransferStats.java:86-108).
TAXONOMY: list[tuple[str, str]] = [
    ("FileBytes", "Bytes"),
    ("TransferBytes", "Bytes"),
    ("TotalBytes", "Bytes"),
    ("TransferTime", "Milliseconds"),
    ("ExtraTransferBytes", "Bytes"),
    ("DedupBytes", "Bytes"),
    ("ParsingOverhead", "Milliseconds"),
    ("StripeHit", "Count"),
    ("StripeMiss", "Count"),
    ("ColumnHit", "Count"),
    ("DoubleColumnHit", "Count"),
    ("DoubleColumnMiss", "Count"),
    ("DoubleColumnMissBytes", "Bytes"),
    ("StringColumnMiss", "Count"),
    ("StringColumnMissBytes", "Bytes"),
    ("ColumnMiss", "Count"),
    ("FooterHit", "Count"),
    ("FooterMiss", "Count"),
    ("SmallColumn", "Count"),
    ("StripeSize", "Bytes"),
    ("FooterSize", "Bytes"),
]


def _per_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per file with every protocol-derived quantity (Spark side)."""
    li = table(spark, sf_dir, "lineitem")
    chunks = lineitem_chunks(li)
    keys_a = snapshot_a_keys(spark, sf_dir)

    # column-store membership via semi-join-derived distinct set + hash join
    # (not a signature window over the full chunk table — see the r02 plan
    # note in ``dedup.classified_chunks``); per-file stripe/footer windows
    # below stay (one row per file, cheap).
    col_store = (
        chunks.join(keys_a, chunks.file_id == keys_a.o_orderkey, "left_semi")
        .select("signature")
        .distinct()
        .withColumn("_h", F.lit(1))
    )
    ch = (
        chunks.join(col_store, "signature", "left")
        .withColumn("col_hit", F.col("_h").isNotNull())
        .drop("_h")
        .withColumn("type_class", F.expr(_COL_TYPE_CASE))
    )
    small = F.col("size") <= SMALL_COL_MAX
    large = ~small
    hit = F.col("col_hit")

    per_file_cols = ch.groupBy("file_id").agg(
        F.sum("size").cast("bigint").alias("stripe_size"),
        F.md5(F.array_join(F.array_sort(F.collect_list("signature")), ",")).alias(
            "stripe_sig"
        ),
        F.count("*").cast("bigint").alias("n_cols"),
        F.sum(small.cast("long")).alias("n_small"),
        F.sum((large & hit).cast("long")).alias("n_large_hit"),
        F.sum((large & ~hit).cast("long")).alias("n_large_miss"),
        F.sum(F.when(large & hit, F.col("size")).otherwise(0))
        .cast("bigint")
        .alias("large_hit_bytes"),
        F.sum(F.when(small | (large & ~hit), F.col("size") + 4).otherwise(0))
        .cast("bigint")
        .alias("failed_send_bytes"),
        F.sum((large & hit & (F.col("type_class") == "Double")).cast("long")).alias(
            "n_double_hit"
        ),
        F.sum((large & ~hit & (F.col("type_class") == "Double")).cast("long")).alias(
            "n_double_miss"
        ),
        F.sum(
            F.when(large & ~hit & (F.col("type_class") == "Double"), F.col("size"))
            .otherwise(0)
        )
        .cast("bigint")
        .alias("double_miss_bytes"),
        F.sum((large & ~hit & (F.col("type_class") == "String")).cast("long")).alias(
            "n_string_miss"
        ),
        F.sum(
            F.when(large & ~hit & (F.col("type_class") == "String"), F.col("size"))
            .otherwise(0)
        )
        .cast("bigint")
        .alias("string_miss_bytes"),
    )

    # per-file snapshot membership: a join on the (small) per-file table,
    # not a tag carried through the raw-row chunking.
    in_a_flag = keys_a.select(F.col("o_orderkey").alias("file_id")).withColumn(
        "in_a", F.lit(True)
    )
    per_file_cols = per_file_cols.join(in_a_flag, "file_id", "left").withColumn(
        "in_a", F.coalesce(F.col("in_a"), F.lit(False))
    )
    w_stripe = Window.partitionBy("stripe_sig")
    stripes = per_file_cols.withColumn("stripe_hit", F.max("in_a").over(w_stripe))

    # file footer = canonical schema + row-count rendering (layout identity).
    footers = (
        li.groupBy(F.col("l_orderkey").alias("file_id"))
        .agg(F.count("*").cast("bigint").alias("n_rows"))
        .withColumn(
            "footer_content",
            F.concat(F.lit(f"schema:{_SCHEMA_STR}|rows:"), F.col("n_rows")),
        )
        .select(
            "file_id",
            F.length("footer_content").cast("bigint").alias("footer_size"),
            F.md5(F.col("footer_content")).alias("footer_sig"),
        )
    )
    pf = stripes.join(footers, "file_id")
    w_footer = Window.partitionBy("footer_sig")
    return pf.withColumn("footer_hit", F.max("in_a").over(w_footer))


def _stat_exprs() -> list[F.Column]:
    """The 19 per-file stat values as columns (Spark side of the protocol)."""
    s_hit = F.col("stripe_hit")
    f_hit = F.col("footer_hit")
    all_failed = F.col("n_large_hit") == 0
    any_failed = (F.col("n_small") + F.col("n_large_miss")) > 0
    n_large = F.col("n_large_hit") + F.col("n_large_miss")
    probe_bytes = OFFER_BYTES * n_large + 4 * F.col("n_small")
    tail = (
        F.when(all_failed, WHOLE_STRIPE_HDR + F.col("stripe_size"))
        .when(any_failed, F.col("failed_send_bytes") + IDX_FTR_HDR)
        .otherwise(F.lit(IDX_FTR_HDR))
    )
    stripe_tb = F.when(
        s_hit, F.lit(OFFER_BYTES)
    ).otherwise(OFFER_BYTES + COL_COUNT_HDR + probe_bytes + tail)
    footer_tb = F.when(f_hit, F.lit(OFFER_BYTES)).otherwise(
        OFFER_BYTES + 4 + F.col("footer_size")
    )
    transfer = (stripe_tb + footer_tb).cast("bigint")
    dedup = (
        F.when(s_hit, F.col("stripe_size"))
        .otherwise(F.when(all_failed, 0).otherwise(F.col("large_hit_bytes")))
        + F.when(f_hit, F.col("footer_size")).otherwise(0)
    ).cast("bigint")
    name_len = F.length(
        F.concat(F.lit("file_"), F.col("file_id").cast("string"), F.lit(".orc"))
    )
    acks = 2 + F.when(s_hit, 0).otherwise(n_large)
    extra = (FILE_HDR_FIXED + name_len + ACK_BYTES * acks).cast("bigint")
    gate = lambda c: F.when(s_hit, F.lit(0)).otherwise(c).cast("bigint")  # noqa: E731
    file_bytes = (F.col("stripe_size") + F.col("footer_size")).cast("bigint")
    transfer_time = F.floor(
        (transfer + extra + (WIRE_BYTES_PER_MS - 1)) / WIRE_BYTES_PER_MS
    ).cast("bigint")
    parsing_overhead = F.floor(
        (file_bytes + (PARSE_BYTES_PER_MS - 1)) / PARSE_BYTES_PER_MS
    ).cast("bigint")
    return [
        file_bytes.alias("FileBytes"),
        transfer.alias("TransferBytes"),
        (transfer + extra).alias("TotalBytes"),
        transfer_time.alias("TransferTime"),
        extra.alias("ExtraTransferBytes"),
        dedup.alias("DedupBytes"),
        parsing_overhead.alias("ParsingOverhead"),
        s_hit.cast("bigint").alias("StripeHit"),
        (~s_hit & all_failed).cast("bigint").alias("StripeMiss"),
        gate(F.col("n_large_hit")).alias("ColumnHit"),
        gate(F.col("n_double_hit")).alias("DoubleColumnHit"),
        gate(F.col("n_double_miss")).alias("DoubleColumnMiss"),
        gate(F.col("double_miss_bytes")).alias("DoubleColumnMissBytes"),
        gate(F.col("n_string_miss")).alias("StringColumnMiss"),
        gate(F.col("string_miss_bytes")).alias("StringColumnMissBytes"),
        gate(F.col("n_large_miss")).alias("ColumnMiss"),
        f_hit.cast("bigint").alias("FooterHit"),
        (~f_hit).cast("bigint").alias("FooterMiss"),
        gate(F.col("n_small")).alias("SmallColumn"),
        F.col("stripe_size").cast("bigint").alias("StripeSize"),
        F.col("footer_size").cast("bigint").alias("FooterSize"),
    ]


# ---------------------------------------------------------------------------
# DuckDB oracle: the same protocol, mirrored CTE by CTE
# ---------------------------------------------------------------------------

_PF_SQL = f"""
long_b AS ({_long_sql('lineitem')}),
col_in AS ({_chunks_sql('long_b')}),
col_flag AS (
  SELECT c.*, (file_id IN ({_KEYS_A_SQL})) AS in_a, {_COL_TYPE_CASE} AS type_class
  FROM col_in c
),
col_hit AS (
  SELECT *, MAX(CASE WHEN in_a THEN 1 ELSE 0 END)
              OVER (PARTITION BY signature) = 1 AS hit
  FROM col_flag
),
per_file_cols AS (
  SELECT file_id,
         CAST(SUM(size) AS BIGINT) AS stripe_size,
         md5(string_agg(signature, ',' ORDER BY signature)) AS stripe_sig,
         BOOL_AND(in_a) AS in_a,
         CAST(COUNT(*) AS BIGINT) AS n_cols,
         CAST(SUM(CASE WHEN size <= {SMALL_COL_MAX} THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
         CAST(SUM(CASE WHEN size > {SMALL_COL_MAX} AND hit THEN 1 ELSE 0 END) AS BIGINT) AS n_large_hit,
         CAST(SUM(CASE WHEN size > {SMALL_COL_MAX} AND NOT hit THEN 1 ELSE 0 END) AS BIGINT) AS n_large_miss,
         CAST(SUM(CASE WHEN size > {SMALL_COL_MAX} AND hit THEN size ELSE 0 END) AS BIGINT) AS large_hit_bytes,
         CAST(SUM(CASE WHEN size <= {SMALL_COL_MAX} OR NOT hit THEN size + 4 ELSE 0 END) AS BIGINT) AS failed_send_bytes,
         CAST(SUM(CASE WHEN size > {SMALL_COL_MAX} AND hit AND type_class = 'Double' THEN 1 ELSE 0 END) AS BIGINT) AS n_double_hit,
         CAST(SUM(CASE WHEN size > {SMALL_COL_MAX} AND NOT hit AND type_class = 'Double' THEN 1 ELSE 0 END) AS BIGINT) AS n_double_miss,
         CAST(SUM(CASE WHEN size > {SMALL_COL_MAX} AND NOT hit AND type_class = 'Double' THEN size ELSE 0 END) AS BIGINT) AS double_miss_bytes,
         CAST(SUM(CASE WHEN size > {SMALL_COL_MAX} AND NOT hit AND type_class = 'String' THEN 1 ELSE 0 END) AS BIGINT) AS n_string_miss,
         CAST(SUM(CASE WHEN size > {SMALL_COL_MAX} AND NOT hit AND type_class = 'String' THEN size ELSE 0 END) AS BIGINT) AS string_miss_bytes
  FROM col_hit GROUP BY file_id
),
stripes AS (
  SELECT *, MAX(CASE WHEN in_a THEN 1 ELSE 0 END)
              OVER (PARTITION BY stripe_sig) = 1 AS stripe_hit
  FROM per_file_cols
),
footers AS (
  SELECT l_orderkey AS file_id,
         CAST(LENGTH('schema:{_SCHEMA_STR}|rows:' || COUNT(*)) AS BIGINT) AS footer_size,
         md5('schema:{_SCHEMA_STR}|rows:' || COUNT(*)) AS footer_sig
  FROM lineitem GROUP BY l_orderkey
),
pf0 AS (
  SELECT s.*, f.footer_size, f.footer_sig
  FROM stripes s JOIN footers f USING (file_id)
),
pf AS (
  SELECT *, MAX(CASE WHEN in_a THEN 1 ELSE 0 END)
              OVER (PARTITION BY footer_sig) = 1 AS footer_hit
  FROM pf0
),
vals AS (
  SELECT file_id,
         stripe_size + footer_size AS FileBytes,
         (CASE WHEN stripe_hit THEN {OFFER_BYTES}
               ELSE {OFFER_BYTES + COL_COUNT_HDR}
                    + {OFFER_BYTES} * (n_large_hit + n_large_miss) + 4 * n_small
                    + CASE WHEN n_large_hit = 0 THEN {WHOLE_STRIPE_HDR} + stripe_size
                           WHEN n_small + n_large_miss > 0 THEN failed_send_bytes + {IDX_FTR_HDR}
                           ELSE {IDX_FTR_HDR} END
          END
          + CASE WHEN footer_hit THEN {OFFER_BYTES}
                 ELSE {OFFER_BYTES} + 4 + footer_size END) AS TransferBytes,
         (CASE WHEN stripe_hit THEN stripe_size
               WHEN n_large_hit = 0 THEN 0
               ELSE large_hit_bytes END
          + CASE WHEN footer_hit THEN footer_size ELSE 0 END) AS DedupBytes,
         ({FILE_HDR_FIXED} + LENGTH('file_' || file_id || '.orc')
          + {ACK_BYTES} * (2 + CASE WHEN stripe_hit THEN 0
                                    ELSE n_large_hit + n_large_miss END)) AS ExtraTransferBytes,
         CASE WHEN stripe_hit THEN 1 ELSE 0 END AS StripeHit,
         CASE WHEN NOT stripe_hit AND n_large_hit = 0 THEN 1 ELSE 0 END AS StripeMiss,
         CASE WHEN stripe_hit THEN 0 ELSE n_large_hit END AS ColumnHit,
         CASE WHEN stripe_hit THEN 0 ELSE n_double_hit END AS DoubleColumnHit,
         CASE WHEN stripe_hit THEN 0 ELSE n_double_miss END AS DoubleColumnMiss,
         CASE WHEN stripe_hit THEN 0 ELSE double_miss_bytes END AS DoubleColumnMissBytes,
         CASE WHEN stripe_hit THEN 0 ELSE n_string_miss END AS StringColumnMiss,
         CASE WHEN stripe_hit THEN 0 ELSE string_miss_bytes END AS StringColumnMissBytes,
         CASE WHEN stripe_hit THEN 0 ELSE n_large_miss END AS ColumnMiss,
         CASE WHEN footer_hit THEN 1 ELSE 0 END AS FooterHit,
         CASE WHEN footer_hit THEN 0 ELSE 1 END AS FooterMiss,
         CASE WHEN stripe_hit THEN 0 ELSE n_small END AS SmallColumn,
         stripe_size AS StripeSize,
         footer_size AS FooterSize
  FROM pf
)
"""

#: stats not materialized as vals columns: derived in the long-form union
#: (TotalBytes decomposes; the time pair is the modeled bytes->ms proxy).
_SQL_DERIVED = {
    "TotalBytes": "TransferBytes + ExtraTransferBytes",
    "TransferTime": (
        f"FLOOR((TransferBytes + ExtraTransferBytes + {WIRE_BYTES_PER_MS - 1})"
        f" / {WIRE_BYTES_PER_MS}.0)"
    ),
    "ParsingOverhead": (
        f"FLOOR((FileBytes + {PARSE_BYTES_PER_MS - 1}) / {PARSE_BYTES_PER_MS}.0)"
    ),
}

_LONG_STATS_SQL = " UNION ALL ".join(
    f"SELECT file_id, '{stat}' AS stat_type, '{unit}' AS unit, "
    f"CAST({_SQL_DERIVED.get(stat, stat)} AS BIGINT) AS value FROM vals"
    for stat, unit in TAXONOMY
)

TAXONOMY_ORACLE = f"""
WITH {_PF_SQL},
long_stats AS ({_LONG_STATS_SQL})
SELECT stat_type, unit,
       CAST(SUM(value) AS BIGINT) AS total,
       CAST(SUM(CASE WHEN value <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_files
FROM long_stats
GROUP BY stat_type, unit
ORDER BY stat_type
"""


@register("transfer_stats_taxonomy", oracle=TAXONOMY_ORACLE)
def transfer_stats_taxonomy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global totals for all 21 TransferStats types (19 exact protocol
    quantities + the 2 modeled time stats, see module docstring).

    One row per stat type ``(stat_type, unit, total, n_files)`` — the engine's
    rendering of the reference's client-log line
    (``README.md:73-78``: ``stats=[ExtraTransferBytes=.. ,DedupBytes=..,
    TransferBytes=..]``), summed over the two-snapshot workload. The
    identical-file re-transfer shape (TransferBytes collapses to protocol
    overhead while DedupBytes carries the content) is pinned by
    ``tests/test_taxonomy.py``.
    """
    pf = _per_file(spark, sf_dir)
    vals = pf.select("file_id", *_stat_exprs())
    pairs = F.array(
        *[
            F.struct(
                F.lit(stat).alias("stat_type"),
                F.lit(unit).alias("unit"),
                F.col(stat).alias("value"),
            )
            for stat, unit in TAXONOMY
        ]
    )
    return (
        vals.select("file_id", F.explode(pairs).alias("p"))
        .select("file_id", "p.stat_type", "p.unit", "p.value")
        .groupBy("stat_type", "unit")
        .agg(
            F.sum("value").cast("bigint").alias("total"),
            F.sum((F.col("value") != 0).cast("long")).cast("bigint").alias("n_files"),
        )
        .orderBy("stat_type")
    )
