"""Zone-map (min/max) stripe pruning over raw ORC bytes, soundness-checked.

The scan-side intelligence a columnar engine adds on top of chunking
(SURVEY §2.1/§2.2: the reference walks stripes but never exploits their
statistics): ORC's Metadata section carries per-stripe min/max for every
column, and a predicate can skip whole stripes without touching their
bytes. This module reads those statistics with OUR protobuf walker
(``functions/orcmeta.py:read_stripe_column_stats``), recomputes the TRUTH
per stripe with pyarrow's independent ORC reader, and certifies three
facts per fixture file (``orc_zone_map_pruning``):

- ``stats_match_truth_ok`` — the writer's claimed per-stripe min/max of
  the lead (sort-key) column equals the values recomputed from the rows;
- ``pruning_sound_ok`` — every stripe whose claimed [min, max] misses the
  predicate band truly contains ZERO matching rows (the invariant that
  makes skipping safe);
- ``pruning_effective_ok`` — the band prunes at least one stripe AND
  keeps at least one (the fixtures are sort-keyed, so zone maps must
  actually bite; a census where nothing prunes would certify nothing).

The predicate band is derived from the claimed GLOBAL min/max (what a
real pruner has before touching data): the lowest quarter of the key
range. Each bit is falsifiable through the same derivation code on
fabricated stripe tables (``tests/test_zonemap.py``).

Scale shape: one parse task per file (binaryFile -> ``mapInPandas``);
statistics live in the file tail, so the certificate reads each stripe
once only to VERIFY — a production pruner reads none of the pruned
bytes, which is the point. Zero shuffles before the presentation sort.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from columnar_aware_dedup_spark.registry import register

#: the ORC snapshot workload files (``sources/orcfixtures.py`` layout).
_ZONE_FILES = (
    "store/lineitem.orc",
    "incoming/lineitem.orc",
    "incoming/lineitem_mod.orc",
    "incoming/orders_new.orc",
)

_ZONE_BITS = [
    "stats_match_truth_ok",
    "pruning_sound_ok",
    "pruning_effective_ok",
]

_STRIPE_SCHEMA = T.StructType(
    [
        T.StructField("file_name", T.StringType(), False),
        T.StructField("stripe_idx", T.IntegerType(), False),
        T.StructField("claimed_min", T.LongType(), True),
        T.StructField("claimed_max", T.LongType(), True),
        T.StructField("true_min", T.LongType(), True),
        T.StructField("true_max", T.LongType(), True),
        T.StructField("band_lo", T.LongType(), False),
        T.StructField("band_hi", T.LongType(), False),
        T.StructField("n_band_matches", T.LongType(), False),
        T.StructField("n_rows", T.LongType(), False),
    ]
)


def zone_map_stripe_table(file_name: str, data: bytes) -> list[dict]:
    """Per-stripe zone-map audit rows for one ORC file: the lead column's
    claimed min/max (our parser), the true min/max and in-band match count
    (pyarrow re-read), and the predicate band (lowest quarter of the
    claimed global key range)."""
    import pyarrow.compute as pc
    import pyarrow.orc as orc

    from columnar_aware_dedup_spark.functions.orcmeta import (
        read_stripe_column_stats,
    )

    stats = read_stripe_column_stats(data)
    o = orc.ORCFile(io.BytesIO(data))
    lead = o.schema.names[0]
    claimed = [
        (st[1]["int_min"], st[1]["int_max"]) if len(st) > 1 else (None, None)
        for st in stats
    ]
    gmin = min((c[0] for c in claimed if c[0] is not None), default=0)
    gmax = max((c[1] for c in claimed if c[1] is not None), default=0)
    band_lo, band_hi = gmin, gmin + (gmax - gmin) // 4
    rows = []
    for i in range(o.nstripes):
        col = o.read_stripe(i, columns=[lead])[lead]
        cmin, cmax = (
            claimed[i] if i < len(claimed) else (None, None)
        )
        in_band = pc.and_(
            pc.greater_equal(col, band_lo), pc.less_equal(col, band_hi)
        )
        rows.append(
            {
                "file_name": file_name,
                "stripe_idx": i,
                "claimed_min": cmin,
                "claimed_max": cmax,
                "true_min": pc.min(col).as_py(),
                "true_max": pc.max(col).as_py(),
                "band_lo": band_lo,
                "band_hi": band_hi,
                "n_band_matches": pc.sum(pc.cast(in_band, "int64")).as_py()
                or 0,
                "n_rows": len(col),
            }
        )
    return rows


def zone_map_bits(stripe_rows: list[dict]) -> dict[str, bool]:
    """The three certificate bits from a per-stripe audit table (module
    doc) — pure, so the flip tests corrupt fabricated tables through the
    SAME derivation the registered query runs. A stripe is PRUNED when its
    claimed range misses the band (None claims never prune — a pruner
    without statistics must read the stripe)."""
    stats_ok = all(
        r["claimed_min"] == r["true_min"] and r["claimed_max"] == r["true_max"]
        for r in stripe_rows
    )
    pruned = [
        r
        for r in stripe_rows
        if r["claimed_min"] is not None
        and r["claimed_max"] is not None
        and (r["claimed_max"] < r["band_lo"] or r["claimed_min"] > r["band_hi"])
    ]
    sound = all(r["n_band_matches"] == 0 for r in pruned)
    effective = 0 < len(pruned) < len(stripe_rows)
    return {
        "stats_match_truth_ok": stats_ok,
        "pruning_sound_ok": sound,
        "pruning_effective_ok": effective,
    }


def _zone_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in _STRIPE_SCHEMA.fields]
    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            name = "/".join(path.rsplit("/", 2)[-2:])
            rows.extend(zone_map_stripe_table(name, bytes(content)))
        yield pd.DataFrame(rows, columns=cols)


def zone_map_stripe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The numeric per-stripe audit table (engine-side twin)."""
    from columnar_aware_dedup_spark.sources.orcfixtures import (
        orc_fixture_dirs,
    )

    store_dir, incoming_dir = orc_fixture_dirs(sf_dir)
    base = store_dir.rsplit("/", 1)[0]
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.orc")
        .option("recursiveFileLookup", "true")
        .load(base)
        .select("path", "content")
    )
    return files.mapInPandas(_zone_batches, _STRIPE_SCHEMA)


ZONE_MAP_ORACLE = (
    "SELECT file_name, "
    + ", ".join(f"TRUE AS {b}" for b in _ZONE_BITS)
    + " FROM (VALUES "
    + ", ".join(f"('{f}')" for f in sorted(_ZONE_FILES))
    + ") t(file_name) ORDER BY file_name"
)


def zone_map_bits_df(audit: DataFrame) -> DataFrame:
    """The Spark rendering of :func:`zone_map_bits` — one file-keyed
    aggregation, no collect. ``tests/test_zonemap.py`` pins the two
    derivations row-for-row on the real audit table so they cannot
    drift."""
    from pyspark.sql import functions as F

    pruned = (
        F.col("claimed_min").isNotNull()
        & F.col("claimed_max").isNotNull()
        & (
            (F.col("claimed_max") < F.col("band_lo"))
            | (F.col("claimed_min") > F.col("band_hi"))
        )
    )
    mismatch = ~(
        F.col("claimed_min").eqNullSafe(F.col("true_min"))
        & F.col("claimed_max").eqNullSafe(F.col("true_max"))
    )
    unsound = pruned & (F.col("n_band_matches") > 0)
    return (
        audit.groupBy("file_name")
        .agg(
            (F.sum(mismatch.cast("int")) == 0).alias("stats_match_truth_ok"),
            (F.sum(unsound.cast("int")) == 0).alias("pruning_sound_ok"),
            F.sum(pruned.cast("int")).alias("_np"),
            F.count("*").alias("_n"),
        )
        .select(
            "file_name",
            "stats_match_truth_ok",
            "pruning_sound_ok",
            (
                (F.col("_np") > 0) & (F.col("_np") < F.col("_n"))
            ).alias("pruning_effective_ok"),
        )
        .orderBy("file_name")
    )


@register("orc_zone_map_pruning", oracle=ZONE_MAP_ORACLE)
def orc_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruning certificate over the ORC snapshot workload (module
    doc): per file, the stats-match / pruning-soundness /
    pruning-effectiveness bits, HASH-CHECKED against DuckDB's constant
    re-statement of the fixture layout with every bit TRUE. Flip tests:
    ``tests/test_zonemap.py`` (through :func:`zone_map_bits`, whose
    Spark rendering below is parity-pinned). The per-stripe numeric audit
    stays available via :func:`zone_map_stripe_audit`."""
    return zone_map_bits_df(zone_map_stripe_audit(spark, sf_dir))


# ---------------------------------------------------------------------------
# the parquet twin: row-group zone maps from the footer statistics
# ---------------------------------------------------------------------------

#: the parquet snapshot workload files (``parquet_fixture_dirs`` layout).
_ZONE_FILES_PARQUET = (
    "store/lineitem.parquet",
    "incoming/lineitem.parquet",
    "incoming/lineitem_mod.parquet",
    "incoming/orders_new.parquet",
)

_RG_SCHEMA = T.StructType(
    [
        T.StructField("file_name", T.StringType(), False),
        T.StructField("row_group_idx", T.IntegerType(), False),
        *_STRIPE_SCHEMA.fields[2:],
    ]
)


def zone_map_row_group_table(file_name: str, data: bytes) -> list[dict]:
    """Per-row-group zone-map audit rows for one parquet file: the lead
    column's claimed min/max from OUR footer walker
    (``functions/parquetmeta.py:read_footer_zone_maps`` — no pyarrow in the
    claim path), the true min/max and in-band match count from pyarrow's
    independent row-group read, and the same lowest-quarter predicate band
    as the ORC audit."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from columnar_aware_dedup_spark.functions.parquetmeta import (
        read_footer_zone_maps,
    )

    zones = read_footer_zone_maps(data)
    pf = pq.ParquetFile(io.BytesIO(data))
    lead = pf.schema_arrow.names[0]
    claimed = [
        (rg[0]["min"], rg[0]["max"]) if rg and rg[0]["path"] == lead else (None, None)
        for rg in zones
    ]
    gmin = min((c[0] for c in claimed if c[0] is not None), default=0)
    gmax = max((c[1] for c in claimed if c[1] is not None), default=0)
    band_lo, band_hi = gmin, gmin + (gmax - gmin) // 4
    rows = []
    for i in range(pf.metadata.num_row_groups):
        col = pf.read_row_group(i, columns=[lead])[lead]
        cmin, cmax = claimed[i] if i < len(claimed) else (None, None)
        in_band = pc.and_(
            pc.greater_equal(col, band_lo), pc.less_equal(col, band_hi)
        )
        rows.append(
            {
                "file_name": file_name,
                "row_group_idx": i,
                "claimed_min": cmin,
                "claimed_max": cmax,
                "true_min": pc.min(col).as_py(),
                "true_max": pc.max(col).as_py(),
                "band_lo": band_lo,
                "band_hi": band_hi,
                "n_band_matches": pc.sum(pc.cast(in_band, "int64")).as_py()
                or 0,
                "n_rows": len(col),
            }
        )
    return rows


def _zone_batches_parquet(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in _RG_SCHEMA.fields]
    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            name = "/".join(path.rsplit("/", 2)[-2:])
            rows.extend(zone_map_row_group_table(name, bytes(content)))
        yield pd.DataFrame(rows, columns=cols)


def zone_map_row_group_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The numeric per-row-group audit table (engine-side twin)."""
    from columnar_aware_dedup_spark.sources.orcfixtures import (
        parquet_fixture_dirs,
    )

    store_dir, _incoming = parquet_fixture_dirs(sf_dir)
    base = store_dir.rsplit("/", 1)[0]
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(base)
        .select("path", "content")
    )
    return files.mapInPandas(_zone_batches_parquet, _RG_SCHEMA)


ZONE_MAP_PARQUET_ORACLE = (
    "SELECT file_name, "
    + ", ".join(f"TRUE AS {b}" for b in _ZONE_BITS)
    + " FROM (VALUES "
    + ", ".join(f"('{f}')" for f in sorted(_ZONE_FILES_PARQUET))
    + ") t(file_name) ORDER BY file_name"
)


@register("parquet_zone_map_pruning", oracle=ZONE_MAP_PARQUET_ORACLE)
def parquet_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruning certificate over the PARQUET snapshot workload —
    the other-format twin of ``orc_zone_map_pruning`` (the reference walks
    both formats; scan-side statistics exploitation should too). Claims
    come from OUR Thrift-compact footer walker
    (``read_footer_zone_maps`` — min_value/max_value of
    ``FileMetaData.row_groups[].columns[].meta_data.statistics``), truth
    from pyarrow's independent row-group read; the three bits
    (stats-match / pruning-soundness / pruning-effectiveness) and their
    Spark rendering are SHARED with the ORC certificate
    (:func:`zone_map_bits` / :func:`zone_map_bits_df`), so the two formats
    cannot drift on what "safe to skip" means. Flip tests:
    ``tests/test_zonemap.py`` (the shared derivation) +
    ``test_parquet_zone_walker_*`` (the walker itself). The per-row-group
    numeric audit stays available via :func:`zone_map_row_group_audit`."""
    return zone_map_bits_df(zone_map_row_group_audit(spark, sf_dir))
