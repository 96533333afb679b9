"""Numeric drift certificate over a ``*_full`` twin (r11, VERDICT r10
"Next round" #7): the certificate queries hash BOOLEAN facts, so a
numeric engine drift that keeps every invariant true — a changed byte
account that still satisfies "hashed < total", say — is invisible to the
driver. The unregistered ``*_full`` twins carry the raw numbers but only
pytest sees them. This module gives ONE rotating representative a driver
seat: the full numeric census is computed live and compared
field-for-field against a COMMITTED known-good snapshot
(``columnar_aware_dedup_spark/pinned/orc_stats_census.json``, written by
``tools/pin_full_twins.py`` from a round whose driver window was fully
green), so any numeric movement flips a hash-checked bit.

r11 pins the ORC stats-pruned dedup census
(``zonemap.orc_stats_pruned_dedup_full``) — the numeric ground under
four registered certificates (the stripe/column stats-pruned rows and
the statsprune parity family). The representative ROTATES: re-point the
pin at another ``*_full`` twin with the same tool when a future round
touches different numeric ground (policy note in COVERAGE.md).

Environment note: the pinned numbers depend on the fixture writer
(pyarrow's ORC stripe layout) — they are snapshots of THIS container's
deterministic output, exactly like the fixture-truth constants the
certificate oracles already restate. A pyarrow upgrade that changes
stripe boundaries fails this row loudly; re-pin after auditing.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_aware_dedup_spark.registry import register

#: the committed known-good census snapshot, keyed by SF ("sf0.01" -> rows).
PINNED_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pinned",
    "orc_stats_census.json",
)

#: the census fields compared (everything the twin emits; fractions are
#: 6-dp-rounded in the twin, so equality is exact).
_CENSUS_FIELDS = (
    "n_regions",
    "n_pruned",
    "n_candidates",
    "n_hits",
    "bytes_total",
    "bytes_hashed",
    "dedup_bytes",
    "hash_savings_frac",
    "dedup_frac",
)

_CENSUS_SCHEMA = (
    "file_name string, n_regions bigint, n_pruned bigint,"
    " n_candidates bigint, n_hits bigint, bytes_total bigint,"
    " bytes_hashed bigint, dedup_bytes bigint, hash_savings_frac double,"
    " dedup_frac double"
)

_DRIFT_FILES = (
    "lineitem.orc",
    "lineitem_mod.orc",
    "lineitem_strmod.orc",
    "orders_new.orc",
)

ORC_STATS_CENSUS_DRIFT_ORACLE = (
    "SELECT file_name, TRUE AS census_matches_pinned_ok FROM (VALUES "
    + ", ".join(f"('{f}')" for f in sorted(_DRIFT_FILES))
    + ") t(file_name) ORDER BY file_name"
)


def pinned_census_rows(sf_key: str) -> list[dict]:
    """The committed snapshot for one SF; raises loudly when the SF was
    never pinned (an unpinned scale must fail, not vacuously pass)."""
    with open(PINNED_PATH) as fh:
        pinned = json.load(fh)
    if sf_key not in pinned:
        raise KeyError(
            f"no pinned census for {sf_key}; run tools/pin_full_twins.py"
        )
    return pinned[sf_key]


def census_drift_bits(
    spark: SparkSession, census: DataFrame, pinned_rows: list[dict]
) -> DataFrame:
    """Per-file equality verdicts, live census vs pinned rows — a full
    outer join, so a file that appears on only one side reads FALSE
    (null-safe equality on every field). Factored so the flip test
    corrupts pinned rows through the SAME derivation."""
    pin = spark.createDataFrame(
        [tuple(r[c] for c in ("file_name", *_CENSUS_FIELDS)) for r in pinned_rows],
        _CENSUS_SCHEMA,
    )
    renamed = pin.select(
        "file_name",
        *[F.col(c).alias(f"_pin_{c}") for c in _CENSUS_FIELDS],
    )
    ok = None
    for c in _CENSUS_FIELDS:
        eq = F.col(c).eqNullSafe(F.col(f"_pin_{c}"))
        ok = eq if ok is None else (ok & eq)
    return (
        census.join(F.broadcast(renamed), "file_name", "full_outer")
        .select(
            "file_name",
            F.coalesce(ok, F.lit(False)).alias("census_matches_pinned_ok"),
        )
        .orderBy("file_name")
    )


@register("orc_stats_census_drift", oracle=ORC_STATS_CENSUS_DRIFT_ORACLE)
def orc_stats_census_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The numeric drift gate (module doc): recompute the ORC
    stats-pruned dedup census live and require field-for-field equality
    with the committed known-good snapshot for this SF — any numeric
    movement in the chunk walk, the stats keys, the probe, or the byte
    accounting flips a bit the driver hashes. Flip test:
    ``tests/test_zonemap.py::test_census_drift_bits_flip``."""
    from columnar_aware_dedup_spark.operators.zonemap import (
        orc_stats_pruned_dedup_full,
    )

    sf_key = "sf" + sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return census_drift_bits(
        spark,
        orc_stats_pruned_dedup_full(spark, sf_dir),
        pinned_census_rows(sf_key),
    )
