"""Cross-format certificate falsifiability: every constant-TRUE bit and
the restated zero intersection must flip on the corruption class it
guards against (oracle parity runs in ``test_registry_oracles``)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from columnar_aware_dedup_spark.sources.crossformat import (
    _LINEITEM_COLS,
    _value_sigs,
    cross_format_chunk_sigs,
    cross_format_report,
)
from columnar_aware_dedup_spark.sources.orcfixtures import (
    orc_fixture_dirs,
    parquet_fixture_dirs,
)


def test_orc_id_mapping_matches_schema(spark, sf_dir):
    """The col{N} -> name map is built from _LINEITEM_COLS in order; the
    real ORC file must carry exactly that schema in that order, else the
    per-column signatures silently compare the wrong columns."""
    store, _ = orc_fixture_dirs(sf_dir)
    names = spark.read.orc(os.path.join(store, "lineitem.orc")).columns
    assert names == [n for n, _t in _LINEITEM_COLS]


def test_cross_format_bits_flip(spark, sf_dir):
    """Three corruption classes, three flips:

    - same format on both chunk sides -> the zero byte-sharing claim
      flips (every column shares every signature with itself);
    - a one-column-perturbed parquet twin (the fixture's
      ``lineitem_mod``) -> ``formats_agree_ok`` flips for exactly that
      column;
    - an empty chunk side -> the walker-ran guard bits flip.
    """
    orc_store, _ = orc_fixture_dirs(sf_dir)
    pq_store, pq_incoming = parquet_fixture_dirs(sf_dir)
    orc_values = _value_sigs(
        spark.read.orc(os.path.join(orc_store, "lineitem.orc")), "orc"
    )
    pq_values = _value_sigs(
        spark.read.parquet(os.path.join(pq_store, "lineitem.parquet")),
        "parquet",
    )
    orc_sigs, pq_sigs = cross_format_chunk_sigs(spark, orc_store, pq_store)

    # 1) same-format comparison: orc vs orc chunk signatures intersect.
    same = cross_format_report(
        orc_sigs, orc_sigs.select("column_name", "signature"),
        orc_values, orc_values.withColumnRenamed("sig_orc", "sig_parquet"),
    ).collect()
    assert all(r["n_shared_byte_sigs"] > 0 for r in same)
    assert all(r["formats_agree_ok"] for r in same)

    # 2) value perturbation: the l_partkey+7 twin disagrees on exactly
    #    that column's value signature.
    mod_values = _value_sigs(
        spark.read.parquet(os.path.join(pq_incoming, "lineitem_mod.parquet")),
        "parquet",
    )
    mod = cross_format_report(
        orc_sigs, pq_sigs, orc_values, mod_values
    ).collect()
    agree = {r["column_name"]: r["formats_agree_ok"] for r in mod}
    assert not agree["l_partkey"]
    assert all(ok for c, ok in agree.items() if c != "l_partkey")

    # 3) an empty chunk side flips the walker-ran guards.
    empty = pq_sigs.filter(F.lit(False))
    bare = cross_format_report(
        orc_sigs, empty, orc_values, pq_values
    ).collect()
    assert all(not r["parquet_pages_ok"] for r in bare)
    assert all(r["orc_chunks_ok"] for r in bare)
    assert all(r["n_shared_byte_sigs"] == 0 for r in bare)
