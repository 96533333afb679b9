"""Zone-map pruning: flip tests, Spark/pure parity, stats parser pins."""

from __future__ import annotations

from columnar_aware_dedup_spark.operators.zonemap import (
    zone_map_bits,
    zone_map_bits_df,
    zone_map_stripe_audit,
    zone_map_stripe_table,
)


def _row(
    idx,
    cmin,
    cmax,
    tmin=None,
    tmax=None,
    matches=0,
    lo=0,
    hi=100,
):
    return {
        "file_name": "f",
        "stripe_idx": idx,
        "claimed_min": cmin,
        "claimed_max": cmax,
        "true_min": cmin if tmin is None else tmin,
        "true_max": cmax if tmax is None else tmax,
        "band_lo": lo,
        "band_hi": hi,
        "n_band_matches": matches,
        "n_rows": 10,
    }


def test_zone_map_bits_flip():
    """Each certificate bit is falsifiable through the same derivation the
    registered query runs (CERT_FLIP_TESTS contract)."""
    good = zone_map_bits(
        [_row(0, 0, 90, matches=10), _row(1, 150, 400, matches=0)]
    )
    assert good == {
        "stats_match_truth_ok": True,
        "pruning_sound_ok": True,
        "pruning_effective_ok": True,
    }

    lying_stats = zone_map_bits([_row(0, 0, 90, tmin=5), _row(1, 150, 400)])
    assert not lying_stats["stats_match_truth_ok"]

    # a stripe whose claimed range misses the band yet holds matches: the
    # skip would lose rows — soundness flips
    unsound = zone_map_bits(
        [_row(0, 0, 90, matches=10), _row(1, 150, 400, matches=3)]
    )
    assert not unsound["pruning_sound_ok"]

    nothing_pruned = zone_map_bits(
        [_row(0, 0, 90, matches=1), _row(1, 50, 99, matches=1)]
    )
    assert not nothing_pruned["pruning_effective_ok"]

    everything_pruned = zone_map_bits(
        [_row(0, 150, 200), _row(1, 300, 400)]
    )
    assert not everything_pruned["pruning_effective_ok"]

    # a stripe with no statistics is never pruned (the pruner must read it)
    no_stats = zone_map_bits(
        [_row(0, None, None, tmin=0, tmax=9, matches=5), _row(1, 150, 400)]
    )
    assert not no_stats["stats_match_truth_ok"]  # None claim != true values
    assert no_stats["pruning_sound_ok"]


def test_spark_and_pure_bit_derivations_agree(spark, sf_dir):
    """zone_map_bits_df must be indistinguishable from zone_map_bits on
    the REAL audit table — the drift guard that lets the flip tests run on
    the pure function while the registered query stays distributed."""
    audit = zone_map_stripe_audit(spark, sf_dir)
    rows = [r.asDict() for r in audit.collect()]
    by_file: dict[str, list[dict]] = {}
    for r in rows:
        by_file.setdefault(r["file_name"], []).append(r)
    pure = {f: zone_map_bits(rs) for f, rs in by_file.items()}
    via_df = {
        r["file_name"]: {
            "stats_match_truth_ok": r["stats_match_truth_ok"],
            "pruning_sound_ok": r["pruning_sound_ok"],
            "pruning_effective_ok": r["pruning_effective_ok"],
        }
        for r in zone_map_bits_df(audit).collect()
    }
    assert pure == via_df
    assert len(pure) == 4


def test_stripe_table_against_pyarrow(sf_dir):
    """The audit rows' claimed stats equal pyarrow's independent per-stripe
    recomputation on a real fixture file (the bit in microcosm), and the
    band really splits the sorted file."""
    from columnar_aware_dedup_spark.sources.orcfixtures import (
        orc_fixture_dirs,
    )

    store_dir, _ = orc_fixture_dirs(sf_dir)
    data = open(f"{store_dir}/lineitem.orc", "rb").read()
    rows = zone_map_stripe_table("store/lineitem.orc", data)
    assert len(rows) >= 2
    for r in rows:
        assert r["claimed_min"] == r["true_min"]
        assert r["claimed_max"] == r["true_max"]
    assert any(r["n_band_matches"] == 0 for r in rows)  # prunable stripes
    assert any(r["n_band_matches"] > 0 for r in rows)  # kept stripes


def test_parquet_zone_map_walker_and_bits():
    """The parquet twin's falsifiability, both layers: (a) the from-scratch
    Thrift-compact footer walker must agree with pyarrow's independent
    footer read on every integer column statistic of every fixture file
    (and see every row group); (b) a corrupted claim / an unsound prune /
    an all-kept band each flip the matching certificate bit through the
    SHARED zone_map_bits derivation the registered query runs."""
    import io
    import os

    import pyarrow.parquet as pq

    from columnar_aware_dedup_spark.functions.parquetmeta import (
        read_footer_zone_maps,
    )
    from columnar_aware_dedup_spark.operators.zonemap import (
        _ZONE_FILES_PARQUET,
        zone_map_bits,
        zone_map_row_group_table,
    )
    from columnar_aware_dedup_spark.sources.orcfixtures import (
        parquet_fixture_dirs,
    )

    store, _ = parquet_fixture_dirs("/root/testdata/sf0.001")
    base = os.path.dirname(store)
    checked = 0
    for rel in _ZONE_FILES_PARQUET:
        data = open(os.path.join(base, rel), "rb").read()
        ours = read_footer_zone_maps(data)
        md = pq.ParquetFile(io.BytesIO(data)).metadata
        assert len(ours) == md.num_row_groups and md.num_row_groups >= 2
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            for j in range(rg.num_columns):
                col = rg.column(j)
                mine = ours[i][j]
                assert mine["path"] == col.path_in_schema
                s = col.statistics
                if (
                    s is not None
                    and s.has_min_max
                    and isinstance(s.min, int)
                    and mine["min"] is not None
                ):
                    assert mine["min"] == s.min and mine["max"] == s.max
                    checked += 1
        # the real audit passes all three bits on this file
        rows = zone_map_row_group_table(rel, data)
        assert all(zone_map_bits(rows).values()), rel
    assert checked > 50, "walker parity must cover a real statistic volume"

    # fabricated-row flips through the SAME derivation
    row = {
        "claimed_min": 0, "claimed_max": 10, "true_min": 0, "true_max": 10,
        "band_lo": 0, "band_hi": 5, "n_band_matches": 3, "n_rows": 10,
    }
    far = dict(row, claimed_min=100, claimed_max=200, true_min=100,
               true_max=200, n_band_matches=0)
    assert zone_map_bits([row, far])["pruning_effective_ok"]
    lying = dict(row, claimed_min=1)  # claim != truth
    assert not zone_map_bits([lying, far])["stats_match_truth_ok"]
    unsound = dict(far, n_band_matches=2)  # pruned range hides matches
    assert not zone_map_bits([row, unsound])["pruning_sound_ok"]
    assert not zone_map_bits([row, row])["pruning_effective_ok"]  # none pruned


# -- the stats-pruned dedup consumer (r09) -----------------------------------


def test_stripe_stats_keys_cover_every_stripe(spark, sf_dir):
    """Every fixture stripe gets a non-null stats key (the fixtures carry
    full Metadata sections) and the per-stripe data sizes are positive —
    the inputs the pruner's candidate join relies on."""
    from columnar_aware_dedup_spark.operators.zonemap import (
        stripe_stats_key_table,
    )
    from columnar_aware_dedup_spark.sources.orcfixtures import (
        orc_fixture_dirs,
    )

    store_dir, incoming_dir = orc_fixture_dirs(sf_dir)
    for d in (store_dir, incoming_dir):
        rows = stripe_stats_key_table(spark, d).collect()
        assert rows
        assert all(r["stats_key"] is not None for r in rows)
        assert all(r["data_size"] > 0 for r in rows)


def test_identical_stripes_have_identical_stats_keys(spark, sf_dir):
    """The pruner's soundness premise, verified directly on the real
    bytes: every signature-equal stripe pair across store and incoming
    carries an equal stats key (identical bytes => identical rows =>
    identical statistics). A signature collision with differing keys
    would make stats pruning unsound — this is the flip direction the
    certificate's stats_prune_sound_ok aggregates."""
    from pyspark.sql import functions as F

    from columnar_aware_dedup_spark.operators.zonemap import (
        stripe_stats_key_table,
    )
    from columnar_aware_dedup_spark.sources.orcfixtures import (
        orc_fixture_dirs,
    )

    store_dir, incoming_dir = orc_fixture_dirs(sf_dir)
    store = stripe_stats_key_table(spark, store_dir).select(
        "signature", F.col("stats_key").alias("store_key")
    )
    inc = stripe_stats_key_table(spark, incoming_dir).select(
        "signature", F.col("stats_key").alias("inc_key")
    )
    joined = inc.join(store, "signature")
    assert joined.count() > 0  # the fixture plants signature hits
    assert (
        joined.filter(F.col("store_key") != F.col("inc_key")).count() == 0
    )


def test_stats_pruned_dedup_saves_bytes_and_changes_nothing(spark, sf_dir):
    """The certificate rows at fixture scale: sound + byte-identical to
    the full probe for every file, with real savings (the perturbed and
    brand-new files hash ZERO bytes; snapshot B hashes only its A-prefix
    candidates)."""
    from columnar_aware_dedup_spark.operators.zonemap import (
        orc_stats_pruned_dedup,
    )

    rows = {
        r["file_name"]: r
        for r in orc_stats_pruned_dedup(spark, sf_dir).collect()
    }
    assert set(rows) == {
        "lineitem.orc", "lineitem_mod.orc", "lineitem_strmod.orc",
        "orders_new.orc",
    }
    for r in rows.values():
        assert r["stats_prune_sound_ok"]
        assert r["dedup_bytes_match_full_ok"]
        assert r["has_pruned"]
        assert r["hashed_lt_total_ok"]
    assert rows["lineitem.orc"]["has_candidates"]
    assert rows["lineitem.orc"]["has_hits"]
    assert not rows["lineitem_mod.orc"]["has_candidates"]
    # the r10 string-keyed row: only STRING statistics distinguish it from
    # the store, and the extended keys prune all of it (VERDICT r09 #2)
    assert not rows["lineitem_strmod.orc"]["has_candidates"]
    assert not rows["orders_new.orc"]["has_candidates"]


def test_stats_pruned_bits_flip(spark):
    """Falsifiability of the stats-pruned dedup certificate: each bit
    must be computable FALSE through the shipped derivation — a
    pruned-but-hit stripe (the unsound case the pruner's premise forbids)
    flips stats_prune_sound_ok AND the dedup-byte parity; a file whose
    every stripe is a candidate flips hashed_lt_total_ok."""
    from columnar_aware_dedup_spark.operators.zonemap import (
        stats_pruned_certificate,
    )

    rows = [
        # healthy file: one pruned miss, one candidate hit, one candidate
        # miss -> every bit true
        ("good.orc", 100, False, False),
        ("good.orc", 200, True, True),
        ("good.orc", 300, True, False),
        # unsound file: a HIT outside the candidate set (stats pruning
        # skipped a stripe the store actually contains)
        ("unsound.orc", 100, False, True),
        ("unsound.orc", 200, True, True),
        # no-saving file: everything is a candidate -> hashed == total
        ("allcand.orc", 100, True, False),
        ("allcand.orc", 200, True, True),
    ]
    df = spark.createDataFrame(
        rows, "file_name string, data_size long, cand boolean, hit boolean"
    )
    got = {r["file_name"]: r for r in stats_pruned_certificate(df).collect()}
    g = got["good.orc"]
    assert g["stats_prune_sound_ok"] and g["dedup_bytes_match_full_ok"]
    assert g["hashed_lt_total_ok"] and g["has_pruned"]
    u = got["unsound.orc"]
    assert not u["stats_prune_sound_ok"]
    assert not u["dedup_bytes_match_full_ok"]
    a = got["allcand.orc"]
    assert a["stats_prune_sound_ok"] and not a["hashed_lt_total_ok"]
    assert not a["has_pruned"]


def test_parquet_identical_row_groups_have_identical_stats_keys(
    spark, sf_dir
):
    """The parquet pruner's soundness premise on real fixture bytes:
    every signature-equal row-group pair across store and incoming
    carries an equal stats key (the ORC premise test's format twin)."""
    from pyspark.sql import functions as F

    from columnar_aware_dedup_spark.operators.zonemap import (
        parquet_rg_stats_key_table,
    )
    from columnar_aware_dedup_spark.sources.orcfixtures import (
        parquet_fixture_dirs,
    )

    store_dir, incoming_dir = parquet_fixture_dirs(sf_dir)
    store = parquet_rg_stats_key_table(spark, store_dir).select(
        "signature", F.col("stats_key").alias("store_key")
    )
    inc = parquet_rg_stats_key_table(spark, incoming_dir).select(
        "signature", F.col("stats_key").alias("inc_key")
    )
    joined = inc.join(store, "signature")
    assert joined.count() > 0  # the fixture plants row-group hits
    assert (
        joined.filter(F.col("store_key") != F.col("inc_key")).count() == 0
    )


def test_parquet_stats_pruned_dedup_shape(spark, sf_dir):
    """Fixture-shaped certificate rows: sound + byte-identical + real
    savings for every file; the perturbed-column and brand-new files
    hash zero bytes (no candidates)."""
    from columnar_aware_dedup_spark.operators.zonemap import (
        parquet_stats_pruned_dedup,
    )

    rows = {
        r["file_name"]: r
        for r in parquet_stats_pruned_dedup(spark, sf_dir).collect()
    }
    assert set(rows) == {
        "lineitem.parquet", "lineitem_mod.parquet",
        "lineitem_strmod.parquet", "orders_new.parquet",
    }
    for r in rows.values():
        assert r["stats_prune_sound_ok"]
        assert r["dedup_bytes_match_full_ok"]
        assert r["has_pruned"] and r["hashed_lt_total_ok"]
    assert rows["lineitem.parquet"]["has_candidates"]
    assert rows["lineitem.parquet"]["has_hits"]
    assert not rows["lineitem_mod.parquet"]["has_candidates"]
    assert not rows["lineitem_strmod.parquet"]["has_candidates"]
    assert not rows["orders_new.parquet"]["has_candidates"]


def test_stats_pruned_census_numbers(spark, sf_dir):
    """The numeric twin's accounting must tie out against itself and the
    fixture shape in BOTH formats: counts partition (pruned + candidates
    = regions), bytes partition, hits only among candidates, the
    perturbed/new files save 100% of hashing, and snapshot B saves a
    positive fraction while still deduplicating a positive fraction."""
    from columnar_aware_dedup_spark.operators.zonemap import (
        orc_stats_pruned_dedup_full,
        parquet_stats_pruned_dedup_full,
    )

    for fn, mod_name in (
        (orc_stats_pruned_dedup_full, "lineitem_mod.orc"),
        (parquet_stats_pruned_dedup_full, "lineitem_mod.parquet"),
    ):
        rows = {r["file_name"]: r for r in fn(spark, sf_dir).collect()}
        assert len(rows) == 4
        for r in rows.values():
            assert r["n_pruned"] + r["n_candidates"] == r["n_regions"]
            assert r["n_hits"] <= r["n_candidates"]
            assert 0 <= r["bytes_hashed"] <= r["bytes_total"]
            assert r["dedup_bytes"] <= r["bytes_hashed"]
            assert r["hash_savings_frac"] > 0
        assert rows[mod_name]["hash_savings_frac"] == 1.0
        assert rows[mod_name.replace("_mod", "_strmod")][
            "hash_savings_frac"
        ] == 1.0
        b = rows[mod_name.replace("_mod", "")]
        assert 0 < b["hash_savings_frac"] < 1
        assert b["dedup_frac"] > 0


# -- string/double-keyed pruning + the column-level fallback (r10) -----------


def test_orc_walker_parses_string_double_stats(sf_dir):
    """The extended stats walk (VERDICT r09 "What's missing" #2): string
    columns carry str_min/str_max, double columns dbl_min/dbl_max, in the
    same Metadata section the integer stats came from."""
    from columnar_aware_dedup_spark.functions.orcmeta import (
        read_stripe_column_stats,
    )
    from columnar_aware_dedup_spark.sources.orcfixtures import (
        orc_fixture_dirs,
    )

    store_dir, _ = orc_fixture_dirs(sf_dir)
    with open(store_dir + "/lineitem.orc", "rb") as fh:
        stats = read_stripe_column_stats(fh.read())
    assert stats
    for stripe in stats:
        kinds = {
            k
            for c in stripe
            for k, v in c.items()
            if v is not None and k != "n_values"
        }
        assert {"int_min", "dbl_min", "str_min"} <= kinds
        # l_returnflag: the column the strmod fixture perturbs
        flags = [c for c in stripe if c["str_min"] is not None]
        assert any(c["str_min"] <= "B" <= c["str_max"] for c in flags)


def test_string_perturbation_needs_string_keys(sf_dir):
    """The power gained by the extended keys, shown directly on the
    bytes: the strmod file's stripes collide with the store under the r09
    INTEGER-ONLY key (same rows, same integer/double statistics) but
    differ under the shipped string-extended key — without string
    statistics every one of its stripes would be hashed only to miss."""
    import glob

    from columnar_aware_dedup_spark.functions.orcmeta import (
        read_stripe_column_stats,
    )
    from columnar_aware_dedup_spark.sources.orcfixtures import (
        orc_fixture_dirs,
        orc_strmod_incoming_dir,
    )
    from columnar_aware_dedup_spark.operators.zonemap import _orc_stats_key

    def keys(path, fields=None):
        with open(path, "rb") as fh:
            stats = read_stripe_column_stats(fh.read())
        if fields is None:
            return [_orc_stats_key(cols) for cols in stats]
        return [
            "|".join(
                ":".join(repr(c.get(f)) for f in fields) for c in cols
            )
            for cols in stats
        ]

    store_dir, _ = orc_fixture_dirs(sf_dir)
    strmod = glob.glob(orc_strmod_incoming_dir(sf_dir) + "/*.orc")[0]
    int_only = ("n_values", "int_min", "int_max")
    store_int = set(keys(store_dir + "/lineitem.orc", int_only))
    strmod_int = keys(strmod, int_only)
    # r09 keys: every strmod stripe is a (futile) hash candidate
    assert all(k in store_int for k in strmod_int)
    store_full = set(keys(store_dir + "/lineitem.orc"))
    strmod_full = keys(strmod)
    # r10 keys: every strmod stripe is pruned from footer metadata alone
    assert all(k not in store_full for k in strmod_full)


def test_identical_columns_have_identical_stats_keys(spark, sf_dir):
    """The COLUMN-level soundness premise on real bytes (the stripe-level
    premise test one level down, now string-inclusive): every
    signature-equal (stripe, column) pair across store and incoming
    carries an equal per-column stats key."""
    from pyspark.sql import functions as F

    from columnar_aware_dedup_spark.operators.zonemap import (
        stripe_column_stats_key_table,
    )
    from columnar_aware_dedup_spark.sources.orcfixtures import (
        orc_fixture_dirs,
        orc_strmod_incoming_dir,
    )

    store_dir, incoming_dir = orc_fixture_dirs(sf_dir)
    store = stripe_column_stats_key_table(spark, store_dir).select(
        "signature", F.col("stats_key").alias("store_key")
    )
    for d in (incoming_dir, orc_strmod_incoming_dir(sf_dir)):
        inc = stripe_column_stats_key_table(spark, d).select(
            "signature", F.col("stats_key").alias("inc_key")
        )
        joined = inc.join(store, "signature")
        assert joined.count() > 0  # unperturbed columns byte-match
        assert (
            joined.filter(
                F.col("store_key") != F.col("inc_key")
            ).count()
            == 0
        )


def test_column_fallback_recovers_perturbed_files(spark, sf_dir):
    """The fallback's payoff, measured: the one-column-perturbed files —
    transferred WHOLE by the stripe level — recover most of their bytes
    as column-level hits while the perturbed column is pruned unhashed;
    and stripes the region level already deduplicated contribute no
    fallback columns at all."""
    from columnar_aware_dedup_spark.operators.zonemap import (
        _column_fallback_probe,
        _orc_incoming_stats,
        stats_pruned_census,
        stripe_column_stats_key_table,
        stripe_stats_key_table,
    )
    from columnar_aware_dedup_spark.sources.orcfixtures import (
        orc_fixture_dirs,
        orc_strmod_incoming_dir,
    )

    store_dir, incoming_dir = orc_fixture_dirs(sf_dir)
    inc_cols = stripe_column_stats_key_table(
        spark, incoming_dir
    ).unionByName(
        stripe_column_stats_key_table(
            spark, orc_strmod_incoming_dir(sf_dir)
        )
    )
    probed = _column_fallback_probe(
        _orc_incoming_stats(spark, sf_dir, incoming_dir),
        stripe_stats_key_table(spark, store_dir),
        inc_cols,
        stripe_column_stats_key_table(spark, store_dir),
    )
    rows = {
        r["file_name"]: r for r in stats_pruned_census(probed).collect()
    }
    for name in ("lineitem_mod.orc", "lineitem_strmod.orc"):
        r = rows[name]
        assert r["n_hits"] > 0 and r["n_pruned"] > 0
        assert r["dedup_bytes"] > 0.9 * r["bytes_total"]
        assert r["bytes_hashed"] < r["bytes_total"]
    # snapshot B's region-level hits are excluded from the fallback: its
    # fallback columns are fewer than its total (stripes x columns)
    total_cols = inc_cols.filter(
        inc_cols.file_name == "lineitem.orc"
    ).count()
    assert rows["lineitem.orc"]["n_regions"] < total_cols


def test_census_drift_bits_flip(spark):
    """Falsifiability of the r11 numeric drift gate: equality with the
    pin reads TRUE; perturbing any pinned field (a count OR a rounded
    fraction), dropping a pinned file, or adding a phantom one flips the
    affected row — through the SAME derivation the registered query
    ships."""
    from columnar_aware_dedup_spark.operators.drift import (
        _CENSUS_FIELDS,
        census_drift_bits,
    )

    live_rows = [
        {"file_name": "a.orc", "n_regions": 4, "n_pruned": 2,
         "n_candidates": 2, "n_hits": 1, "bytes_total": 100,
         "bytes_hashed": 60, "dedup_bytes": 30,
         "hash_savings_frac": 0.4, "dedup_frac": 0.3},
        {"file_name": "b.orc", "n_regions": 3, "n_pruned": 3,
         "n_candidates": 0, "n_hits": 0, "bytes_total": 90,
         "bytes_hashed": 0, "dedup_bytes": 0,
         "hash_savings_frac": 1.0, "dedup_frac": 0.0},
    ]
    live = spark.createDataFrame(
        [tuple(r[c] for c in ("file_name", *_CENSUS_FIELDS)) for r in live_rows],
        "file_name string, n_regions bigint, n_pruned bigint,"
        " n_candidates bigint, n_hits bigint, bytes_total bigint,"
        " bytes_hashed bigint, dedup_bytes bigint,"
        " hash_savings_frac double, dedup_frac double",
    )

    def bits(pinned):
        return {
            r["file_name"]: r["census_matches_pinned_ok"]
            for r in census_drift_bits(spark, live, pinned).collect()
        }

    import copy

    assert bits(copy.deepcopy(live_rows)) == {"a.orc": True, "b.orc": True}
    # an integer drift flips its file only
    bad = copy.deepcopy(live_rows)
    bad[0]["dedup_bytes"] = 31
    assert bits(bad) == {"a.orc": False, "b.orc": True}
    # a fraction drift flips too
    bad = copy.deepcopy(live_rows)
    bad[1]["hash_savings_frac"] = 0.999999
    assert bits(bad) == {"a.orc": True, "b.orc": False}
    # a file missing from the pin cannot vacuously pass
    assert bits(copy.deepcopy(live_rows)[:1]) == {
        "a.orc": True, "b.orc": False,
    }
    # a pinned file the live census no longer produces appears as FALSE
    extra = copy.deepcopy(live_rows) + [
        {**copy.deepcopy(live_rows)[0], "file_name": "ghost.orc"}
    ]
    assert bits(extra) == {"a.orc": True, "b.orc": True, "ghost.orc": False}
