"""Planted-signal + invariant tests for the winnowing family, the sampled
shingle census, the b-bit minhash report, and the JSONL source leg (r11
late batch). Oracle parity runs in test_registry_oracles; these pin the
INTENT: the winnowing guarantee, the boilerplate cap, the sample bit's
falsifiability, b-bit containment, and JSONL/parquet agreement."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _write_documents(tmp_path, rows):
    """rows = [(doc_id, text, source)] -> fixture dir."""
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _uniq(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


# -- winnowing selection invariants ------------------------------------------


def test_winnowing_density_and_min(spark, sf_dir):
    """Selection size is within [1, n_windows] and the global minimum gram
    hash is always selected (it is the min of its own window) — so
    ``min_fp`` equals the stream minimum."""
    from columnar_aware_dedup_spark.operators.winnowing import (
        _GRAMS_SPARK,
        winnowing_fingerprints,
    )
    from columnar_aware_dedup_spark.operators.text import normalized

    out = winnowing_fingerprints(spark, sf_dir)
    bad = out.filter(
        (F.col("n_fingerprints") < 1)
        | (F.col("n_fingerprints") > F.col("n_windows"))
    ).count()
    assert bad == 0
    stream_min = normalized(spark, sf_dir).select(
        "doc_id",
        F.expr(f"array_min({_GRAMS_SPARK})").alias("smin"),
    )
    mismatch = (
        out.join(stream_min, "doc_id")
        .filter(F.col("min_fp") != F.col("smin"))
        .count()
    )
    assert mismatch == 0


def test_winnowing_guarantee_planted(spark, tmp_path):
    """The paper's guarantee: two docs sharing a token run of length
    >= w + k - 1 (= 6 here) share at least one SELECTED fingerprint —
    and a long-enough shared run yields a reported overlap pair, while
    an unrelated doc pairs with nobody."""
    from columnar_aware_dedup_spark.operators.winnowing import (
        _MIN_SHARED,
        _winnowed,
        winnowing_overlap_pairs,
    )

    run = _uniq("shared", 20)  # 20-token common run
    rows = [
        (0, _uniq("alpha", 8) + " " + run + " " + _uniq("omega", 8), "s"),
        (1, _uniq("beta", 8) + " " + run + " " + _uniq("tail", 8), "s"),
        (2, _uniq("lonely", 30), "s"),
    ]
    sf_dir = _write_documents(tmp_path, rows)
    sel = {
        r["doc_id"]: set(r["sel"])
        for r in _winnowed(spark, sf_dir).collect()
    }
    shared = sel[0] & sel[1]
    assert len(shared) >= _MIN_SHARED  # 20-token run >> the guarantee floor
    assert not (sel[0] & sel[2]) and not (sel[1] & sel[2])
    pairs = {
        (r["doc_a"], r["doc_b"]): r["shared_fps"]
        for r in winnowing_overlap_pairs(spark, sf_dir).collect()
    }
    assert set(pairs) == {(0, 1)}
    assert pairs[(0, 1)] == len(shared)


def test_winnowing_cap_drops_boilerplate(spark, tmp_path):
    """A fingerprint selected by more than _CAP distinct texts never
    enters the pair join: _CAP + 2 docs sharing ONE 6-token boilerplate
    run (their only common content) produce ZERO pairs, while a 2-doc
    shared run (under the cap) still reports."""
    from columnar_aware_dedup_spark.operators.winnowing import (
        _CAP,
        winnowing_overlap_pairs,
    )

    # a 20-token boilerplate run: long enough that, uncapped, every pair
    # of carriers would share >= _MIN_SHARED selected fingerprints (the
    # planted pair below proves 20 tokens clears the threshold) — so a
    # pass here is attributable to the CAP, not to the threshold
    boiler = _uniq("cookiebanner", 20)
    rows = [
        (i, _uniq(f"u{i}x", 10) + " " + boiler + " " + _uniq(f"v{i}y", 10), "s")
        for i in range(_CAP + 2)
    ]
    run = _uniq("pair", 20)
    rows += [
        (100, _uniq("left", 8) + " " + run, "s"),
        (101, run + " " + _uniq("right", 8), "s"),
    ]
    sf_dir = _write_documents(tmp_path, rows)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in winnowing_overlap_pairs(spark, sf_dir).collect()
    }
    assert pairs == {(100, 101)}


def test_winnowing_within_class_pairs(spark, tmp_path):
    """Identical docs report as pairs sharing their WHOLE selection (the
    member-pair expansion's within-class leg), without the duplicate
    multiplicity ever reaching the fingerprint join."""
    from columnar_aware_dedup_spark.operators.winnowing import (
        _winnowed,
        winnowing_overlap_pairs,
    )

    text = _uniq("copy", 25)
    rows = [(0, text, "s"), (1, text, "s"), (2, text, "s")]
    sf_dir = _write_documents(tmp_path, rows)
    nfp = len(_winnowed(spark, sf_dir).collect()[0]["sel"])
    got = {
        (r["doc_a"], r["doc_b"]): r["shared_fps"]
        for r in winnowing_overlap_pairs(spark, sf_dir).collect()
    }
    assert got == {(0, 1): nfp, (0, 2): nfp, (1, 2): nfp}


def test_winnowing_overlap_plan_has_no_cartesian(spark, sf_dir):
    """The overlap join must stay an equi-join on the fingerprint key —
    a banded-family-style bucket join, never a cross product."""
    from columnar_aware_dedup_spark.operators.winnowing import (
        winnowing_overlap_pairs,
    )

    from columnar_aware_dedup_spark.plans import explain

    plan = explain.plan_string(winnowing_overlap_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan and "cartesian" not in plan


# -- sampled shingle census ---------------------------------------------------


def _short_words(prefix: str, want_sampled: bool, n: int) -> list[str]:
    """n single-token texts whose md5 does / does not start with '0'
    (single-token docs shingle to the whole text — the short-doc guard —
    so the sample membership of each doc's one shingle is controllable)."""
    out, i = [], 0
    while len(out) < n:
        w = f"{prefix}{i}"
        if (hashlib.md5(w.encode()).hexdigest().startswith("0")) == want_sampled:
            out.append(w)
        i += 1
    return out


def test_shingle_sample_bit_flips(spark, tmp_path):
    """Falsifiability: a corpus where every SAMPLED shingle is shared but
    no unsampled one is drives the estimate ~100 pp away from the exact
    fraction — the certificate bit must read FALSE; the balanced twin
    (sampled and unsampled equally shared) must read TRUE."""
    from columnar_aware_dedup_spark.operators.winnowing import (
        shingle_dup_sample_estimate,
    )

    s_words = _short_words("sam", True, 4)
    u_words = _short_words("oth", False, 40)
    # adversarial: sampled shingles all duplicated, unsampled all unique
    rows = [(i, w, "s") for i, w in enumerate(s_words * 2)]
    rows += [(100 + i, w, "s") for i, w in enumerate(u_words)]
    row = shingle_dup_sample_estimate(
        spark, _write_documents(tmp_path, rows)
    ).collect()[0]
    assert row["sampled_distinct"] == 4 and row["sampled_shared"] == 4
    assert row["n_distinct_shingles"] == 44 and row["n_shared_shingles"] == 4
    assert row["est_within_2pct"] is False
    # balanced: every shingle duplicated -> estimate exactly right
    rows2 = [(i, w, "s") for i, w in enumerate((s_words + u_words) * 2)]
    (tmp_path / "b").mkdir()
    row2 = shingle_dup_sample_estimate(
        spark, _write_documents(tmp_path / "b", rows2)
    ).collect()[0]
    assert row2["est_within_2pct"] is True


# -- b-bit minhash ------------------------------------------------------------


def test_bbit_contains_full_candidates(spark, sf_dir):
    """Containment certificate: the full-width candidate pair set (from
    minhash_near_dup) is EXACTLY the full_candidate=TRUE subset of the
    b-bit report — low-bit truncation can add candidates, never lose
    one."""
    from columnar_aware_dedup_spark.operators.text import (
        minhash_bbit_near_dup,
        minhash_near_dup,
    )

    full = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_near_dup(spark, sf_dir).collect()
    }
    got = minhash_bbit_near_dup(spark, sf_dir).collect()
    flagged = {(r["doc_a"], r["doc_b"]) for r in got if r["full_candidate"]}
    allp = {(r["doc_a"], r["doc_b"]) for r in got}
    assert flagged == full
    assert full <= allp


# -- maintained winnowing index (streaming/winnow.py) -------------------------


def test_streaming_winnow_parity_matches_batch(spark, sf_dir):
    """The certificate's served report (two waves + replay, from the
    maintained tables) equals the batch corpus scan row-for-row, and its
    guard bit reads TRUE (the plan scanned only the two warehouse
    tables)."""
    from columnar_aware_dedup_spark.operators.streaming_parity import (
        streaming_winnow_parity,
    )
    from columnar_aware_dedup_spark.operators.winnowing import (
        winnowing_overlap_pairs,
    )
    from tests.conftest import rows_equal

    served = streaming_winnow_parity(spark, sf_dir)
    assert all(r["served_from_index"] for r in served.collect())
    assert rows_equal(
        served.drop("served_from_index"),
        winnowing_overlap_pairs(spark, sf_dir),
    )


def test_winnow_served_bit_flips_on_inplan_substitute(spark, sf_dir):
    """Falsifiability: a result-identical IN-PLAN recompute (the batch
    chain over the fixture parquet) scans files outside the warehouse,
    so the guard bit must read FALSE for it."""
    from columnar_aware_dedup_spark.operators.streaming_parity import (
        _index_served_bit,
    )
    from columnar_aware_dedup_spark.operators.winnowing import (
        winnowing_overlap_pairs,
    )

    substitute = winnowing_overlap_pairs(spark, sf_dir)
    assert not _index_served_bit(
        spark, substitute, "parity_winnow_fp", "parity_winnow_members"
    )


# -- JSONL source leg ---------------------------------------------------------


def test_jsonl_read_bit_flips(spark, sf_dir):
    """Falsifiability: the source-format guard reads FALSE for a parquet
    scan's file listing, for an empty listing, and for a mixed listing —
    TRUE only for a pure ``.jsonl`` listing."""
    from columnar_aware_dedup_spark.io import table
    from columnar_aware_dedup_spark.sources.jsonl import all_jsonl_bit

    parquet_files = table(spark, sf_dir, "documents").inputFiles()
    assert parquet_files and not all_jsonl_bit(parquet_files)
    assert not all_jsonl_bit([])
    assert not all_jsonl_bit(["a.jsonl", "b.parquet"])
    assert all_jsonl_bit(["a.jsonl", "b.jsonl"])


def test_jsonl_matches_parquet(spark, sf_dir):
    """The JSONL shards round-trip the documents table: the per-source
    dedup census from the JSONL read equals the same aggregation over the
    parquet fixture, and the guard bit attests the scan really read
    ``.jsonl`` files."""
    from columnar_aware_dedup_spark.sources.jsonl import (
        jsonl_ingest_dedup,
        read_documents_jsonl,
    )
    from columnar_aware_dedup_spark.io import table

    out = jsonl_ingest_dedup(spark, sf_dir)
    assert all(r["read_from_jsonl"] for r in out.collect())
    files = read_documents_jsonl(spark, sf_dir).inputFiles()
    assert files and all(f.endswith(".jsonl") for f in files)

    from columnar_aware_dedup_spark.operators.text import _NORM_SPARK

    sig = F.md5(F.expr(_NORM_SPARK))
    expect = (
        table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct(sig).cast("bigint").alias("n_distinct_texts"),
        )
    )
    got = {
        r["source"]: (r["n_docs"], r["n_distinct_texts"], r["n_dup_docs"])
        for r in out.collect()
    }
    for r in expect.collect():
        assert got[r["source"]] == (
            r["n_docs"],
            r["n_distinct_texts"],
            r["n_docs"] - r["n_distinct_texts"],
        )
