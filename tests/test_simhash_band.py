"""Banded all-corpus SimHash near-dup (VERDICT r05 brief #4).

Two guarantees under test: (a) planted bit-flips land exactly where the
pigeonhole argument says they must — every pair within Hamming distance 3
is reported with its exact distance, and a pair whose 4 flips touch all
four bands shares no band and is invisible; (b) at fixture scale the
banded pair set EQUALS the exhaustive all-pairs set filtered to <= 3, i.e.
banding loses nothing (full recall) and adds nothing (the verify stage
filters false bucket collisions).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from columnar_aware_dedup_spark.operators.text import (
    _SH64_HAM_T,
    banded_hamming_pairs,
    simhash64_bands,
    simhash_band_near_dup,
)

from tests.conftest import rows_equal


def _sig_rows(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, b0 int, b1 int, b2 int, b3 int"
    )


def test_banded_hamming_planted_flips(spark):
    """Doc 0 is the base signature; docs 1..3 flip 1..3 bits inside one
    band (must be found, exact distance); doc 4 flips one bit in EVERY
    band (distance 4, no shared band — must be invisible); doc 5 flips 4
    bits in one band (distance 4, three shared bands — a bucket candidate,
    but the verify stage must drop it)."""
    base = (0b1010101010101010, 0x0F0F, 0x1234, 0x7FFF)
    rows = [
        (0, *base),
        (1, base[0] ^ 0b1, base[1], base[2], base[3]),
        (2, base[0] ^ 0b11, base[1], base[2], base[3]),
        (3, base[0] ^ 0b111, base[1], base[2], base[3]),
        (4, base[0] ^ 1, base[1] ^ 1, base[2] ^ 1, base[3] ^ 1),
        (5, base[0] ^ 0b1111, base[1], base[2], base[3]),
    ]
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in banded_hamming_pairs(_sig_rows(spark, rows), 3).collect()
    }
    # pairs among {0,1,2,3}: distances are Hamming between flip masks
    assert got[(0, 1)] == 1 and got[(0, 2)] == 2 and got[(0, 3)] == 3
    assert got[(1, 2)] == 1 and got[(1, 3)] == 2 and got[(2, 3)] == 1
    assert (0, 4) not in got, "4 flips across all bands must be invisible"
    assert (0, 5) not in got, "candidate at distance 4 must fail the verify"
    # doc 5 vs 1..3: e.g. 5 vs 3 differ in exactly one bit
    assert got[(3, 5)] == 1


def test_simhash_band_near_dup_full_recall(spark, sf_dir):
    """Fixture-scale exhaustive cross-check: the banded pair set must
    equal the brute-force all-pairs set filtered to <= _SH64_HAM_T — full
    recall by pigeonhole, full precision by the verify join."""
    sigs = simhash64_bands(spark, sf_dir).localCheckpoint(eager=True)
    a = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(c).alias(f"a_{c}") for c in ("b0", "b1", "b2", "b3")],
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(c).alias(f"b_{c}") for c in ("b0", "b1", "b2", "b3")],
    )
    ham = sum(F.bit_count(F.expr(f"a_b{i} ^ b_b{i}")) for i in range(4))
    exhaustive = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= _SH64_HAM_T)
    )
    assert rows_equal(simhash_band_near_dup(spark, sf_dir), exhaustive)


def test_simhash_band_near_dup_is_evalpython_free(spark, sf_dir):
    """The whole signature+band+verify pipeline stays JVM-side (built-in
    expressions only) and carries no global sort."""
    from columnar_aware_dedup_spark.plans import explain

    df = simhash_band_near_dup(spark, sf_dir)
    plan = explain.plan_string(df)
    assert "EvalPython" not in plan
    assert not explain.has_global_sort(df)
