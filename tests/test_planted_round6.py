"""Planted-signal tests for the round-6 late operators: synthetic fixtures
with hand-computed answers, independent of the DuckDB oracles (an oracle
match proves both engines agree, not that the shared semantics are the
intended ones — these tests pin the intent)."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq


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


def _write_embeddings(tmp_path, vecs):
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


# -- crawl_admission_report ---------------------------------------------------

# long, clearly-distinct base paragraphs (>= 3 tokens so shingling is real)
_BASE = "the quick brown fox jumps over the lazy dog near the river bank"
_OTHER = "completely different text about astrophysics and neutron star mergers"
_THIRD = "unrelated recipe for sourdough bread with rye flour and honey"


def test_crawl_admission_verdicts(spark, tmp_path):
    """One incoming doc is a byte-exact copy of a corpus doc -> duplicate;
    one differs by a single trailing word (shares most shingles, so at
    least one MinHash band collides) -> near_duplicate; one is unrelated
    -> admit. The corpus-side copies must NOT appear in the output."""
    from columnar_aware_dedup_spark.operators.text import (
        _INCOMING_SOURCE,
        crawl_admission_report,
    )

    rows = [
        (0, _BASE, "corpus_a"),
        (1, _OTHER, "corpus_a"),
        (2, _THIRD, "corpus_b"),
        (10, _BASE, _INCOMING_SOURCE),  # exact dup of doc 0
        (11, _BASE + " tonight", _INCOMING_SOURCE),  # near dup of doc 0
        (12, "totally novel musings on typed lambda calculi", _INCOMING_SOURCE),
    ]
    sf_dir = _write_documents(tmp_path, rows)
    got = {
        r["doc_id"]: (r["verdict"], r["exact_dup"], r["n_band_hits"])
        for r in crawl_admission_report(spark, sf_dir).collect()
    }
    assert set(got) == {10, 11, 12}, "only incoming docs are on trial"
    assert got[10][0] == "duplicate" and got[10][1] is True
    # the exact copy shares every shingle, so every band collides too
    assert got[10][2] == 4
    assert got[11] == ("near_duplicate", False, got[11][2])
    assert got[11][2] >= 1, "one-word suffix edit must share >= 1 band"
    assert got[12] == ("admit", False, 0)


def test_crawl_admission_is_asymmetric(spark, tmp_path):
    """Two identical docs BOTH inside the corpus must not produce any
    verdict row — the corpus is never on trial, only the incoming crawl."""
    from columnar_aware_dedup_spark.operators.text import (
        _INCOMING_SOURCE,
        crawl_admission_report,
    )

    rows = [
        (0, _BASE, "corpus_a"),
        (1, _BASE, "corpus_b"),  # intra-corpus exact dup: not our problem
        (10, _OTHER, _INCOMING_SOURCE),
    ]
    sf_dir = _write_documents(tmp_path, rows)
    got = {r["doc_id"]: r["verdict"] for r in crawl_admission_report(spark, sf_dir).collect()}
    assert got == {10: "admit"}


# -- embedding_prototypicality ------------------------------------------------


def test_prototypicality_keeps_the_farthest(spark, tmp_path):
    """30 vectors; ids 20..27 are the fixed centroids. Ids 0..7 sit ON
    centroid 20 (distance 0), ids 8..11 sit progressively farther along the
    same axis. Cell 20 holds 13 vectors (0..11 + centroid 20 itself);
    keep = ceil(0.75 * 13) = 10, so exactly the 3 closest-to-centroid
    vectors are pruned — and they must come from the distance-0 pile."""
    from columnar_aware_dedup_spark.operators.similarity import (
        embedding_prototypicality,
    )

    dim = 4
    on_centroid = [[1.0, 0.0, 0.0, 0.0]] * 8  # ids 0..7: d2 = 0
    ladder = [
        [1.0 + 0.1 * (k + 1), 0.0, 0.0, 0.0] for k in range(4)
    ]  # ids 8..11: d2 = 0.01, 0.04, 0.09, 0.16
    fillers = [
        [0.0, 1.0 + 0.01 * k, 0.0, 0.0] for k in range(8)
    ]  # ids 12..19: nearest to centroid 21
    centroids = [
        [1.0, 0.0, 0.0, 0.0],  # id 20
        [0.0, 1.0, 0.0, 0.0],  # id 21
        [0.0, 0.0, 1.0, 0.0],  # id 22
        [0.0, 0.0, 0.0, 1.0],  # id 23
        [1.0, 1.0, 0.0, 0.0],  # id 24
        [0.0, 1.0, 1.0, 0.0],  # id 25
        [0.0, 0.0, 1.0, 1.0],  # id 26
        [1.0, 0.0, 0.0, 1.0],  # id 27
    ]
    extra = [[0.0, 0.0, 1.0, 0.01], [0.0, 0.0, 1.0, 0.02]]  # ids 28, 29
    vecs = on_centroid + ladder + fillers + centroids + extra
    assert all(len(v) == dim for v in vecs)
    sf_dir = _write_embeddings(tmp_path, vecs)

    rows = embedding_prototypicality(spark, sf_dir).collect()
    cell20 = {r["vec_id"]: r for r in rows if r["cid"] == 20}
    assert set(cell20) == set(range(12)) | {20}
    n = len(cell20)
    n_keep = sum(1 for r in cell20.values() if r["keep"])
    assert n_keep == math.ceil(0.75 * n) == 10
    # the ladder (largest distances) must all be kept; the pruned 3 must
    # all be distance-0 duplicates of the centroid
    for vid in (8, 9, 10, 11):
        assert cell20[vid]["keep"] is True
    pruned = [vid for vid, r in cell20.items() if not r["keep"]]
    assert len(pruned) == 3
    assert all(cell20[vid]["d2"] == 0.0 for vid in pruned)
    # deterministic tiebreak: equal distances prune the HIGHEST vec_ids
    # (rank orders d2 desc, vec_id asc, so low ids rank first among ties)
    assert pruned == sorted(pruned) and min(pruned) > max(
        vid for vid, r in cell20.items() if r["keep"] and r["d2"] == 0.0
    )


def test_prototypicality_ranks_are_a_permutation(spark, sf_dir):
    """On the real fixture: within every cell, cell_rank is 1..n with no
    gaps, keep-counts equal ceil(0.75*n), and distances are non-increasing
    along the rank order."""
    from collections import defaultdict

    from columnar_aware_dedup_spark.operators.similarity import (
        embedding_prototypicality,
    )

    by_cell = defaultdict(list)
    for r in embedding_prototypicality(spark, sf_dir).collect():
        by_cell[r["cid"]].append(r)
    assert by_cell, "fixture produced no cells"
    for cid, rows in by_cell.items():
        rows.sort(key=lambda r: r["cell_rank"])
        n = len(rows)
        assert [r["cell_rank"] for r in rows] == list(range(1, n + 1))
        assert sum(1 for r in rows if r["keep"]) == math.ceil(0.75 * n)
        d2s = [r["d2"] for r in rows]
        assert d2s == sorted(d2s, reverse=True)


# -- perplexity_bucket_report -------------------------------------------------


def test_perplexity_single_grid_cell_collapses_to_bucket_one(spark, tmp_path):
    """Identical docs -> identical scores -> one 2-dp grid cell -> every
    decile cutoff is that cell -> every doc lands in bucket 1."""
    from columnar_aware_dedup_spark.operators.selection import (
        perplexity_bucket_report,
    )

    rows = [(i, _BASE, "web") for i in range(6)]
    sf_dir = _write_documents(tmp_path, rows)
    got = perplexity_bucket_report(spark, sf_dir).collect()
    assert len(got) == 1
    assert got[0]["bucket"] == 1
    assert got[0]["n_docs"] == 6
    assert got[0]["lo_logprob"] == got[0]["hi_logprob"]


def test_perplexity_buckets_partition_the_corpus(spark, sf_dir):
    """On the real fixture: bucket labels live in 1..10 starting at 1, doc
    counts sum to the number of scored docs, and score ranges are disjoint
    and ordered (bucket 1 = lowest logprob = worst perplexity tail). NOT
    asserted: all 10 labels present — a 2-dp grid cell holding more than a
    decile of the corpus legitimately swallows the next label(s), because
    value ties are never split (determinism over equal-sizing; at sf0.1 one
    cell holds 41% of docs and buckets 3/5/6/7/9 are empty)."""
    from columnar_aware_dedup_spark.operators.selection import (
        perplexity_bucket_report,
    )
    from columnar_aware_dedup_spark.operators.text import bigram_logprob_score

    rows = sorted(
        perplexity_bucket_report(spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    labels = [r["bucket"] for r in rows]
    assert labels[0] == 1, "the lowest-score docs always open bucket 1"
    assert labels == sorted(set(labels)) and all(1 <= d <= 10 for d in labels)
    assert len(labels) >= 2, "the fixture spans more than one grid cell"
    n_scored = bigram_logprob_score(spark, sf_dir).count()
    assert sum(r["n_docs"] for r in rows) == n_scored
    for a, b in zip(rows, rows[1:]):
        assert a["hi_logprob"] < b["lo_logprob"], "bucket ranges must be ordered"


# -- doc_length_outliers --------------------------------------------------------


def test_length_outlier_flags_planted_extreme(spark, tmp_path):
    """Source A: nine ~100-char docs and one 5000-char monster. med = 100,
    MAD is small, the monster's modified z-score is enormous -> flagged;
    the nine stay unflagged. Source B: identical lengths -> MAD = 0 ->
    robust_z NULL and the equal-length fallback flags nothing."""
    from columnar_aware_dedup_spark.operators.text import doc_length_outliers

    rows = []
    for i in range(9):
        rows.append((i, "x" * (98 + i), "A"))  # lengths 98..106
    rows.append((9, "x" * 5000, "A"))
    for i in range(10, 14):
        rows.append((i, "y" * 200, "B"))  # MAD = 0 source
    sf_dir = _write_documents(tmp_path, rows)
    got = {r["doc_id"]: r for r in doc_length_outliers(spark, sf_dir).collect()}
    assert len(got) == 14
    assert got[9]["is_outlier"] is True
    assert got[9]["robust_z"] > 100, "5000 chars vs med ~102 is an extreme z"
    for i in range(9):
        assert got[i]["is_outlier"] is False
    for i in range(10, 14):
        assert got[i]["mad"] == 0
        assert got[i]["robust_z"] is None
        assert got[i]["is_outlier"] is False, "equal lengths are not outliers"


def test_length_outlier_mad_zero_fallback_flags_inequality(spark, tmp_path):
    """MAD = 0 with a lone deviant length: >half the source at one length
    forces MAD 0, and the fallback flags exactly the docs whose length
    differs from the median."""
    from columnar_aware_dedup_spark.operators.text import doc_length_outliers

    rows = [(i, "z" * 300, "C") for i in range(5)] + [(5, "z" * 310, "C")]
    sf_dir = _write_documents(tmp_path, rows)
    got = {r["doc_id"]: r for r in doc_length_outliers(spark, sf_dir).collect()}
    assert all(r["mad"] == 0 for r in got.values())
    assert got[5]["is_outlier"] is True
    assert all(got[i]["is_outlier"] is False for i in range(5))


# -- edit_distance_verify -------------------------------------------------------


def test_edit_distance_verify_confirms_and_rejects(spark, tmp_path):
    """Three docs built on the same repeated base sentence so all pairs are
    banded candidates: doc 1 differs from doc 0 by ONE character
    (edit_dist == 1 -> confirmed); doc 2 replaces ONE 'dog' with a
    150-char token — only ~3 of ~63 shingles churn, so bands survive, but
    edit distance is at least the 147-char length gap against a ~472-char
    max length: relative edit >= 0.31 > 0.2 -> rejected."""
    from columnar_aware_dedup_spark.operators.text import edit_distance_verify

    base = "the quick brown fox jumps over the lazy dog near the river bank "
    long_word = "x" * 150
    rows = [
        (0, base * 5, "w"),
        (1, (base * 5).replace("quick", "quirk", 1), "w"),
        (2, (base * 5).replace("dog", long_word, 1), "w"),
    ]
    sf_dir = _write_documents(tmp_path, rows)
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in edit_distance_verify(spark, sf_dir).collect()
    }
    assert (0, 1) in got, "one-char edit must stay a banded candidate"
    r01 = got[(0, 1)]
    assert r01["edit_dist"] == 1 and r01["confirmed"] is True
    assert (0, 2) in got, "token-preserving bloat must stay a candidate"
    r02 = got[(0, 2)]
    assert r02["edit_dist"] >= 147, "at least the length difference"
    assert r02["confirmed"] is False
    assert r02["rel_edit"] > 0.2


# -- approx_rank_certificate ----------------------------------------------------


def test_rank_certificate_bits_flip_on_wrong_values(spark):
    """The rank-window certificate is falsifiable: feeding the TRUE
    discrete percentiles as candidates passes every bit (even with heavy
    ties), while feeding the group's max as the p25 candidate fails its
    bit — so a sketch regression cannot hide behind the tolerance."""
    from pyspark.sql import functions as F

    from columnar_aware_dedup_spark.operators.stats import rank_bits

    # 1000 rows, heavy ties: values 1..10 each repeated 100x
    rows = [(i, float(1 + (i % 10))) for i in range(1000)]
    long_df = spark.createDataFrame(rows, ["i", "v"]).select(
        F.lit("g").alias("k"), "v"
    )
    good = spark.createDataFrame(
        [("g", 1000, 3.0, 5.0, 8.0)], ["k", "n_rows", "_a0", "_a1", "_a2"]
    )
    ps = (0.25, 0.50, 0.75)
    ok = rank_bits(long_df, good, "k", "v", ps, 1e-3).collect()[0]
    assert ok["p25_rank_ok"] and ok["p50_rank_ok"] and ok["p75_rank_ok"]

    bad = spark.createDataFrame(
        [("g", 1000, 10.0, 5.0, 1.0)], ["k", "n_rows", "_a0", "_a1", "_a2"]
    )
    flip = rank_bits(long_df, bad, "k", "v", ps, 1e-3).collect()[0]
    assert flip["p25_rank_ok"] is False, "max as p25 must fail"
    assert flip["p50_rank_ok"] is True
    assert flip["p75_rank_ok"] is False, "min as p75 must fail"


# -- doc_ngram_novelty ----------------------------------------------------------


def test_ngram_novelty_planted_extremes(spark, tmp_path):
    """Two identical docs share every shingle (novelty 0 -> boilerplate);
    an unrelated doc shares none (novelty 1.0 -> kept). Pairwise dedup
    would catch the identical pair — the point is the SCORE shape."""
    from columnar_aware_dedup_spark.operators.text import doc_ngram_novelty

    rows = [
        (0, _BASE, "w"),
        (1, _BASE, "w"),
        (2, _OTHER, "w"),
    ]
    sf_dir = _write_documents(tmp_path, rows)
    got = {r["doc_id"]: r for r in doc_ngram_novelty(spark, sf_dir).collect()}
    for d in (0, 1):
        assert got[d]["n_novel"] == 0
        assert got[d]["novel_frac"] == 0.0
        assert got[d]["is_boilerplate"] is True
    assert got[2]["n_novel"] == got[2]["n_shingles"]
    assert got[2]["novel_frac"] == 1.0
    assert got[2]["is_boilerplate"] is False


# -- cluster_aware_split --------------------------------------------------------


def test_cluster_aware_split_keeps_near_dups_together(spark, tmp_path):
    """Doc ids 0 and 47 hash to DIFFERENT splits under plain doc_id hashing
    (train vs test — verified below with the same md5 rule), so a one-word
    edit pair planted at those ids is exactly the eval-leak corpus_split
    permits. cluster_aware_split must give both the KEEPER's split, and
    singletons must keep their own-id split."""
    import hashlib

    from columnar_aware_dedup_spark.operators.curation import (
        _SHUFFLE_SALT,
        _TEST_LO,
        _VAL_LO,
        cluster_aware_split,
    )

    def own_split(i):
        b = int(
            hashlib.md5(f"{i}:{_SHUFFLE_SALT}".encode()).hexdigest()[:4], 16
        )
        return "train" if b < _VAL_LO else ("val" if b < _TEST_LO else "test")

    assert own_split(0) == "train" and own_split(47) == "test", (
        "the planted ids must straddle splits under plain doc_id hashing"
    )

    rows = [
        (0, _BASE, "w"),
        (47, _BASE + " tonight", "w"),  # near-dup of doc 0
        (5, _OTHER, "w"),  # singleton
    ]
    sf_dir = _write_documents(tmp_path, rows)
    got = {r["doc_id"]: r for r in cluster_aware_split(spark, sf_dir).collect()}
    assert got[0]["cluster_id"] == got[47]["cluster_id"] == 0
    assert got[0]["split"] == got[47]["split"] == own_split(0), (
        "the pair must land together, in the keeper's split"
    )
    assert got[5]["cluster_id"] is None
    assert got[5]["split"] == own_split(5)


def test_cluster_aware_split_is_leakproof_on_fixture(spark, sf_dir):
    """On the real fixture: every near-dup cluster's members share one
    split — the property corpus_split cannot offer."""
    from collections import defaultdict

    from columnar_aware_dedup_spark.operators.curation import (
        cluster_aware_split,
    )

    by_cluster = defaultdict(set)
    for r in cluster_aware_split(spark, sf_dir).collect():
        if r["cluster_id"] is not None:
            by_cluster[r["cluster_id"]].add(r["split"])
    assert by_cluster, "fixture has near-dup clusters"
    leaks = {c: s for c, s in by_cluster.items() if len(s) > 1}
    assert not leaks, f"clusters straddling splits: {leaks}"
