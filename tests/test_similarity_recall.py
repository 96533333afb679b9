"""Recall goldens for the banded-LSH family.

The driver fixtures contain no true near-duplicates (max pairwise cosine
~0.51), so ``embedding_near_dup_pairs`` correctly returning zero rows proves
only precision. These tests plant near-identical vectors and require the
banded construction to *find* them — the property the single-band r01
construction traded away when buckets got finer.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from columnar_aware_dedup_spark.operators import similarity

_DIM = 64


def _planted(spark, n_base: int = 200, n_dup: int = 20):
    """n_base deterministic pseudo-random vectors + n_dup near-copies of the
    first n_dup of them (one component nudged by 1%%)."""

    def vec(seed: int) -> list[float]:
        return [((seed * 31 + i * 17) % 101 - 50) / 10.0 for i in range(_DIM)]

    rows = [(i, vec(i)) for i in range(n_base)]
    for d in range(n_dup):
        v = vec(d)
        v[0] *= 1.01
        rows.append((10_000 + d, v))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_banded_lsh_finds_planted_near_dups(spark):
    e = _planted(spark)
    b = similarity.lsh_buckets(e).select("vec_id", "bucket")
    a, c = b.alias("a"), b.alias("c")
    cand = (
        a.join(
            c,
            (F.col("c.bucket") == F.col("a.bucket"))
            & (F.col("c.vec_id") > F.col("a.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("c.vec_id").alias("vec_b"))
        .distinct()
    )
    found = {
        (r["vec_a"], r["vec_b"])
        for r in cand.filter(F.col("vec_b") >= 10_000).collect()
    }
    planted = {(d, 10_000 + d) for d in range(20)}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.95, f"banded LSH recalled only {recall:.0%} of planted near-dups"


def test_banded_lsh_candidate_set_is_sparse(spark):
    """The OR-construction must not degenerate into all-pairs: candidates
    should be a small fraction of the n^2/2 pair space."""
    e = _planted(spark)
    n = e.count()
    b = similarity.lsh_buckets(e).select("vec_id", "bucket")
    a, c = b.alias("a"), b.alias("c")
    n_cand = (
        a.join(
            c,
            (F.col("c.bucket") == F.col("a.bucket"))
            & (F.col("c.vec_id") > F.col("a.vec_id")),
        )
        .select("a.vec_id", "c.vec_id")
        .distinct()
        .count()
    )
    assert n_cand <= 0.05 * n * (n - 1) / 2, f"{n_cand} candidates of {n} vectors"


def test_ivf_nprobe2_dominates_nprobe1(spark, sf_dir):
    """More probed cells can only improve the candidate pool: for every
    query, the k-th best cosine under nprobe=2 is >= the k-th best under
    nprobe=1 (elementwise dominance of the sorted top-k lists)."""
    from columnar_aware_dedup_spark.operators.similarity import (
        ann_ivf_nprobe_topk,
        ann_ivf_topk,
    )

    def ranked(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], []).append(r["cosine_sim"])
        return {q: sorted(v, reverse=True) for q, v in out.items()}

    one = ranked(ann_ivf_topk(spark, sf_dir))
    two = ranked(ann_ivf_nprobe_topk(spark, sf_dir))
    assert set(two) >= set(one)
    for q, sims1 in one.items():
        sims2 = two[q]
        assert len(sims2) >= len(sims1)
        for s2, s1 in zip(sims2, sims1):
            assert s2 >= s1 - 1e-12, f"query {q}: nprobe=2 top-k worse than nprobe=1"


def test_persisted_ivf_index_prunes_partitions(spark, sf_dir, tmp_path):
    """The IVF deployment artifact: the cell-partitioned index must serve
    the EXACT ann_ivf_topk ranking, with the collection scan restricted to
    the queries' cells by dynamic partition pruning — the plan property
    that makes a probe read nprobe/k of a 100 TB collection instead of
    scanning it."""
    from columnar_aware_dedup_spark.plans import explain

    path = str(tmp_path / "ivf_index")
    similarity.write_ivf_index(spark, sf_dir, path)

    got = similarity.ann_ivf_topk_from_index(spark, sf_dir, path)
    plan = explain.plan_string(got, "formatted")
    pruned = [
        line
        for line in plan.splitlines()
        if "PartitionFilters" in line and "dynamicpruning" in line.lower()
    ]
    assert pruned, f"collection scan is not partition-pruned:\n{plan}"

    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in similarity.ann_ivf_topk(spark, sf_dir).collect())
    assert a == b and a, "index-served ranking must equal the scan form"


def test_semantic_dedup_cell_cap_flip(spark):
    """The semantic_dedup cell-population cap (VERDICT r07 "What's wrong"
    #1) must BITE when tiny and stay ORACLE-IDENTICAL while biting: a cap
    far below the fixture's N/8 cell size censuses split cells
    (n_cells_capped > 0), never grows the duplicate set (sub-splitting only
    removes candidate pairs), and still hash-matches a DuckDB oracle
    carrying the same cap — proving the cap is applied identically on both
    engines, not just when it is a no-op."""
    from tests.oracle import compare

    sf_dir = "/root/testdata/sf0.001"
    default = similarity.semantic_dedup(spark, sf_dir)
    d_rows = default.collect()
    assert d_rows and all(r["n_cells_capped"] == 0 for r in d_rows), (
        "default cap must not bind at sf0.001 (cells are ~N/8 = 62)"
    )

    tiny = similarity.semantic_dedup_frame(spark, sf_dir, cap=16)
    t_rows = tiny.collect()
    assert all(r["n_cells_capped"] > 0 for r in t_rows), "tiny cap must census"
    n_dup_default = sum(r["is_dup"] for r in d_rows)
    n_dup_tiny = sum(r["is_dup"] for r in t_rows)
    assert n_dup_tiny <= n_dup_default, "sub-splitting may only drop pairs"

    compare(tiny, similarity._semantic_dedup_oracle(16), sf_dir)


def test_passage_ann_recall_against_exact(spark):
    """The passage IVF path must serve from the exact candidate space:
    EVERY ANN pair's cosine is re-verified against an independent
    recomputation from the raw passage vectors (so a norm/rounding bug in
    ANY served row fails, not just rows that land in the exact top-5), and
    nprobe=1 recall of the exact top-5 stays useful at fixture scale (the
    cell structure, not a broken probe, is the only recall loss)."""
    import math

    from columnar_aware_dedup_spark.operators.search import (
        passage_ann_ivf_topk,
        passage_hash_vectors,
        passage_topk_retrieval,
    )

    sf_dir = "/root/testdata/sf0.001"
    vecs = {
        (r["doc_id"], r["passage_idx"]): (list(r["vec"]), r["nrm"])
        for r in passage_hash_vectors(spark, sf_dir).collect()
    }
    ann_rows = passage_ann_ivf_topk(spark, sf_dir).collect()
    assert ann_rows
    for r in ann_rows:
        assert r["n_doc"] != r["q_doc"], "own-doc pair served"
        qv, qn = vecs[(r["q_doc"], r["q_passage"])]
        nv, nn = vecs[(r["n_doc"], r["n_passage"])]
        want = round(sum(a * b for a, b in zip(qv, nv)) / (qn * nn), 6)
        assert math.isclose(r["cosine_sim"], want, abs_tol=1e-9), (
            r,
            want,
        )

    exact = {
        (r["q_doc"], r["q_passage"], r["n_doc"], r["n_passage"])
        for r in passage_topk_retrieval(spark, sf_dir).collect()
    }
    hits = sum(
        (r["q_doc"], r["q_passage"], r["n_doc"], r["n_passage"]) in exact
        for r in ann_rows
    )
    recall = hits / len(exact)
    assert recall >= 0.3, f"nprobe=1 passage recall {recall:.2f} of exact top-5"
