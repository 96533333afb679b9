"""Planted-cluster goldens for the Lloyd trainer (the R-checked query's
correctness contract — float averages have no SQL oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from columnar_aware_dedup_spark.operators.kmeans import (
    assign_cells,
    init_centroids,
    lloyd_train,
)


def _planted(spark):
    """Three well-separated clusters in 4-d; ids interleaved so the first-3
    deterministic seeds land one per true cluster."""
    centers = [(0.0, 0.0, 0.0, 0.0), (10.0, 10.0, 0.0, 0.0), (0.0, 0.0, 10.0, 10.0)]
    rows = []
    for i in range(30):
        c = i % 3
        jitter = ((i * 37) % 5) * 0.1  # deterministic, < cluster separation
        rows.append((i, [x + jitter for x in centers[c]], c))
    return spark.createDataFrame(rows, ["vec_id", "embedding", "truth"])


def test_lloyd_recovers_planted_clusters(spark):
    e = _planted(spark)
    cent = lloyd_train(e.select("vec_id", "embedding"), k=3, iters=3)
    got = assign_cells(e.select("vec_id", "embedding"), cent)
    joined = got.join(e.select("vec_id", "truth"), "vec_id")
    # each learned cell maps to exactly one planted cluster and vice versa
    purity = joined.groupBy("cell").agg(
        F.countDistinct("truth").alias("n_truth"), F.count("*").alias("n")
    )
    assert [r["n_truth"] for r in purity.collect()] == [1, 1, 1]
    assert sorted(r["n"] for r in purity.collect()) == [10, 10, 10]


def test_lloyd_centroids_near_true_means(spark):
    e = _planted(spark)
    cent = lloyd_train(e.select("vec_id", "embedding"), k=3, iters=3).collect()
    # every trained centroid sits within jitter range of a planted center
    centers = [(0.0, 0.0, 0.0, 0.0), (10.0, 10.0, 0.0, 0.0), (0.0, 0.0, 10.0, 10.0)]
    for row in cent:
        best = min(
            sum((a - b) ** 2 for a, b in zip(row["ce"], c)) for c in centers
        )
        assert best < 1.0


def test_lloyd_empty_cell_keeps_centroid(spark):
    """Two identical seed points => round 1 assigns every member to the
    lower cell (tie rule) and cell 1 goes empty; the empty cell must keep
    its centroid (not null/NaN) — which lets round 2 repopulate it and
    split the two true groups."""
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [5.0, 5.0]), (3, [5.1, 5.0])]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cent = lloyd_train(e, k=2, iters=2)
    got = {r["cell"]: r["ce"] for r in cent.collect()}
    assert len(got) == 2
    assert got[1] == [0.0, 0.0]  # orphaned seed survived round 1 verbatim
    assert got[0] == [5.05, 5.0]  # round 2 re-centered on the far group
    assigned = {
        r["vec_id"]: r["cell"] for r in assign_cells(e, cent).collect()
    }
    assert assigned == {0: 1, 1: 1, 2: 0, 3: 0}


def test_init_centroids_deterministic(spark):
    rows = [(i, [float(i), 0.0]) for i in (5, 3, 9, 1)]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["cell"]: r["ce"] for r in init_centroids(e, 2).collect()}
    assert got == {0: [1.0, 0.0], 1: [3.0, 0.0]}


def test_certificate_inertia_bit_can_flip(spark):
    """The r06 H-certificate's load-bearing bit is falsifiable: on the
    planted clusters, total inertia under the TRAINED centroids beats the
    seed, while a deliberately bad centroid set (everything at the origin)
    scores strictly worse than the seed — so a broken update step that
    regressed the objective would flip ``inertia_improved_ok``."""
    from columnar_aware_dedup_spark.operators.kmeans import _total_inertia

    e = _planted(spark).select("vec_id", "embedding")
    seed = init_centroids(e, 3)
    trained = lloyd_train(e, k=3, iters=3)
    bad = spark.createDataFrame(
        [(c, [0.0, 0.0, 0.0, 0.0]) for c in range(3)], ["cell", "ce"]
    )
    i_seed = _total_inertia(e, seed).collect()[0]["inertia"]
    i_trained = _total_inertia(e, trained).collect()[0]["inertia"]
    i_bad = _total_inertia(e, bad).collect()[0]["inertia"]
    assert i_trained <= i_seed + 1e-6
    assert i_bad > i_seed, "the bad centroids must regress the objective"


def test_full_structure_table_partitions_the_collection(spark, sf_dir):
    """ivf_train_kmeans_full (the unregistered float twin): one row per
    trained cell, member counts partition the collection exactly."""
    from columnar_aware_dedup_spark.io import table
    from columnar_aware_dedup_spark.operators.kmeans import (
        ivf_train_kmeans_full,
    )

    rows = ivf_train_kmeans_full(spark, sf_dir).collect()
    n = table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_members"] for r in rows) == n
    assert all(r["mean_d2"] >= 0.0 for r in rows)
