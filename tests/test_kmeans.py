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
