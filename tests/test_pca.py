"""Planted-anisotropy tests for the distributed power-iteration PCA."""

from __future__ import annotations

import math
import random

from columnar_aware_dedup_spark.operators.pca import fit_pca2


def _planted_embeddings(spark, n=200, dim=8):
    """Points stretched along two known orthogonal axes: coordinates 0 and 1
    carry sd 5 and sd 2; the rest is sd 0.05 noise. PC1/PC2 must recover
    e0/e1 (up to sign)."""
    rng = random.Random(7)
    rows = []
    for i in range(n):
        v = [rng.gauss(0, 0.05) for _ in range(dim)]
        v[0] += rng.gauss(0, 5.0)
        v[1] += rng.gauss(0, 2.0)
        rows.append((i, [float(x) for x in v], i % 3))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    return num / math.sqrt(sum(x * x for x in a) * sum(y * y for y in b))


def test_power_iteration_recovers_planted_axes(spark):
    e = _planted_embeddings(spark)
    model = fit_pca2(e, dim=8).collect()[0]
    v1, v2 = list(model["v1"]), list(model["v2"])
    e0 = [1.0] + [0.0] * 7
    e1 = [0.0, 1.0] + [0.0] * 6
    assert abs(_cos(v1, e0)) > 0.99, v1
    assert abs(_cos(v2, e1)) > 0.98, v2
    assert abs(_cos(v1, v2)) < 1e-6  # deflation keeps PC2 orthogonal
    assert model["lam1"] > model["lam2"] > 0
    # eigenvalues approximate the planted variances (25 and 4)
    assert 15 < model["lam1"] < 35
    assert 2 < model["lam2"] < 7


def test_pca_projection_query_shape(spark, sf_dir):
    from columnar_aware_dedup_spark.operators.pca import (
        embedding_pca_project_full,
    )

    rows = embedding_pca_project_full(spark, sf_dir).collect()
    assert len(rows) == 500
    assert {r["vec_id"] for r in rows} == set(range(500))
    lam1, lam2 = rows[0]["lam1"], rows[0]["lam2"]
    assert lam1 >= lam2 > 0
    n = len(rows)
    var1 = sum(r["p1"] ** 2 for r in rows) / n - (sum(r["p1"] for r in rows) / n) ** 2
    var2 = sum(r["p2"] ** 2 for r in rows) / n - (sum(r["p2"] for r in rows) / n) ** 2
    # projections realize the captured variance ordering
    assert var1 >= var2 > 0
    # centered data: projections are mean-free
    assert abs(sum(r["p1"] for r in rows) / n) < 1e-3 * max(1.0, var1)
