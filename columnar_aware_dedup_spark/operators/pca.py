"""PCA over the embedding collection — matrix-free distributed power
iteration, the dimensionality-reduction step in front of ANN/clustering.

Design (kmeans-trainer discipline: iterative, DataFrame state, zero
``collect()``):

- The 64x64 covariance is never materialized. Power iteration only needs
  the matrix-vector product ``C v = (1/n) sum_x ((x-mu)·v) (x-mu)``, so each
  round is ONE corpus scan: a narrow map computes the scalar ``s = (x-mu)·v``
  per row against the broadcast one-row (mu, v) state, posexplodes the
  s-scaled centered vector, and a 64-row partial aggregation re-folds the
  new direction. Map-side combine collapses every task to <=dim rows, so
  the exchange is dim x tasks rows regardless of corpus size.
- The state (mean vector, current direction, eigenvalue estimate) lives in
  one single-row DataFrame, ``localCheckpoint``-ed per round.
- The second component re-runs the loop with a Gram-Schmidt deflation step
  folded into the same one-row normalization expression (w := w - (w·v1)v1).
- Deterministic: the starting direction is an md5-seeded pseudo-random
  vector, so the whole trajectory (including the sign of each component) is
  a pure function of the collection.

Registered rows-only: iterated float division is not SQL-expressible, and
eigenvector recovery is pinned by the planted-anisotropy pytest instead
(`tests/test_pca.py`).

Reference surface: the reference has no PCA (its signatures are byte
hashes); this extends the embedding family (`operators/similarity.py`)
the way a training-data pipeline needs before IVF/PQ at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_aware_dedup_spark.io import table
from columnar_aware_dedup_spark.registry import register

_ITERS = 10

#: deterministic unit-free start direction: md5 of the seeded position,
#: 4 hex digits -> centered pseudo-uniform in [-0.5, 0.5).
_V0_EXPR = (
    "transform(sequence(1, {dim}), j ->"
    " (conv(substring(md5(concat('pca:', cast(j as string))), 1, 4), 16, 10)"
    " / 65536.0) - 0.5)"
)

#: per-row centered embedding (double-cast once).
_CENTERED = (
    "transform(sequence(1, {dim}), j ->"
    " cast(element_at(embedding, j) as double) - element_at(mu, j))"
)


#: embedding width of the fixture layout. A constant, not a probe: every
#: expression needs it at plan-build time, and reading it with a driver
#: action would break the no-collect discipline. Planted tests pass their
#: own width to :func:`fit_pca2`.
_DIM = 64


def _mean_row(e: DataFrame, dim: int) -> DataFrame:
    """ONE row: (mu array<double>, n) — the collection mean, via a
    dim-bounded partial aggregation."""
    return (
        e.select(F.posexplode("embedding").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.sum(F.col("x").cast("double")).alias("sx"), F.count("*").alias("c"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, sx / c AS m))),"
                " t -> t.m)"
            ).alias("mu"),
            F.first("c").alias("n"),
        )
    )


def _power_component(
    e: DataFrame, state: DataFrame, dim: int, prev: str | None, iters: int = _ITERS
) -> DataFrame:
    """Run ``iters`` power rounds; returns the state row with ``v`` (unit
    direction) and ``lam`` (eigenvalue estimate ||Cv||). ``prev`` names an
    existing column of the state row to deflate against (PC2)."""
    centered = _CENTERED.format(dim=dim)
    dot_v = (
        f"aggregate(sequence(1, {dim}), cast(0 as double),"
        f" (acc, j) -> acc + element_at(c, j) * element_at(v, j))"
    )
    deflate = (
        f"zip_with(w, {prev}, (a, b) -> a - dot_prev * b)" if prev else "w"
    )
    keep = [c for c in state.columns if c != "v"]
    for _ in range(iters):
        contrib = (
            e.join(F.broadcast(state))
            .select(F.expr(centered).alias("c"), *state.columns)
            .select(F.expr(dot_v).alias("s"), "c")
            .select(F.posexplode(F.expr("transform(c, x -> x * s)")).alias("pos", "w"))
        )
        wrow = (
            contrib.groupBy("pos")
            .agg(F.sum("w").alias("w"))
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, w))), t -> t.w)"
                ).alias("w")
            )
        )
        norm_expr = (
            "sqrt(aggregate(wd, cast(0 as double), (acc, x) -> acc + x * x))"
        )
        dot_prev = (
            f"aggregate(sequence(1, {dim}), cast(0 as double),"
            f" (acc, j) -> acc + element_at(w, j) * element_at({prev}, j))"
            if prev
            else "cast(0 as double)"
        )
        state = (
            state.select(*keep, "v")
            .join(wrow)
            .withColumn("dot_prev", F.expr(dot_prev))
            .withColumn("wd", F.expr(deflate))
            .select(
                *keep,
                F.expr(f"transform(wd, x -> x / ({norm_expr}))").alias("v"),
                (F.expr(norm_expr) / F.col("n")).alias("lam"),
            )
            .localCheckpoint(eager=True)
        )
    return state


def fit_pca2(e: DataFrame, dim: int = _DIM) -> DataFrame:
    """ONE row: (mu, n, v1, lam1, v2, lam2) — the top-2 principal axes."""
    v0 = _V0_EXPR.format(dim=dim)
    st = _mean_row(e, dim).select("mu", "n", F.expr(v0).alias("v"))
    st1 = _power_component(e, st, dim, prev=None)
    st1 = st1.select(
        "mu", "n", F.col("v").alias("v1"), F.col("lam").alias("lam1")
    ).localCheckpoint(eager=True)
    # PC2: restart from a re-seeded direction, deflating against v1 each round.
    v0b = _V0_EXPR.format(dim=dim).replace("'pca:'", "'pca2:'")
    st2 = _power_component(
        e, st1.select("mu", "n", "v1", "lam1", F.expr(v0b).alias("v")), dim, prev="v1"
    )
    return st2.select(
        "mu", "n", "v1", "lam1", F.col("v").alias("v2"), F.col("lam").alias("lam2")
    )


@register("embedding_pca_project")
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto the top-2 principal axes.

    Output: (vec_id, label, p1, p2, lam1, lam2) — the 2-D PCA map plus the
    captured variance per axis. The projection pass is zero-shuffle: the
    fitted one-row state broadcasts against the collection and each
    coordinate is an array fold.
    """
    e = table(spark, sf_dir, "embeddings")
    model = fit_pca2(e)
    centered = _CENTERED.format(dim=_DIM)
    proj = (
        "aggregate(sequence(1, {d}), cast(0 as double),"
        " (acc, j) -> acc + element_at(c, j) * element_at({v}, j))"
    )
    return (
        e.join(F.broadcast(model))
        .select("vec_id", "label", F.expr(centered).alias("c"), "v1", "v2",
                "lam1", "lam2")
        .select(
            "vec_id",
            "label",
            F.round(F.expr(proj.format(d=_DIM, v="v1")), 6).alias("p1"),
            F.round(F.expr(proj.format(d=_DIM, v="v2")), 6).alias("p2"),
            F.round("lam1", 6).alias("lam1"),
            F.round("lam2", 6).alias("lam2"),
        )
    )
