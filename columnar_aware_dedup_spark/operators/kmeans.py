"""Lloyd k-means trainer for the IVF coarse quantizer (DataFrame-only).

``ann_ivf_topk`` assigns vectors to *fixed medoids* so the cell assignment
stays DuckDB-oracle-checkable; a production IVF index TRAINS its coarse
quantizer. This module is that trainer, expressed entirely as DataFrame
dataflow (no .collect(), no RDDs):

- **assignment**: fold the k centroids into a ONE-ROW array, broadcast it
  against the collection, and take each vector's argmin centroid with a
  per-row array fold (squared-L2 via ``zip_with``+``aggregate``, ties to
  the lowest cell id) — a narrow map with zero shuffle of the collection
  (plan-pinned in ``tests/test_plans.py``);
- **update**: ``posexplode`` the assigned vectors and average per
  (cell, dim) — partial aggregation means the shuffle carries only
  k x dim partial sums per map task, not the vectors;
- **empty cells** keep their previous centroid (the standard Lloyd rule);
- ``localCheckpoint`` truncates lineage each round, the same iterative
  pattern as ``clustering.connected_components``.

At 100 TB: train on a sampled slice (`.sample` keeps it one pass), then
write the collection partitioned by the trained cell for partition-pruned
probes — the assignment plan here IS that write's plan.

Registered HASH-CHECKED (H) since r06 via the tolerance-bit certificate
pattern (:func:`ivf_train_kmeans` — the ``pq_train_codebooks`` discipline):
the per-cell float structure is not SQL-oracle-reproducible across engines,
but exact facts (k cells, all vectors assigned) plus Lloyd invariants
computed from the real trained centroids (inertia non-increase vs the seed,
dimensionality, finiteness) are. The full float table remains as
:func:`ivf_train_kmeans_full`; planted-cluster recovery stays pinned by
``tests/test_kmeans.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from columnar_aware_dedup_spark.io import table
from columnar_aware_dedup_spark.operators.similarity import (
    _DOT_SPARK,
    _L2SQ_SPARK,
    centroid_array,
    nearest_cell_expr,
)
from columnar_aware_dedup_spark.registry import register

_K = 8
_ITERS = 3


def init_centroids(e: DataFrame, k: int) -> DataFrame:
    """Deterministic seed: the k lowest-id vectors, cast to double.

    (k-means|| would sample better-spread seeds; determinism matters more
    here — the trainer's output must be reproducible run-to-run.)
    """
    w = Window.orderBy("vec_id")
    return (
        e.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(w) - 1).alias("cell"),
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("ce"),
        )
    )


def assign_cells(e: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, embedding, cell): nearest centroid, ties to lowest cell.

    Zero-shuffle: the k centroids fold into a one-row array that broadcasts
    against the collection; the argmin is a per-row array fold (unrounded
    squared-L2, id tiebreak — same ordering the r02 window produced, minus
    its 8N-row shuffle+sort; VERDICT r02 finding #2)."""
    cent_arr = centroid_array(cent, id_col="cell", vec_col="ce")
    best = nearest_cell_expr("embedding", rounded=False)
    return e.join(F.broadcast(cent_arr)).select(
        "vec_id", "embedding", best.alias("cell")
    )


def lloyd_train(
    e: DataFrame,
    k: int = _K,
    iters: int = _ITERS,
    seed: DataFrame | None = None,
) -> DataFrame:
    """``iters`` Lloyd rounds; returns the trained (cell, ce) centroid
    table. ``seed`` lets a caller that already built the deterministic seed
    (the certificate query measures pre-training inertia on it) share it
    instead of re-deriving the orderBy/limit job."""
    cent = (
        seed if seed is not None else init_centroids(e, k)
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        assigned = assign_cells(e, cent)
        new = (
            assigned.select(
                "cell", F.posexplode("embedding").alias("pos", "v")
            )
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, m))), s -> s.m)"
                ).alias("new_ce")
            )
        )
        cent = (
            cent.join(new, "cell", "left")
            .select("cell", F.coalesce("new_ce", "ce").alias("ce"))
            .localCheckpoint(eager=True)
        )
    return cent


def ivf_train_kmeans_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the IVF quantizer and report the resulting cell structure.

    One row per cell: member count, centroid L2 norm, and mean within-cell
    squared distance (the per-cell inertia — the quantity Lloyd descends).
    Data-dependent float averages, so not oracle-checkable per cell; intent
    pinned by the planted-cluster tests in ``tests/test_kmeans.py`` and the
    registered certificate query (:func:`ivf_train_kmeans`) hash-checks the
    Lloyd invariants.
    """
    e = table(spark, sf_dir, "embeddings")
    cent = lloyd_train(e)
    assigned = assign_cells(e, cent)
    d2 = F.expr(_L2SQ_SPARK.format(a="embedding", b="ce"))
    return (
        assigned.join(F.broadcast(cent), "cell")
        .select("cell", "vec_id", d2.alias("d2"), F.col("ce"))
        .groupBy("cell")
        .agg(
            F.count("*").alias("n_members"),
            F.round(
                F.sqrt(F.first(F.expr(_DOT_SPARK.format(a="ce", b="ce")))), 6
            ).alias("centroid_norm"),
            F.round(F.avg("d2"), 6).alias("mean_d2"),
        )
        .orderBy("cell")
    )


def _total_inertia(e: DataFrame, cent: DataFrame) -> DataFrame:
    """One row: the Lloyd objective (total min-over-cells squared L2) under
    ``cent`` — the zero-shuffle broadcast argmin plus a global partial
    aggregation. Also carries the assigned-row count and the collection's
    dimensionality (free to fold here; a separate dim pass would cost a
    third corpus scan on the benchmarked path)."""
    cent_arr = centroid_array(cent, id_col="cell", vec_col="ce")
    best_d = F.expr(
        "element_at(array_sort(transform(cents, c -> struct("
        + _L2SQ_SPARK.format(a="embedding", b="c.ce")
        + " AS d, c.cid AS cid))), 1).d"
    )
    return (
        e.join(F.broadcast(cent_arr))
        .select(best_d.alias("d"), F.size("embedding").alias("_dim"))
        .agg(
            F.sum("d").alias("inertia"),
            F.count("*").alias("n_assigned"),
            F.min("_dim").alias("dim"),
        )
    )


KMEANS_TRAIN_ORACLE = f"""
SELECT g.cell,
       (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_assigned,
       {_K} AS k_cells,
       TRUE AS centroid_dim_ok,
       TRUE AS inertia_improved_ok,
       TRUE AS centroid_finite_ok
FROM (SELECT unnest(generate_series(0, {_K - 1})) AS cell) g
ORDER BY g.cell
"""


@register("ivf_train_kmeans", oracle=KMEANS_TRAIN_ORACLE)
def ivf_train_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF Lloyd training, HASH-CHECKED via the tolerance-bit certificate
    pattern that graduated the PQ trainer in r05 (``pq_train_codebooks``).
    One row per trained cell. The LOAD-BEARING bits — the ones a trainer
    bug flips — are computed from the REAL trained centroids:

    - ``centroid_dim_ok``: every trained centroid has the collection's
      dimensionality (catches a dropped/extra posexplode position);
    - ``inertia_improved_ok``: the Lloyd objective under the trained
      centroids <= the objective under the deterministic seed (relative
      tolerance) — Lloyd never increases it, so a broken assign/update
      step flips the bit (falsifiability pinned in ``tests/test_kmeans``);
    - ``centroid_finite_ok``: every centroid coordinate is finite (catches
      NaN propagation from empty-cell division).

    ``n_assigned`` / ``k_cells`` and the k-row key set are shared FRAMING
    facts, not trainer checks: both engines derive them from the same
    constants/corpus count, and the trainer emits exactly k rows by
    construction (seed k rows; the update is a left join + coalesce) —
    they anchor the row grid the bits ride on, nothing more. The full
    per-cell structure table (member counts, centroid norms, mean
    within-cell error) stays available as :func:`ivf_train_kmeans_full`,
    planted-cluster pytest-pinned.
    """
    e = table(spark, sf_dir, "embeddings")
    seed = init_centroids(e, _K)
    cent = lloyd_train(e, seed=seed)
    before = _total_inertia(e, seed).select(
        F.col("inertia").alias("inertia0")
    )
    after = _total_inertia(e, cent)
    per_cell = cent.select(
        "cell",
        F.size("ce").alias("ce_dim"),
        F.expr(
            "aggregate(ce, true, (acc, x) -> acc AND NOT isnan(x)"
            " AND NOT (abs(x) = double('inf')))"
        ).alias("finite"),
    )
    return (
        per_cell.join(F.broadcast(after))
        .join(F.broadcast(before))
        .select(
            "cell",
            F.col("n_assigned").cast("bigint").alias("n_assigned"),
            F.lit(_K).alias("k_cells"),
            (F.col("ce_dim") == F.col("dim")).alias("centroid_dim_ok"),
            # RELATIVE tolerance: the two inertias are independent
            # distributed float sums, so when trained == seed analytically
            # their fp jitter scales with the sum's magnitude — an absolute
            # epsilon on a corpus-scale sum would flake on noise alone.
            (
                F.col("inertia")
                <= F.col("inertia0") * F.lit(1.0 + 1e-9) + F.lit(1e-6)
            ).alias("inertia_improved_ok"),
            F.col("finite").alias("centroid_finite_ok"),
        )
        .orderBy("cell")
    )
