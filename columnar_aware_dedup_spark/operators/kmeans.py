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

Registered rows-only (R): data-dependent float averages are not
SQL-oracle-reproducible across engines; correctness is pinned by
planted-cluster recovery tests (``tests/test_kmeans.py``).
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


def lloyd_train(e: DataFrame, k: int = _K, iters: int = _ITERS) -> DataFrame:
    """``iters`` Lloyd rounds; returns the trained (cell, ce) centroid table."""
    cent = init_centroids(e, k).localCheckpoint(eager=True)
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


@register("ivf_train_kmeans")
def ivf_train_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the IVF quantizer and report the resulting cell structure.

    One row per cell: member count, centroid L2 norm, and mean within-cell
    squared distance (the per-cell inertia — the quantity Lloyd descends).
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
