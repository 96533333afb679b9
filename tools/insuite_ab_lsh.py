"""In-suite-context A/B for lsh_parameter_sweep (VERDICT r11 #1).

Replicates the bench's in-suite state (JIT warmup of every headline query
at sf0.001, then one sf0.1 pass of every query that precedes the sweep in
HEADLINE), then times three input-derivation variants INTERLEAVED in the
same session (min-of-5 each) so VM drift hits all variants equally:

  fused_eager  — current (r11): one scan, wide frame eagerly checkpointed
  fused_lazy   — same fusion, lazy checkpoint
  revert       — pre-r11: separate sigs scan; sh-only eager checkpoint
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from bench import HEADLINE
from columnar_aware_dedup_spark.session import get_spark
from columnar_aware_dedup_spark.operators import text as T

SF_DIR = "/root/testdata/sf0.1"
WARM_DIR = "/root/testdata/sf0.001"


def inputs_fused_eager(spark, sf_dir):
    fused = (
        T._fanned(spark, sf_dir)
        .select(
            "doc_id",
            *T._minhash_slots_spark(),
            F.expr(
                f"array_sort(array_distinct(transform({T._SHINGLES_SPARK},"
                " s -> xxhash64(s))))"
            ).alias("hsh"),
        )
        .localCheckpoint(eager=True)
    )
    sigs = fused.select("doc_id", *[f"mh{i}" for i in range(T._MINHASH_K)])
    return sigs, fused.select("doc_id", "hsh")


def inputs_fused_lazy(spark, sf_dir):
    fused = (
        T._fanned(spark, sf_dir)
        .select(
            "doc_id",
            *T._minhash_slots_spark(),
            F.expr(
                f"array_sort(array_distinct(transform({T._SHINGLES_SPARK},"
                " s -> xxhash64(s))))"
            ).alias("hsh"),
        )
        .localCheckpoint(eager=False)
    )
    sigs = fused.select("doc_id", *[f"mh{i}" for i in range(T._MINHASH_K)])
    return sigs, fused.select("doc_id", "hsh")


def inputs_revert(spark, sf_dir):
    sigs = T._fanned(spark, sf_dir).select(
        "doc_id", *T._minhash_slots_spark()
    )
    sh = T._hashed_shingle_sets(spark, sf_dir).localCheckpoint(eager=True)
    return sigs, sh


VARIANTS = {
    "fused_eager": inputs_fused_eager,
    "fused_lazy": inputs_fused_lazy,
    "revert": inputs_revert,
}


def main():
    spark = get_spark("r12-lsh-ab")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # bench-faithful warmup: every headline query once at sf0.001
    for name in HEADLINE:
        queries[name](spark, WARM_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    # in-suite context: one sf0.1 pass of every query preceding the sweep
    idx = HEADLINE.index("lsh_parameter_sweep")
    t0 = time.time()
    for name in HEADLINE[:idx]:
        queries[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
    print(f"context pass ({idx} queries): {time.time() - t0:.1f}s",
          flush=True)

    fn = queries["lsh_parameter_sweep"]

    def timed(variant):
        T._sweep_inputs = VARIANTS[variant]
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # one unmeasured round so every variant's codegen is JIT-warm at sf0.1
    for v in VARIANTS:
        timed(v)

    best = {v: float("inf") for v in VARIANTS}
    for r in range(5):
        for v in VARIANTS:
            dt = timed(v)
            best[v] = min(best[v], dt)
            print(f"round {r} {v}: {dt:.2f}s", flush=True)
    print("RESULT " + " ".join(f"{v}={t:.2f}" for v, t in best.items()))


if __name__ == "__main__":
    main()
