"""Isolation A/B for bench queries (r11, VERDICT r10 "What's wrong" #3:
the claim "`lsh_parameter_sweep`'s in-suite 4.9 s is suite interference"
rested on an uncommitted re-measure — nothing in the repo reproduced it).

Measures the named queries in a FRESH engine session with ONLY their own
JIT warmup (one sf0.001 run) before timing min-of-5 at the bench SF —
i.e. none of the suite's 80 preceding queries touching the fixture
caches, the JVM code cache, or the OS page cache — and writes the
committed artifact ``BENCH_ISOLATION.md`` with this run's 3-probe
calibration so the numbers stay comparable across VMs. Compare against
the same query's line in the latest ``BENCH_r*.json`` (in-suite): a gap
well beyond the calibration drift is suite interference, not a plan
property.

Usage::

    python tools/isolation_ab.py lsh_parameter_sweep [more_queries...]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv: list[str]) -> int:
    names = argv or ["lsh_parameter_sweep"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entrymod
    from bench import RUNS, _best_of, _calibrate
    from columnar_aware_dedup_spark.session import get_spark

    spark = get_spark("cawd-isolation-ab")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    cal = _calibrate(spark)

    # warmup runs at the smallest sibling SF of the timed dir (falls back
    # to the timed dir itself when no sibling exists) so the tool works
    # on any testdata layout, not just /root/testdata
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    rows = []
    for name in names:
        fn = queries[name]
        # JIT warmup for THIS query only — the suite warms every query,
        # so the isolated number must too or it measures C2 compilation
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        rows.append((name, round(_best_of(fn, spark, sf_dir), 2)))
        print(f"{name}: {rows[-1][1]} s (isolated, min-of-{RUNS}, sf{sf})")

    lines = [
        "# Isolation A/B",
        "",
        "Each query timed min-of-5 in a FRESH session (own JIT warmup "
        "only — no preceding suite). Compare with the same query's line "
        "in the latest BENCH_r*.json (in-suite, same min-of-5 "
        "discipline); normalize across VMs by the calibrations below.",
        "",
        f"This run's calibration: JVM {cal['jvm']} s, python-worker "
        f"{cal['python_worker']} s, parquet-scan {cal['parquet_scan']} s.",
        "",
        f"| query | isolated sf{sf} (s) |",
        "|---|---|",
        *[f"| {n} | {t} |" for n, t in rows],
        "",
        "```json",
        json.dumps(
            {"sf": float(sf), "calibration": cal, "isolated": dict(rows)},
            separators=(",", ":"),
        ),
        "```",
        "",
    ]
    with open(os.path.join(REPO, "BENCH_ISOLATION.md"), "w") as fh:
        fh.write("\n".join(lines))
    print("wrote BENCH_ISOLATION.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
