#!/usr/bin/env python
"""Quick A/B timer: min-of-N wall-clock for named registry queries through
the noop sink, bench-faithful session (``get_spark``, warm run first).

Usage::

    python tools/ab_time.py [-n RUNS] QUERY [QUERY ...]

Prints one ``name seconds`` line per query plus a compact JSON tail.

ADVICE r11: flags are parsed with argparse (any ordering), and the JIT
warmup directory is derived from ``$SPARK_GRAFT_SF_DIR``'s sibling
``sf0.001`` (falling back to the timed dir itself) instead of a
hard-coded ``/root/testdata`` path, so the tool runs on any layout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from columnar_aware_dedup_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-n", "--runs", type=int, default=5)
    ap.add_argument("queries", nargs="+")
    ns = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    spark = get_spark("cawd-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = {}
    for name in ns.queries:
        fn = queries[name]
        # warm at the smallest sibling SF (bench-faithful JIT warmup)
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(ns.runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(name, out[name], flush=True)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
