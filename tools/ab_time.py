#!/usr/bin/env python
"""Quick A/B timer: min-of-N wall-clock for named registry queries through
the noop sink, bench-faithful session (``get_spark``, warm run first).

Usage::

    python tools/ab_time.py [-n RUNS] QUERY [QUERY ...]

Prints one ``name seconds`` line per query plus a compact JSON tail.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from columnar_aware_dedup_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs = 5
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    spark = get_spark("cawd-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = {}
    for name in names:
        fn = queries[name]
        # warm at sf0.001 (bench-faithful JIT warmup)
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(name, out[name], flush=True)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
