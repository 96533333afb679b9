"""(Re-)pin the numeric drift snapshot for ``orc_stats_census_drift``
(r11): compute the ORC stats-pruned dedup census (the
``orc_stats_pruned_dedup_full`` twin) at every test/driver/bench scale
and commit the values to ``columnar_aware_dedup_spark/pinned/
orc_stats_census.json``. Run ONLY from a state whose driver window is
green — the pin asserts "these numbers are known-good", so pinning over
a regression launders it.

Usage::

    python tools/pin_full_twins.py            # pins sf0.001/sf0.01/sf0.1
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SFS = ("sf0.001", "sf0.01", "sf0.1")


def main() -> int:
    from columnar_aware_dedup_spark.operators.drift import (
        _CENSUS_FIELDS,
        PINNED_PATH,
    )
    from columnar_aware_dedup_spark.operators.zonemap import (
        orc_stats_pruned_dedup_full,
    )
    from columnar_aware_dedup_spark.session import get_spark

    spark = get_spark("pin-full-twins")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, list[dict]] = {}
    for sf in SFS:
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            print(f"skip {sf}: no testdata dir")
            continue
        rows = orc_stats_pruned_dedup_full(spark, sf_dir).collect()
        out[sf] = [
            {"file_name": r["file_name"],
             **{c: r[c] for c in _CENSUS_FIELDS}}
            for r in sorted(rows, key=lambda r: r["file_name"])
        ]
        print(f"pinned {sf}: {len(out[sf])} files")
    os.makedirs(os.path.dirname(PINNED_PATH), exist_ok=True)
    with open(PINNED_PATH, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {PINNED_PATH}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
