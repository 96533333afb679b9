"""Rotation-window simulator: the ONE model of the staleness invariants.

The driver hash-checks the first 50 registered queries each round
(``ROTATION_R{n}``), and two live tests police freshness:

- never-driver-checked queries must sit in the NEXT window
  (``test_rotation_r{n}_is_prepared_and_fresh``);
- queries whose newest driver row is 3+ rounds behind the newest archive
  must sit in the next window or the one after
  (``test_overdue_queries_are_scheduled``).

Rounds 1..7 derived the forward windows by hand, narrating every
displacement in ``__init__.py`` comments — which works, but each new
registration triggers a seat cascade that took a careful session to
re-pack (and the r07 verdict's history shows how easy those cascades are
to get subtly wrong). This module replays the invariants mechanically:
``simulate`` runs the committed windows forward from the real archives,
assuming each round lands fully green, and reports the first violated
check. ``tests/test_rotation_sim.py`` pins the committed windows to the
horizon recorded there, so any future seat edit that silently shortens
the guarantee fails loudly — and a session adding queries can validate a
re-packing in seconds instead of re-deriving envelope arithmetic by hand.

Usage (from the repo root)::

    python tools/derive_rotation.py          # report horizon + violations
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: staleness wall: a query is overdue when its newest driver row is this
#: many rounds behind the newest archive (mirrors
#: tests/test_registry_oracles.py::test_overdue_queries_are_scheduled).
STALE_AFTER = 3


def archive_state(repo: str = REPO) -> tuple[dict[str, int], int]:
    """(newest driver round per query, newest archive round) from the
    committed CORRECTNESS_r*.json archives."""
    latest: dict[str, int] = {}
    newest = 0
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        newest = max(newest, rnd)
        with open(path) as fh:
            for q in json.load(fh):
                latest[q] = max(latest.get(q, 0), rnd)
    return latest, newest


def simulate(
    windows: dict[int, list[str]],
    latest: dict[str, int],
    queries: set[str],
    start: int,
    end: int,
) -> list[tuple[int, str, list[str]]]:
    """Replay rounds ``start..end`` assuming each window lands fully
    green; return every violated check as (round, kind, offenders).

    Before round k runs, two checks must hold (the live tests' logic):
    never-checked queries ⊆ R{k}, and queries overdue at newest=k-1
    ⊆ R{k} ∪ R{k+1}.
    """
    lat = dict(latest)
    problems: list[tuple[int, str, list[str]]] = []
    for k in range(start, end + 1):
        wk = set(windows.get(k, []))
        never = queries - set(lat)
        if not never <= wk:
            problems.append((k, "never-checked not in window", sorted(never - wk)))
        overdue = {q for q in queries if lat.get(q, 0) <= k - 1 - STALE_AFTER}
        sched = wk | set(windows.get(k + 1, []))
        if not overdue <= sched:
            problems.append((k, "overdue unscheduled", sorted(overdue - sched)))
        for q in wk:
            lat[q] = k
    return problems


def committed_windows() -> dict[int, list[str]]:
    import columnar_aware_dedup_spark as pkg

    out: dict[int, list[str]] = {}
    for n in range(5, 30):
        w = getattr(pkg, f"ROTATION_R{n}", None)
        if w is not None:
            out[n] = list(w)
    return out


def main() -> int:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    queries = set(entry.queries())
    latest, newest = archive_state()
    windows = committed_windows()
    horizon = max(windows)
    probs = simulate(windows, latest, queries, newest + 1, horizon)
    print(f"archives: newest=r{newest}; windows prepared through R{horizon}")
    if not probs:
        print(f"GREEN through round {horizon} (all checks pass)")
        return 0
    first = min(p[0] for p in probs)
    print(f"first violation at round {first}:")
    for k, kind, who in probs:
        print(f"  r{k}: {kind}: {who[:8]}{'...' if len(who) > 8 else ''}")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
