"""Rotation repair solver: packs the NEXT active window's demand and
re-derives the cascade, mechanically (r10 — the machinery the r09 verdict
asked sessions to run instead of hand-deriving envelope arithmetic).

Demand for the next window R{newest+1} is read from the repo itself:

- never-driver-checked queries (new registrations), from the archives;
- ``SCHEMA_CHANGED[newest+1]`` and ``REWRITTEN[newest+1]`` re-seats.

The solver inserts the demand, evicts the slackest non-demand fills
(latest staleness deadline first; a fill is evictable only when the next
window still satisfies its overdue envelope), cascades window by window,
and folds any residual simulate() violation back into the demand until a
fixpoint; the last window absorbs the cascade plus the previous horizon
edge and is topped up with the oldest projected rows. The result is
verified with the SAME ``simulate`` the tests pin, then written as JSON
for the session to transcribe into ``__init__.py``.

Usage::

    python tools/repair_rotation.py            # prints plan + diffs
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from derive_rotation import archive_state, committed_windows, simulate  # noqa: E402


def build(windows, latest, demand, first, last):
    """Apply per-round demand, cascading the slackest non-demand fills
    into the next window; returns (plan, projected-latest)."""
    lat = dict(latest)
    plan = {}
    for k in range(first, last + 1):
        dem = demand.get(k, set())
        w = sorted(dem - set(windows.get(k, []))) + list(windows.get(k, []))
        if len(w) > 50:

            def deadline(q):
                return lat.get(q, 99) + 4

            evictable = [
                q for q in w if q not in dem and (k + 1) <= deadline(q) + 1
            ]
            evictable.sort(key=lambda q: (-deadline(q), q))
            n_evict = len(w) - 50
            evict = set(evictable[:n_evict])
            assert len(evict) == n_evict, (k, len(evict), n_evict)
            w = [q for q in w if q not in evict]
            demand.setdefault(k + 1, set()).update(evict)
        plan[k] = w
        for q in w:
            lat[q] = k
    return plan, lat


def solve(queries, latest, committed, base_demand):
    """Fixpoint-solve the windows from the committed state; returns the
    verified plan (first..horizon+?) or raises."""
    newest = max(
        int(k) for k in committed
    )  # last prepared window = horizon
    first = min(base_demand) if base_demand else newest
    horizon = newest
    demand = {k: set(v) for k, v in base_demand.items()}
    for _ in range(30):
        dem = {k: set(v) for k, v in demand.items()}
        windows = dict(committed)
        windows[horizon + 1] = sorted(dem.get(horizon + 1, set()))
        plan, lat = build(windows, latest, dem, first, horizon + 1)
        d_last = set(plan[horizon + 1])
        fills = sorted(
            (q for q in queries if q not in d_last),
            key=lambda q: (lat.get(q, 0), q),
        )
        plan[horizon + 1] = sorted(d_last) + fills[: 50 - len(d_last)]
        probs = simulate(plan, latest, queries, first, horizon)
        if not probs:
            return plan
        k, _kind, who = probs[0]
        demand.setdefault(min(k + 1, horizon + 1), set()).update(who)
    raise RuntimeError("repair did not converge in 30 iterations")


def main() -> int:
    import __spark_entry__ as entry
    import columnar_aware_dedup_spark as pkg

    queries = set(entry.queries())
    latest, newest = archive_state()
    committed = {k: list(v) for k, v in committed_windows().items()}
    nxt = newest + 1
    demand = {
        nxt: (queries - set(latest))
        | set(getattr(pkg, "SCHEMA_CHANGED", {}).get(nxt, []))
        | set(getattr(pkg, "REWRITTEN", {}).get(nxt, []))
    }
    plan = solve(queries, latest, committed, demand)
    horizon = max(plan)
    info = [p for p in simulate(plan, latest, queries, nxt, horizon)]
    print(f"plan green through R{horizon - 1}; horizon-edge info: {info}")
    for k in sorted(plan):
        old = set(committed.get(k, []))
        new = set(plan[k])
        assert len(plan[k]) == 50 == len(new), k
        if new != old:
            print(f"== R{k}")
            print("  added:  ", sorted(new - old))
            print("  removed:", sorted(old - new))
    import tempfile

    fd, path = tempfile.mkstemp(
        prefix="rotation_plan_", suffix=".json", dir=REPO
    )
    with os.fdopen(fd, "w") as fh:
        json.dump({str(k): plan[k] for k in plan}, fh, indent=1)
    print(f"plan written to {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
