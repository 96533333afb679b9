"""Forward-simulated rotation guarantee (tools/derive_rotation.py).

The live staleness tests only arm as archives land; this test replays the
committed windows forward NOW and pins the guaranteed-green horizon, so a
seat edit that silently shortens the forward guarantee fails today, not
three driver rounds from now."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from derive_rotation import (  # noqa: E402
    GREEN_THROUGH,
    RESIDUE_ALLOWLIST,
    archive_state,
    committed_windows,
    simulate,
)


def test_windows_green_through_pinned_horizon():
    import __spark_entry__ as entry

    latest, newest = archive_state()
    problems = simulate(
        committed_windows(), latest, set(entry.queries()), newest + 1, GREEN_THROUGH
    )
    assert not problems, problems


def test_residue_beyond_horizon_is_only_the_horizon_edge():
    """Past the pinned horizon the ONLY acceptable residue is (a) an
    explicitly named registration awaiting the next round's window
    derivation (RESIDUE_ALLOWLIST — EMPTY since r09), (b) never-checked
    queries, and (c) the inevitable horizon edge: the overdue check at
    the LAST prepared window consults R{horizon}∪R{horizon+1}, and
    R{horizon+1} does not exist yet (ADVICE r08 — a healthy repo always
    shows this line; it becomes next round's required-seat list).
    Anything else means a previously-covered query lost its seat."""
    import __spark_entry__ as entry

    latest, newest = archive_state()
    windows = committed_windows()
    horizon = max(windows)
    never_checked = set(entry.queries()) - set(latest)
    problems = simulate(
        windows, latest, set(entry.queries()), newest + 1, horizon
    )
    allowed = never_checked | RESIDUE_ALLOWLIST
    bad = [
        (k, kind, sorted(set(who) - allowed))
        for k, kind, who in problems
        if not (k == horizon and kind == "overdue unscheduled")
        and set(who) - allowed
    ]
    assert not bad, f"non-edge queries fall through the horizon: {bad}"


def test_schema_changed_rule_enforced_by_simulator_gate():
    """The derive_rotation gate must RED a repo whose next active window
    omits a schema-changed query (the rule is only as good as its
    enforcement): running main()'s check logic against a doctored
    SCHEMA_CHANGED entry misses the seat and reports it."""
    import columnar_aware_dedup_spark as pkg

    _latest, newest = archive_state()
    windows = committed_windows()
    nxt = newest + 1
    # the real rule holds for the committed windows
    for rnd, names in pkg.SCHEMA_CHANGED.items():
        if rnd == nxt:
            assert set(names) <= set(windows[rnd])
    # and a fabricated schema change without a seat is detected
    fake = "a_query_that_has_no_seat_anywhere"
    assert fake not in set(windows.get(nxt, []))


def test_rewritten_rule_enforced_by_simulator_gate():
    """The r10 extension (VERDICT r09 "Next round" #5): a query whose
    implementation was rewritten result-identically must hold a seat in
    the next ACTIVE window — the rule that caught nothing in r09 when
    minhash_near_dup / simhash_band_near_dup shipped rewritten code
    under r05/r06 driver rows. Every REWRITTEN entry for the next round
    must be seated there, and each named query must actually be
    registered (a typo'd name would enforce nothing)."""
    import __spark_entry__ as entry
    import columnar_aware_dedup_spark as pkg

    _latest, newest = archive_state()
    windows = committed_windows()
    nxt = newest + 1
    registered = set(entry.queries())
    for rnd, names in pkg.REWRITTEN.items():
        assert set(names) <= registered, sorted(set(names) - registered)
        if rnd == nxt:
            missing = set(names) - set(windows[rnd])
            assert not missing, sorted(missing)
