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


def test_residue_beyond_horizon_is_only_new_registrations():
    """Past the pinned horizon the ONLY acceptable gap is this round's
    new registrations needing their second driver row (named above) —
    anything else means a previously-covered query lost its seat."""
    import __spark_entry__ as entry

    latest, newest = archive_state()
    never_checked = set(entry.queries()) - set(latest)
    problems = simulate(
        committed_windows(), latest, set(entry.queries()), newest + 1, GREEN_THROUGH + 1
    )
    offenders = {q for _k, _kind, who in problems for q in who}
    allowed = never_checked | RESIDUE_ALLOWLIST
    assert offenders <= allowed, (
        f"non-new queries fall through the horizon: "
        f"{sorted(offenders - allowed)}"
    )
