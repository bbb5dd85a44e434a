"""Pins for scripts/freshness.py `carried_over` (VERDICT r12 task 6):
a stale query that missed its own cohort's rotation AND is not being
resolved by the current window must be named explicitly — a budgeted
slip (q99 in r12, q97 in r13) and an accidental registration slip look
identical inside stale_vs_newest, so the tool must separate them.
Semantics are pinned on synthetic rotation states (the live artifact
set changes every round); a live run is checked structurally.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "freshness", os.path.join(REPO, "scripts", "freshness.py")
)
freshness = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(freshness)


def _state(cohorts: dict[int, list[str]]) -> dict[str, int]:
    return {n: rnd for rnd, names in cohorts.items() for n in names}


def test_unresolved_carry_is_named():
    """Post-round state: the r13 artifact landed, q97 (latest r10) sat
    outside the r13 window — it missed the r10 cohort's rotation and
    nothing is resolving it. carried_over must name exactly it; the
    r11 cohort is normal rotation debt, NOT a carry."""
    latest = _state(
        {
            13: [f"a{i}" for i in range(50)],
            12: [f"b{i}" for i in range(50)],
            11: [f"c{i}" for i in range(50)],
            10: ["q97"],
        }
    )
    window = [f"a{i}" for i in range(50)]  # still the r13 window
    rep = freshness.compute(latest, list(latest), window)
    assert rep["carried_over"] == ["q97"]
    # the 50 r11 names are stale (11 < 13-1) but not carried
    assert len(rep["stale_vs_newest"]) == 51


def test_carry_resolved_by_window_is_silent():
    """Rotation-time state (this round's shape): q99 rests on r9, the
    r10 cohort is due, and the current window contains q99 — the carry
    is being resolved, so carried_over is empty."""
    latest = _state(
        {
            12: [f"a{i}" for i in range(50)],
            11: [f"b{i}" for i in range(50)],
            10: [f"c{i}" for i in range(50)],
            9: ["q99"],
        }
    )
    window = ["q99"] + [f"c{i}" for i in range(49)]
    rep = freshness.compute(latest, list(latest), window)
    assert rep["carried_over"] == []


def test_steady_state_has_no_carry():
    """Three clean cohorts, window = oldest cohort: nothing carried."""
    latest = _state(
        {
            12: [f"a{i}" for i in range(50)],
            11: [f"b{i}" for i in range(50)],
            10: [f"c{i}" for i in range(50)],
        }
    )
    rep = freshness.compute(
        latest, list(latest), [f"c{i}" for i in range(50)]
    )
    assert rep["carried_over"] == []
    assert rep["stale_vs_newest"] == sorted(f"c{i}" for i in range(50))


def test_double_carry_lists_both():
    """Two queries resting two cohorts back, only one in the window:
    the other is carried — multiple carries accumulate, not mask."""
    latest = _state(
        {12: [f"a{i}" for i in range(50)], 10: ["old1", "old2", "old3"]}
    )
    # boundary: all three rest on the newest stale cohort itself, so
    # the strictly-older rule keeps them out even though two sit
    # outside the window
    rep = freshness.compute(latest, list(latest), ["old3"])
    assert rep["carried_over"] == []
    # push two older: both become carries, neither masks the other
    latest["old1"] = 9
    latest["old2"] = 9
    rep = freshness.compute(latest, list(latest), ["old3"])
    assert rep["carried_over"] == ["old1", "old2"]


def test_live_report_is_structurally_sound():
    """The repo's real report: carried_over is a subset of
    stale_vs_newest and disjoint from the current window (exact value
    changes when each round's artifact lands, so no value pin here)."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "freshness.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr
    rep = json.loads(out.stdout)
    from demy_spark import queries as Q

    assert set(rep["carried_over"]) <= set(rep["stale_vs_newest"])
    assert not set(rep["carried_over"]) & set(Q._DRIVER_PRIORITY)
