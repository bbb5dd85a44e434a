"""Latest-round freshness histogram over CORRECTNESS_r*.json — makes
window-rotation debt visible per round without judge archaeology
(VERDICT r9 task 8). Prints one JSON line:

    {"histogram": {"9": 50, "8": 50, ...}, "stale_pre_r8": [...],
     "stale_vs_newest": [...], "unrowed": [...], "carried_over": [...],
     "window_next": [...]}

- histogram: queries by the round of their LATEST official row
- stale_pre_r8: names still resting on a pre-r8 row (r10's done
  criterion is this list being empty)
- stale_vs_newest: names whose latest row is >=2 rounds behind the
  newest artifact (the cadence makes one 50-query cohort stale per
  round — that is normal rotation debt, not a slip)
- unrowed: registered queries with no official row in ANY artifact
  (must all sit inside _DRIVER_PRIORITY)
- carried_over (VERDICT r12 task 6): stale names OUTSIDE the current
  window whose latest row is older than the newest stale cohort —
  i.e. queries that missed their own cohort's rotation and are not
  being resolved by the current window either. A budgeted slip (q99
  in r12, q97 in r13) shows up here the moment the round's artifact
  lands; an ACCIDENTAL registration slip shows up the same way
  instead of hiding inside stale_vs_newest. Empty means every
  overdue query is in the current window.
- window_next: the oldest-rowed queries NOT in the current window
  (up to 60 — a full 50-slot rotation cohort plus spillover), in
  rotation order: the next window is literally this list's head

Run from the repo root: python scripts/freshness.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def compute(
    latest: dict[str, int], registered: list[str], window: list[str]
) -> dict:
    """Pure freshness report over a latest-row map — unit-testable
    without repo artifacts (tests/test_freshness.py pins the
    carried_over semantics on synthetic rotation states)."""
    hist: dict[str, int] = {}
    for rnd in sorted(set(latest.values()), reverse=True):
        hist[str(rnd)] = sum(1 for v in latest.values() if v == rnd)

    newest = max(latest.values(), default=0)
    stale = sorted(n for n, v in latest.items() if v < newest - 1)
    unrowed = sorted(n for n in registered if n not in latest)
    window_set = set(window)
    outside = sorted(
        (n for n in latest if n not in window_set),
        key=lambda n: (latest[n], n),
    )
    # A carry is a stale query older than its own cohort's rotation:
    # strictly older than the newest stale cohort AND not being
    # resolved by the current window.
    newest_stale = max((latest[n] for n in stale), default=0)
    carried = sorted(
        n
        for n in stale
        if latest[n] < newest_stale and n not in window_set
    )
    return {
        "histogram": hist,
        "stale_pre_r8": sorted(n for n, v in latest.items() if v < 8),
        "stale_vs_newest": stale,
        "unrowed": unrowed,
        "carried_over": carried,
        "window_next": outside[:60],
    }


def load_latest() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        for name in json.load(open(f)):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> int:
    sys.path.insert(0, REPO)
    from demy_spark import queries as Q

    report = compute(
        load_latest(), list(Q.REGISTRY), list(Q._DRIVER_PRIORITY)
    )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
