"""Latest-round freshness histogram over CORRECTNESS_r*.json — makes
window-rotation debt visible per round without judge archaeology
(VERDICT r9 task 8). Prints one JSON line:

    {"histogram": {"9": 50, "8": 50, ...}, "stale_pre_r8": [...],
     "unrowed": [...], "window_next": [...]}

- histogram: queries by the round of their LATEST official row
- stale_pre_r8: names still resting on a pre-r8 row (r10's done
  criterion is this list being empty)
- unrowed: registered queries with no official row in ANY artifact
  (must all sit inside _DRIVER_PRIORITY)
- window_next: the oldest-rowed queries NOT in the current window —
  the natural candidates for the next rotation

Run from the repo root: python scripts/freshness.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sys.path.insert(0, REPO)
    from demy_spark import queries as Q

    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        for name in json.load(open(f)):
            latest[name] = max(latest.get(name, 0), rnd)

    hist: dict[str, int] = {}
    for rnd in sorted(set(latest.values()), reverse=True):
        hist[str(rnd)] = sum(1 for v in latest.values() if v == rnd)

    newest = max(latest.values(), default=0)
    stale = sorted(n for n, v in latest.items() if v < newest - 1)
    unrowed = sorted(n for n in Q.REGISTRY if n not in latest)
    window = set(Q._DRIVER_PRIORITY)
    outside = sorted(
        (n for n in latest if n not in window), key=lambda n: (latest[n], n)
    )
    print(
        json.dumps(
            {
                "histogram": hist,
                "stale_pre_r8": sorted(
                    n for n, v in latest.items() if v < 8
                ),
                "stale_vs_newest": stale,
                "unrowed": unrowed,
                "window_next": outside[:10],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
