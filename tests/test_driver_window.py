"""Guards on the correctness-driver window contract: the driver
verifies the FIRST 50 entries of queries(), so rotation edits to
_DRIVER_PRIORITY must keep the list exactly 50 well-formed slots and
every never-rowed registration must be inside them.
"""

from __future__ import annotations

import json
import os
import re

from demy_spark import queries as Q

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_priority_list_is_exactly_the_window():
    assert len(Q._DRIVER_PRIORITY) == 50
    assert len(set(Q._DRIVER_PRIORITY)) == 50, "duplicate window slots"
    unknown = [n for n in Q._DRIVER_PRIORITY if n not in Q.REGISTRY]
    assert not unknown, f"window names not in REGISTRY: {unknown}"


def test_ordered_registry_puts_window_first():
    names = list(Q.queries())
    assert names[:50] == [n for n in Q._DRIVER_PRIORITY]
    assert sorted(names) == sorted(Q.REGISTRY)


def test_every_query_is_oracle_backed():
    missing = [n for n, q in Q.REGISTRY.items() if not q.oracle]
    assert not missing, f"rows-only queries: {missing}"


def test_never_rowed_registrations_are_in_window():
    """Any registered query with no row in ANY CORRECTNESS_r*.json
    artifact must sit in the first 50 — a new registration left outside
    the window would close the round without a correctness row."""
    rowed: set[str] = set()
    for f in os.listdir(REPO):
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", f):
            rowed.update(json.load(open(os.path.join(REPO, f))))
    never_rowed = [n for n in Q.REGISTRY if n not in rowed]
    window = set(Q._DRIVER_PRIORITY)
    outside = [n for n in never_rowed if n not in window]
    assert not outside, f"never-rowed registrations outside the window: {outside}"
