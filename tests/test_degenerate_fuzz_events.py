"""Degenerate-event oracle fuzz — the temporal-family companion of
test_degenerate_fuzz.py: every registry query whose oracle reads ONLY
the events table replays engine-vs-oracle over a fixture of
pathological events: same-instant duplicates (window/session
tie-breaks), events exactly on hour and window boundaries, NULL and
malformed JSON props, NULL/zero/negative/huge values, one-user skew,
and a NULL event_type.

Timestamps are written as microsecond-precision (the loader
normalizes physical types; the fuzz must not depend on one). NULL ts
is excluded: an event without a time is an ingest bug — the
engine's streaming twins would drop it at the watermark, and batch
semantics for a NULL time bucket are not part of any operator's
contract.
"""

from __future__ import annotations

import datetime
import os

import duckdb
import pytest

from demy_spark import queries as Q
from tests.test_oracle_parity import assert_query_parity, oracle_queries_touching_only

# no exclusions: q121's rollup state lands under the tmp fixture dir
# and was verified to match its oracle on the degenerate events
EXCLUDED: dict[str, str] = {}


FUZZ_QUERIES = oracle_queries_touching_only("events", EXCLUDED)

# slow lane (VERDICT r13 task 1): full-registry oracle replays — run
# with `pytest -m slow`; tests/test_slow_lane_smoke.py keeps a
# representative slice in the default lane.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def fuzz_events_dir(tmp_path_factory):
    from tests.degenerate_fixtures import write_events

    d = tmp_path_factory.mktemp("fuzz_events")
    write_events(str(d))
    return str(d)


@pytest.fixture(scope="module")
def fuzz_events_ddb(fuzz_events_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(fuzz_events_dir, 'events.parquet')}')"
    )
    return con


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_degenerate_events_fuzz_parity(name, spark, fuzz_events_dir, fuzz_events_ddb):
    assert_query_parity(name, spark, fuzz_events_dir, fuzz_events_ddb)
