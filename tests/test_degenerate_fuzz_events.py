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


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def fuzz_events_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    T = "2024-03-01 "
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        # same-instant triple for one user (ordering tie-breaks)
        (1, T + "00:00:00", 1, "click", 1.0, '{"k": "a"}'),
        (2, T + "00:00:00", 1, "view", 2.0, '{"k": "b", "n": 3}'),
        (3, T + "00:00:00", 1, "purchase", 0.0, "{}"),
        # exact hour boundary + one microsecond before it
        (4, T + "00:59:59.999999", 1, "click", -5.0, None),
        (5, T + "01:00:00", 1, "click", 5.0, "not json"),
        # a >30min session gap for the same user
        (6, T + "02:00:00", 1, "view", 1e9, '{"a": {"b": 1}}'),
        # second user: NULL value, NULL event_type, empty-string props
        (7, T + "00:30:00", 2, "signup", None, ""),
        (8, T + "00:45:00", 2, None, 4.0, '{"k": "c"}'),
        (9, T + "23:59:59.999999", 2, "error", 7.0, "[1, 2]"),
        # third user: lone event at epoch-style midnight
        (10, T + "00:00:00", 3, "error", 0.5, '{"k": "a"}'),
    ]
    # skew tail: one user dominating (salted-agg path does real work)
    for i in range(11, 41):
        rows.append(
            (
                i,
                T + f"03:{i % 60:02d}:{(i * 7) % 60:02d}",
                1,
                ["click", "view", "purchase", "error", "signup"][i % 5],
                float(i % 7),
                f'{{"k": "v{i % 3}"}}',
            )
        )
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [_ts(r[1]) for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    d = tmp_path_factory.mktemp("fuzz_events")
    pq.write_table(tbl, str(d / "events.parquet"))
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
