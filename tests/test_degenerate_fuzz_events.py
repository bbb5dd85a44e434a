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
import re

import duckdb
import pytest

from demy_spark import queries as Q
from tests.test_oracle_parity import _rows

_OTHER_TABLES = (
    "region nation customer supplier part orders lineitem documents embeddings"
).split()

EXCLUDED: dict[str, str] = {
    "q121_incremental_rollup": "writes rollup state under the sf dir",
}


def _events_only() -> list[str]:
    out = []
    for name, q in Q.REGISTRY.items():
        sql = q.oracle or ""
        if "events" not in sql or name in EXCLUDED:
            continue
        if any(re.search(rf"\b{t}\b", sql) for t in _OTHER_TABLES):
            continue
        out.append(name)
    return sorted(out)


FUZZ_QUERIES = _events_only()


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
    q = Q.REGISTRY[name]
    spark_pdf = q.fn(spark, fuzz_events_dir).toPandas()
    duck_pdf = fuzz_events_ddb.execute(q.oracle).fetchdf()
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch"
    )
    s_rows, d_rows = _rows(spark_pdf), _rows(duck_pdf)
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
