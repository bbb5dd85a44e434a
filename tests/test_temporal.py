from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from demy_spark.operators.temporal import asof_join, range_join, time_rollup


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", ts("2024-01-01 10:00:05"), 1),
            ("A", ts("2024-01-01 10:00:00"), 2),  # exactly at a quote ts
            ("A", ts("2024-01-01 09:00:00"), 3),  # before any quote
            ("B", ts("2024-01-01 10:30:00"), 4),
            ("C", ts("2024-01-01 10:30:00"), 5),  # key with no quotes
        ],
        ["sym", "t", "trade_id"],
    )
    quotes = spark.createDataFrame(
        [
            ("A", ts("2024-01-01 10:00:00"), 100.0, 1),
            ("A", ts("2024-01-01 10:00:00"), 101.0, 2),  # tie on (key, ts)
            ("A", ts("2024-01-01 10:00:04"), 102.0, 3),
            ("B", ts("2024-01-01 10:00:00"), 50.0, 4),
        ],
        ["sym", "t", "px", "qid"],
    )
    return trades, quotes


def test_asof_backward_match_and_ties(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades,
        quotes,
        on="sym",
        left_ts="t",
        right_ts="t",
        right_cols=["px", "qid"],
        tie_break="qid",
    )
    rows = {r["trade_id"]: r for r in out.collect()}
    assert len(rows) == 5  # every left row kept
    assert rows[1]["px"] == 102.0  # latest quote <= 10:00:05
    assert rows[2]["px"] == 101.0  # inclusive match; tie broken by max qid
    assert rows[3]["px"] is None and rows[3]["matched_ts"] is None
    assert rows[4]["px"] == 50.0
    assert rows[5]["px"] is None  # key never quoted


def test_asof_tolerance(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades,
        quotes,
        on="sym",
        left_ts="t",
        right_ts="t",
        right_cols=["px"],
        tie_break="qid",
        tolerance_seconds=60,
    )
    rows = {r["trade_id"]: r for r in out.collect()}
    assert rows[1]["px"] == 102.0  # 1s old: inside tolerance
    assert rows[4]["px"] is None  # 30min old: nulled out


def test_asof_matches_naive_join_on_fixture(spark, sf_dir):
    from demy_spark.io import load_tables

    t = load_tables(spark, sf_dir)
    ev = t["events"].select("event_id", "user_id", "ts").limit(200)
    orders = t["orders"].select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"
    )
    fast = asof_join(
        ev,
        orders,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey"],
        tie_break="o_orderkey",
    ).select("event_id", "o_orderkey")
    naive = (
        ev.join(orders, on="user_id")
        .where(F.col("o_orderdate") <= F.col("ts"))
        .withColumn(
            "_rk_",
            F.row_number().over(
                Window.partitionBy("event_id").orderBy(
                    F.desc("o_orderdate"), F.desc("o_orderkey")
                )
            ),
        )
        .where(F.col("_rk_") == 1)
        .select("event_id", "o_orderkey")
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, naive.collect()))


def test_range_join_keyed_vs_bucketed(spark):
    points = spark.createDataFrame(
        [("u", ts(f"2024-01-01 10:{m:02d}:00"), m) for m in range(0, 60, 7)],
        ["k", "p", "pid"],
    )
    intervals = spark.createDataFrame(
        [
            ("u", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:15:00"), "w1"),
            ("u", ts("2024-01-01 10:20:00"), ts("2024-01-01 10:40:00"), "w2"),
        ],
        ["k", "s", "e", "wid"],
    )
    keyed = range_join(
        points, intervals, left_point="p", right_start="s", right_end="e", on="k"
    ).select("pid", "wid")
    bucketed = range_join(
        points,
        intervals,
        left_point="p",
        right_start="s",
        right_end="e",
        bucket_seconds=600,
    ).select("pid", "wid")
    expected = {(0, "w1"), (7, "w1"), (14, "w1"), (21, "w2"), (28, "w2"), (35, "w2")}
    assert set(map(tuple, keyed.collect())) == expected
    assert set(map(tuple, bucketed.collect())) == expected


def test_range_join_end_inclusive(spark):
    points = spark.createDataFrame([("u", ts("2024-01-01 10:15:00"), 1)], ["k", "p", "pid"])
    intervals = spark.createDataFrame(
        [("u", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:15:00"), "w")],
        ["k", "s", "e", "wid"],
    )
    kw = dict(left_point="p", right_start="s", right_end="e", on="k")
    assert range_join(points, intervals, **kw).count() == 0
    assert range_join(points, intervals, end_inclusive=True, **kw).count() == 1


def test_time_rollup_grains_and_fill(spark):
    rows = [
        ("a", ts("2024-01-01 00:10:00"), 1.0),
        ("a", ts("2024-01-01 00:50:00"), 2.0),
        ("a", ts("2024-01-01 03:00:00"), 4.0),  # hours 1-2 empty -> gap fill
        ("a", ts("2024-01-02 00:00:00"), 8.0),
        ("b", ts("2024-01-01 05:00:00"), 16.0),
    ]
    df = spark.createDataFrame(rows, ["et", "t", "v"])
    out = time_rollup(
        df,
        ts="t",
        grains=["hour", "day"],
        group_by=["et"],
        metrics={"n": F.count(F.lit(1)), "tv": F.sum("v")},
        fill_gaps=True,
    )
    got = {(r["grain"], r["bucket"], r["et"]): (r["n"], r["tv"]) for r in out.collect()}
    # a spans hour 0 .. next-day hour 0: 25 hourly buckets, gaps zero-filled
    a_hours = [k for k in got if k[0] == "hour" and k[2] == "a"]
    assert len(a_hours) == 25
    assert got[("hour", ts("2024-01-01 00:00:00"), "a")] == (2, 3.0)
    assert got[("hour", ts("2024-01-01 01:00:00"), "a")] == (0, 0.0)
    assert got[("day", ts("2024-01-01 00:00:00"), "a")] == (3, 7.0)
    assert got[("day", ts("2024-01-02 00:00:00"), "a")] == (1, 8.0)
    # b: single bucket at both grains, no fill needed
    assert got[("day", ts("2024-01-01 00:00:00"), "b")] == (1, 16.0)
    assert len([k for k in got if k[2] == "b"]) == 2


def test_time_rollup_single_scan(spark):
    df = spark.createDataFrame([("a", ts("2024-01-01 00:10:00"), 1.0)], ["et", "t", "v"])
    out = time_rollup(df, ts="t", grains=["hour", "day"], group_by=["et"])
    assert {r["grain"] for r in out.collect()} == {"hour", "day"}
    assert out.where(F.col("grain") == "day").collect()[0]["n"] == 1


def test_merge_partials_equals_full_aggregation(spark):
    # merge(agg(A), agg(B)) == agg(A ∪ B) exactly, including keys that
    # appear on only one side (new day in the delta / retired day in
    # the store)
    from pyspark.sql import functions as F

    from demy_spark.operators.temporal import aggregate_partials, merge_partials

    rows_a = [("d1", "x", 10), ("d1", "x", 30), ("d2", "y", 5)]
    rows_b = [("d1", "x", 20), ("d3", "z", 7)]
    schema = "day string, event_type string, cents long"
    a = spark.createDataFrame(rows_a, schema)
    b = spark.createDataFrame(rows_b, schema)
    spec = dict(
        sums={"cents_sum": F.sum("cents")},
        mins={"min_cents": F.min("cents")},
        maxs={"max_cents": F.max("cents")},
    )
    keys = ["day", "event_type"]
    merged = merge_partials(
        aggregate_partials(a, keys, **spec),
        aggregate_partials(b, keys, **spec),
        keys,
        sum_cols=["cents_sum"],
        min_cols=["min_cents"],
        max_cols=["max_cents"],
    )
    full = aggregate_partials(a.unionAll(b), keys, **spec)
    key = lambda r: (r["day"], r["event_type"])  # noqa: E731
    got = {key(r): tuple(r)[2:] for r in merged.collect()}
    want = {key(r): tuple(r)[2:] for r in full.collect()}
    assert got == want
    assert got[("d1", "x")] == (3, 60, 10, 30)
    assert got[("d3", "z")] == (1, 7, 7, 7)
