"""Stream-stream interval join: watermarked streaming result must match
the batch twin pair-for-pair, and unbounded streaming joins must be
impossible to build by accident (state-eviction condition required)."""

from __future__ import annotations

from pyspark.sql import functions as F

from demy_spark.io import load_tables
from demy_spark.streaming.joins import interval_join
from demy_spark.streaming.windows import read_events_stream


def _batch_pairs(spark, sf_dir):
    ev = load_tables(spark, sf_dir)["events"]
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return interval_join(clicks, purchases, on="user_id", upper="30 minutes")


def test_stream_join_matches_batch(spark, sf_dir):
    left = read_events_stream(spark, sf_dir).where(
        F.col("event_type") == "click"
    ).select("event_id", "user_id", "ts")
    right = read_events_stream(spark, sf_dir).where(
        F.col("event_type") == "purchase"
    ).select("event_id", "user_id", "ts")

    joined = interval_join(left, right, on="user_id", upper="30 minutes")
    assert joined.isStreaming

    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    }

    want = {
        (r["event_id"], r["r_event_id"]) for r in _batch_pairs(spark, sf_dir).collect()
    }
    assert want, "fixture produced no click→purchase pairs"
    # Inner stream-stream joins emit every match once all inputs arrive.
    assert got == want


def test_batch_twin_single_shuffle(spark, sf_dir):
    from demy_spark.operators.layout import exchange_count

    pairs = _batch_pairs(spark, sf_dir)
    # One shuffle per side of the equi-join at most — the interval is a
    # residual predicate, never a cross-product.
    assert exchange_count(pairs) <= 3


def test_stream_batch_mix_rejected(spark, sf_dir):
    import pytest

    stream = read_events_stream(spark, sf_dir)
    batch = load_tables(spark, sf_dir)["events"]
    with pytest.raises(ValueError, match="both sides"):
        interval_join(stream, batch, on="user_id")


def test_batch_outer_keeps_unmatched(spark, sf_dir):
    """Left-outer batch interval join must keep clicks with no purchase
    in-window (null right columns), not silently degrade to inner —
    the interval predicate lives inside the join condition."""
    ev = load_tables(spark, sf_dir)["events"]
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    inner = interval_join(clicks, purchases, on="user_id", upper="30 minutes")
    left = interval_join(
        clicks, purchases, on="user_id", upper="30 minutes", how="left"
    )
    n_clicks = clicks.count()
    matched_clicks = inner.select("event_id").distinct().count()
    assert matched_clicks < n_clicks, "fixture should leave some clicks unmatched"
    # every click appears; unmatched ones exactly once with null right ts
    assert left.select("event_id").distinct().count() == n_clicks
    unmatched = left.where(F.col("r_ts").isNull())
    assert unmatched.count() == n_clicks - matched_clicks
    # inner rows are identical to the left join's matched rows
    assert left.where(F.col("r_ts").isNotNull()).count() == inner.count()


def test_right_outer_alias_spelling_keeps_keys(spark, sf_dir):
    """Spark accepts 'rightouter' as a spelling of 'right_outer'; the
    key coalesce must fire for every accepted spelling or right-only
    rows silently lose their join key (round-2 ADVICE finding)."""
    ev = load_tables(spark, sf_dir)["events"]
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    for how in ("right_outer", "rightouter"):
        j = interval_join(
            clicks, purchases, on="user_id", upper="30 minutes", how=how
        )
        # every output row keeps a non-null user_id — right-only rows
        # get theirs from the coalesced right key
        assert j.where(F.col("user_id").isNull()).count() == 0, how
