"""Stateful streaming sessionization test: file-source stream →
applyInPandasWithState → memory sink."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import types as T

from demy_spark.streaming.sessions import sessionize_stream

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_sessionize_stream_closes_on_gap(spark, tmp_path):
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        (1, at(0), 1.0),
        (1, at(5), 2.0),     # same session (gap 30 min)
        (1, at(120), 4.0),   # 115-min jump → closes session 1
        (2, at(0), 8.0),     # single open session, never closed
    ]
    src = os.path.join(str(tmp_path), "events")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    sessions = sessionize_stream(stream, gap_seconds=1800)
    q = (
        sessions.writeStream.outputMode("update")
        .format("memory")
        .queryName("sessions_out")
        .start()
    )
    # ProcessingTimeTimeout schedules periodic state-cleanup batches, so
    # processAllAvailable never settles — poll the sink instead
    import time

    try:
        got = []
        for _ in range(60):
            got = spark.sql("SELECT * FROM sessions_out").collect()
            if got:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert len(got) == 1  # only user 1's first session closed
    r = got[0]
    assert r["user_id"] == 1
    assert r["n_events"] == 2
    assert r["total_value"] == 3.0
    assert r["session_start"] == t0
    assert r["session_end"] == at(5)


def test_capture_to_partitioned_parquet(spark, tmp_path):
    import os

    from demy_spark.streaming.windows import capture_to_partitioned_parquet

    t0 = datetime.datetime(2026, 1, 2, 9, 30, 0)
    rows = [
        (1, t0, 1.0),
        (2, t0 + datetime.timedelta(hours=1), 2.0),
        (3, t0 + datetime.timedelta(hours=1, minutes=5), 3.0),
    ]
    src = os.path.join(str(tmp_path), "in")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)

    out = os.path.join(str(tmp_path), "capture")
    q = capture_to_partitioned_parquet(
        spark.readStream.schema(SCHEMA).parquet(src),
        out,
        checkpoint_dir=os.path.join(str(tmp_path), "ckpt"),
    )
    q.awaitTermination(60)  # availableNow trigger stops by itself

    hours = sorted(
        d for d in os.listdir(os.path.join(out, "_date_=2026-01-02")) if d.startswith("_hour_=")
    )
    assert hours == ["_hour_=10", "_hour_=9"] or hours == ["_hour_=9", "_hour_=10"]
    back = spark.read.parquet(out)
    assert back.count() == 3
    assert back.where("_hour_ = 10").count() == 2


def test_dedup_stream_within_watermark(spark, tmp_path):
    import os

    from demy_spark.streaming.windows import dedup_stream, run_stream_to_memory

    t0 = datetime.datetime(2026, 1, 3, 8, 0, 0)
    rows = [(1, t0, 1.0), (2, t0 + datetime.timedelta(minutes=1), 2.0)]
    src = os.path.join(str(tmp_path), "in")
    # the same rows land twice (two files → two micro-batches), as an
    # at-least-once source would redeliver them
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    deduped = dedup_stream(stream, ["user_id"], ts_col="ts")
    got = run_stream_to_memory(deduped, name="dedup_out")
    assert sorted(r["user_id"] for r in got.collect()) == [1, 2]


def test_dedup_stream_batch_twin(spark):
    t0 = datetime.datetime(2026, 1, 3, 8, 0, 0)
    from demy_spark.streaming.windows import dedup_stream

    df = spark.createDataFrame([(1, t0, 1.0), (1, t0, 1.0), (2, t0, 2.0)], SCHEMA)
    assert dedup_stream(df, ["user_id"]).count() == 2


def test_streaming_hll_registers_match_batch(spark, sf_dir):
    """The HLL register stage is a plain streaming aggregation (max per
    bucket), so distinct-count sketches build incrementally over a
    stream; the estimate applied to the streamed registers equals the
    batch hll_distinct exactly — the mergeable-sketch property, live."""
    import pyspark.sql.functions as F

    from demy_spark.io import load_table
    from demy_spark.operators.sketches import (
        hll_distinct,
        hll_estimate_from_registers,
        hll_registers,
    )
    from demy_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
    )

    stream = read_events_stream(spark, sf_dir)
    regs = hll_registers(stream, "user_id", ["event_type"], p=6)
    got = run_stream_to_memory(regs, "hll_regs", output_mode="complete")
    est_s = {
        r["event_type"]: r["est_distinct"]
        for r in hll_estimate_from_registers(got, ["event_type"], p=6).collect()
    }
    batch = load_table(spark, sf_dir, "events")
    est_b = {
        r["event_type"]: r["est_distinct"]
        for r in hll_distinct(batch, "user_id", ["event_type"], p=6).collect()
    }
    assert est_s == est_b and len(est_s) >= 2


def test_streaming_histogram_quantiles_match_batch(spark, sf_dir):
    """r12: the equi-width histogram's bin stage is a plain streaming
    aggregation (count per literal-derived bin), so histograms build
    incrementally over a stream exactly like the HLL registers above;
    the interpolated quantiles applied to the streamed bins equal the
    batch path bit-for-bit — the last sketch in the family to get its
    stream/batch equality pinned."""
    import pyspark.sql.functions as F

    from demy_spark.io import load_table
    from demy_spark.operators.sketches import (
        equi_width_histogram,
        histogram_quantiles,
    )
    from demy_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
    )

    kw = dict(bins=32, lo=0.0, hi=1000.0)
    stream = read_events_stream(spark, sf_dir)
    bins_s = equi_width_histogram(stream.select("value"), "value", **kw)
    got_bins = run_stream_to_memory(bins_s, "hist_bins", output_mode="complete")
    qs = [0.1, 0.5, 0.9]
    got = sorted(
        map(tuple, histogram_quantiles(got_bins, qs, **kw).collect())
    )
    batch = load_table(spark, sf_dir, "events").select("value")
    want_bins = equi_width_histogram(batch, "value", **kw)
    want = sorted(
        map(tuple, histogram_quantiles(want_bins, qs, **kw).collect())
    )
    assert got == want and len(got) == 3
    # and the streamed bins themselves are the batch bins
    assert sorted(map(tuple, got_bins.collect())) == sorted(
        map(tuple, want_bins.collect())
    )


def test_streaming_bloom_bitmap_matches_batch(spark, sf_dir):
    """r12: the Bloom bitmap's word stage is a bit_or streaming
    aggregation, so the membership gate builds incrementally over a
    stream (the continuously-updated dedup-gate deployment); the
    streamed bitmap is word-for-word the batch bitmap, and probing
    against it gives identical verdicts."""
    import pyspark.sql.functions as F

    from demy_spark.io import load_table
    from demy_spark.operators.sketches import bloom_bitmap, bloom_probe
    from demy_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
    )

    kw = dict(m_bits=1 << 12, n_hashes=5)
    stream = read_events_stream(spark, sf_dir)
    bm_s = bloom_bitmap(stream.select("user_id"), "user_id", **kw)
    got_bm = run_stream_to_memory(bm_s, "bloom_words", output_mode="complete")
    batch = load_table(spark, sf_dir, "events").select("user_id")
    want_bm = bloom_bitmap(batch, "user_id", **kw)
    assert sorted(map(tuple, got_bm.collect())) == sorted(
        map(tuple, want_bm.collect())
    )
    probes = spark.range(0, 2000).select(F.col("id").alias("k"))
    got = sorted(
        map(tuple, bloom_probe(probes, "k", got_bm, **kw).collect())
    )
    want = sorted(
        map(tuple, bloom_probe(probes, "k", want_bm, **kw).collect())
    )
    assert got == want and any(m for _, m in got) and not all(m for _, m in got)


def test_streaming_countmin_counters_match_batch(spark, sf_dir):
    """r12: the count-min counter table is a sum streaming
    aggregation (one weight-1 update fan-out per event), so frequency
    sketches build incrementally; the streamed counter table equals
    the batch operator's (which routes its exact-tf frame through the
    SAME countmin_counters code path) cell-for-cell."""
    from demy_spark.io import load_table
    from demy_spark.operators.sketches import countmin_counters
    from demy_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
    )

    kw = dict(depth=4, width=256)
    stream = read_events_stream(spark, sf_dir)
    cnt_s = countmin_counters(stream.select("event_type"), "event_type", **kw)
    got = run_stream_to_memory(cnt_s, "cm_counters", output_mode="complete")
    batch = load_table(spark, sf_dir, "events").select("event_type")
    want = countmin_counters(batch, "event_type", **kw)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # and per-key weighted routing (what heavy_hitters uses) agrees
    import pyspark.sql.functions as F

    tf = batch.groupBy("event_type").agg(F.count(F.lit(1)).alias("tf"))
    via_tf = countmin_counters(tf, "event_type", weight_col="tf", **kw)
    assert sorted(map(tuple, via_tf.collect())) == sorted(
        map(tuple, want.collect())
    )
