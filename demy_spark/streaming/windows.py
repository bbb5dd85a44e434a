"""Structured Streaming windows over event streams.

The reference ingests streams with a hand-rolled ring buffer flushed to
hourly gzip files (twitter/src/main/scala/Execute.scala:32-98) and has
no Spark Streaming at all (SURVEY §2.12). Here the same hourly-file
semantics are native Structured Streaming: file source → watermark →
tumbling window → sink, which adds late-data correctness and
exactly-once sinks for free and scales with executor count instead of
one ingest JVM.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _event_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (one file per
    micro-batch in tests; a directory of hourly files in production —
    exactly the reference's capture layout, consumed incrementally).

    The file source requires a directory of FILES; the table is
    staged (symlinked) into a scratch dir — a single-file fixture as
    one link, a multi-file table as one link per part (the file
    source does not recurse into nested directories)."""
    import glob as _glob
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    stage = os.path.join(
        tempfile.gettempdir(), "demy_stream_" + sf_dir.strip("/").replace("/", "_")
    )
    os.makedirs(stage, exist_ok=True)
    if os.path.isdir(src):
        for part in sorted(
            _glob.glob(os.path.join(src, "**", "*.parquet"), recursive=True)
        ):
            link = os.path.join(
                stage, os.path.relpath(part, src).replace(os.sep, "-")
            )
            if not os.path.exists(link):
                os.symlink(part, link)
    else:
        link = os.path.join(stage, "events.parquet")
        if not os.path.exists(link):
            os.symlink(src, link)

    # The fixture's ts physical type varies (nanos in some generations,
    # micros in others; tz-aware in neither so far, but probe attributes,
    # not the str() spelling, so a tz-aware fixture routes correctly);
    # nanos must be read as long (Spark has no nanos timestamp) and
    # rescaled, micros read natively then normalized to TIMESTAMP. Pin the
    # session to UTC here — not just in load_tables — so the NTZ→timestamp
    # cast never shifts instants in a non-UTC driver session.
    import pyarrow.parquet as pq

    from demy_spark.io import first_parquet_file

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # dir-safe: a multi-file events table probes its first part file;
    # an EMPTY directory (day with no events) streams nothing — treat
    # it as tz-less micros rather than crashing the probe
    probe = first_parquet_file(src)
    ts_type = pq.read_schema(probe).field("ts").type if probe else None
    ts_is_nanos = getattr(ts_type, "unit", None) == "ns"
    ts_is_tz = getattr(ts_type, "tz", None) is not None
    if ts_is_nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = _event_schema(T.LongType())
    elif ts_is_tz:
        # tz-aware micros: Spark reads as TIMESTAMP (instant) directly.
        schema = _event_schema(T.TimestampType())
    else:
        schema = _event_schema(T.TimestampNTZType())
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    if ts_is_nanos:
        return stream.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def hourly_event_aggregate(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data
    tolerance ``watermark``. Works on both batch and streaming frames
    (same plan — the batch twin is queries.q12_events_hourly)."""
    df = events
    if events.isStreaming:
        df = df.withWatermark("ts", watermark)
    return df.groupBy(F.window("ts", window).alias("win"), "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value")
    )


def sliding_event_aggregate(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window counts/cent-sums per event_type — every event
    lands in window/slide overlapping windows. Works on both batch and
    streaming frames (same plan — the batch twin is
    queries.q120_events_sliding); Spark's TimeWindow generates all
    assignments JVM-side, no explode, and in streaming mode the
    watermark bounds the open-window state."""
    df = events
    if events.isStreaming:
        df = df.withWatermark("ts", watermark)
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    return df.groupBy(F.window("ts", window, slide).alias("win"), "event_type").agg(
        F.count("*").alias("n"), (F.sum(cents) / 100.0).alias("total_value")
    )


def capture_to_partitioned_parquet(
    events: DataFrame,
    path: str,
    *,
    checkpoint_dir: str,
    partition_granularity: str = "hour",
    trigger_seconds: int | None = None,
):
    """Streaming capture sink: events land as parquet partitioned by
    (date, hour) — the reference's hourly-gzip-file capture loop
    (twitter/Execute.scala:58-98) as an exactly-once Structured
    Streaming sink. Returns the started StreamingQuery.

    Scale notes: partitioning by coarse time buckets keeps file counts
    bounded and makes downstream scans partition-prunable on date/hour;
    the checkpoint dir gives restart-without-duplication (the reference's
    ring buffer loses its buffer on crash)."""
    cols = [F.to_date("ts").alias("_date_")]
    if partition_granularity == "hour":
        cols.append(F.hour("ts").alias("_hour_"))
    out = events.select("*", *cols)
    writer = (
        out.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy(*[c for c in ("_date_", "_hour_")[: len(cols)]])
        .outputMode("append")
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(
    events: DataFrame,
    key_cols: list[str] | tuple[str, ...] = ("event_id",),
    *,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication on ``key_cols``: at-least-once
    sources (file re-lists, kafka redeliveries, capture-loop replays)
    become exactly-once event streams.

    Uses ``dropDuplicatesWithinWatermark`` so the dedup state is
    BOUNDED: a key is remembered only until the watermark passes it,
    instead of growing forever like plain ``dropDuplicates`` on a
    stream — the difference between a pipeline that survives months of
    uptime at 100 TB and one that OOMs on state. Batch frames fall
    back to plain ``dropDuplicates`` (same result on finite input —
    the batch twin of queries.q18's content dedup, keyed not hashed)."""
    cols = list(key_cols)
    if not events.isStreaming:
        return events.dropDuplicates(cols)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(cols)


def run_stream_to_memory(
    agg: DataFrame, name: str = "stream_out", output_mode: str = "append"
) -> DataFrame:
    """Drive a streaming aggregate to completion against the available
    input (test harness: memory sink + processAllAvailable)."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return agg.sparkSession.sql(f"SELECT * FROM {name}")
