"""Structured Streaming operators."""

from demy_spark.streaming.windows import (  # noqa: F401
    hourly_event_aggregate,
    read_events_stream,
    run_stream_to_memory,
)
