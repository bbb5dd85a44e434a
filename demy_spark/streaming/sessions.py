"""Stateful streaming sessionization (custom stateful operator).

The reference has no streaming state at all (SURVEY §2.12) — its
"sessions" are batch jobs over hourly files. The PySpark-native engine
gets a real stateful operator: per-user session windows with an
inactivity gap, built on ``applyInPandasWithState`` (Arrow-batched
state, per-key timeouts) — the Structured Streaming twin of the batch
sessionization query (queries.q13_sessionize).

Scale notes: state is partitioned by the grouping key across executors
(RocksDB/HDFS-backed state store on a cluster); each invocation sees
one key's micro-batch rows as pandas. Sessions close either by seeing
a row beyond the gap or by processing-time timeout, so state size is
bounded by active keys, not history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _us(ts) -> int:
    return int(ts.value // 1_000) if hasattr(ts, "value") else int(ts)


def make_session_fn(gap_seconds: int):
    """Builds the per-key state-update function: rows extend the open
    session while within ``gap_seconds`` of the last event; a larger
    jump (or a timeout) emits the closed session and opens a new one."""
    import pandas as pd

    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n, total = state.get
                closed.append((user_id, start_us, last_us, n, total))
                state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
            if state.exists:
                start_us, last_us, n, total = state.get
            else:
                start_us, last_us, n, total = None, None, 0, 0.0
            for ts, value in zip(rows["ts"], rows["value"]):
                t = _us(ts)
                if last_us is not None and t - last_us > gap_us:
                    closed.append((user_id, start_us, last_us, n, total))
                    start_us, n, total = t, 0, 0.0
                if start_us is None:
                    start_us = t
                last_us = t
                n += 1
                total += float(value)
            state.update((start_us, last_us, n, total))
            state.setTimeoutDuration(gap_seconds * 1000)
        if closed:
            out = pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            out["total_value"] = out["total_value"].round(2)
            yield out

    return update


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 1800, key_col: str = "user_id"
) -> DataFrame:
    """Per-key session windows over a stream with ``ts``/``value``
    columns. Emits one row per CLOSED session (update output mode)."""
    return events.groupBy(key_col).applyInPandasWithState(
        make_session_fn(gap_seconds),
        outputStructType=SESSION_OUTPUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
