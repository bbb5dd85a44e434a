"""Stream-stream event-time interval joins.

The reference has no streaming joins at all (SURVEY §2.12 — ingestion
is a hand-rolled ring buffer, twitter/src/main/scala/Execute.scala:32-98;
event correlation happens in Airflow-scheduled batch jobs). This module
is the Spark-native upgrade: a watermarked stream-stream join whose
state is BOUNDED by the watermark + interval width, so "purchases
within 30 minutes of a click" runs continuously instead of re-scanning
a day of capture files per batch run.

The same plan shape works on batch frames (watermarks are skipped), so
every streaming pipeline has an identical-semantics batch twin — that
twin is what the DuckDB oracle checks (queries.q67_event_followup).

Scale notes (100 TB / unbounded):
- Both sides MUST carry watermarks and the join condition MUST bound
  event time on both sides; otherwise Spark keeps all state forever.
  `interval_join` refuses to build an unbounded streaming join.
- State size ≈ input rate × (watermark delay + interval width) per
  side — independent of total stream history.
- The batch twin is a co-keyed equi-join with the interval as residual
  predicate: one shuffle on the key, no row blow-up beyond true
  matches (same shape as operators/temporal.range_join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "30 minutes",
    lower_inclusive: bool = False,
    upper_inclusive: bool = True,
    watermark: str = "2 hours",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Join right rows whose ``right_ts`` falls in
    ``(left_ts + lower, left_ts + upper]`` (bounds configurable) for
    matching ``on`` keys. Works identically on batch and streaming
    frames; on streams both sides are watermarked and the time bound
    doubles as the state-eviction condition.

    Right columns (except the join keys) come back prefixed with
    ``right_prefix`` so self-joins stay unambiguous.
    """
    keys = [on] if isinstance(on, str) else list(on)

    streaming = left.isStreaming or right.isStreaming
    if streaming:
        if not (left.isStreaming and right.isStreaming):
            raise ValueError("stream-batch interval joins: make both sides streams")
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)

    r = right
    renames = {}
    for c in right.columns:
        # Keys get an unambiguous temp name too, so the post-join coalesce
        # and drop never hit duplicate-name resolution.
        newc = f"__rk_{c}" if c in keys else right_prefix + c
        if newc in left.columns:
            raise ValueError(f"prefixed column {newc} collides with left side")
        renames[c] = newc
        r = r.withColumnRenamed(c, newc)
    rts = renames.get(right_ts, right_ts)

    lo = F.col(left_ts) + F.expr(f"INTERVAL {lower}")
    hi = F.col(left_ts) + F.expr(f"INTERVAL {upper}")
    cond = F.col(rts) >= lo if lower_inclusive else F.col(rts) > lo
    cond = cond & (F.col(rts) <= hi if upper_inclusive else F.col(rts) < hi)

    # Both batch and streaming put the interval predicate INSIDE the join
    # condition: streaming needs it there for state eviction, and batch
    # needs it there so non-inner `how` keeps unmatched rows (a post-join
    # .where() would silently drop null-extended rows, degrading outer
    # joins to inner semantics).
    key_cond = None
    for k in keys:
        eq = F.col(k) == F.col(f"__rk_{k}")
        key_cond = eq if key_cond is None else (key_cond & eq)
    joined = left.join(r, key_cond & cond, how)
    # Collapse to one key column per key. For right/full joins the left key
    # is null on right-only rows, so coalesce both sides first. Spark
    # accepts 'rightouter'/'fullouter' alias spellings too — normalize
    # before the membership test so no accepted input skips the coalesce.
    how_norm = how.replace("_", "").lower()
    for k in keys:
        if how_norm in ("right", "rightouter", "full", "fullouter", "outer"):
            joined = joined.withColumn(k, F.coalesce(F.col(k), F.col(f"__rk_{k}")))
        joined = joined.drop(f"__rk_{k}")
    return joined
