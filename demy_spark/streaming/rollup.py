"""Streaming continuous aggregate: maintain a stored partial-aggregate
table from a stream of events via ``foreachBatch`` merge.

The streaming twin of ``operators/temporal.aggregate_partials`` +
``merge_partials`` (q121's batch shape; no reference analog — its
streaming surface is the hourly capture flush,
`twitter/Execute.scala:58-98`, which appends raw files and never
maintains an aggregate): each micro-batch reduces to mergeable integer
partials (count/sum/min/max) and merges into the parquet-backed store
with ONE rollup-sized co-keyed shuffle. Because the partial algebra is
exact (merge(agg(A), agg(B)) == agg(A ∪ B) on integers), the store
equals the from-scratch batch aggregation after ANY micro-batch
slicing — the test asserts that equality.

``foreachBatch`` rather than a native streaming agg because the store
must live OUTSIDE the streaming checkpoint (queryable by any engine,
survivable across query rewrites); the merge itself is the batch
operator verbatim — one code path, zero drift between the stream
updater and a batch backfill.

Write protocol: read-store → merge → overwrite-store is NOT atomic
across concurrent writers; run one updater per store (the normal
continuous-aggregate deployment) or layer a table format with
transactional commit underneath.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame

from demy_spark.operators.temporal import aggregate_partials, merge_partials

__all__ = ["streaming_rollup_update"]


def streaming_rollup_update(
    events_stream: DataFrame,
    store_path: str,
    keys: Sequence[str],
    *,
    sums: dict[str, Column] | None = None,
    mins: dict[str, Column] | None = None,
    maxs: dict[str, Column] | None = None,
    count_col: str = "n",
    checkpoint_dir: str,
):
    """Start an availableNow stream that folds every micro-batch into
    the partial-aggregate store at ``store_path`` (parquet; created on
    first batch). Returns the started StreamingQuery; callers own
    ``awaitTermination``/``processAllAvailable``.

    ``sums``/``mins``/``maxs`` map output names to aggregate
    expressions over the raw batch (quantize floats to integers there
    — integer partials make the store bit-stable under any batch
    slicing). Each epoch costs O(batch) plus one co-keyed merge of two
    rollup-sized frames; history is never re-scanned.
    """
    spark = events_stream.sparkSession
    spec = dict(sums=sums, mins=mins, maxs=maxs, count_col=count_col)
    merge_kw = dict(
        sum_cols=list(sums or ()),
        min_cols=list(mins or ()),
        max_cols=list(maxs or ()),
        count_col=count_col,
    )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        delta = aggregate_partials(batch_df, list(keys), **spec)
        if os.path.exists(store_path):
            stored = spark.read.parquet(store_path)
            merged = merge_partials(stored, delta, list(keys), **merge_kw)
        else:
            merged = delta
        # the store is its own input here: materialize the merge fully
        # before the overwrite clobbers what it reads
        out = merged.localCheckpoint(eager=True)
        out.write.mode("overwrite").parquet(store_path)

    return (
        events_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
