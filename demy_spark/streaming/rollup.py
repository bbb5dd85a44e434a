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

Durability protocol (foreachBatch is AT-LEAST-ONCE, and an in-place
overwrite would corrupt the store if the writer died mid-write):
- The store is VERSIONED: each applied epoch writes a complete new
  snapshot under ``store/v=<epoch>`` (staged under a dot-prefixed temp
  dir, then directory-renamed into place — atomic on HDFS and local
  filesystems). A crash at any point leaves the previous version
  intact; readers always see a complete snapshot.
- Replays are IDEMPOTENT: an epoch ≤ the newest committed version is
  skipped, so Spark re-delivering a micro-batch after a crash cannot
  double-merge it.
- All filesystem probing goes through the Hadoop FileSystem API, so
  ``hdfs://``/``s3a://`` store paths resolve like Spark's own IO
  (NOTE: object-store directory "rename" is copy-based, not atomic —
  there, back the store with a transactional table format instead).
- One updater per store (the normal continuous-aggregate deployment);
  the version protocol does not arbitrate concurrent writers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession

from demy_spark.operators.temporal import aggregate_partials, merge_partials

__all__ = ["read_rollup_store", "streaming_rollup_update"]

_KEEP_VERSIONS = 2


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def _committed_versions(spark: SparkSession, store_path: str) -> list[int]:
    fs, jpath, _ = _fs(spark, store_path)
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v="):
            out.append(int(name[2:]))
    return sorted(out)


def read_rollup_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Read the newest committed snapshot of a versioned rollup store."""
    versions = _committed_versions(spark, store_path)
    if not versions:
        raise FileNotFoundError(f"no committed rollup version under {store_path}")
    return spark.read.parquet(f"{store_path}/v={versions[-1]}")


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
    the versioned partial-aggregate store at ``store_path`` (created on
    first batch; read it back with ``read_rollup_store``). Returns the
    started StreamingQuery; callers own
    ``awaitTermination``/``processAllAvailable``.

    ``sums``/``mins``/``maxs`` map output names to aggregate
    expressions over the raw batch (quantize floats to integers there
    — integer partials make the store bit-stable under any batch
    slicing). Each epoch costs O(batch) plus one co-keyed merge of two
    rollup-sized frames; history is never re-scanned. Replayed epochs
    are skipped (see the module docstring's durability protocol).
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
        versions = _committed_versions(spark, store_path)
        if versions and epoch_id <= versions[-1]:
            return  # at-least-once replay of an already-merged batch
        delta = aggregate_partials(batch_df, list(keys), **spec)
        if versions:
            stored = spark.read.parquet(f"{store_path}/v={versions[-1]}")
            merged = merge_partials(stored, delta, list(keys), **merge_kw)
        else:
            merged = delta
        staging = f"{store_path}/.staging-v={epoch_id}"
        merged.write.mode("overwrite").parquet(staging)
        fs, _, jvm = _fs(spark, store_path)
        final = jvm.org.apache.hadoop.fs.Path(f"{store_path}/v={epoch_id}")
        if not fs.rename(jvm.org.apache.hadoop.fs.Path(staging), final):
            raise IOError(f"could not commit rollup version {epoch_id}")
        for v in versions[: -(_KEEP_VERSIONS - 1)] if _KEEP_VERSIONS > 1 else versions:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{store_path}/v={v}"), True)

    return (
        events_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
