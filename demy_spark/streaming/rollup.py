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

Durability protocol (foreachBatch is AT-LEAST-ONCE, epoch ids are
CHECKPOINT-scoped, and an in-place overwrite would corrupt the store
if the writer died mid-write):
- The store is VERSIONED: every applied batch writes a complete new
  snapshot under ``store/v=<n>`` (``n`` a store-local counter, NOT the
  epoch id), staged under a dot-prefixed temp dir and directory-renamed
  into place — atomic on HDFS and local filesystems. A crash at any
  point leaves the previous version intact.
- Each version records the (transaction id, epoch) that produced it —
  the Delta ``txnAppId``/``txnVersion`` idempotence pattern, with the
  streaming checkpoint directory as the transaction identity. A
  replayed epoch from the SAME checkpoint (crash-restart redelivery)
  is skipped; a DIFFERENT checkpoint (query rewrite — Spark re-reads
  the whole source) means the incoming epochs re-cover data already in
  the store, so the store is REBUILT from scratch rather than silently
  double-merged (epoch ids are meaningless across checkpoints; merging
  them would be corruption, not recovery).
- Orphaned staging dirs from crashed writes are garbage-collected on
  the next successful commit.
- All filesystem probing goes through the Hadoop FileSystem API, so
  ``hdfs://``/``s3a://`` store paths resolve like Spark's own IO
  (NOTE: object-store directory "rename" is copy-based, not atomic —
  there, back the store with a transactional table format instead).
- One updater per store (the normal continuous-aggregate deployment);
  the version protocol does not arbitrate concurrent WRITERS. External
  READERS racing the updater should raise ``keep_versions`` — the
  default retains only the previous snapshot, which the cleanup may
  delete while a slow concurrent reader still scans it.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession

from demy_spark.operators.temporal import aggregate_partials, merge_partials

__all__ = ["apply_rollup_batch", "read_rollup_store", "streaming_rollup_update"]


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


def _read_txn(spark: SparkSession, store_path: str, version: int):
    fs, _, jvm = _fs(spark, f"{store_path}/v={version}/_txn.json")
    p = jvm.org.apache.hadoop.fs.Path(f"{store_path}/v={version}/_txn.json")
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        data = bytes(stream.readAllBytes())
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


def read_rollup_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Read the newest committed snapshot of a versioned rollup store."""
    versions = _committed_versions(spark, store_path)
    if not versions:
        raise FileNotFoundError(f"no committed rollup version under {store_path}")
    return spark.read.parquet(f"{store_path}/v={versions[-1]}")


def apply_rollup_batch(
    batch_df: DataFrame,
    store_path: str,
    keys: Sequence[str],
    txn_id: str,
    epoch_id: int,
    *,
    sums: dict[str, Column] | None = None,
    mins: dict[str, Column] | None = None,
    maxs: dict[str, Column] | None = None,
    count_col: str = "n",
    keep_versions: int = 2,
) -> bool:
    """Fold one batch into the versioned store; returns True if applied,
    False if skipped as a replay. Idempotence contract:

    - same ``txn_id``, epoch ≤ last applied epoch → REPLAY, skipped;
    - different ``txn_id`` → new query incarnation whose epochs
      re-cover the source from the start, so the existing versions are
      discarded and the store REBUILDS from this transaction's batches
      (never silently double-merged).

    Directly callable for batch backfills and unit tests; the streaming
    updater passes its checkpoint dir as ``txn_id``.
    """
    spark = batch_df.sparkSession
    versions = _committed_versions(spark, store_path)
    last_txn = _read_txn(spark, store_path, versions[-1]) if versions else None
    same_txn = last_txn is not None and last_txn["txn_id"] == txn_id
    if same_txn and epoch_id <= last_txn["epoch"]:
        return False  # at-least-once redelivery of an applied batch
    delta = aggregate_partials(batch_df, list(keys), sums=sums, mins=mins,
                               maxs=maxs, count_col=count_col)
    if versions and same_txn:
        stored = spark.read.parquet(f"{store_path}/v={versions[-1]}")
        merged = merge_partials(
            stored,
            delta,
            list(keys),
            sum_cols=list(sums or ()),
            min_cols=list(mins or ()),
            max_cols=list(maxs or ()),
            count_col=count_col,
        )
        stale = versions  # superseded snapshots (retention-pruned below)
    else:
        merged = delta  # empty store, or a new transaction: rebuild
        stale = versions
    next_v = (versions[-1] + 1) if versions else 0
    staging = f"{store_path}/.staging-v={next_v}"
    merged.write.mode("overwrite").parquet(staging)
    fs, store_jpath, jvm = _fs(spark, store_path)
    txn_path = jvm.org.apache.hadoop.fs.Path(f"{staging}/_txn.json")
    out = fs.create(txn_path, True)
    try:
        out.write(bytearray(json.dumps({"txn_id": txn_id, "epoch": epoch_id}).encode()))
    finally:
        out.close()
    final = jvm.org.apache.hadoop.fs.Path(f"{store_path}/v={next_v}")
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(staging), final):
        raise IOError(f"could not commit rollup version {next_v}")
    # retention: keep the newest (keep_versions - 1) superseded
    # snapshots for slow readers, drop the rest; GC orphaned staging
    # dirs left by crashed writes
    for v in stale[: len(stale) - (keep_versions - 1)]:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{store_path}/v={v}"), True)
    for st in fs.listStatus(store_jpath):
        name = st.getPath().getName()
        if name.startswith(".staging-v=") and name != f".staging-v={next_v}":
            fs.delete(st.getPath(), True)
    return True


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
    keep_versions: int = 2,
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
    rollup-sized frames; history is never re-scanned. The checkpoint
    directory is the store's transaction identity — crash-restart
    replays are skipped, and pointing a NEW checkpoint at an existing
    store rebuilds it (see ``apply_rollup_batch`` and the module
    docstring's durability protocol).
    """

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        apply_rollup_batch(
            batch_df,
            store_path,
            keys,
            checkpoint_dir,
            epoch_id,
            sums=sums,
            mins=mins,
            maxs=maxs,
            count_col=count_col,
            keep_versions=keep_versions,
        )

    return (
        events_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
