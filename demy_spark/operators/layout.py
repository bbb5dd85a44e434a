"""Storage-layout operators: bucketed tables (shuffle-free co-located
joins), hive-partitioned writes with scan pruning, small-file
compaction, and a programmatic physical-plan audit.

Parity + upgrade rationale: the reference hand-manages layout with
`repartition`/`coalesce` (mllib/src/main/scala/index/implicits.scala:150-152,
mllib/src/main/scala/Model.scala:98) and writes hive-partitioned parquet
(core/src/main/scala/util/util.scala:50-53); it never uses Spark
bucketing, so every fact-fact join in a demy pipeline pays a full
shuffle per run. These operators are the 100 TB levers:

- **Bucketing** persists the shuffle: a fact table bucketed on its join
  key sort-merge-joins an equally-bucketed table with ZERO Exchange —
  the per-run shuffle cost is paid once at write time and amortized
  over every subsequent join. `audit` proves it from the plan.
- **Hive partitioning** turns predicates on the partition column into
  directory pruning — a scan of 3 of 1000 date partitions reads 0.3%
  of the table, before any row-level filter runs.
- **Compaction** bounds file counts: a streaming sink or over-parallel
  writer that leaves 10k tiny files makes every downstream scan pay
  10k task launches; rewriting toward a target in-file size restores
  scan efficiency without changing data.
"""

from __future__ import annotations

import math
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


# ---------------------------------------------------------------------------
# Physical-plan audit
# ---------------------------------------------------------------------------


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (what ``df.explain(mode)`` prints)."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle / broadcast-build) operators in the
    physical plan. The audit primitive: a co-located bucketed join has
    0 below the join; a plain join has 2."""
    plan = plan_string(df, "formatted")
    return sum(1 for line in plan.splitlines() if line.strip().startswith("(") and "Exchange" in line)


def scan_is_bucketed(df: DataFrame) -> bool:
    """True when every file scan in the plan reads bucketed output."""
    plan = plan_string(df, "formatted")
    return "Bucketed: true" in plan and "Bucketed: false" not in plan


# ---------------------------------------------------------------------------
# Bucketed tables
# ---------------------------------------------------------------------------


def ensure_database(spark: SparkSession, database: str, location: str) -> None:
    """Create ``database`` at an explicit filesystem ``location``."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database} LOCATION '{location}'")


def drop_table(spark: SparkSession, table: str) -> None:
    """Drop a managed table AND its on-disk location.

    The in-memory catalog forgets tables between sessions while the
    managed location persists, so a fresh session's `overwrite` write
    hits LOCATION_ALREADY_EXISTS; clearing both makes layout builds
    idempotent across processes.
    """
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    db, _, name = table.rpartition(".")
    if not db:
        return
    try:
        rows = spark.sql(f"DESCRIBE DATABASE {db}").collect()
    except Exception:
        return
    loc = next(
        (r[1] for r in rows if str(r[0]).strip().lower() == "location"), None
    )
    if loc and str(loc).startswith("file:"):
        import shutil

        shutil.rmtree(
            os.path.join(str(loc)[len("file:"):], name), ignore_errors=True
        )


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and per-file sorted)
    on ``bucket_cols``.

    Joins and aggregations on a prefix of the bucket columns then need
    no Exchange: the scan reports its HashPartitioning(bucket_cols,
    num_buckets) and Catalyst drops the shuffle. ``sort_cols`` additionally
    drops the Sort below a sort-merge join. Pick ``num_buckets`` so one
    bucket of the LARGEST co-bucketed table fits an executor core's
    working memory at target scale (e.g. 100 TB / 4096 buckets ≈ 25 GB
    per bucket pre-filter — size to the post-pushdown width).
    """
    if mode == "overwrite":
        drop_table(df.sparkSession, table)
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables shuffle-free.

    The merge hint pins sort-merge (a broadcast would hide the point of
    the layout and re-serialize the small side every run); with both
    sides bucketed identically on the join key the plan has no Exchange
    and — when the tables were written with matching ``sort_cols`` — no
    Sort either.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    cond = on(left, right) if callable(on) else on
    return left.hint("merge").join(right, cond, how)


# ---------------------------------------------------------------------------
# Hive-partitioned layout
# ---------------------------------------------------------------------------


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet write (`partition_col=value/` dirs).

    Reference analog: core/src/main/scala/util/util.scala:50-53
    (`partitionBy` on checkpoint write). Partition columns should be
    low-cardinality (dates, categories): each distinct value is a
    directory, and 10k+ partitions per write stresses the driver's
    file-commit protocol.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def pruned_files(df: DataFrame) -> list[str]:
    """Files the scan ACTUALLY reads, post partition-pruning.

    ``df.inputFiles()`` lists the whole relation regardless of pushed
    predicates, so the audit asks the executed scan itself via
    ``input_file_name()`` — a file outside the selected partitions
    appearing here means pruning did not happen.
    """
    from pyspark.sql import functions as F

    return sorted(
        r[0] for r in df.select(F.input_file_name().alias("f")).distinct().collect()
    )


# ---------------------------------------------------------------------------
# Small-file compaction
# ---------------------------------------------------------------------------


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    *,
    target_file_mb: int = 128,
) -> int:
    """Rewrite a parquet directory into ceil(bytes / target) files.

    Returns the output file count. Local paths size via the filesystem;
    on an object store pass the catalog's size estimate instead. The
    repartition is a round-robin shuffle of the data once — the cost a
    10k-small-file layout re-pays on EVERY downstream scan.
    """
    df = spark.read.parquet(src_path)
    n_files = max(1, math.ceil(_dir_bytes(src_path) / (target_file_mb * 1024 * 1024)))
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return len([f for f in os.listdir(dst_path) if f.endswith(".parquet")])


# ---------------------------------------------------------------------------
# Z-order clustering (multi-column data skipping)
# ---------------------------------------------------------------------------


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bits: int = 8,
    key_col: str = "_z_",
) -> DataFrame:
    """Append an interleaved-bit Z-order key over ``cols``.

    Each column is linearly binned into ``2**bits`` buckets between its
    min and max (one tiny agg, broadcast back — no driver collect, no
    global sort), then the bucket bits are interleaved LSB-first so
    rows close in EVERY dimension get close keys. Hive partitioning
    prunes on one column; sorting by a Z key tightens per-file min/max
    footer stats on ALL interleaved columns at once, so predicates on
    any of them skip files (the Delta/Iceberg OPTIMIZE ZORDER idea,
    here as a plain parquet rewrite).

    Linear binning (not quantile) keeps the formula deterministic and
    SQL-reproducible (queries.q68 recomputes it in DuckDB bit-for-bit);
    heavy skew in a column degrades its bit spread, in which case
    pre-transform the column (e.g. log) before z-ordering.
    """
    from pyspark.sql import functions as F

    if not 1 <= bits <= 16 or len(cols) < 2:
        raise ValueError("need >=2 cols and 1<=bits<=16")
    if bits * len(cols) > 63:
        # shiftleft wraps its amount mod 64 on the JVM, and bit 63 is the
        # sign bit — either silently corrupts the curve. Fail loudly.
        raise ValueError(
            f"bits*len(cols) = {bits * len(cols)} exceeds 63: the interleaved "
            f"key must fit a signed long; use bits<={63 // len(cols)} for "
            f"{len(cols)} columns"
        )
    n = 1 << bits
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"_min_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"_max_{c}")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))

    z = F.lit(0).cast("long")
    width = len(cols)
    for j, c in enumerate(cols):
        rng = F.col(f"_max_{c}") - F.col(f"_min_{c}") + F.lit(1e-9)
        bucket = F.least(
            F.floor((F.col(c).cast("double") - F.col(f"_min_{c}")) * n / rng),
            F.lit(n - 1),
        ).cast("long")
        # bit i of this column lands at position i*width + (width-1-j):
        # LSB-first interleave, first column in the high lane.
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(bucket, i).bitwiseAND(F.lit(1)),
                i * width + (width - 1 - j),
            )
    drop = [f"_{m}_{c}" for c in cols for m in ("min", "max")]
    return out.withColumn(key_col, z).drop(*drop)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    *,
    bits: int = 8,
    num_files: int = 8,
) -> None:
    """Rewrite ``df`` z-ordered on ``cols`` into ``num_files`` parquet
    files: range-partition by the Z key (sampled boundaries — no global
    sort), sort within each file, drop the key. At 100 TB this is the
    periodic clustering job; size ``num_files`` to the target file size
    like compact_parquet."""
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(num_files, "_z_")
        .sortWithinPartitions("_z_")
        .drop("_z_")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_column_spans(path: str, cols: Sequence[str]) -> dict[str, float]:
    """Mean normalized per-file [min, max] span of each column, from
    parquet footer stats (0 = perfectly clustered, 1 = every file spans
    the whole range) — the measurable payoff of zorder_write: engines
    skip a file when the predicate misses its span."""
    import pyarrow.parquet as pq

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    spans: dict[str, list[float]] = {c: [] for c in cols}
    glob_min: dict[str, float] = {}
    glob_max: dict[str, float] = {}
    per_file: dict[str, list[tuple[float, float]]] = {c: [] for c in cols}
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                # Stats can be absent (older writers, disabled stats) and
                # non-numeric (string/binary/timestamp) — skip both rather
                # than crash; a file with no usable stats contributes no span.
                if st is None or not st.has_min_max:
                    continue
                try:
                    mn, mx = float(st.min), float(st.max)
                except (TypeError, ValueError):
                    continue
                lo = mn if lo is None else min(lo, mn)
                hi = mx if hi is None else max(hi, mx)
            if lo is None:
                continue
            per_file[c].append((lo, hi))
            glob_min[c] = min(glob_min.get(c, lo), lo)
            glob_max[c] = max(glob_max.get(c, hi), hi)
    for c in cols:
        if not per_file[c]:
            continue
        rng = (glob_max[c] - glob_min[c]) or 1.0
        spans[c] = [(hi - lo) / rng for lo, hi in per_file[c]]
    return {c: sum(v) / len(v) for c, v in spans.items() if v}
