"""SparkSession factory.

Parity: core/src/main/scala/Application.scala:10-54 (session bootstrap).
The reference builds one session per spark-submit run; we expose a
factory with cluster-sane defaults that also behaves on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """Shuffle-partition default: env override, else CPU count."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "demy_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-sane defaults.

    - AQE on: runtime shuffle-partition coalescing, skew-join splitting
      and dynamic broadcast decisions replace hand-tuned repartitions.
    - UTC session timezone: deterministic timestamp semantics (and the
      DuckDB oracle compares naive-UTC values).
    - Arrow on: pandas UDFs and toPandas go through columnar batches.
    """
    cpus = shuffle_partitions or default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # wide agg stages (e.g. the 128-column MinHash signature) must
        # stay in whole-stage codegen; the default cutoff is 100 fields
        .config("spark.sql.codegen.maxFields", "256")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
