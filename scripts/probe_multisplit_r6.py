"""Round-6 probe (VERDICT r5 task 9): the pure-map per-row operators
(repetition_profile, script_profile, html_strip, unicode_hygiene) run
as ONE task on the single-file sf fixtures, so their bench numbers
conflate per-row cost with parallelism. This probe records each shape
at 1 split (the fixture reality) vs 32 splits (`repartition(32)` —
what any real multi-file input gives for free), at 1x and 10x rows.

Expectation: ~linear per-row cost, near-Nx speedup from splits (these
ops have no shuffle, so parallelism is purely input-split-bound).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from demy_spark.session import get_spark  # noqa: E402
from demy_spark.io import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timeit(spark, label, mk):
    spark.catalog.clearCache()
    mk().write.format("noop").mode("overwrite").save()
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.2f}s", flush=True)
    return best


def main():
    from demy_spark.functions import textstats
    from demy_spark.functions.text import (
        strip_control_chars,
        strip_html,
        unicode_normalize,
    )

    spark = get_spark(
        "demy_spark_probe", master="local[32]", shuffle_partitions=16
    )
    docs = load_table(spark, SF_DIR, "documents").localCheckpoint()
    reps = spark.range(10).select(F.col("id").alias("_rep_"))
    docs10 = (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") * 10 + F.col("_rep_"))
        .drop("_rep_")
        .localCheckpoint()
    )
    print(f"docs {docs.count()} -> {docs10.count()}", flush=True)

    def rep_shape(d):
        return d.select(
            "doc_id", textstats.repetition_profile(F.col("text")).alias("p")
        )

    def script_shape(d):
        return d.select(
            "doc_id", textstats.script_profile(F.col("text")).alias("p")
        ).select("doc_id", "p.*")

    def html_shape(d):
        marked = d.withColumn(
            "t",
            F.concat(
                F.lit("<html><body><p>"),
                F.col("text"),
                F.lit("</p><br>&amp;tail</body></html>"),
            ),
        )
        return marked.select("doc_id", strip_html(F.col("t")).alias("clean"))

    def hyg_shape(d):
        norm = unicode_normalize(strip_control_chars(F.col("text")))
        return d.select("doc_id", F.length(norm).alias("n"), norm)

    shapes = {
        "repetition_profile": rep_shape,
        "script_profile": script_shape,
        "html_strip": html_shape,
        "unicode_hygiene": hyg_shape,
    }
    for scale, base in (("1x", docs), ("10x", docs10)):
        for splits in (1, 32):
            d = base if splits == 1 else base.repartition(32).localCheckpoint()
            nparts = d.rdd.getNumPartitions()
            for name, fn in shapes.items():
                timeit(
                    spark,
                    f"{name} {scale} splits={nparts}",
                    lambda d=d, fn=fn: fn(d),
                )
    spark.stop()


if __name__ == "__main__":
    main()
