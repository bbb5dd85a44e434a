"""Round-6 late-addition scale probes: phrase_search, c4_rules,
bloom gate and fim_split at 1x vs 10x replicated sf0.1 documents.

What each probe is watching for:
- phrase_search: candidate volume is (query-term df x positions) —
  sublinear headroom comes from the broadcast term filter; a
  super-linear reading would mean the anchor aggregation is blowing
  up on hot terms.
- c4_rules / fim_split: pure per-row maps — expect ~linear.
- bloom: build reduces to a constant-size word frame; expect ~linear
  hash cost and a flat join side.
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


def replicate(df, id_col: str, n: int = 10):
    reps = df.sparkSession.range(n).select(F.col("id").alias("_rep_"))
    return (
        df.crossJoin(F.broadcast(reps))
        .withColumn(id_col, F.col(id_col) * n + F.col("_rep_"))
        .drop("_rep_")
    )


def timeit(spark, label: str, mk) -> float:
    spark.catalog.clearCache()
    mk().write.format("noop").mode("overwrite").save()  # warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.2f}s", flush=True)
    return best


def main() -> None:
    spark = get_spark(
        "demy_spark_probe", master="local[32]", shuffle_partitions=16
    )
    docs = load_table(spark, SF_DIR, "documents")
    docs10 = replicate(docs, "doc_id").localCheckpoint()
    print(f"docs {docs.count()} -> {docs10.count()}")

    from demy_spark.queries import _Q134_QUERIES
    from demy_spark.operators.retrieval import phrase_search

    qdf = spark.createDataFrame(_Q134_QUERIES, "query_id long, qtext string")
    for label, d in (("phrase_search 1x", docs), ("phrase_search 10x", docs10)):
        timeit(
            spark,
            label,
            lambda d=d: phrase_search(
                d, "doc_id", "text", qdf, "query_id", "qtext", k=10
            ),
        )

    from demy_spark.functions.textstats import c4_rules

    for label, d in (("c4_rules 1x", docs), ("c4_rules 10x", docs10)):
        timeit(
            spark,
            label,
            lambda d=d: d.select("doc_id", c4_rules("text").alias("r")),
        )

    from demy_spark.operators.sketches import bloom_bitmap, bloom_probe

    def bloom_gate(d):
        keyed = d.select(
            "doc_id", F.array_join(F.split(F.lower("text"), " "), " ").alias("k")
        )
        build = keyed.where(F.col("doc_id") % 3 != 0).select("k").distinct()
        bm = bloom_bitmap(build, "k", m_bits=1 << 20, n_hashes=7)
        return bloom_probe(keyed, "k", bm, m_bits=1 << 20, n_hashes=7)

    for label, d in (("bloom_gate 1x", docs), ("bloom_gate 10x", docs10)):
        timeit(spark, label, lambda d=d: bloom_gate(d))

    from demy_spark.operators.packing import fim_split

    for label, d in (("fim_split 1x", docs), ("fim_split 10x", docs10)):
        timeit(
            spark,
            label,
            lambda d=d: fim_split(d, "doc_id", "text", rate_pct=50, salt=7),
        )


if __name__ == "__main__":
    main()
