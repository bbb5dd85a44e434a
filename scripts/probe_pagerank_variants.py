"""r13 probe: pagerank join-strategy variants on q152's exact graph.

Times one full q152-equivalent evaluation (both modes) per variant and
counts Spark jobs, bench methodology (noop force, warmups, min-of-3).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from demy_spark.session import get_spark  # noqa: E402
from demy_spark.io import load_tables  # noqa: E402
from demy_spark.operators.graph import pagerank  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def q152_like(spark, sf_dir, bmax):
    t = load_tables(spark, sf_dir)
    urgent = (
        t["orders"].where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    )
    su = (
        t["lineitem"]
        .join(urgent, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    pairs = (
        su.alias("a")
        .join(su.alias("b"), (F.col("a.ok") == F.col("b.ok")) & (F.col("a.s") != F.col("b.s")))
        .select(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .persist()
    )
    nodes = t["supplier"].where(F.col("s_suppkey").isNotNull()).select("s_suppkey")

    def run(mode, p):
        return pagerank(
            p, nodes, src="src", dst="dst", node_col="s_suppkey",
            iterations=5, scale=10**12, broadcast_nodes_max=bmax,
        ).select(F.lit(mode).alias("mode"), "s_suppkey", "rank_fp")

    full = run("full", pairs)
    dag = run("dag", pairs.where(F.col("src") < F.col("dst")))
    pairs.unpersist(blocking=True)
    return full.unionByName(dag)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("probe_pr", master=f"local[{cpus}]", shuffle_partitions=min(cpus, 16))
    sc = spark.sparkContext

    for label, bmax in [("broadcast", 4_000_000), ("shuffle", 0)]:
        spark.catalog.clearCache()
        sc.setJobDescription(f"warmup:{label}")
        for _ in range(2):
            force(q152_like(spark, sf_dir, bmax))
        best = float("inf")
        njobs = 0
        for i in range(3):
            sc.setJobGroup(f"m-{label}-{i}", label)
            t0 = time.perf_counter()
            force(q152_like(spark, sf_dir, bmax))
            best = min(best, time.perf_counter() - t0)
            njobs = len(sc.statusTracker().getJobIdsForGroup(f"m-{label}-{i}"))
        sc.setLocalProperty("spark.jobGroup.id", None)
        print(f"RESULT {label}: {best:.3f}s jobs={njobs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
