"""Round-13 scale probe (VERDICT r12 task 5): the WEIGHTED
quantile-sketch build at 1x vs 10x rows under a Zipfian value column
with a hot (group, value) pair.

The r12 10x probe exercised the unweighted single-shuffle path; the
weighted build adds a pre-aggregation groupBy(keys, shard, value) whose
skew behavior under a hot pair was unprobed. The hypothesis being
checked: the hot (group, value) pair is absorbed MAP-SIDE by partial
hash aggregation (it collapses to one row per input partition before
the shuffle), so the weighted build stays in the same ~2x-for-10x band
as the unweighted path instead of serializing on the hot key's reduce
partition.

Value distribution: v = floor(1/u) for u ~ U(0,1] derived from
xxhash64(l_orderkey, l_linenumber) — Zipf(1)-shaped, so value 1 alone
carries ~50% of all rows (the hot pair, per group). Weights are
token-count-like small ints (1 + l_linenumber). capacity=64 keeps the
compression path ACTIVE at both scales; shard_key defaults to the
value column — the realistic weighted-histogram usage, where the hot
value CANNOT be spread across shards and partial agg is the only
defense.

Run: python scripts/probe_quantile_weighted_r13.py
Writes one JSON line; record the ladder row in PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from demy_spark.io import load_tables
    from demy_spark.operators.sketches import (
        quantile_sketch_build,
        quantile_sketch_query,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("probe_quantile_weighted_r13")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def frame(sf_dir: str):
        li = load_tables(spark, sf_dir)["lineitem"]
        u = (
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(1000000))
            + 1
        ) / 1000000.0
        return li.select(
            F.col("l_returnflag").alias("g"),
            F.least(F.floor(1.0 / u), F.lit(1000000)).alias("v"),
            (1 + F.col("l_linenumber")).cast("long").alias("w"),
        )

    def run(sf_dir: str) -> tuple[float, dict]:
        df = frame(sf_dir)
        n = df.count()
        stats = {
            "rows": n,
            "hot_share": round(
                df.where(F.col("v") == 1).count() / n, 3
            ),
        }
        best = None
        for _ in range(4):  # pass 1 is the warm-up
            t0 = time.perf_counter()
            sk = quantile_sketch_build(
                df, "v", ["g"], shards=4, capacity=64, weight_col="w"
            )
            out = quantile_sketch_query(sk, [50, 90, 99], ["g"])
            out.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        stats["sec"] = round(best, 3)
        return best, stats

    _, one = run("/root/testdata/sf0.01")
    _, ten = run("/root/testdata/sf0.1")
    print(
        json.dumps(
            {
                "probe": "quantile_weighted_10x",
                "sf0.01": one,
                "sf0.1": ten,
                "ratio": round(ten["sec"] / one["sec"], 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
