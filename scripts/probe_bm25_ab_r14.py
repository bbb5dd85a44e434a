"""Round-14 same-session A/B: bm25_search old vs new formulation.

Arm "old" is the pre-r14 operator body (verbatim from git r13 HEAD:
corpus stats via a second postings pass, per-term df via a third pass
aggregated + broadcast-joined back). Arm "new" is the committed
operator (stats from one narrow doc-level aggregate, df as a
partition-only window over the filtered frame). Interleaved min-of-N
in ONE session so hypervisor drift cancels; equality of the two arms'
results is asserted once up front.

Usage: python scripts/probe_bm25_ab_r14.py [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from demy_spark.functions.textstats import norm_tokens  # noqa: E402
from demy_spark.io import load_tables  # noqa: E402
from demy_spark.operators.retrieval import bm25_search  # noqa: E402
from demy_spark.session import get_spark  # noqa: E402
from demy_spark.queries import _Q117_QUERIES  # noqa: E402


def old_bm25_search(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: DataFrame,
    query_id_col: str,
    query_text_col: str,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    quantize: int = 10**6,
) -> DataFrame:
    """The r13 body, kept verbatim for the A/B."""
    toks = docs.select(
        F.col(id_col).alias("_id_"),
        F.explode(norm_tokens(F.col(text_col))).alias("_w_"),
    )
    postings = toks.groupBy("_id_", "_w_").agg(F.count(F.lit(1)).alias("_tf_"))
    postings = postings.withColumn(
        "_dl_", F.sum("_tf_").over(Window.partitionBy("_id_"))
    )
    stats = postings.agg(
        F.countDistinct("_id_").alias("_n_"), F.sum("_tf_").alias("_tot_")
    )
    qterms = queries.select(
        F.col(query_id_col).alias("_qid_"),
        F.explode(F.array_distinct(norm_tokens(F.col(query_text_col)))).alias(
            "_w_"
        ),
    )
    matched = postings.join(
        F.broadcast(qterms.select("_w_").distinct()), "_w_"
    )
    dfreq = matched.groupBy("_w_").agg(F.count(F.lit(1)).alias("_df_"))
    scored = (
        matched.join(F.broadcast(dfreq), "_w_")
        .join(F.broadcast(qterms), "_w_")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("_n_") - F.col("_df_") + 0.5) / (F.col("_df_") + 0.5) + 1.0
    )
    tfn = (F.col("_tf_") * (k1 + 1.0)) / (
        F.col("_tf_")
        + k1
        * (
            1.0
            - b
            + b * F.col("_dl_") / (F.col("_tot_") * 1.0 / F.col("_n_"))
        )
    )
    term_micro = F.floor(idf * tfn * F.lit(float(quantize))).cast("long")
    agg = (
        scored.select("_qid_", "_id_", term_micro.alias("_tm_"))
        .groupBy("_qid_", "_id_")
        .agg(F.sum("_tm_").alias("score_micro"))
    )
    wq = Window.partitionBy("_qid_").orderBy(
        F.col("score_micro").desc(), F.col("_id_").asc()
    )
    return (
        agg.withColumn("rk", F.row_number().over(wq))
        .where(F.col("rk") <= k)
        .select(
            F.col("_qid_").alias(query_id_col),
            F.col("_id_").alias(id_col),
            "score_micro",
            "rk",
        )
    )


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "demy_bm25_ab_r14",
        master=f"local[{cpus}]",
        shuffle_partitions=min(cpus, 16),
    )
    sc = spark.sparkContext
    t = load_tables(spark, sf_dir)
    qdf = spark.createDataFrame(_Q117_QUERIES, "query_id long, qtext string")

    def new_df():
        return bm25_search(
            t["documents"], "doc_id", "text", qdf, "query_id", "qtext", k=10
        )

    def old_df():
        return old_bm25_search(
            t["documents"], "doc_id", "text", qdf, "query_id", "qtext", k=10
        )

    # result equality once up front (same rows, both sorted)
    a = sorted(map(tuple, new_df().collect()))
    b = sorted(map(tuple, old_df().collect()))
    assert a == b, "old and new bm25 disagree"
    print(f"arms agree on {len(a)} rows", flush=True)

    best = {"old": float("inf"), "new": float("inf")}
    jobs = {}
    for arm, fn in (("old", old_df), ("new", new_df)):
        sc.setJobDescription(f"warmup:{arm}")
        force(fn())
    for i in range(rounds):
        for arm, fn in (("old", old_df), ("new", new_df)):
            gid = f"bm25-{arm}-{i}"
            sc.setJobGroup(gid, gid)
            t0 = time.perf_counter()
            force(fn())
            best[arm] = min(best[arm], time.perf_counter() - t0)
            jobs[arm] = len(sc.statusTracker().getJobIdsForGroup(gid))
            sc.setLocalProperty("spark.jobGroup.id", None)

    import bench as _b

    print(
        json.dumps(
            {
                "old_s": round(best["old"], 3),
                "new_s": round(best["new"], 3),
                "old_jobs": jobs["old"],
                "new_jobs": jobs["new"],
                "data_calib_sec": _b.data_probe(spark, sf_dir),
                "sched_ms_per_job": _b.sched_probe(spark),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
