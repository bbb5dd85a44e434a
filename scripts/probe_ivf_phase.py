"""Phase-level timing for the q123 knn_ivf shape at 10x (round-5
follow-up to scripts/probe_10x_r5.py, which read ~25s for the whole
chain at 10x). Splits: seed computation, Lloyd training, probe+rerank,
vote — to localize whether the wall is data work or per-job scheduling
on this host (see PLANS.md machine-condition calibration)."""

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


def replicate(df, id_col, n=10):
    reps = df.sparkSession.range(n).select(F.col("id").alias("_rep_"))
    return (
        df.crossJoin(F.broadcast(reps))
        .withColumn(id_col, F.col(id_col) * n + F.col("_rep_"))
        .drop("_rep_")
    )


def main() -> None:
    from demy_spark.operators.similarity import (
        ivf_build,
        ivf_cosine_topk,
        knn_classify,
    )

    spark = get_spark("demy_spark_probe", master="local[32]", shuffle_partitions=16)
    sc = spark.sparkContext
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    )
    emb10 = replicate(emb, "vec_id").localCheckpoint()
    n = emb10.count()
    print(f"vectors: {n}")
    n_lists, nprobe = 80, 2

    def jobs():
        return sc._jsc.sc().dagScheduler().nextJobId()

    # calibration: per-job scheduling price right now
    t0 = time.perf_counter()
    for _ in range(20):
        spark.range(10).count()
    cal = (time.perf_counter() - t0) / 20
    print(f"calibration: {cal*1000:.0f} ms/trivial-job")

    j0, t0 = jobs(), time.perf_counter()
    index = ivf_build(emb10, "embedding", "vec_id", n_lists=n_lists, train_iters=3)
    t1, j1 = time.perf_counter(), jobs()
    print(f"ivf_build (seeds + 3 Lloyd + final assign, lazy): {t1-t0:.2f}s, {j1-j0} jobs")

    queries = emb10.where(F.col("vec_id") % 25 == 0).select("vec_id", "embedding")
    for dim in (None, 64):
        cand = ivf_cosine_topk(
            emb10, queries, "embedding", "vec_id",
            k=5, n_lists=n_lists, nprobe=nprobe, index=index, dim=dim,
        ).select("query_id", "neighbor_id")
        j0, t0 = jobs(), time.perf_counter()
        cand.write.format("noop").mode("overwrite").save()
        t1, j1 = time.perf_counter(), jobs()
        print(f"probe+rerank (given index, dim={dim}): {t1-t0:.2f}s, {j1-j0} jobs")

        out = knn_classify(
            emb10, queries, "embedding", "vec_id", "label",
            k=5, candidates=cand, dim=dim,
        )
        j0, t0 = jobs(), time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        t1, j1 = time.perf_counter(), jobs()
        print(f"vote (recomputes cand branch, dim={dim}): {t1-t0:.2f}s, {j1-j0} jobs")

    spark.stop()


if __name__ == "__main__":
    main()
