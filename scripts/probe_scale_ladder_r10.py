"""Round-10 scale-ladder probe (VERDICT r9 task 2): the 2x perf bar is
enforced at sf0.1 only — this probe MEASURES the 1x -> 10x scaling of
the 8 headline queries plus the 5 most expensive extras instead of
arguing it from plan shape.

Method: two on-disk TWINS of sf0.1 under the tempdir, built the way
bench.py builds the split32 twin (dimension tables symlinked, scaled
tables rewritten) so every REGISTRY query runs UNCHANGED against a
twin as its sf_dir:

- twin 1x: one replica, fact tables re-written at 4 part files — the
  layout control, so the 10x ratio compares equal parallelism shape
  and never conflates file count with data volume;
- twin 10x: ten replicas at 40 part files. Keys remapped
  (key*10 + rep) so joins stay key-correct and foreign keys still
  resolve (lineitem.l_orderkey matches orders.o_orderkey in the same
  replica; dimension keys untouched since dimensions don't scale).

Duplicate-density control: replicas > 0 get every 8th token suffixed
with a replica marker ("zq<rep>"). Identical replicas would MANUFACTURE
quadratic near-dup structure (every doc a 10-clique in minhash bands:
~45 artificial pairs per doc) and the probe would report a data
artifact as an engine blow-up; the marker breaks ~5/8 of k-shingles
cross-replica (jaccard ~0.2, far below band thresholds) while leaving
WITHIN-replica duplicate structure intact — so duplicate density per
byte is constant up the ladder, which is what "10x the corpus" means
for a real crawl. Embeddings likewise get +rep*1e-3 on component 0 so
vector dedup doesn't see 10-cliques of exactly-identical vectors.

Wall = min of 2 noop-forced runs after 1 warm-up, cache cleared
between operators (bench.py discipline). sched_ms_per_job printed for
host calibration. Run on an idle machine. Expected: ratios ~<= 12x
(linear + scheduler floor); anything clearly superlinear gets a plan
fix or a documented adjudication in PLANS.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from demy_spark.io import load_table  # noqa: E402
from demy_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ALL_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
SCALED = {"documents", "embeddings", "lineitem", "orders", "events"}
KEY = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
}

HEADLINERS = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_top_orders",
    "q12_events_hourly",
    "q18_exact_dedup",
    "q23_cosine_topk",
    "q24_fuzzy_lookup",
    "q26_minhash_dedup",
]
# the 5 most expensive extras in BENCH_r09 (c4_filters 2.46,
# repetition_profile 1.92, phrase_search 1.83, bpe_train 1.78,
# winnow_pairs 1.73) + semdedup (1.70, the widest shuffle among them)
EXTRAS = [
    "q133_c4_filters",
    "q124_repetition_profile",
    "q134_phrase_search",
    "q115_bpe_train",
    "q127_winnow_pairs",
    "q100_semdedup",
]


def build_twin(spark, n_reps: int) -> str:
    twin = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"demy_scale_twin_{n_reps}x"
    )
    done = os.path.join(twin, "_BUILT")
    if os.path.exists(done):
        return twin
    shutil.rmtree(twin, ignore_errors=True)
    os.makedirs(twin)
    for t in ALL_TABLES:
        src = os.path.join(SF_DIR, f"{t}.parquet")
        dst = os.path.join(twin, f"{t}.parquet")
        if t not in SCALED:
            os.symlink(src, dst)
            continue
        df = load_table(spark, SF_DIR, t)
        reps = spark.range(n_reps).select(F.col("id").alias("_rep_"))
        out = df.crossJoin(F.broadcast(reps)).withColumn(
            KEY[t], F.col(KEY[t]) * n_reps + F.col("_rep_")
        )
        if t == "documents":
            toks = F.split(F.col("text"), " ")
            out = out.withColumn(
                "text",
                F.when(
                    F.col("_rep_") > 0,
                    F.array_join(
                        F.transform(
                            toks,
                            lambda tok, i: F.when(
                                i % 8 == 0,
                                F.concat(
                                    tok,
                                    F.lit("zq"),
                                    F.col("_rep_").cast("string"),
                                ),
                            ).otherwise(tok),
                        ),
                        " ",
                    ),
                ).otherwise(F.col("text")),
            )
        if t == "embeddings":
            out = out.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: F.when(
                        i == 0,
                        x + (F.col("_rep_") * F.lit(1e-3)).cast("float"),
                    ).otherwise(x),
                ),
            )
        out.drop("_rep_").repartition(4 * n_reps).write.mode(
            "overwrite"
        ).parquet(dst)
    open(done, "w").write("ok")
    return twin


def sched_probe(spark, jobs: int = 40) -> float:
    t0 = time.perf_counter()
    for _ in range(jobs):
        spark.range(10).count()
    return round((time.perf_counter() - t0) * 1000 / jobs, 1)


def timeit(spark, fn, sf_dir: str) -> float:
    spark.catalog.clearCache()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark(
        "demy_scale_ladder", master="local[32]", shuffle_partitions=16
    )
    t1 = build_twin(spark, 1)
    t10 = build_twin(spark, 10)
    from demy_spark import queries as _q

    print(f"sched_ms_per_job (start): {sched_probe(spark)}", flush=True)
    print(f"{'query':<28} {'1x':>8} {'10x':>8} {'ratio':>7}")
    for name in HEADLINERS + EXTRAS:
        fn = _q.REGISTRY[name].fn
        w1 = timeit(spark, fn, t1)
        w10 = timeit(spark, fn, t10)
        print(
            f"{name:<28} {w1:>8.2f} {w10:>8.2f} {w10 / w1:>7.2f}",
            flush=True,
        )
    print(f"sched_ms_per_job (end): {sched_probe(spark)}", flush=True)


if __name__ == "__main__":
    main()
