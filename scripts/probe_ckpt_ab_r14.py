"""Round-14 same-session A/B: checkpoint-shared subtrees vs rescans.

The r14 optimization materializes the shared corpus subtree of
bm25_search / phrase_search / minhash_bands with a lazy
localCheckpoint. Cross-session walls on this hypervisor drift 2x, so
this probe times BOTH arms in ONE session, interleaved (A,B,A,B,...):
arm "ckpt" is the committed code, arm "rescan" monkeypatches
DataFrame.localCheckpoint to identity — exactly the pre-r14 plan
(those operators had no other localCheckpoint in their query path).

Usage: python scripts/probe_ckpt_ab_r14.py [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Spark 4: pyspark.sql.DataFrame is the dispatch base; live instances
# are pyspark.sql.classic.dataframe.DataFrame, which OVERRIDES
# localCheckpoint — the patch must land on the classic class or both
# arms silently run the checkpointed plan (verified via explain).
from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402

from demy_spark.session import get_spark  # noqa: E402
from demy_spark import queries as _q  # noqa: E402

NAMES = {
    "bm25_search": "q117_bm25_search",
    "phrase_search": "q134_phrase_search",
    "hybrid_rrf": "q138_hybrid_rrf",
    "incremental_probe": "q101_incremental_dedup",
}

# extra argv names select a subset / additional registry queries:
#   python scripts/probe_ckpt_ab_r14.py 3 q24_fuzzy_lookup fuzzy_probe_10x

_real_ckpt = DataFrame.localCheckpoint


def _identity_ckpt(self, eager=True):  # noqa: ANN001
    return self


def _persist_ckpt(self, eager=True):  # noqa: ANN001
    return self.persist()


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = dict(NAMES)
    if len(sys.argv) > 2:
        names = {n: NAMES.get(n, n) for n in sys.argv[2:]}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "demy_ckpt_ab_r14",
        master=f"local[{cpus}]",
        shuffle_partitions=min(cpus, 16),
    )
    sc = spark.sparkContext
    results: dict[str, dict[str, float]] = {}
    for short, qname in names.items():
        fn = getattr(_q, qname) if hasattr(_q, qname) else _q.REGISTRY[qname].fn
        best = {"ckpt": float("inf"), "rescan": float("inf"), "persist": float("inf")}
        jobs = {}
        ARMS = (
            ("ckpt", _real_ckpt),
            ("rescan", _identity_ckpt),
            ("persist", _persist_ckpt),
        )
        # warm-up each arm once
        for arm, patch in ARMS:
            DataFrame.localCheckpoint = patch
            spark.catalog.clearCache()
            sc.setJobDescription(f"warmup:{short}:{arm}")
            force(fn(spark, sf_dir))
        for i in range(rounds):
            for arm, patch in ARMS:
                DataFrame.localCheckpoint = patch
                spark.catalog.clearCache()
                gid = f"ab-{short}-{arm}-{i}"
                sc.setJobGroup(gid, gid)
                t0 = time.perf_counter()
                force(fn(spark, sf_dir))
                dt = time.perf_counter() - t0
                best[arm] = min(best[arm], dt)
                jobs[arm] = len(sc.statusTracker().getJobIdsForGroup(gid))
                sc.setLocalProperty("spark.jobGroup.id", None)
        DataFrame.localCheckpoint = _real_ckpt
        results[short] = {
            f"{a}_s": round(best[a], 3) for a, _ in ARMS
        } | {f"{a}_jobs": jobs[a] for a, _ in ARMS}
        print(short, results[short], flush=True)

    import bench as _b

    print(
        json.dumps(
            {
                "results": results,
                "data_calib_sec": _b.data_probe(spark, sf_dir),
                "sched_ms_per_job": _b.sched_probe(spark),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
