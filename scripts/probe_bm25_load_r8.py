"""Round-8 probe: bm25_search (q117) under QUERY LOAD.

phrase_search got rarest-term anchoring because its offset fan-out was
avoidable; this probe documents why BM25 keeps its plan: every
(query, doc) pair sharing >= 1 term IS a scored result candidate under
exact BM25, so the candidate volume Σ_q Σ_t df(t) is the OUTPUT's own
lower bound, not avoidable shuffle waste (WAND-style pruning changes
ordered-traversal cost, not batch candidate generation, and any
df-based candidate cut changes results — an oracle divergence).
Measures 5 / 100 / 1,000 queries over the sf0.1 documents fixture,
asserts the query-side joins stay broadcast at every load, and
records wall + candidate volume so growth can be judged against the
volume it is REQUIRED to do.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from demy_spark.functions.textstats import norm_tokens  # noqa: E402
from demy_spark.io import load_table  # noqa: E402
from demy_spark.operators.retrieval import bm25_search  # noqa: E402
from demy_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="probe-bm25-load-r8")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs.persist().count()
    # real 2-term queries drawn from corpus windows (they match)
    toks = docs.select(
        F.col("doc_id"), norm_tokens(F.col("text")).alias("tk")
    ).where(F.size("tk") >= 2)
    qsrc = [
        (i, f"{r['tk'][i % 8]} {r['tk'][(i % 8) + 1]}")
        for i, r in enumerate(toks.limit(1000).collect())
    ]
    print(f"fixture: {SF_DIR} docs={docs.count()} query pool={len(qsrc)}")
    for n in (5, 100, 1000):
        qdf = spark.createDataFrame(qsrc[:n], "query_id long, qtext string")
        mk = lambda: bm25_search(
            docs, "doc_id", "text", qdf, "query_id", "qtext", k=10
        )
        plan = mk()._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan, f"n={n}: query side fell off broadcast"
        # required candidate volume: sum over query terms of df(term)
        qt = qdf.select(
            F.explode(F.array_distinct(norm_tokens(F.col("qtext")))).alias("w")
        )
        dtok = docs.select(
            F.col("doc_id"), F.explode(norm_tokens(F.col("text"))).alias("w")
        ).distinct()
        vol = dtok.join(qt, "w").count()
        mk().count()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            got = mk().count()
            best = min(best, time.monotonic() - t0)
        print(
            f"n_queries={n:>5} wall={best:.3f}s required_candidates={vol:,} "
            f"rows_out={got}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
