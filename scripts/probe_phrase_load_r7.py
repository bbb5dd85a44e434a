"""Round-7 probe (VERDICT r6 task 7): phrase_search at realistic
query load — 5 / 100 / 1000 phrases over the sf0.1 documents corpus.

The q134 fixture freezes 5 phrases; this probe checks the two claims
that matter when the query side stops being tiny:

1. the query side STAYS broadcast (three explicit broadcast hints:
   the distinct-term semi-join, the qtok offsets join, the qlen
   join) — assert no SortMergeJoin appears in the executed plan;
2. wall time grows with the candidate volume (query-term document
   frequency x positions), NOT with phrase count per se — phrases
   here are real corpus windows, so term df saturates once the
   phrase set covers the frequent-token space and the growth from
   100 -> 1000 should be well under 10x.

Phrases are deterministic corpus slices (token windows from the
first N documents by doc_id, window offset/length derived from
doc_id residues) — they actually occur, so the anchor aggregation
does real work.
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
from demy_spark.operators.retrieval import phrase_search  # noqa: E402
from demy_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(
        "phrase_load_probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=16,
    )
    docs = load_table(spark, SF_DIR, "documents")
    # deterministic real-corpus phrases: a 2-4-token window per doc
    toks = docs.select("doc_id", norm_tokens(F.col("text")).alias("tk"))
    d = F.col("doc_id")
    phrases = [
        r["p"]
        for r in (
            toks.where(F.size("tk") >= 12)
            .orderBy("doc_id")
            .limit(1000)
            .select(
                F.array_join(
                    F.slice(
                        "tk",
                        (F.pmod(d, 7) + 1).cast("int"),
                        (F.pmod(d, 3) + 2).cast("int"),
                    ),
                    " ",
                ).alias("p")
            )
            .collect()
        )
    ]
    assert len(phrases) == 1000, len(phrases)

    results = {}
    for n in (5, 100, 1000):
        q = spark.createDataFrame(
            list(enumerate(phrases[:n])), "qid long, qtext string"
        )
        mk = lambda: phrase_search(  # noqa: E731
            docs, "doc_id", "text", q, "qid", "qtext", k=10
        )
        plan = mk()._jdf.queryExecution().executedPlan().toString()
        n_bhj = plan.count("BroadcastHashJoin")
        # r8: under rarest-term anchoring the positional VERIFY join
        # (corpus vs corpus on (_id_, _w_, _pos_)) may legitimately
        # sort-merge; only a QUERY-side shuffle would be a regression
        import re as _re

        smjs = [ln for ln in plan.splitlines() if "SortMergeJoin" in ln]
        assert all(
            _re.search(r"SortMergeJoin \[_id_#\d+L?, _w_#\d+, _pos_#\d+", ln)
            for ln in smjs
        ), f"n={n}: query side fell off broadcast: {smjs}"
        force(mk())  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            force(mk())
            best = min(best, time.perf_counter() - t0)
        results[n] = (round(best, 3), n_bhj)
        print(f"n_phrases={n:5d}  wall={best:.3f}s  broadcast_joins={n_bhj}")

    r100, r1000 = results[100][0], results[1000][0]
    print(
        f"growth 100->1000 phrases: {r1000 / r100:.2f}x "
        f"(10x phrases; sublinear = term-df saturation as expected)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
