"""Round-5 10x scale probes (VERDICT r4 task 8 + new-shape convention):

- q117/bm25_search and q96/line_dedup — the two corpus-frequency joins
  without a recorded blow-up probe;
- the round-5 shapes: q122 fuzzy typed-filter and q123 IVF-routed kNN.

Method (PLANS.md convention): documents at sf0.1 (5k docs), replicated
10x with remapped ids (50k docs); embeddings likewise (2k -> 20k
vectors, n_lists scaled with the corpus per the IVF contract). Wall =
min of 3 noop-forced runs after one warm-up, cache cleared between
operators. Run on an idle machine.
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


def replicate(df, id_col: str, n: int = 10, keep_rep: bool = False):
    reps = df.sparkSession.range(n).select(F.col("id").alias("_rep_"))
    out = df.crossJoin(F.broadcast(reps)).withColumn(
        id_col, F.col(id_col) * n + F.col("_rep_")
    )
    return out if keep_rep else out.drop("_rep_")


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
    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label")
    )
    emb10 = replicate(emb, "vec_id").localCheckpoint()
    print(f"docs {docs.count()} -> {docs10.count()}; emb {emb.count()} -> {emb10.count()}")

    # --- bm25 ---------------------------------------------------------
    from demy_spark.queries import _Q117_QUERIES
    from demy_spark.operators.retrieval import bm25_search

    qdf = spark.createDataFrame(_Q117_QUERIES, "query_id long, qtext string")
    for label, d in (("bm25 1x", docs), ("bm25 10x", docs10)):
        timeit(spark, label, lambda d=d: bm25_search(d, "doc_id", "text", qdf, "query_id", "qtext", k=10))

    # --- line_dedup ---------------------------------------------------
    from demy_spark.operators.subdoc import line_dedup

    for label, d in (("line_dedup 1x", docs), ("line_dedup 10x", docs10)):
        timeit(spark, label, lambda d=d: line_dedup(d, "doc_id", "text"))

    # --- fuzzy typed filter (q122 shape) ------------------------------
    from demy_spark.operators.fuzzy_lookup import fuzzy_lookup
    from demy_spark.functions import textstats

    def fuzzy_shape(d):
        toks = textstats.norm_tokens(F.col("text"))
        dictionary = (
            d.where((F.col("doc_id") % 97 == 0) & (F.size(toks) >= 3))
            .select(
                F.concat_ws(" ", F.slice(toks, 1, 3)).alias("phrase"),
                F.col("doc_id").alias("entity_id"),
                F.col("lang"),
            )
            .groupBy("phrase")
            .agg(F.min("entity_id").alias("entity_id"), F.min("lang").alias("dict_lang"))
        )
        probes = d.where(F.col("doc_id") % 10 == 0).select(
            "doc_id",
            "text",
            F.when(F.col("doc_id") % 3 == 0, F.lit(None).cast("string"))
            .otherwise(F.col("lang"))
            .alias("want_lang"),
        )
        return fuzzy_lookup(
            probes, dictionary, "text", "phrase",
            max_lev_distance=0, min_score=1.0, top_k=1,
            tie_break_cols=("entity_id",),
            filter_cols=[("want_lang", "dict_lang")],
        )

    for label, d in (("fuzzy_typed 1x", docs), ("fuzzy_typed 10x", docs10)):
        timeit(spark, label, lambda d=d: fuzzy_shape(d))

    # --- knn via IVF (q123 shape; n_lists scales with corpus) ---------
    # Two 10x variants: raw replication collapses each vector's 10
    # copies into ONE point (cosine is scale/position-sensitive to
    # nothing we replicate), so the Lloyd lists degenerate to ~10x
    # their balanced size and every probe drags ~10x the contract's
    # candidate fraction — the worst-case-skew reading. The jittered
    # variant perturbs each copy directionally (deterministic per
    # (rep, dim)) so lists balance — the contract reading.
    from demy_spark.operators.similarity import ivf_cosine_topk, knn_classify

    emb10j = (
        replicate(emb, "vec_id", keep_rep=True)
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: x + ((F.col("_rep_") * 31 + i) % 7 - 3) * 0.01,
            ),
        )
        .drop("_rep_")
        .localCheckpoint()
    )

    def knn_shape(e, n_lists):
        queries = e.where(F.col("vec_id") % 25 == 0).select("vec_id", "embedding")
        cand = ivf_cosine_topk(
            e, queries, "embedding", "vec_id",
            k=5, n_lists=n_lists, nprobe=2, train_iters=3,
        ).select("query_id", "neighbor_id")
        return knn_classify(e, queries, "embedding", "vec_id", "label", k=5, candidates=cand)

    for label, e, nl in (
        ("knn_ivf 1x", emb, 8),
        ("knn_ivf 10x (collapsed dups, worst-case skew)", emb10, 80),
        ("knn_ivf 10x (jittered, balanced lists)", emb10j, 80),
    ):
        timeit(spark, label, lambda e=e, nl=nl: knn_shape(e, nl))

    probe_new_shapes(spark, docs, docs10)
    spark.stop()


def probe_new_shapes(spark, docs, docs10) -> None:
    """Late-round-5 shapes: q124 repetition profile and q125 unicode
    hygiene — both pure per-row maps (no shuffle), so the expectation
    is ~linear in rows; the probe guards against an accidental
    quadratic in the n-gram fold or a pandas-UDF batching cliff."""
    from demy_spark.functions import textstats
    from demy_spark.functions.text import strip_control_chars, unicode_normalize

    def rep_shape(d):
        return d.select(
            "doc_id", textstats.repetition_profile(F.col("text")).alias("p")
        )

    def hyg_shape(d):
        txt = F.col("text")
        for search, repl in (
            ("e", "é"),
            ("a", "\x07a"),
            ("t", "한"),
        ):
            txt = F.replace(txt, F.lit(search), F.lit(repl))
        norm = unicode_normalize(strip_control_chars(txt))
        return d.select("doc_id", F.length(norm).alias("n"), norm)

    for label, d in (
        ("repetition_profile 1x", docs),
        ("repetition_profile 10x", docs10),
        ("unicode_hygiene 1x", docs),
        ("unicode_hygiene 10x", docs10),
    ):
        mk = rep_shape if label.startswith("repetition") else hyg_shape
        timeit(spark, label, lambda d=d, mk=mk: mk(d))


def main_new_only() -> None:
    spark = get_spark(
        "demy_spark_probe", master="local[32]", shuffle_partitions=16
    )
    docs = load_table(spark, SF_DIR, "documents")
    docs10 = replicate(docs, "doc_id").localCheckpoint()
    probe_new_shapes(spark, docs, docs10)
    spark.stop()


if __name__ == "__main__":
    main_new_only() if "--new-only" in sys.argv else main()
