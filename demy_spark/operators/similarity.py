"""Similarity search over embedding columns (array<float>).

Two paths:
- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Queries are broadcast (a query set is dictionary-sized by contract);
  the corpus side streams through one scan, score is a codegen'd
  zip_with/aggregate, top-k is a rank window on the query id.
- ``lsh_cosine_topk``: random-hyperplane LSH bucketing — the 100 TB
  path. Deterministic planes are derived per (plane, dim) from a
  seeded hash folded into the plan (no driver-side numpy state, no
  broadcast variable), so the same seed gives the same buckets on any
  cluster. Probing compares only same-bucket candidates; multi-probe
  (flipping the weakest plane bits) trades recall for cost.

The reference's vector ops (linalg/implicits.scala cosine/similarity)
are covered by functions/vectors.py; these operators add the search
layer a training-data pipeline needs (ANN over corpus embeddings).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from demy_spark.functions.vectors import cosine_similarity


def _plane_component(plane: Column, dim_idx: Column, seed: int) -> Column:
    """Deterministic pseudo-random plane component in [-1, 1): Knuth
    multiplicative hash of (plane, dim, seed) — stable across
    executors/runs AND bit-reproducible in plain SQL (the DuckDB
    oracles recompute it), unlike xxhash64. The key is masked to 20
    bits before the multiply so ANSI mode cannot overflow a long."""
    key = (plane * 1000003 + dim_idx * 7 + F.lit(seed)).bitwiseAND(F.lit(0xFFFFF))
    h = (key * F.lit(2654435761)) % F.lit(4294967296) % 100003
    return h.cast("double") / 100003.0 * 2.0 - 1.0


def hyperplane_bucket(vec: Column, num_planes: int = 16, seed: int = 42) -> Column:
    """LSH bucket id: sign bits of <vec, plane_p> packed into a long."""
    dims = F.sequence(F.lit(0), F.size(vec) - 1)
    def plane_dot(p: Column) -> Column:
        return F.aggregate(
            F.zip_with(
                vec,
                dims,
                lambda x, i: x.cast("double") * _plane_component(p, i, seed),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    out = F.lit(0).cast("long")
    for p in range(num_planes):
        out = out.bitwiseOR(
            F.when(plane_dot(F.lit(p)) > 0, F.lit(1 << p).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return out


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    k: int = 10,
    query_vec_col: str | None = None,
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact brute-force top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, sim, rk). Self-matches (same id)
    are excluded when ids share a domain."""
    qv = query_vec_col or vec_col
    qi = query_id_col or id_col
    q = queries.select(
        F.col(qi).alias("query_id"), F.col(qv).alias("_qv_")
    )
    pairs = corpus.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine_similarity("_qv_", vec_col).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    k: int = 10,
    num_planes: int = 12,
    seed: int = 42,
    query_vec_col: str | None = None,
    query_id_col: str | None = None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, exact cosine rerank inside the bucket. Recall grows as
    ``num_planes`` shrinks (bigger buckets); 2^num_planes buckets
    bound each bucket to ~N/2^p candidates — pick p ≈ log2(N/1000)."""
    qv = query_vec_col or vec_col
    qi = query_id_col or id_col
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv_"),
        hyperplane_bucket(F.col(vec_col), num_planes, seed).alias("_bucket_"),
    )
    q = queries.select(
        F.col(qi).alias("query_id"),
        F.col(qv).alias("_qv_"),
        hyperplane_bucket(F.col(qv), num_planes, seed).alias("_bucket_"),
    )
    pairs = c.join(F.broadcast(q), "_bucket_").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id", "neighbor_id", cosine_similarity("_qv_", "_cv_").alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)
