"""Sequence packing: lay documents out into fixed token-budget
training sequences — the concat-and-chunk step between a curated
corpus and a pretraining dataloader.

LLM-pipeline extension (no reference analog; the reference's nearest
shape is partitioned capture flush, twitter/Execute.scala:58-98). The
semantics are the standard pretraining layout: documents are
concatenated in a deterministic order and the stream is chunked every
``cap`` tokens, so a document may straddle a chunk boundary (the
dataloader splits it); what the operator computes is each document's
(pack, offset) coordinates plus per-pack occupancy.

Scale shape: a global concatenation order would serialize on one
reducer, so the corpus is first sharded into ``buckets`` deterministic
hash buckets and packed WITHIN each bucket — the layout every real
packing job uses (each bucket's packs are independent; a reader
consumes bucket-by-bucket). The only data movement is one shuffle on
the bucket key; the running offset is an integer prefix sum per
bucket, so the whole layout is bit-reproducible on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from demy_spark.operators.sampling import KNUTH, M32

__all__ = ["greedy_pack", "pack_occupancy"]


def greedy_pack(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    *,
    cap: int,
    buckets: int = 256,
    salt: int = 0,
) -> DataFrame:
    """Assign every document its training-sequence coordinates:
    ``bucket`` (deterministic Knuth-hash shard), ``pack`` (which
    cap-token sequence inside the bucket its FIRST token lands in) and
    ``offset`` (position of that first token inside the pack). The
    concatenation order inside a bucket is (hash, id) — stable,
    engine-reproducible, and shuffling-by-construction (neighbors in
    the corpus are unlikely to be neighbors in a pack).

    Documents longer than ``cap`` simply span multiple packs, exactly
    like the dataloader's chunking. All arithmetic is integer, so the
    layout is deterministic at any parallelism. One shuffle (bucket
    key); the prefix sum is a per-bucket running window."""
    b = F.pmod(
        F.pmod((F.col(id_col).cast("long") + salt) * KNUTH, F.lit(M32)),
        F.lit(buckets),
    )
    u = F.pmod((F.col(id_col).cast("long") + salt) * KNUTH, F.lit(M32))
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("_u_").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.col(tokens_col).cast("long")
    return (
        df.withColumn("bucket", b)
        .withColumn("_u_", u)
        .withColumn("_cum_", F.sum(toks).over(w))
        .withColumn("_start_", F.col("_cum_") - toks)
        .select(
            F.col(id_col),
            "bucket",
            F.floor(F.col("_start_") / cap).cast("long").alias("pack"),
            F.pmod(F.col("_start_"), F.lit(cap)).cast("long").alias("offset"),
            toks.alias("n_tokens"),
        )
    )


def pack_occupancy(packed: DataFrame, *, cap: int) -> DataFrame:
    """Per-(bucket, pack) audit of a ``greedy_pack`` layout: documents
    STARTING in the pack, tokens they contribute, and how much of the
    pack budget those starts fill (a straddling doc's tail spills into
    later packs — the concat-and-chunk contract). Aggregate only —
    map-side combined, dictionary-sized per bucket."""
    return (
        packed.groupBy("bucket", "pack")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .withColumn(
            "fill_ratio",
            F.round(F.least(F.col("n_tokens") / cap, F.lit(1.0)), 6),
        )
    )
