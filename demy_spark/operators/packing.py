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

__all__ = ["fim_split", "greedy_pack", "pack_occupancy"]


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


def fim_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    rate_pct: int = 50,
    salt: int = 0,
) -> DataFrame:
    """Fill-in-the-middle (FIM) training transform: deterministically
    rewrite ``rate_pct`` percent of documents into the PSM
    (prefix-suffix-middle) layout the FIM pretraining recipe trains on
    — the dataloader-side text transform between curation and packing
    (LLM-pipeline extension, no reference analog; packing is the
    nearest neighbor in this module).

    Selection and both cut points derive from md5 slices of the
    document id + ``salt`` (no RNG state — any engine replays the
    exact split): a document is transformed iff ``h0 mod 100 <
    rate_pct``; two cuts over 0..n_tokens are taken from two more
    independent slices, sorted, and the TOKEN stream (norm_tokens —
    the oracle tokenization contract) splits into prefix / middle /
    suffix. Output text is ``<PRE> prefix <SUF> suffix <MID> middle``
    for transformed rows and the joined token stream for passthrough
    rows, plus the three span token counts and the ``fim`` flag.

    Purely a narrow per-row map — no shuffle, no UDF; scales as a
    scan at any corpus size.
    """
    from demy_spark.functions.textstats import norm_tokens
    from demy_spark.operators.dedup import _md5_long

    key = F.concat_ws("\u0001", F.col(id_col).cast("string"), F.lit(str(salt)))
    # NULL text must tokenize to [] (n = 0), not NULL: F.size(NULL) is
    # -1, which would feed pmod(h, 0) -> NULL cuts and a NULL text_fim
    # while the oracle's coalesced slices emit the degenerate layout
    toks = F.coalesce(
        norm_tokens(F.col(text_col)), F.array().cast("array<string>")
    )
    n = F.size(toks)
    take = F.pmod(_md5_long(key, 1, 8), F.lit(100)) < rate_pct
    c1 = F.pmod(_md5_long(key, 9, 8), n + 1)
    c2 = F.pmod(_md5_long(key, 17, 8), n + 1)
    lo = F.least(c1, c2)
    hi = F.greatest(c1, c2)
    prefix = F.slice(toks, 1, lo)
    middle = F.slice(toks, lo + 1, hi - lo)
    suffix = F.slice(toks, hi + 1, n - hi)
    join = lambda a: F.array_join(a, " ")  # noqa: E731
    # plain concat with literal separators, NOT concat_ws: concat_ws
    # drops empty strings in some engines (DuckDB) but keeps them in
    # Spark, so an empty prefix/suffix/middle would diverge
    fim_text = F.concat(
        F.lit("<PRE> "),
        join(prefix),
        F.lit(" <SUF> "),
        join(suffix),
        F.lit(" <MID> "),
        join(middle),
    )
    return df.select(
        F.col(id_col),
        F.when(take, fim_text).otherwise(join(toks)).alias("text_fim"),
        F.when(take, lo).otherwise(n).cast("long").alias("n_prefix"),
        F.when(take, hi - lo).otherwise(F.lit(0)).cast("long").alias("n_middle"),
        F.when(take, n - hi).otherwise(F.lit(0)).cast("long").alias("n_suffix"),
        take.alias("fim"),
    )
