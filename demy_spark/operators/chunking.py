"""Document chunking: split long documents into overlapping token
windows — the context-window preprocessing every LLM training /
retrieval pipeline runs between curation and tokenization (fixed-size
training sequences, RAG passage windows).

No reference analog (the reference's text surface stops at sentence
split, `mllib/src/main/scala/text/Word.scala`); this is one of the
LLM-pipeline extensions the engine adds as first-class operators.

Design: pure per-row expression — token array, `sequence()` of chunk
starts, one `posexplode`, `slice` + `array_join` per chunk. No
shuffle, no UDF, whole-stage codegen; at 100 TB the operator is a
narrow map over the corpus scan with output rows ~ input tokens /
stride. Tokenization is ``textstats.norm_tokens`` (the single-space
oracle contract), so the DuckDB gate replays chunk boundaries
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demy_spark.functions.textstats import norm_tokens

__all__ = ["chunk_documents"]


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into token windows of ``chunk_tokens``
    starting every ``stride`` tokens (``stride < chunk_tokens`` gives
    the classic overlapping RAG windows; ``stride == chunk_tokens``
    gives disjoint training blocks).

    Chunk starts are 0, stride, 2*stride, … while start < n_tokens,
    so the tail chunk may be shorter than ``chunk_tokens`` and every
    token belongs to at least one chunk; documents with no tokens
    emit no rows. Returns (``id_col``, chunk_id, tok_start, n_tokens,
    chunk_text) with chunk_id = tok_start / stride.
    """
    if chunk_tokens < 1 or stride < 1:
        raise ValueError(
            f"chunk_tokens and stride must be >= 1, got {chunk_tokens}, {stride}"
        )
    if stride > chunk_tokens:
        # a larger stride silently drops the tokens between windows,
        # violating the every-token-covered promise above — refuse
        # rather than lose corpus (subsample explicitly instead)
        raise ValueError(
            f"stride ({stride}) must be <= chunk_tokens ({chunk_tokens}): "
            "a gap would silently drop tokens from every document"
        )
    toks = norm_tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    return (
        docs.select(F.col(id_col), toks.alias("_tk_"), starts.alias("_st_"))
        .select(id_col, "_tk_", F.explode("_st_").alias("_s_"))
        .select(
            id_col,
            (F.col("_s_") / stride).cast("long").alias("chunk_id"),
            F.col("_s_").cast("long").alias("tok_start"),
            F.least(
                F.lit(chunk_tokens), F.size("_tk_") - F.col("_s_")
            ).cast("long").alias("n_tokens"),
            F.array_join(
                F.slice("_tk_", F.col("_s_") + 1, F.lit(chunk_tokens)), " "
            ).alias("chunk_text"),
        )
    )
