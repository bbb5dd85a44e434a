"""Best-span detection: locate the contiguous token window that
maximizes a frozen linear classifier's score.

Re-expresses the reference's ClassifierNode transform-time span
detection (mllib/src/main/scala/topic/ClassifierNode.scala:99-166):
the reference greedily expands a window right while the classifier
score improves (``:118-134``), then contracts from the left
(``:135-145``), keeping the best-scoring (from, to) token range per
document. The greedy scan is a sequential heuristic for "the
bounded-length span whose token-vector SUM scores highest"; this
module computes that argmax exactly, which Spark can do in ONE window
pass instead of a per-row Python loop:

- a LINEAR scorer means ``margin(span) = w·(Σ v_t) + b
  = Σ (w·v_t) + b`` — per-token dot products, then a prefix sum;
- the best span of length ≤ W ending at position j is
  ``cum[j] - min(cum[i-1] for i in [j-W+1, j])`` — a running-min
  window (ROWS BETWEEN W-1 PRECEDING), the same range-frame trick as
  operators/fuzzy_lookup's ngram scorer;
- the reference's margin→score calibration
  (evaluation/RawPrediction2Score.scala:24-35) is strictly monotonic,
  so the margin argmax IS the score argmax; calibration is applied
  once to the winner.

Scale shape: per-token dot product is a codegen'd ``zip_with`` +
``aggregate`` over the vector column (no UDF), the prefix/min windows
partition by document (no global window), and the final per-document
argmax is a ``row_number`` over the same partitioning — one shuffle on
doc_id total. Oracle: queries.q70_span_detect enumerates all spans of
length ≤ W in DuckDB and takes the same argmax.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def token_margins(
    df: DataFrame,
    vec_col: str,
    weights: Sequence[float],
    *,
    out_col: str = "_tok_margin_",
) -> DataFrame:
    """Per-token contribution w·v as a codegen'd array fold (no UDF)."""
    w = F.array(*[F.lit(float(x)) for x in weights])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), w, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.withColumn(out_col, dot)


def detect_best_span(
    tokens: DataFrame,
    *,
    doc_col: str = "doc_id",
    pos_col: str = "pos",
    vec_col: str = "vec",
    weights: Sequence[float],
    bias: float = 0.0,
    window_size: int = 5,
) -> DataFrame:
    """Per document, the contiguous token span of length ≤
    ``window_size`` whose vector-sum margin ``w·Σv + b`` is maximal.

    Returns one row per document: (doc_col, span_start, span_end,
    margin, score) with positions inclusive and score the calibrated
    margin (functions.calibration.margin_to_score). Ties break to the
    earliest start, then earliest end — deterministic, so the DuckDB
    oracle reproduces it exactly.
    """
    from demy_spark.functions.calibration import margin_to_score

    d = token_margins(tokens, vec_col, weights)
    by_pos = Window.partitionBy(doc_col).orderBy(pos_col)
    # cum[j] = Σ margins up to j; cumprev[j] = cum[j-1] (0 before doc start)
    d = d.withColumn("_cum_", F.sum("_tok_margin_").over(by_pos))
    d = d.withColumn("_cumprev_", F.col("_cum_") - F.col("_tok_margin_"))
    # best start for a span ending here: the smallest cumprev in the last
    # W rows (ties → earliest position, via struct min)
    wmin = by_pos.rowsBetween(-(window_size - 1), 0)
    d = d.withColumn(
        "_best_start_", F.min(F.struct("_cumprev_", pos_col)).over(wmin)
    )
    d = d.select(
        doc_col,
        F.col("_best_start_")[pos_col].alias("span_start"),
        F.col(pos_col).alias("span_end"),
        (F.col("_cum_") - F.col("_best_start_")["_cumprev_"] + F.lit(float(bias))).alias(
            "margin"
        ),
    )
    pick = Window.partitionBy(doc_col).orderBy(
        F.desc("margin"), F.asc("span_start"), F.asc("span_end")
    )
    best = (
        d.withColumn("_rk_", F.row_number().over(pick))
        .where(F.col("_rk_") == 1)
        .drop("_rk_")
    )
    return best.withColumn("score", margin_to_score(F.col("margin")))
