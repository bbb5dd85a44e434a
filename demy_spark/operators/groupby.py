"""Declarative group-by reduction, including element-wise vector aggs.

Parity: mllib/src/main/scala/feature/GroupBy.scala:10-117 — the reference
implements max/min/sum/"peek" per column with an RDD ``reduceByKey``;
here each reduction is a native Catalyst aggregate (partial + final,
map-side combine for free), and vector (array) columns reduce
element-wise through ``reduce(collect_list, zip_with)``.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from demy_spark.functions.vectors import vec_agg_mean, vec_agg_sum


def _vector_elementwise(col: str, how: str) -> Column:
    op = {"max": F.greatest, "min": F.least}.get(how)
    if how == "sum":
        return vec_agg_sum(col)
    if how == "mean":
        return vec_agg_mean(col)
    # element-wise max/min via reduce over collected arrays
    return F.reduce(
        F.collect_list(F.col(col)),
        F.lit(None).cast("array<double>"),
        lambda acc, x: F.when(acc.isNull(), x.cast("array<double>")).otherwise(
            F.zip_with(acc, x, lambda p, q: op(p, q))
        ),
    )


def group_by_reduce(
    df: DataFrame,
    keys: Sequence[str],
    reductions: Mapping[str, str],
    vector_cols: Sequence[str] = (),
) -> DataFrame:
    """``reductions``: column → one of max|min|sum|mean|peek|count.

    ``peek`` = any value (reference's "peek"); columns listed in
    ``vector_cols`` reduce element-wise over array values.
    """
    aggs = []
    for col, how in reductions.items():
        if col in vector_cols:
            aggs.append(_vector_elementwise(col, how).alias(col))
            continue
        fn = {
            "max": F.max,
            "min": F.min,
            "sum": F.sum,
            "mean": F.avg,
            "peek": F.first,
            "count": F.count,
        }[how]
        aggs.append(fn(col).alias(col))
    return df.groupBy(*keys).agg(*aggs)
