"""Skew mitigation: salted joins, two-phase salted aggregation, hot-key
detection, and a hybrid skew-aware join.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin``) only
rewrites sort-merge joins at runtime; it does nothing for skewed
AGGREGATIONS, broadcast-ineligible shuffled-hash joins, or
stream-static joins. These operators make the mitigation explicit and
plan-stable, the way a 1000-executor job wants it:

- ``salted_join``: left rows get a deterministic salt in [0, salts);
  the right side replicates once per salt; the join key becomes
  (key, salt), spreading each hot key over ``salts`` reducers. The
  OUTPUT is exactly the plain join (salt never leaks): the replication
  factor trades |right| x salts extra shuffle volume for even
  reducers — use when the right side is small-ish but over the
  broadcast threshold.
- ``salted_agg``: two-phase aggregation for low-cardinality/skewed
  group keys — partial agg on (key, salt), final agg on key. Phase 1
  reduces each hot key on ``salts`` reducers; phase 2 shuffles only
  |keys| x salts partial rows. (Spark's own partial aggregation does
  this per-MAP-PARTITION; the explicit salt phase matters when the
  partials themselves are too wide to combine map-side, e.g.
  collect_set/percentile buffers.)
- ``hot_keys``: exact frequency head — one agg, top-n by share.
- ``skew_aware_join``: salt ONLY the detected hot keys; the long tail
  joins plainly — the production hybrid that avoids replicating the
  right side for keys that never needed it.

No reference counterpart (the reference ran Spark 2.3 before AQE;
its jobs are small-dimension broadcasts) — SURVEY §4 notes the gap.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _default_salt(df: DataFrame, salts: int) -> Column:
    """Deterministic per-row salt: xxhash64 over all columns. Any
    uniform row-dependent value works — the salt never affects the
    result, only which reducer a row lands on."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salts))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    *,
    salts: int = 8,
    how: str = "inner",
    salt_expr: Column | None = None,
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``salts``
    reducers. Semantics identical to ``left.join(right, on, how)`` for
    ``inner``/``left`` joins (each left row carries exactly one salt,
    and the right side is replicated once per salt value)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    keys = [on] if isinstance(on, str) else list(on)
    if "_salt_" in left.columns or "_salt_" in right.columns:
        raise ValueError("reserved column _salt_ present")
    l = left.withColumn(
        "_salt_", salt_expr if salt_expr is not None else _default_salt(left, salts)
    )
    r = right.withColumn(
        "_salt_", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return l.join(r, on=[*keys, "_salt_"], how=how).drop("_salt_")


def salted_agg(
    df: DataFrame,
    group_by: str | Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    *,
    salts: int = 32,
    salt_expr: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name ->
    (partial_agg_over_raw, final_agg_over_partial). The partial runs
    grouped by (keys..., salt); the final re-aggregates the
    |keys| x salts partial rows. E.g. a count is
    ``(F.count(F.lit(1)), F.sum(...))``; a sum is ``(F.sum(c),
    F.sum(...))``; a distinct-set is ``(F.collect_set(c),
    F.array_distinct(F.flatten(F.collect_list(...))))``.

    The final agg expression receives the partial column under the
    output name."""
    keys = [group_by] if isinstance(group_by, str) else list(group_by)
    if "_salt_" in df.columns:
        raise ValueError("reserved column _salt_ present")
    salted = df.withColumn(
        "_salt_", salt_expr if salt_expr is not None else _default_salt(df, salts)
    )
    partial = salted.groupBy(*keys, "_salt_").agg(
        *[p.alias(name) for name, (p, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[f.alias(name) for name, (_, f) in aggs.items()]
    )


def hot_keys(
    df: DataFrame, key: str | Sequence[str], *, top_n: int = 16, min_share: float = 0.01
) -> DataFrame:
    """The exact frequency head of ``key``: top_n keys holding at least
    ``min_share`` of the rows. One hash-agg + a constant-size sort.
    (For a scan-free estimate compose with
    operators/sketches.countmin_heavy_hitters.)"""
    keys = [key] if isinstance(key, str) else list(key)
    total = df.count()
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", F.col("n") / F.lit(float(total)))
        .where(F.col("share") >= min_share)
        .orderBy(F.desc("n"), *[F.asc(k) for k in keys])
        .limit(top_n)
    )


def skew_aware_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    *,
    hot: Sequence | DataFrame | None = None,
    salts: int = 8,
    how: str = "inner",
    top_n: int = 16,
    min_share: float = 0.05,
) -> DataFrame:
    """Hybrid: salt only the hot keys, join the tail plainly, union.

    ``hot`` is an explicit hot-key list (values of a single join key),
    a 1-column DataFrame, or None to detect via ``hot_keys`` on the
    left side (one extra agg job over the left frame — at scale,
    detect on a sample or a sketch instead and pass the list in).
    The right side is replicated ``salts`` x only for the hot keys, so
    replication cost is |hot| x salts rows, not |right| x salts."""
    keys = [on] if isinstance(on, str) else list(on)
    if len(keys) != 1:
        raise ValueError("skew_aware_join splits on a single key column")
    k = keys[0]
    if hot is None:
        hot_vals = [r[k] for r in hot_keys(left, k, top_n=top_n, min_share=min_share).collect()]
    elif isinstance(hot, DataFrame):
        hot_vals = [r[0] for r in hot.collect()]
    else:
        hot_vals = list(hot)
    if not hot_vals:
        return left.join(right, on=keys, how=how)
    l_hot = left.where(F.col(k).isin(hot_vals))
    l_tail = left.where(~F.col(k).isin(hot_vals) | F.col(k).isNull())
    r_hot = right.where(F.col(k).isin(hot_vals))
    salted = salted_join(l_hot, r_hot, k, salts=salts, how=how)
    plain = l_tail.join(right, on=keys, how=how)
    return salted.unionByName(plain)
