"""Deterministic sampling for training-data pipelines: stratified
rate sampling and bottom-k (hash-reservoir) fixed-size sampling.

Both use the Knuth multiplicative hash ``(key * 2654435761) mod 2^32``
(integer keys; reproduces bit-exactly in any SQL engine — the same
family backs tuning.fold_of), so a sample is a PURE FUNCTION of the
key: re-running the pipeline, or running it on another engine, selects
the same rows. That is what makes sampled training corpora auditable.

The reference's sampling is nondeterministic ``rand()``
(topic/TopicTree.scala:337-338, tuning/RandomSplit.scala:30-33); the
seeded-hash re-expression is the same trade ``genetic.sample_vectors``
makes.

Scale shape: rate sampling is a stateless filter (no shuffle at all —
it composes with scan pushdown); bottom-k is one per-stratum window
top-k (single shuffle on the stratum key, WindowGroupLimit prunes
per-partition before the shuffle).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KNUTH = 2654435761
M32 = 4294967296


def knuth_unit(key: Column, *, salt: int = 0) -> Column:
    """Uniform [0,1) value from an integer key: Knuth multiplicative
    hash scaled to the unit interval. ``salt`` derives independent
    sampling decisions from the same key (salt is added pre-multiply,
    so each salt is a different affine lattice)."""
    return F.pmod((key.cast("long") + salt) * KNUTH, F.lit(M32)) / F.lit(float(M32))


def stratified_sample(
    df: DataFrame,
    key: str,
    stratum: str,
    rates: Mapping[str, float],
    *,
    default_rate: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Keep each row iff knuth_unit(key) < rates[stratum] — per-stratum
    Bernoulli sampling that is deterministic in the key. Rows whose
    stratum is not in ``rates`` sample at ``default_rate``.

    A pure narrow filter: no shuffle, pushes below column pruning, and
    the rate map broadcasts as a literal CASE expression (fine for
    hundreds of strata; use a broadcast-join rate table beyond that).
    """
    u = knuth_unit(F.col(key), salt=salt)
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(stratum) == s, F.lit(float(r))).otherwise(rate)
    return df.where(u < rate)


def bottom_k_sample(
    df: DataFrame,
    key: str,
    stratum: str,
    k: int,
    *,
    salt: int = 0,
) -> DataFrame:
    """Fixed-size uniform sample WITHOUT replacement per stratum: the k
    rows with the smallest hash values — the classic bottom-k /
    KMV construction. Deterministic in the key set: adding rows can
    only displace the largest kept hashes, so samples are stable under
    appends and mergeable across partitions (union → bottom-k again).

    One shuffle on the stratum; WindowGroupLimit keeps only k rows per
    map partition before it.
    """
    w = Window.partitionBy(stratum).orderBy(
        knuth_unit(F.col(key), salt=salt).asc(), F.col(key).asc()
    )
    return (
        df.withColumn("_rk_", F.row_number().over(w))
        .where(F.col("_rk_") <= k)
        .drop("_rk_")
    )


def weighted_sample(
    df: DataFrame,
    key: str,
    weight: Column | str,
    n: int,
    *,
    salt: int = 0,
    quantize: int | None = None,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis
    A-ES): each row draws u = knuth_unit(key, salt) and scores
    ``u ** (1/w)``; the ``n`` highest scores are the sample. Inclusion
    probability is proportional to weight, yet the draw is a PURE
    FUNCTION of (key, salt) — re-runs and other engines select the
    same rows, the property that makes a weighted training mixture
    auditable. Rows with weight <= 0 are excluded (zero mass).

    Adds ``_es_key_`` (the selection score) to the output. Selection
    compiles to TakeOrderedAndProject (distributed per-partition
    top-n, no global sort); ties break on the id key.

    ``quantize`` floors the score to an integer in units of
    ``1/quantize`` (e.g. ``10**9`` for nano-units) BEFORE ordering —
    the cross-engine determinism mode: ``pow`` with a fractional
    exponent is not bit-identical between libm implementations, so an
    oracle-compared selection must rank on the quantized integer
    (boundary-flip probability drops from 1-ulp-anywhere to
    ~ulp×quantize per row) with the id tie-break absorbing collisions.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    u = knuth_unit(F.col(key), salt=salt)
    score = F.pow(u, F.lit(1.0) / w.cast("double"))
    if quantize is not None:
        score = F.floor(score * F.lit(float(quantize))).cast("long")
    return (
        df.where(w > 0)
        .withColumn("_es_key_", score)
        .orderBy(F.col("_es_key_").desc(), F.col(key).asc())
        .limit(n)
    )
