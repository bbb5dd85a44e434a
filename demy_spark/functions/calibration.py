"""Score calibration.

Parity: mllib/src/main/scala/evaluation/RawPrediction2Score.scala:24-35
(duplicated in topic/WrappedClassifier.scala:21-29): a two-class margin
vector (rawPrediction) is mapped to a [0,1] score with an atan blend so
large margins saturate smoothly.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def raw_prediction_to_score(raw: Column | str, index: int = 1) -> Column:
    """margin = raw[index] - raw[1-index]; score = 0.5 + atan(margin)/π.

    Monotone in the margin, 0.5 at the decision boundary, asymptotes at
    0 and 1 — same shape as the reference's blend.
    """
    r = F.col(raw) if isinstance(raw, str) else raw
    margin = r[index] - r[1 - index]
    return F.lit(0.5) + F.atan(margin) / F.lit(math.pi)


def margin_to_score(margin: Column) -> Column:
    """Same atan blend applied to an already-computed scalar margin
    (used by operators.spans, where the margin is a span-sum dot
    product rather than a rawPrediction pair). Strictly monotonic, so
    argmax-by-margin == argmax-by-score."""
    return F.lit(0.5) + F.atan(margin) / F.lit(math.pi)


def platt_fit(
    decis: list[float],
    labels: list[int],
    *,
    n_steps: int | None = None,
    max_iter: int = 100,
    minstep: float = 1e-10,
    sigma: float = 1e-12,
) -> tuple[float, float]:
    """Platt-scaling constants (A, B) for P(y=1|f) = 1/(1+exp(A·f+B)),
    the Lin–Weng–Keerthi improved algorithm exactly as the reference
    ports it (text/TermlLikelyhoodEvaluator.scala:288-400): regularized
    targets (N+±1)/(N±+2), B₀ = log((N₋+1)/(N₊+1)), damped-Newton steps
    on the 2-parameter cross-entropy with an Armijo backtracking line
    search (halve until newf < fval + 1e-4·step·g·d, give up below
    ``minstep``).

    The reference collects every decision value to the driver before
    fitting (``:214-219``); this port takes the already-collected list,
    so callers bound the calibration sample (a few thousand margins
    calibrate as well as millions — at 100 TB, pass a sampled column).

    ``n_steps``: when set, run EXACTLY that many Newton steps with no
    gradient-based early stop — the deterministic-replay mode the
    DuckDB oracle unrolls (queries.q73_platt_calibration); leave None
    for the reference's adaptive stopping (|g|<1e-5 or ``max_iter``).
    """
    prior1 = sum(1 for y in labels if y > 0)
    prior0 = len(labels) - prior1
    hi = (prior1 + 1.0) / (prior1 + 2.0)
    lo = 1.0 / (prior0 + 2.0)
    t = [hi if y > 0 else lo for y in labels]

    def objective(a: float, b: float) -> float:
        s = 0.0
        for fi, ti in zip(decis, t):
            fApB = fi * a + b
            if fApB >= 0:
                s += ti * fApB + math.log(1.0 + math.exp(-fApB))
            else:
                s += (ti - 1.0) * fApB + math.log(1.0 + math.exp(fApB))
        return s

    A = 0.0
    B = math.log((prior0 + 1.0) / (prior1 + 1.0))
    fval = objective(A, B)

    steps = n_steps if n_steps is not None else max_iter
    for _ in range(steps):
        h11 = h22 = sigma
        h21 = g1 = g2 = 0.0
        for fi, ti in zip(decis, t):
            fApB = fi * A + B
            if fApB >= 0:
                e = math.exp(-fApB)
                p = e / (1.0 + e)
                q = 1.0 / (1.0 + e)
            else:
                e = math.exp(fApB)
                p = 1.0 / (1.0 + e)
                q = e / (1.0 + e)
            d2 = p * q
            h11 += fi * fi * d2
            h22 += d2
            h21 += fi * d2
            d1 = ti - p
            g2 += d1
            g1 += fi * d1
        if n_steps is None and abs(g1) < 1e-5 and abs(g2) < 1e-5:
            break
        det = h11 * h22 - h21 * h21
        dA = -(h22 * g1 - h21 * g2) / det
        dB = -(-h21 * g1 + h11 * g2) / det
        gd = g1 * dA + g2 * dB
        stepsize = 1.0
        while stepsize >= minstep:
            newA = A + stepsize * dA
            newB = B + stepsize * dB
            newf = objective(newA, newB)
            if newf < fval + 1e-4 * stepsize * gd:
                A, B, fval = newA, newB, newf
                break
            stepsize /= 2.0
        else:
            if n_steps is None:
                break  # line search failed (reference stops the outer loop)
    return A, B


def platt_probability(deci: Column, A: float, B: float) -> Column:
    """Calibrated P(y=1|f) = 1/(1+exp(A·f+B)) as a codegen'd column.
    When the fit degenerates (A ≤ 1e-20) the reference falls back to
    the atan blend on the margin pair (TermlLikelyhoodEvaluator.scala:
    266-280); callers with a raw pair can use raw_prediction_to_score
    for that branch."""
    if A > 1e-20:
        return F.lit(1.0) / (F.lit(1.0) + F.exp(F.lit(A) * deci + F.lit(B)))
    return margin_to_score(deci)
