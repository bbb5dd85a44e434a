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
