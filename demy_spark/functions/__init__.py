"""Scalar function kits: text normalization, text analytics, vector math,
score calibration. Everything here returns Column expressions built from
``pyspark.sql.functions`` where possible (JVM-side, whole-stage codegen);
pandas UDFs only where semantics genuinely require Python."""

from demy_spark.functions.text import (  # noqa: F401
    simplify_text,
    phonetic_simplify,
    strip_urls,
    blank_urls,
    clean_tweet,
    tokenize,
    double_acronyms,
    split_sentences,
)
from demy_spark.functions.textstats import (  # noqa: F401
    token_count,
    quality_score,
    language_id,
    fingerprint,
)
from demy_spark.functions.vectors import (  # noqa: F401
    dot,
    l2_norm,
    cosine_similarity,
    similarity_score,
    vec_sum,
    vec_scale,
    vec_minus,
)
from demy_spark.functions.calibration import raw_prediction_to_score  # noqa: F401
