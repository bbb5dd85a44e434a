"""Feature encoders: multi-hot tag vectors, hashed bag-of-words,
embedding application, Word2Vec training.

Parity targets:
- ``Tag2Vector`` (feature/Tag2Vector.scala:32-89): learn a top-K tag
  dictionary by frequency, encode tag arrays as multi-hot vectors.
- ``ArrayHasher`` (feature/ArrayHasher.scala:20-30): murmur-hashed
  bag-of-words sparse vector → built-in ``HashingTF``.
- ``Word2VecApplier`` (text/Word2VecApplier.scala:33-169): token →
  vector lookup join + per-doc sum/mean, with a hit-rate metric.
- ``Corpus.fitWord2Vec`` (text/Corpus.scala:12-51): Word2Vec training.

Scale notes: vocabulary learning is groupBy-count + top-K (two
shuffles, constant-size result); encoding is a pure projection against
the literal vocabulary (no join, no UDF). Embedding application keeps
everything codegen'd: explode tokens → broadcast join the (small)
vector table → posexplode dims → two keyed aggregations; the per-doc
vector is reassembled from sorted (dim, value) structs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def learn_tag_vocabulary(
    df: DataFrame, tags_col: str, top_k: int = 1000
) -> list[str]:
    """Top-K tags by frequency (ties broken by tag asc, so the
    dictionary is deterministic) — Tag2Vector.scala:57-89."""
    rows = (
        df.select(F.explode(tags_col).alias("_tag_"))
        .groupBy("_tag_")
        .count()
        .orderBy(F.desc("count"), F.asc("_tag_"))
        .limit(top_k)
        .collect()
    )
    return [r["_tag_"] for r in rows]


def multi_hot(tags: Column | str, vocab: list[str]) -> Column:
    """Multi-hot array<int> over a literal vocabulary: position i is 1
    iff vocab[i] ∈ tags. Pure projection — the vocabulary lives inside
    the plan, so encoding shuffles nothing (Tag2Vector.scala:32-50)."""
    t = F.col(tags) if isinstance(tags, str) else tags
    return F.array(*[F.array_contains(t, v).cast("int") for v in vocab])


def hashed_tf(df: DataFrame, tokens_col: str, out_col: str, num_features: int = 1 << 18) -> DataFrame:
    """Murmur-hashed term-frequency vector (ArrayHasher ≈ HashingTF)."""
    from pyspark.ml.feature import HashingTF

    return HashingTF(
        inputCol=tokens_col, outputCol=out_col, numFeatures=num_features
    ).transform(df)


def fit_word2vec(
    df: DataFrame,
    tokens_col: str,
    *,
    dim: int = 300,
    min_count: int = 10,
    seed: int = 42,
    num_partitions: int = 1,
    max_iter: int = 1,
) -> DataFrame:
    """Train Word2Vec (reference defaults: 300 dims, minCount 10,
    Corpus.scala:36-42); returns the (word, vector) table with the
    vector as array<float> — the join side for ``apply_embeddings``.

    Determinism contract: with the default ``num_partitions=1`` and
    ``max_iter=1`` the fit is a pure function of (corpus, seed) —
    gradient updates apply in one fixed order, so refits are
    bit-identical (pinned by the seeded golden test). Raising
    ``num_partitions`` for corpus-scale training trades that away:
    partitions train concurrently and merge, so vectors vary
    run-to-run (Hogwild-style, the standard large-corpus trade)."""
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array

    model = Word2Vec(
        vectorSize=dim,
        minCount=min_count,
        seed=seed,
        numPartitions=num_partitions,
        maxIter=max_iter,
        inputCol=tokens_col,
        outputCol="_w2v_",
    ).fit(df)
    return model.getVectors().select(
        "word", vector_to_array("vector").cast("array<float>").alias("vector")
    )


def prepare_tokens(
    tokens,
    *,
    truncate_at: int = 0,
    accent_sensitive: bool = True,
    case_sensitive: bool = False,
):
    """Word2VecApplier's query-side token normalization
    (``applyCaseAccentsAndLimit``, text/Word2VecApplier.scala:154-160):
    truncate each token to ``truncate_at`` chars FIRST, then lowercase
    (unless case-sensitive), then accent-simplify (unless accent-
    sensitive) — order matters and is preserved. The unsupported
    combination accent-insensitive + case-sensitive raises, exactly
    like the reference (:155). Pure ``F.transform`` over the token
    array — codegen, no UDF."""
    from pyspark.sql import Column

    from demy_spark.functions.text import simplify_text

    if not accent_sensitive and case_sensitive:
        raise ValueError(
            "accent-insensitive + case-sensitive is not supported "
            "(Word2VecApplier.scala:155)"
        )
    col = tokens if isinstance(tokens, Column) else F.col(tokens)

    def prep(x):
        t = F.substring(x, 1, truncate_at) if truncate_at > 0 else x
        if not case_sensitive:
            t = F.lower(t)
        if not accent_sensitive:
            t = simplify_text(t)
        return t

    return F.transform(col, prep)


def load_embeddings_text(
    spark, path: str, *, element_type: str = "double"
) -> DataFrame:
    """Text-format embedding table (Word2VecApplier.scala:94-98):
    each line is ``word v1 v2 ...``; lines with fewer than 3
    space-separated fields are dropped (the reference's ``size>2``
    filter). Returns (word, vector) with vector ``array<element_type>``.
    Scales as a plain distributed text scan — no driver parse."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), " ")
    return (
        lines.select(parts.alias("_p_"))
        .where(F.size("_p_") > 2)
        .select(
            F.element_at("_p_", 1).alias("word"),
            F.transform(
                F.slice("_p_", 2, F.size("_p_") - 1),
                lambda s: s.cast(element_type),
            ).alias("vector"),
        )
    )


def apply_embeddings(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    vectors: DataFrame,
    *,
    word_col: str = "word",
    vector_col: str = "vector",
    agg: str = "sum",
    element_type: str = "float",
) -> DataFrame:
    """Per-document embedding: explode tokens, broadcast-join the vector
    table, element-wise sum (or mean) per doc (Word2VecApplier.scala:
    104-138).

    The element-wise aggregation is posexplode(dim) → groupBy(id, dim)
    → groupBy(id) with sorted reassembly — every step codegen'd; no
    per-row lambda over vectors. Docs with zero matched tokens are
    absent from the output (join semantics), matching the reference's
    lookup behavior. Returns (id, embedding, n_tokens, n_matched).
    """
    how = {"sum": F.sum, "mean": F.avg}[agg]
    ex = df.select(
        F.col(id_col).alias("_id_"),
        F.size(tokens_col).alias("_n_tok_"),
        F.explode(tokens_col).alias("_w_"),
    )
    joined = ex.join(
        F.broadcast(
            vectors.select(F.col(word_col).alias("_w_"), F.col(vector_col).alias("_v_"))
        ),
        "_w_",
    )
    dims = joined.select(
        "_id_", "_n_tok_", F.posexplode("_v_").alias("_d_", "_x_")
    )
    per_dim = dims.groupBy("_id_", "_d_").agg(
        how("_x_").alias("_val_"),
        # every token row repeats _n_tok_; matched count = rows per dim
        F.count(F.lit(1)).alias("_n_match_"),
        F.first("_n_tok_").alias("_n_tok2_"),
    )
    return (
        per_dim.groupBy("_id_")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_d_", "_val_"))),
                lambda s: s["_val_"].cast(element_type),
            ).alias("embedding"),
            F.first("_n_tok2_").alias("n_tokens"),
            F.first("_n_match_").alias("n_matched"),
        )
        .select(F.col("_id_").alias(id_col), "embedding", "n_tokens", "n_matched")
    )


def embedding_hit_rate(applied: DataFrame) -> DataFrame:
    """Corpus-level coverage metric (Word2VecApplier.scala:140-150):
    fraction of tokens that had a vector."""
    return applied.agg(
        F.round(F.sum("n_matched") / F.sum("n_tokens"), 6).alias("hit_rate"),
        F.count(F.lit(1)).alias("n_docs"),
    )
