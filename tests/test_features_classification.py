"""Unit tests for feature encoders and one-vs-rest classification."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from demy_spark.features import (
    apply_embeddings,
    embedding_hit_rate,
    hashed_tf,
    learn_tag_vocabulary,
    multi_hot,
)


def test_learn_tag_vocabulary_orders_by_freq_then_tag(spark):
    df = spark.createDataFrame(
        [(["a", "b"],), (["b", "c"],), (["b"],), (["c"],)], ["tags"]
    )
    assert learn_tag_vocabulary(df, "tags", top_k=2) == ["b", "c"]
    assert learn_tag_vocabulary(df, "tags", top_k=3) == ["b", "c", "a"]


def test_multi_hot_encoding(spark):
    df = spark.createDataFrame([(1, ["x", "z"]), (2, ["y"]), (3, [])], ["id", "tags"])
    out = df.select("id", multi_hot("tags", ["x", "y", "z"]).alias("hot"))
    got = {r["id"]: r["hot"] for r in out.collect()}
    assert got == {1: [1, 0, 1], 2: [0, 1, 0], 3: [0, 0, 0]}


def test_hashed_tf_shape(spark):
    df = spark.createDataFrame([(["a", "b", "a"],)], ["toks"])
    out = hashed_tf(df, "toks", "tf", num_features=16).first()["tf"]
    assert out.toArray().sum() == 3.0  # term counts preserved


def _vectors(spark):
    return spark.createDataFrame(
        [("cat", [1.0, 0.0]), ("dog", [0.0, 1.0]), ("fish", [1.0, 1.0])],
        ["word", "vector"],
    )


def test_apply_embeddings_sum_and_counts(spark):
    docs = spark.createDataFrame(
        [(1, ["cat", "dog", "unknown"]), (2, ["fish", "fish"]), (3, ["zzz"])],
        ["doc_id", "toks"],
    )
    out = apply_embeddings(docs, "doc_id", "toks", _vectors(spark))
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["embedding"] == [1.0, 1.0]
    assert (got[1]["n_tokens"], got[1]["n_matched"]) == (3, 2)
    assert got[2]["embedding"] == [2.0, 2.0]
    assert 3 not in got  # no matched tokens → absent (join semantics)

    hr = embedding_hit_rate(out).first()
    assert hr["hit_rate"] == 0.8  # 4 matched of 5 tokens in docs 1-2


def test_apply_embeddings_mean(spark):
    docs = spark.createDataFrame([(1, ["cat", "fish"])], ["doc_id", "toks"])
    out = apply_embeddings(docs, "doc_id", "toks", _vectors(spark), agg="mean").first()
    assert out["embedding"] == [1.0, 0.5]


@pytest.mark.slow  # ~52 s: Spark ML LogisticRegression fits (r14 durations)
def test_one_vs_rest_separable(spark):
    from pyspark.ml.functions import array_to_vector

    from demy_spark.classification import fit_one_vs_rest, predict_one_vs_rest

    # two linearly separable blobs on the first axis
    rows = [([float(10 + i % 3), 0.0], 0) for i in range(12)] + [
        ([float(-10 - i % 3), 0.0], 1) for i in range(12)
    ]
    df = spark.createDataFrame(rows, ["arr", "y"])
    base = df.select(
        array_to_vector("arr").alias("features"),
        multi_hot(F.array("y"), [0, 1]).alias("labels"),
        "y",
    )
    models = fit_one_vs_rest(base, "features", "labels", 2, parallelism=2)
    pred = predict_one_vs_rest(models, base, "features")
    rows = pred.select("y", "predicted_label", "scores").collect()
    assert all(r["y"] == r["predicted_label"] for r in rows)
    assert all(0.0 <= s <= 1.0 for r in rows for s in r["scores"])


def test_oracle_murmur3_matches_hashingtf_indexof():
    """The q144 oracle's pure-Python murmur3_x86_32 (implemented from
    Appleby's public-domain reference, independent of the JVM) must
    agree with the REAL HashingTF bucket for terms covering every tail
    length mod 4, multi-byte UTF-8 (2/3/4-byte sequences) and the
    empty string — this equality is what makes the q144 row an
    independent verification of ArrayHasher, not a self-check."""
    from pyspark.ml.feature import HashingTF

    from demy_spark.queries import _murmur3_x86_32

    tf = HashingTF(numFeatures=1024, inputCol="a", outputCol="v")
    terms = [
        "", "a", "ab", "abc", "abcd", "abcde",
        "en", "de", "src0", "src19", "REG AIR", "1-URGENT",
        "é", "ñx", "日本語", "🙂", "zh_src7", "a b c d e",
    ]
    for t in terms:
        want = tf.indexOf(t)
        got = (_murmur3_x86_32(t.encode("utf-8")) % 1024 + 1024) % 1024
        assert got == want, f"{t!r}: python {got} != spark {want}"


def test_q144_plan_is_broadcast_vocab_no_python(spark):
    """q144's scale shape (the reason it never explodes the 1024-slot
    vector): the corpus leg must join the hashed vocabulary via ONE
    broadcast hash join and carry zero Python/Arrow evaluation — the
    HashingTF transform runs only on the distinct-vocab frame."""
    from demy_spark.queries import REGISTRY

    out = REGISTRY["q144_hashingtf_buckets"].fn(spark, "/root/testdata/sf0.001")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


_TF_CACHE: list = []  # built lazily: HashingTF needs a live SparkContext


def _tf_1024():
    if not _TF_CACHE:
        from pyspark.ml.feature import HashingTF

        _TF_CACHE.append(
            HashingTF(numFeatures=1024, inputCol="a", outputCol="v")
        )
    return _TF_CACHE[0]


@settings(max_examples=150, deadline=None)
@given(
    term=st.text(
        alphabet=st.characters(
            codec="utf-8", blacklist_categories=("Cs",)
        ),
        max_size=24,
    )
)
def test_oracle_murmur3_fuzz_matches_hashingtf(spark, term):
    """Hypothesis twin of the fixed-list pin: arbitrary non-surrogate
    unicode terms (any tail length, any byte width) must bucket
    identically between the q144 oracle's pure-Python murmur3 and the
    real HashingTF."""
    from demy_spark.queries import _murmur3_x86_32

    want = _tf_1024().indexOf(term)
    got = (_murmur3_x86_32(term.encode("utf-8")) % 1024 + 1024) % 1024
    assert got == want, repr(term)
