from __future__ import annotations

import math

from pyspark.sql import functions as F

from demy_spark.operators.selection import bigram_lm_scores, dsir_scores


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigram_lm_known_counts(spark):
    # train: c(a b)=2, c(b a)=1, c(a)=3, c(b)=2, V=2
    train = _docs(spark, [(1, "a b a b a")])
    score = _docs(spark, [(10, "a b"), (11, "z z")])
    out = {
        r["doc_id"]: r
        for r in bigram_lm_scores(train, score, "doc_id", "text", add_k=0.5).collect()
    }
    p_ab = (2 + 0.5) / (3 + 0.5 * 3)  # c(a b)+k / c(a)+k(V+1)
    assert out[10]["n_bigrams"] == 1
    assert out[10]["nll_micro"] == math.floor(-math.log(p_ab) * 1e6)
    # fully unseen bigram over an unseen unigram: c2=0, c1=0
    p_zz = 0.5 / (0.5 * 3)
    assert out[11]["nll_micro"] == math.floor(-math.log(p_zz) * 1e6)
    assert out[11]["avg_nll"] > out[10]["avg_nll"]


def test_bigram_lm_drops_single_token_docs(spark):
    train = _docs(spark, [(1, "a b c")])
    score = _docs(spark, [(10, "solo"), (11, "a b")])
    ids = {r["doc_id"] for r in bigram_lm_scores(train, score, "doc_id", "text").collect()}
    assert ids == {11}


def test_bigram_lm_score_is_integer_sum(spark):
    # the document score equals the sum of its per-bigram micro-nat
    # integers: repeat the same bigram 3x -> exactly 3x the single term
    train = _docs(spark, [(1, "x y x y")])
    one = _docs(spark, [(10, "x y")])
    three = _docs(spark, [(10, "x y x y x y x y")])
    # "x y x y x y x y": transitions x>y (4), y>x (3)
    s1 = bigram_lm_scores(train, one, "doc_id", "text").collect()[0]
    s3 = bigram_lm_scores(train, three, "doc_id", "text").collect()[0]
    assert s3["n_bigrams"] == 7
    assert s3["nll_micro"] % 1 == 0 and s1["nll_micro"] % 1 == 0


def test_dsir_prefers_target_like_docs(spark):
    target = _docs(spark, [(100, "alpha beta alpha beta alpha")])
    raw = _docs(
        spark,
        [
            (1, "alpha beta alpha"),
            (2, "gamma delta epsilon"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in dsir_scores(raw, target, "doc_id", "text", n_buckets=64).collect()
    }
    assert out[1]["avg_llr"] > out[2]["avg_llr"]
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 3


def test_dsir_selection_is_deterministic_topk(spark):
    target = _docs(spark, [(100, "t t t")])
    raw = _docs(spark, [(i, "t u v") for i in range(20)])
    scored = dsir_scores(raw, target, "doc_id", "text", n_buckets=64)
    top = scored.orderBy(
        (F.col("llr_micro") * 1.0 / F.col("n_tokens")).desc(), "doc_id"
    ).limit(5)
    # identical scores everywhere -> tie-break selects smallest ids
    assert [r["doc_id"] for r in top.collect()] == [0, 1, 2, 3, 4]


def test_distinctive_terms_surfaces_group_exclusive_words(spark):
    from demy_spark.operators.selection import distinctive_terms

    rows = (
        [(i, "tech", "code spark data shared") for i in range(10)]
        + [(i + 10, "news", "vote press data shared") for i in range(10)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = distinctive_terms(docs, "text", "source", k=2)
    top = {}
    for r in out.collect():
        top.setdefault(r["source"], []).append((r["z_micro"], r["word"]))
    tech_words = {w for _, w in top["tech"]}
    news_words = {w for _, w in top["news"]}
    # exclusive words dominate; shared vocabulary never ranks first
    assert tech_words <= {"code", "spark"}
    assert news_words <= {"vote", "press"}
    # z-scores are positive for distinctive words
    assert all(z > 0 for z, _ in top["tech"] + top["news"])


def test_tfidf_top_terms_ranks_rare_over_common(spark):
    import math

    from demy_spark.operators.selection import tfidf_top_terms

    rows = [
        (1, "shared shared unique1 unique1 unique1"),
        (2, "shared unique2"),
        (3, "shared other"),
        (4, "shared other"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in tfidf_top_terms(docs, "doc_id", "text", k=2).collect():
        out.setdefault(r["doc_id"], []).append((r["term"], r["tf"], r["score_micro"]))
    # doc 1: unique1 (tf 3, df 1) beats shared (tf 2, df 4)
    assert [t for t, _, _ in out[1]] == ["unique1", "shared"]
    # score is tf * floor((ln((N+1)/(df+1)) + 1) * 1e6) exactly
    idf_u1 = math.floor((math.log(5 / 2) + 1) * 1_000_000)
    assert out[1][0] == ("unique1", 3, 3 * idf_u1)
    # every doc returns at most k rows and at least its distinct terms
    assert all(len(v) <= 2 for v in out.values()) and set(out) == {1, 2, 3, 4}
    # ties (same tf, same df) break lexicographically: doc 3/4 rank
    # 'other' before 'shared'? other has df 2 < shared df 4 -> higher idf
    assert [t for t, _, _ in out[3]] == ["other", "shared"]


def test_token_budget_select_whole_doc_fit_and_ties(spark):
    """token_budget_select (q140): best-score-first greedy cut, a kept
    document fits ENTIRELY under the budget (no partial docs), score
    ties break by ascending id, and groups select independently."""
    from demy_spark.operators.selection import token_budget_select

    rows = [
        # group a: scores 9,8,8,1 with tokens 50,30,30,5; budget 100
        # -> 50+30=80, next 30 would hit 110 > 100 -> dropped even
        # though 5 more would fit after it (strict greedy prefix)
        ("a", 1, 9, 50),
        ("a", 3, 8, 30),   # tie on 8: id 2 before id 3
        ("a", 2, 8, 30),
        ("a", 4, 1, 5),
        # group b: independent budget
        ("b", 5, 5, 100),
        ("b", 6, 4, 1),
    ]
    df = spark.createDataFrame(rows, "src string, id long, score long, n_tok long")
    out = token_budget_select(
        df, "score", "n_tok", 100, by=["src"], id_col="id"
    )
    kept = {r["id"]: (r["keep"], r["tokens_cum"]) for r in out.collect()}
    assert kept[1] == (True, 50)
    assert kept[2] == (True, 80)     # tie-break: id 2 enters first
    assert kept[3] == (False, 110)   # would overflow -> dropped whole
    assert kept[4] == (False, 115)   # strict prefix: no backfill
    assert kept[5] == (True, 100)    # exactly on budget fits
    assert kept[6] == (False, 101)


def test_token_budget_histogram_cut_matches_window_on_hot_group(spark):
    """The histogram-cut strategy (VERDICT r7 task 6) must produce the
    IDENTICAL keep-set and tokens_cum as the window path on a frame
    where one group holds 90% of the rows — the hot-group case the
    analytic cut exists for."""
    import random

    from demy_spark.operators.selection import token_budget_select

    rng = random.Random(8)
    rows = [
        ("hot", i, rng.randrange(0, 40), rng.randrange(1, 30))
        for i in range(900)
    ] + [
        (f"cold{i % 9}", 1000 + i, rng.randrange(0, 40), rng.randrange(1, 30))
        for i in range(100)
    ]
    # NULL score and NULL group key rows must survive BOTH strategies
    # identically (the histogram join back is null-safe — r8 review:
    # a name-based equi-join silently dropped them)
    rows += [
        ("hot", 5000, None, 10),
        (None, 5001, 7, 10),
        (None, 5002, None, 10),
    ]
    df = spark.createDataFrame(rows, "src string, id long, score long, n_tok long")
    nkey = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    want = sorted(
        (
            tuple(r)
            for r in token_budget_select(
                df, "score", "n_tok", 2000, by=["src"], id_col="id"
            ).collect()
        ),
        key=nkey,
    )
    assert len(want) == len(rows)  # row-preserving incl. NULLs
    got = sorted(
        (
            tuple(r)
            for r in token_budget_select(
                df,
                "score",
                "n_tok",
                2000,
                by=["src"],
                id_col="id",
                strategy="histogram",
            ).collect()
        ),
        key=nkey,
    )
    assert got == want
    assert any(r[-1] for r in got) and not all(r[-1] for r in got)


def test_token_budget_global_selection(spark):
    """by=None: the window path refuses loudly (one global reducer —
    the VERDICT r7 scale trap); the histogram path implements it and
    matches a driver-side replay of the greedy prefix."""
    import pytest as _pytest

    from demy_spark.operators.selection import token_budget_select

    rows = [(i, (i * 7) % 13, 10 + (i % 5)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, score long, n_tok long")
    with _pytest.raises(ValueError, match="global-window"):
        token_budget_select(df, "score", "n_tok", 300, id_col="id")
    with _pytest.raises(ValueError, match="id_col"):
        token_budget_select(
            df, "score", "n_tok", 300, strategy="histogram"
        )
    out = token_budget_select(
        df, "score", "n_tok", 300, id_col="id", strategy="histogram"
    )
    got = {r["id"]: (r["keep"], r["tokens_cum"]) for r in out.collect()}
    cum = 0
    for i, s, n in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += n
        assert got[i] == (cum <= 300, cum)
