"""Unit tests for entity matching and co-occurrence refinement."""

from __future__ import annotations

from demy_spark.entity import cooccurring_tokens, match_entities


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick join runs a hash join fast"),
            (2, "merge sort beats a slow scan"),
            (3, "jion with a typo and a scan"),
            (4, "nothing relevant here"),
        ],
        ["doc_id", "text"],
    )


def _ents(spark):
    return spark.createDataFrame(
        [("join_ops", "join"), ("join_ops", "merge"), ("scan_ops", "scan")],
        ["entity", "synonym"],
    )


def test_match_entities_exact(spark):
    m = match_entities(_docs(spark), "text", "doc_id", _ents(spark))
    rows = [(r["doc_id"], r["entity"], r["token"]) for r in m.collect()]
    assert rows.count((1, "join_ops", "join")) == 2  # both occurrences
    assert (2, "join_ops", "merge") in rows
    assert (3, "scan_ops", "scan") in rows
    assert not any(d == 4 for d, _, _ in rows)


def test_match_entities_fuzzy_catches_typo(spark):
    m = match_entities(
        _docs(spark), "text", "doc_id", _ents(spark), min_similarity=0.5
    )
    rows = {(r["doc_id"], r["token"], r["synonym"]) for r in m.collect()}
    # plain levenshtein counts a transposition as 2 edits → sim 0.5
    assert (3, "jion", "join") in rows
    sims = {(r["token"], r["synonym"]): r["similarity"] for r in m.collect()}
    assert sims[("jion", "join")] == 0.5


def test_cooccurring_tokens_ranks_and_excludes_matches(spark):
    docs = _docs(spark)
    m = match_entities(docs, "text", "doc_id", _ents(spark))
    out = cooccurring_tokens(docs, "text", "doc_id", m, top_k=5, min_count=1)
    got = {(r["entity"], r["candidate"]): r["n_docs"] for r in out.collect()}
    assert ("join_ops", "a") in got and got[("join_ops", "a")] == 2
    assert ("join_ops", "join") not in got  # matched token excluded
    assert ("join_ops", "merge") not in got


def test_refine_entities_two_rounds(spark):
    """Round 1 accepts the strongest co-occurring tokens; round 2
    proposes relative to the GROWN dictionary; known synonyms are never
    re-accepted (EntityCalculator's iterative loop with the
    deterministic auto-accept policy)."""
    from demy_spark.entity import refine_entities

    docs = spark.createDataFrame(
        [
            (1, "acme corp ltd"),
            (2, "acme corp ltd"),
            (3, "acme corp paris"),
            (4, "corp paris metro"),
            (5, "other words here"),
        ],
        ["doc_id", "text"],
    )
    seeds = spark.createDataFrame([("e1", "acme")], ["entity", "synonym"])
    out = refine_entities(
        docs, "text", "doc_id", seeds, rounds=2, accept_top_k=1, min_count=2
    )
    rows = {(r["synonym"]): r["round_added"] for r in out.collect()}
    # round 1: corp co-occurs with acme in 3 docs (ltd only 2) -> corp
    assert rows == {"acme": 0, "corp": 1, "ltd": 2}
    # round 2 proposes vs the grown dict {acme, corp}: candidate docs
    # now include doc 4; ltd(2) beats paris(2) on the token tie-break
