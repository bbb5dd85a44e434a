from __future__ import annotations

from demy_spark.operators.phrases import apply_merges, phrase_merges


def test_apply_merges_replays_training(spark):
    """Applying the merge list phrase_merges learned reproduces the
    trained token stream exactly — the train/apply pair can't drift
    (they share _merge_pass)."""
    rows = [
        (1, "new york is big new york is old"),
        (2, "in new york new york wins"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges, trained = phrase_merges(docs, "doc_id", "text", iterations=2)
    pairs = [
        (r["w1"], r["w2"])
        for r in merges.orderBy("iteration").collect()
        if r["w1"] is not None
    ]
    applied = apply_merges(docs, "doc_id", "text", pairs)
    key = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert key(applied) == key(trained)


def test_apply_merges_chains_and_noops(spark):
    docs = spark.createDataFrame([(1, "a b c a b")], "doc_id long, text string")
    out = apply_merges(
        docs, "doc_id", "text", [("a", "b"), ("a@@b", "c"), ("zz", "qq")]
    )
    toks = [r["token"] for r in out.orderBy("pos").collect()]
    assert toks == ["a@@b@@c", "a@@b"]  # chained merge; unknown pair no-ops
    # empty merge list is the identity
    same = apply_merges(docs, "doc_id", "text", [])
    assert [r["token"] for r in same.orderBy("pos").collect()] == [
        "a", "b", "c", "a", "b",
    ]


def _run(spark, rows, iterations=3):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges, tokens = phrase_merges(docs, "doc_id", "text", iterations=iterations)
    m = [
        (r["iteration"], r["w1"], r["w2"], r["pair_count"], r["tokens_after"])
        for r in merges.orderBy("iteration").collect()
    ]
    t = {
        d: [
            r["token"]
            for r in sorted(rows_t, key=lambda r: r["pos"])
        ]
        for d, rows_t in _group(tokens.collect())
    }
    return m, t


def _group(rows):
    out: dict = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(r)
    return out.items()


def test_phrase_merges_reliable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir switches per-round lineage truncation from
    executor-local blocks to a reliable checkpoint that survives
    executor loss — results identical either way."""
    rows = [(1, "new york is big new york is old")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges, tokens = phrase_merges(
        docs, "doc_id", "text", iterations=2, checkpoint_dir=str(tmp_path / "ckpt")
    )
    got = [(r["w1"], r["w2"]) for r in merges.orderBy("iteration").collect()]
    assert got == [("new", "york"), ("new@@york", "is")]
    assert tokens.count() == 4
    # the reliable checkpoint actually wrote to the requested dir
    import os

    assert any(os.scandir(tmp_path / "ckpt"))


def test_phrase_merges_greedy_argmax_chain(spark):
    m, t = _run(
        spark,
        [
            (1, "new york is big new york is old"),
            (2, "in new york new york wins"),
        ],
    )
    # round 1: (new, york) x4; round 2: (new@@york, is) x2 —
    # merged tokens participate in later rounds
    assert m[0][:4] == (1, "new", "york", 4)
    assert m[1][:4] == (2, "new@@york", "is", 2)
    assert t[1][0] == "new@@york@@is"
    assert t[2][1] == "new@@york"


def test_phrase_merges_self_adjacent_run_parity(spark):
    # "a a a a a": pairs (a,a) x4; greedy left-to-right merges at
    # positions 0 and 2, leaving the odd tail unmerged
    m, t = _run(spark, [(1, "a a a a a")], iterations=1)
    assert m[0][:4] == (1, "a", "a", 4)
    assert t[1] == ["a@@a", "a@@a", "a"]


def test_phrase_merges_tie_breaks_lexicographic(spark):
    # (b c) and (a b)? craft equal counts: "b c" x2 and "x y" x2 —
    # tie on count 2 -> lexicographically smallest pair wins
    m, _ = _run(spark, [(1, "b c d b c"), (2, "x y z x y")], iterations=1)
    assert m[0][1:3] == ("b", "c")


def test_phrase_merges_token_count_bookkeeping(spark):
    m, t = _run(spark, [(1, "p q p q")], iterations=1)
    # 4 tokens, 2 merges -> 2 tokens after
    assert m[0][3] == 2 and m[0][4] == 2
    assert t[1] == ["p@@q", "p@@q"]


def test_phrase_merges_pair_exhaustion_is_noop(spark):
    # 2 tokens -> round 1 merges them; rounds 2-3 find NO pair and
    # must leave the stream intact (regression: the empty argmax
    # frame used to annihilate every token row)
    m, t = _run(spark, [(1, "a b")], iterations=3)
    assert t[1] == ["a@@b"]
    assert m[0][:4] == (1, "a", "b", 1)
    assert m[1][1] is None and m[1][2] is None and m[1][4] == 1
    assert m[2][1] is None and m[2][4] == 1
