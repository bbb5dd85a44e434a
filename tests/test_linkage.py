from __future__ import annotations

from demy_spark.operators.linkage import record_linkage


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "B1", "john smith", "acme corp"),
            (2, "B1", "jane doe", "globex"),
            (3, "B2", "john smith", "acme corp"),
        ],
        "id long, blk string, name string, firm string",
    )
    right = spark.createDataFrame(
        [
            (10, "B1", "jon smith", "acme corp"),   # typo'd 1
            (11, "B1", "jane d", "globex inc"),     # truncated 2
            (12, "B2", "zzzzzz", "qqqqqq"),         # matches nothing well
        ],
        "rid long, blk string, name string, firm string",
    )
    return left, right


def test_record_linkage_best_match_within_block(spark):
    left, right = _frames(spark)
    out = {
        r["rid"]: (r["id"], r["score_micro"])
        for r in record_linkage(
            left, right, "id", "rid", "blk",
            [("name", 0.7), ("firm", 0.3)], min_score=0.5,
        ).collect()
    }
    assert out[10][0] == 1          # typo still links to john in B1
    assert out[11][0] == 2
    # blocking: rid 10 can never link to id 3 (same fields, block B2)
    assert 12 not in out            # below threshold -> no row
    assert out[10][1] > out[11][1]  # closer match scores higher


def test_record_linkage_tie_breaks_to_smallest_left_id(spark):
    left = spark.createDataFrame(
        [(5, "B", "same"), (4, "B", "same")], "id long, blk string, name string"
    )
    right = spark.createDataFrame(
        [(9, "B", "same")], "rid long, blk string, name string"
    )
    out = record_linkage(
        left, right, "id", "rid", "blk", [("name", 1.0)]
    ).collect()
    assert len(out) == 1 and out[0]["id"] == 4
    assert out[0]["score_micro"] == 1_000_000


def test_record_linkage_null_field_scores_zero(spark):
    left = spark.createDataFrame(
        [(1, "B", None, "acme")], "id long, blk string, name string, firm string"
    )
    right = spark.createDataFrame(
        [(9, "B", "anything", "acme")],
        "rid long, blk string, name string, firm string",
    )
    out = record_linkage(
        left, right, "id", "rid", "blk", [("name", 0.7), ("firm", 0.3)]
    ).collect()
    # name contributes 0 (no evidence), firm matches fully
    assert out[0]["score_micro"] == 300_000


def test_sorted_neighborhood_exact_pair_set(spark):
    from demy_spark.operators.linkage import sorted_neighborhood_pairs

    # keys sort as k00..k19; window 3 -> pairs with rank gap 1..3
    rows = [(i, f"k{i:02d}") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, k string")
    got = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(df, "id", "k", window=3).collect()
    }
    want = {(a, b) for a in range(20) for b in range(20) if 0 < b - a <= 3}
    assert got == want


def test_sorted_neighborhood_orders_by_key_not_id(spark):
    from demy_spark.operators.linkage import sorted_neighborhood_pairs

    # reversed key order: neighbors in KEY space, not id space
    rows = [(i, f"k{99 - i:02d}") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, k string")
    out = sorted_neighborhood_pairs(df, "id", "k", window=1).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    # key-adjacent = id-adjacent here, but pos follows the KEY order:
    # id 9 has key k90 (lowest) -> pos 0
    pos = {r["id_a"]: r["pos_a"] for r in out}
    assert pos[9] == 0
    # pairs are POSITION-ordered: id 9 (lowest key) precedes id 8
    assert got == {(a + 1, a) for a in range(9)}


def test_record_linkage_candidates_mode_matches_block_mode(spark):
    from demy_spark.operators.linkage import record_linkage

    left, right = _frames(spark)
    blocked = record_linkage(
        left, right, "id", "rid", "blk",
        [("name", 0.7), ("firm", 0.3)], min_score=0.5,
    ).collect()
    # equivalent candidate set: the in-block cross product
    cands = (
        right.selectExpr("rid", "blk")
        .join(left.selectExpr("id", "blk"), "blk")
        .select("id", "rid")
    )
    via_cands = record_linkage(
        left, right, "id", "rid", None,
        [("name", 0.7), ("firm", 0.3)], min_score=0.5, candidates=cands,
    ).collect()
    key = lambda r: (r["rid"], r["id"], r["score_micro"])  # noqa: E731
    assert sorted(map(key, blocked)) == sorted(map(key, via_cands))


def test_record_linkage_requires_exactly_one_blocking(spark):
    import pytest

    from demy_spark.operators.linkage import record_linkage

    left, right = _frames(spark)
    with pytest.raises(ValueError):
        record_linkage(left, right, "id", "rid", None, [("name", 1.0)])


def test_order_positions_equals_global_row_number(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from demy_spark.operators.topk import order_positions

    # adversarial: duplicate keys, skewed distribution, shuffled input
    rows = [(i, f"k{(i * 7) % 13:02d}") for i in range(500)]
    df = spark.createDataFrame(rows, "id long, k string").repartition(16)
    got = {
        r["id"]: r["_pos_"]
        for r in order_positions(df, [F.col("k").asc(), F.col("id").asc()]).collect()
    }
    want = {
        r["id"]: r["p"]
        for r in df.withColumn(
            "p", F.row_number().over(Window.orderBy("k", "id")) - 1
        ).collect()
    }
    assert got == want
