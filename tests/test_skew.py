from __future__ import annotations

from pyspark.sql import functions as F

from demy_spark.operators.skew import (
    hot_keys,
    salted_agg,
    salted_join,
    skew_aware_join,
)


def _skewed(spark):
    # key 0 holds ~70% of rows; keys 1..9 share the tail
    left = spark.range(1000).select(
        F.when(F.col("id") < 700, 0).otherwise(F.col("id") % 9 + 1).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame([(i, f"dim{i}") for i in range(10)], ["k", "name"])
    return left, right


def test_salted_join_matches_plain(spark):
    left, right = _skewed(spark)
    plain = left.join(right, on="k").select("k", "v", "name")
    salted = salted_join(left, right, "k", salts=4).select("k", "v", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    left, right = _skewed(spark)
    right_partial = right.where(F.col("k") < 5)
    plain = left.join(right_partial, on="k", how="left").select("k", "v", "name")
    salted = salted_join(left, right_partial, "k", salts=4, how="left").select(
        "k", "v", "name"
    )
    assert sorted(map(tuple, salted.collect()), key=str) == sorted(
        map(tuple, plain.collect()), key=str
    )


def test_salted_agg_matches_direct(spark):
    left, _ = _skewed(spark)
    direct = {
        r["k"]: (r["n"], r["s"], r["d"])
        for r in left.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.countDistinct("v").alias("d"),
        )
        .collect()
    }
    two_phase = salted_agg(
        left,
        "k",
        {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "s": (F.sum("v"), F.sum("s")),
            "d": (
                F.collect_set("v"),
                F.size(F.array_distinct(F.flatten(F.collect_list("d")))).cast("long"),
            ),
        },
        salts=8,
    )
    got = {r["k"]: (r["n"], r["s"], r["d"]) for r in two_phase.collect()}
    assert got == direct


def test_hot_keys_detects_head(spark):
    left, _ = _skewed(spark)
    hot = hot_keys(left, "k", top_n=3, min_share=0.05).collect()
    assert hot[0]["k"] == 0 and hot[0]["n"] == 700
    assert hot[0]["share"] == 0.7


def test_skew_aware_join_matches_plain(spark):
    left, right = _skewed(spark)
    plain = left.join(right, on="k").select("k", "v", "name")
    for hot in ([0], None):  # explicit hot list and auto-detection
        hybrid = skew_aware_join(left, right, "k", hot=hot, salts=4).select(
            "k", "v", "name"
        )
        assert sorted(map(tuple, hybrid.collect())) == sorted(
            map(tuple, plain.collect())
        )


def test_skew_aware_join_empty_hot_falls_back(spark):
    left, right = _skewed(spark)
    out = skew_aware_join(left, right, "k", hot=[], salts=4)
    assert out.count() == left.count()
