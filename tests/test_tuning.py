"""Unit tests for folders, out-of-fold prediction and threshold sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demy_spark.tuning import (
    best_threshold,
    fold_of,
    out_of_fold_predict,
    random_split,
    rank_split,
    threshold_sweep,
    train_test_folds,
)


def _df(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("key"), (F.col("id") % 7).alias("grp"), F.rand(1).alias("x")
    )


def test_random_split_partitions_everything(spark):
    df = random_split(_df(spark), 5, "key")
    counts = {r["fold"]: r["n"] for r in df.groupBy("fold").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {0, 1, 2, 3, 4}
    assert sum(counts.values()) == 200
    # deterministic: same seed → same assignment
    again = random_split(_df(spark), 5, "key")
    assert df.select("key", "fold").collect() == again.select("key", "fold").collect()


def test_fold_of_group_consistency(spark):
    df = _df(spark).withColumn("fold", fold_of("grp", 3))
    per_group = df.groupBy("grp").agg(F.countDistinct("fold").alias("k")).collect()
    assert all(r["k"] == 1 for r in per_group)


def test_rank_split_balanced(spark):
    df = rank_split(_df(spark), 4, ["x"])
    counts = [r["n"] for r in df.groupBy("fold").agg(F.count("*").alias("n")).orderBy("fold").collect()]
    assert counts == [50, 50, 50, 50]


def test_train_test_folds_disjoint_cover(spark):
    df = random_split(_df(spark), 3, "key")
    seen = set()
    for _, train, test in train_test_folds(df, 3):
        test_keys = {r["key"] for r in test.select("key").collect()}
        train_keys = {r["key"] for r in train.select("key").collect()}
        assert not (test_keys & train_keys)
        seen |= test_keys
    assert len(seen) == 200


def test_out_of_fold_predict_covers_all_rows(spark):
    df = _df(spark)

    def fit(train):
        return train.agg(F.avg("x")).first()[0]

    def transform(mean, test):
        return test.select("key", (F.col("x") > mean).cast("int").alias("pred"))

    oof = out_of_fold_predict(df, 4, "key", fit, transform)
    assert oof.count() == 200
    assert oof.select("key").distinct().count() == 200


def test_out_of_fold_force_filters(spark):
    df = _df(spark)

    def fit(train):
        # forced-train rows (key<10) must be in every training set
        keys = {r["key"] for r in train.select("key").collect()}
        assert set(range(10)) <= keys
        return train.agg(F.avg("x")).first()[0]

    def transform(mean, test):
        return test.select("key", F.lit(float(mean)).alias("m"))

    oof = out_of_fold_predict(
        df, 3, "key", fit, transform, force_train_on="key < 10", force_test_on="key >= 190"
    )
    keys = [r["key"] for r in oof.select("key").collect()]
    assert set(range(10)).isdisjoint(keys)  # forced-train never predicted
    assert set(range(190, 200)) <= set(keys)  # forced-test always predicted
    assert len(keys) == len(set(keys)) == 190


def test_threshold_sweep_known_counts(spark):
    # scores .1/.4/.6/.9 with labels 0/0/1/1 → perfect split at 0.5
    rows = [(0.1, 0), (0.4, 0), (0.6, 1), (0.9, 1)]
    df = spark.createDataFrame(rows, ["score", "y"])
    sweep = threshold_sweep(df, "score", "y", bins=10).collect()
    by_thr = {r["threshold"]: r for r in sweep}
    r = by_thr[0.6]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 0, 0, 2)
    assert r["f1"] == 1.0
    r9 = by_thr[0.9]
    assert (r9["tp"], r9["fp"]) == (1, 0)


def test_best_threshold_modes(spark):
    rows = [(0.1, 0), (0.4, 0), (0.6, 1), (0.9, 1)]
    df = spark.createDataFrame(rows, ["score", "y"])
    sweep = threshold_sweep(df, "score", "y", bins=10)
    best = best_threshold(sweep, optimize="f1")
    assert best["threshold"] == pytest.approx(0.6)
    high_p = best_threshold(sweep, optimize="recall", min_precision=1.0)
    assert high_p["precision"] == 1.0


def test_binary_metrics_bundle(spark):
    from demy_spark.tuning import binary_metrics

    # perfectly separable → AUC 1, huge chi2, tiny p
    rows = [(0.1, 0), (0.2, 0), (0.3, 0), (0.7, 1), (0.8, 1), (0.9, 1)]
    df = spark.createDataFrame(rows, ["score", "y"])
    m = binary_metrics(df, "score", "y", bins=10)
    assert m["f1"] == 1.0
    assert m["auc"] == 1.0
    assert m["chi2"] == pytest.approx(6.0)  # n * 1 for a perfect 3/3 split
    assert 0 < m["p_value"] < 0.05

    # anti-correlated scores → AUC 0
    flipped = spark.createDataFrame([(1 - s, y) for s, y in rows], ["score", "y"])
    assert binary_metrics(flipped, "score", "y", bins=10)["auc"] == 0.0


def test_platt_fit_recovers_sigmoid():
    """Adaptive-mode Platt fit recovers the generating sigmoid's
    parameters from sampled labels (scala getA_B semantics)."""
    import math
    import random

    from demy_spark.functions.calibration import platt_fit

    rnd = random.Random(5)
    a_true, b_true = -2.0, 0.3
    decis = [rnd.uniform(-3, 3) for _ in range(2000)]
    labels = [
        1 if rnd.random() < 1.0 / (1.0 + math.exp(a_true * d + b_true)) else 0
        for d in decis
    ]
    a, b = platt_fit(decis, labels)
    assert abs(a - a_true) < 0.4
    assert abs(b - b_true) < 0.3


def test_platt_fixed_steps_deterministic():
    from demy_spark.functions.calibration import platt_fit

    decis = [(-1) ** i * (i / 10.0) for i in range(40)]
    labels = [1 if i % 3 == 0 else 0 for i in range(40)]
    assert platt_fit(decis, labels, n_steps=2) == platt_fit(
        decis, labels, n_steps=2
    )
    # more steps move toward the adaptive-mode optimum
    a_full, b_full = platt_fit(decis, labels)
    a_8, b_8 = platt_fit(decis, labels, n_steps=8)
    assert abs(a_8 - a_full) < 0.1
