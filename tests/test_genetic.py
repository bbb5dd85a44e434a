"""Unit tests for the genetic prototype selector."""

from __future__ import annotations

import pytest

from demy_spark.genetic import evolve_prototypes, sample_vectors, score_population


def _blobs(spark):
    # two orthogonal blobs: prototypes covering both should win
    rows = [(i, [1.0, 0.05 * (i % 3), 0.0]) for i in range(10)] + [
        (10 + i, [0.0, 1.0, 0.05 * (i % 3)]) for i in range(10)
    ]
    return spark.createDataFrame(rows, ["id", "vec"])


def test_score_population_prefers_covering_sets(spark):
    df = _blobs(spark)
    both = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    only_x = [[1.0, 0.0, 0.0], [0.9, 0.1, 0.0]]
    fits = score_population(df, "id", "vec", [both, only_x])
    assert fits[0] > fits[1] > 0.0
    assert fits[0] > 0.99  # every doc ≈ on one of the two axes


def test_sample_vectors_deterministic(spark):
    df = _blobs(spark)
    a = sample_vectors(df, "id", "vec", 5, seed=7)
    b = sample_vectors(df, "id", "vec", 5, seed=7)
    assert a == b and len(a) == 5


def test_evolve_improves_or_holds_fitness(spark):
    df = _blobs(spark)
    best, fit, history = evolve_prototypes(
        df, "id", "vec", k=2, pop_size=6, generations=3, seed=11
    )
    assert len(best) == 2
    assert fit == pytest.approx(max(history))
    assert fit >= history[0] - 1e-9  # elitism: never regresses
    assert fit > 0.97  # two prototypes suffice for two blobs
