"""Span detection (operators.spans): exact argmax over bounded-length
token spans of a frozen linear scorer, one window pass, no UDF."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from demy_spark.operators.spans import detect_best_span, token_margins


def _mk(spark, docs):
    rows = [
        (doc_id, pos, vec)
        for doc_id, vecs in docs.items()
        for pos, vec in enumerate(vecs)
    ]
    return spark.createDataFrame(rows, "doc_id long, pos int, vec array<double>")


def _brute(vecs, w, b, W):
    best = None
    for i, j in itertools.combinations_with_replacement(range(len(vecs)), 2):
        if j - i + 1 > W:
            continue
        m = sum(
            sum(wk * vk for wk, vk in zip(w, v)) for v in vecs[i : j + 1]
        ) + b
        key = (-m, i, j)
        if best is None or key < best[0]:
            best = (key, i, j, m)
    return best[1:]


def test_matches_bruteforce(spark):
    import random

    rnd = random.Random(11)
    w = [rnd.uniform(-1, 1) for _ in range(4)]
    docs = {
        d: [[rnd.uniform(-1, 1) for _ in range(4)] for _ in range(rnd.randint(1, 9))]
        for d in range(12)
    }
    out = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["margin"])
        for r in detect_best_span(
            _mk(spark, docs), weights=w, bias=0.25, window_size=3
        ).collect()
    }
    assert set(out) == set(docs)
    for d, vecs in docs.items():
        i, j, m = _brute(vecs, w, 0.25, 3)
        gi, gj, gm = out[d]
        assert (gi, gj) == (i, j), f"doc {d}"
        assert gm == pytest.approx(m, abs=1e-9)


def test_window_bound_respected(spark):
    # all-positive tokens: unbounded best span is the whole doc, but
    # W=2 must cap the span length
    docs = {0: [[1.0], [1.0], [1.0], [1.0]]}
    r = detect_best_span(_mk(spark, docs), weights=[1.0], window_size=2).collect()[0]
    assert r["span_end"] - r["span_start"] + 1 == 2
    assert r["margin"] == pytest.approx(2.0)


def test_score_is_calibrated_margin(spark):
    docs = {0: [[2.0]]}
    r = detect_best_span(_mk(spark, docs), weights=[1.0], window_size=1).collect()[0]
    assert r["score"] == pytest.approx(0.5 + math.atan(2.0) / math.pi)


def test_tie_breaks_to_earliest(spark):
    docs = {0: [[1.0], [-1.0], [1.0]]}
    r = detect_best_span(_mk(spark, docs), weights=[1.0], window_size=1).collect()[0]
    assert (r["span_start"], r["span_end"]) == (0, 0)


def test_token_margins_no_udf(spark):
    docs = {0: [[1.0, 2.0]]}
    plan = token_margins(_mk(spark, docs), "vec", [0.5, 0.25])._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
