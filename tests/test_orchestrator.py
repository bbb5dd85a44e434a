"""Unit tests for the pipeline orchestrator."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from demy_spark.orchestrator import Model, Plan, Step, grid_search


def _model(tmp_path=None):
    return Model(
        "m",
        [
            Step(
                "filtered",
                lambda df, min_id=0: df.where(F.col("id") >= min_id),
                inputs=["#base"],
            ),
            Step(
                "doubled",
                lambda df: df.withColumn("twice", F.col("id") * 2),
                inputs=["$filtered"],
                rename={"twice": "double_id"},
            ),
            Step(
                "agg",
                lambda df: df.agg(F.sum("double_id").alias("total")),
                inputs=["$doubled"],
            ),
        ],
        snapshot_dir=str(tmp_path) if tmp_path else None,
    )


def test_run_wires_named_inputs(spark):
    out = _model().run(spark, {"base": spark.range(10)})
    assert out["output"].first()["total"] == 90  # 2 * sum(0..9)
    assert set(out) == {"filtered", "doubled", "agg", "output"}
    assert "double_id" in out["doubled"].columns


def test_run_overrides_params(spark):
    m = _model()
    out = m.run(spark, {"base": spark.range(10)}, overrides={"filtered": {"min_id": 5}})
    assert out["output"].first()["total"] == 70  # 2 * sum(5..9)
    assert len(m.metrics) == 3
    assert {x["step"] for x in m.metrics} == {"filtered", "doubled", "agg"}


def test_snapshot_reuse(spark, tmp_path):
    m = _model(tmp_path)
    m.steps[1].snapshot = True
    m.run(spark, {"base": spark.range(10)})
    snap = os.path.join(str(tmp_path), "m", "0", "doubled")
    assert os.path.exists(os.path.join(snap, "_SUCCESS"))
    # poison the upstream: reuse means the snapshot, not the new input, wins
    out2 = m.run(spark, {"base": spark.range(3)})
    assert out2["output"].first()["total"] == 90


def test_plan_expansion():
    p = Plan().switch("filtered", "min_id", [0, 5]).switch("agg", "mode", ["a", "b"])
    versions = p.build()
    assert len(versions) == 4
    assert versions[0] == {"filtered": {"min_id": 0}, "agg": {"mode": "a"}}
    assert len(Plan().set("s", x=1).repeat(3).build()) == 3
    assert len(Plan().switch("s", "x", [1, 2]).merge(Plan()).build()) == 3


def test_grid_search_picks_best(spark):
    result = grid_search(
        _model(),
        spark,
        {"base": spark.range(10)},
        Plan().switch("filtered", "min_id", [0, 5, 9]),
        evaluate=lambda df: float(df.first()["total"]),
        maximize=False,
    )
    assert result["best_version"] == "2"  # min_id=9 → total 18
    assert result["best_score"] == 18.0
    assert len(result["scores"]) == 3
