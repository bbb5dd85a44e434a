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


# ------------------------------------------------ app config (r11, §3 EP1)


def test_load_config_object_and_list_forms(tmp_path):
    """Configuration.scala:11-35: one JSON object or a list of objects
    (merged left-to-right); values stringified; file values do NOT
    merge with defaults — defaults only serve get_or_default."""
    import json

    import pytest

    from demy_spark.config import load_config

    obj = tmp_path / "conf.json"
    obj.write_text(json.dumps({"storage.root": "/data", "folds": 5, "ansi": True}))
    cfg = load_config(str(obj), defaults={"folds": 3, "mode": "fast"})
    assert cfg.get("storage.root") == "/data"
    assert cfg.get("folds") == "5"  # stringified like the reference's .toString
    assert cfg.get("ansi") == "true"  # JVM-style lowercase boolean
    assert cfg.get("mode") is None  # defaults are NOT merged into values
    assert cfg.get_or_default("mode") == "fast"
    assert cfg.get_or_default("folds") == "5"  # file wins over default
    with pytest.raises(KeyError, match="neither|Cannot find"):
        cfg.get_or_default("absent.prop")

    lst = tmp_path / "list.json"
    lst.write_text(json.dumps([{"a": 1}, {"b": 2, "a": 9}]))
    cfg2 = load_config(str(lst))
    assert cfg2.get("a") == "9" and cfg2.get("b") == "2"  # later elems win

    # no file: the defaults ARE the values (the missing-FSNode branch)
    cfg3 = load_config(None, defaults={"x": 1})
    assert cfg3.get("x") == "1"


def test_load_config_rejects_non_json_and_scalar(tmp_path):
    import pytest

    from demy_spark.config import load_config

    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    with pytest.raises(ValueError, match="as json"):
        load_config(str(bad))
    scalar = tmp_path / "scalar.json"
    scalar.write_text('"just-a-string"')
    with pytest.raises(ValueError, match="problem loading"):
        load_config(str(scalar))
    lst = tmp_path / "lst.json"
    lst.write_text("[1, 2]")
    with pytest.raises(ValueError, match="cannot interpret"):
        load_config(str(lst))


def test_model_resolves_cfg_params(spark, tmp_path):
    """A Step param marked Cfg('prop') resolves through the model's
    Configuration at run time (the reference's models reading
    properties out of the app config)."""
    import json

    import pytest

    from demy_spark.config import Cfg, load_config

    conf = tmp_path / "app.json"
    conf.write_text(json.dumps({"filter.min_id": 7}))
    cfg = load_config(str(conf), defaults={"filter.min_id": 0})

    def flt(df, min_id):
        return df.filter(F.col("id") >= int(min_id))

    m = Model(
        "cfgm",
        [Step("f", flt, inputs=["#base"], params={"min_id": Cfg("filter.min_id")})],
        config=cfg,
    )
    out = m.run(spark, {"base": spark.range(10)})
    assert out["output"].count() == 3  # ids 7, 8, 9

    bare = Model(
        "nocfg",
        [Step("f", flt, inputs=["#base"], params={"min_id": Cfg("filter.min_id")})],
    )
    with pytest.raises(ValueError, match="no configuration"):
        bare.run(spark, {"base": spark.range(10)})


def test_application_bootstrap_end_to_end(spark, tmp_path):
    """Application.scala parity (§3 EP1): key=value args parsed
    case-insensitively, config loaded over defaults, run() invoked
    with (session, Configuration); malformed args print usage and
    return None without invoking run."""
    import json

    from demy_spark.app import parse_app_args, run_application

    assert parse_app_args(["Master=local[2]", "appName=x"]) == {
        "master": "local[2]", "appname": "x"}
    for bad in (["=x"], ["master="], ["nope"], ["other=1"]):
        assert parse_app_args(bad) is None

    conf = tmp_path / "app.json"
    conf.write_text(json.dumps({"threshold": 7}))
    seen = {}

    def body(session, configuration):
        seen["n"] = session.range(
            int(configuration.get_or_default("threshold"))).count()
        seen["mode"] = configuration.get_or_default("mode")
        return "done"

    out = run_application(
        body,
        [f"config={conf}", "appname=t"],
        default_conf_values={"threshold": 3, "mode": "fast"},
        spark=spark,
    )
    assert out == "done" and seen == {"n": 7, "mode": "fast"}

    # malformed arg: usage path, run never called
    seen.clear()
    assert run_application(body, ["bogus"], spark=spark) is None
    assert seen == {}
