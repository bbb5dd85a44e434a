"""Unit tests for geo operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demy_spark.geo import (
    admin_hierarchy_flatten,
    best_locality_match,
    parse_address,
    point_in_bbox_join,
)


def test_parse_address_full(spark):
    df = spark.createDataFrame(
        [
            ("12 RUE DE LA PAIX 75002 PARIS",),
            ("8 AVENUE FOCH 69006 LYON CEDEX",),
            ("RUE SANS NUMERO 13001 MARSEILLE",),
            ("42 CHEMIN VERT",),
        ],
        ["addr"],
    )
    rows = df.select(parse_address("addr").alias("p")).collect()
    p0 = rows[0]["p"]
    assert (p0["house_number"], p0["postcode"]) == (12, "75002")
    assert (p0["street"], p0["city"]) == ("RUE DE LA PAIX", "PARIS")
    p1 = rows[1]["p"]
    assert (p1["street"], p1["city"]) == ("AVENUE FOCH", "LYON CEDEX")
    p2 = rows[2]["p"]
    assert p2["house_number"] is None
    assert (p2["postcode"], p2["city"]) == ("13001", "MARSEILLE")
    p3 = rows[3]["p"]
    assert (p3["house_number"], p3["postcode"]) == (42, None)
    assert (p3["street"], p3["city"]) == ("CHEMIN VERT", "")


def test_best_locality_match_picks_min_distance(spark):
    queries = spark.createDataFrame([("PARIZ",), ("LYONN",)], ["city"])
    localities = spark.createDataFrame(
        [("PARIS",), ("LYON",), ("MARSEILLE",)], ["name"]
    )
    out = best_locality_match(queries, localities, "city", "name").collect()
    got = {r["city"]: (r["matched_name"], r["match_distance"]) for r in out}
    assert got["PARIZ"] == ("PARIS", 1)
    assert got["LYONN"] == ("LYON", 1)


def test_admin_hierarchy_flatten_paths(spark):
    regions = spark.createDataFrame([(1, "EUROPE")], ["rk", "rname"])
    nations = spark.createDataFrame([(10, 1, "FRANCE"), (11, 1, "SPAIN")], ["nk", "rk", "nname"])
    cities = spark.createDataFrame([(100, 10, "PARIS"), (101, 11, "MADRID")], ["ck", "nk", "cname"])
    out = admin_hierarchy_flatten(
        [
            (regions, "rk", "", "rname"),
            (nations, "nk", "rk", "nname"),
            (cities, "ck", "nk", "cname"),
        ]
    )
    got = {r["leaf_key"]: r["path"] for r in out.collect()}
    assert got == {100: "EUROPE > FRANCE > PARIS", 101: "EUROPE > SPAIN > MADRID"}


def test_point_in_bbox_join(spark):
    points = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 1.5, 0.5), (3, -1.0, -1.0)], ["pid", "x", "y"]
    )
    boxes = spark.createDataFrame(
        [("A", 0.0, 1.0, 0.0, 1.0), ("B", 1.0, 2.0, 0.0, 1.0)],
        ["box", "x_min", "x_max", "y_min", "y_max"],
    )
    out = point_in_bbox_join(points, boxes)
    got = {r["pid"]: r["box"] for r in out.collect()}
    assert got == {1: "A", 2: "B"}  # point 3 falls in no box


def test_point_in_polygon_verify_requires_shapely(spark):
    pytest.importorskip("shapely", reason="shapely not bundled")


def test_raycast_concave_polygon(spark):
    from demy_spark.geo import point_in_polygon_raycast

    # concave "C" shape: notch on the right side
    xs = [0.0, 4.0, 4.0, 1.0, 1.0, 4.0, 4.0, 0.0]
    ys = [0.0, 0.0, 1.0, 1.0, 3.0, 3.0, 4.0, 4.0]
    pts = [
        (0, 0.5, 2.0, True),   # inside the spine
        (1, 2.5, 2.0, False),  # inside the notch (outside polygon)
        (2, 2.5, 0.5, True),   # lower arm
        (3, 2.5, 3.5, True),   # upper arm
        (4, 5.0, 2.0, False),  # right of everything
        (5, -1.0, 2.0, False), # left of everything (ray crosses twice)
    ]
    df = spark.createDataFrame(
        [(i, x, y, xs, ys) for i, x, y, _ in pts],
        "pt_id int, x double, y double, xs array<double>, ys array<double>",
    )
    got = {
        r["pt_id"]: r["contains"]
        for r in point_in_polygon_raycast(df).collect()
    }
    for i, _, _, want in pts:
        assert got[i] == want, f"point {i}"


def test_raycast_stays_in_codegen(spark):
    from demy_spark.geo import point_in_polygon_raycast

    df = spark.createDataFrame(
        [(1.0, 1.0, [0.0, 2.0, 1.0], [0.0, 0.0, 2.0])],
        "x double, y double, xs array<double>, ys array<double>",
    )
    plan = point_in_polygon_raycast(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
