"""HierarchyBuilder port: greedy nearest-pair agglomeration with
tag-set intersection, parent-count adjustment to the power of two
below the center count, and root→node paths
(reference mllib/src/main/scala/text/HierarchyBuilder.scala:6-232)."""

from __future__ import annotations

import numpy as np
import pytest

from demy_spark.hierarchy import (
    CenterTagged,
    HierarchyBuilder,
    build_center_hierarchy,
    cosine_distance,
)


def _c(cid, vec, tags=()):
    return CenterTagged(cid, np.asarray(vec, dtype=np.float64), tuple(tags))


def test_greedy_pairing_four_untagged():
    # 0 and 1 nearly parallel, 2 and 3 nearly parallel, the two groups
    # orthogonal: greedy pairing must produce (0,1) and (2,3).
    leafs = [
        _c(0, [1.0, 0.0]),
        _c(1, [0.9, 0.1]),
        _c(2, [0.0, 1.0]),
        _c(3, [0.1, 0.9]),
    ]
    b = HierarchyBuilder(leafs)
    b.build()
    assert b.child_of[4] == [0, 1]
    assert b.child_of[5] == [2, 3]
    assert b.child_of[6] == [4, 5]
    # parent center is the SUM of children (HierarchyBuilder.scala:28)
    np.testing.assert_allclose(b.nodes[4].center, [1.9, 0.1])
    # root path: every node's hierarchy starts at the root
    for nid in (0, 1, 2, 3, 4, 5):
        assert b.get_hierarchy(nid)[0] == 6


def test_tagged_groups_pair_first():
    # tags force (0,1) together even though 0 is closer to 2.
    leafs = [
        _c(0, [1.0, 0.0], ["a"]),
        _c(1, [0.0, 1.0], ["a"]),
        _c(2, [0.99, 0.05]),
        _c(3, [0.05, 0.99]),
    ]
    b = HierarchyBuilder(leafs)
    b.build()
    assert b.child_of[4] == [0, 1]
    assert b.nodes[4].tags == ("a",)
    # untagged leftovers pair together
    assert b.child_of[5] == [2, 3]
    assert b.nodes[5].tags == ()


def test_odd_count_single_child_parent():
    leafs = [_c(0, [1.0, 0.0]), _c(1, [0.9, 0.1]), _c(2, [0.0, 1.0])]
    b = HierarchyBuilder(leafs)
    b.build()
    # 3 centers → target 2 parents: pair (0,1) and single-child (2)
    assert b.child_of[3] == [0, 1]
    assert b.child_of[4] == [2]
    np.testing.assert_allclose(b.nodes[4].center, [0.0, 1.0])


def test_parent_count_is_power_of_two_below():
    rng = np.random.default_rng(7)
    leafs = [_c(i, rng.normal(size=8)) for i in range(6)]
    b = HierarchyBuilder(leafs)
    b.build()
    level1 = {b.parent_of[i] for i in range(6)}
    # 6 centers → 2^(ceil(log2 6)-1) = 4 parents
    assert len(level1) == 4
    level2 = {b.parent_of[p] for p in level1}
    assert len(level2) == 2


def test_zero_vector_distance():
    assert cosine_distance(np.zeros(3), np.ones(3)) == 1.0


def test_spark_wrapper_roundtrip(spark):
    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=4)], ["t"] if i < 2 else [])
            for i in range(4)]
    df = spark.createDataFrame(rows, "center_id long, center array<double>, tags array<string>")
    out = build_center_hierarchy(df, "center_id", "center", "tags").collect()
    by_id = {r["center_id"]: r for r in out}
    assert len(by_id) == 7  # 4 leaves + 2 parents + 1 root
    roots = [r for r in out if r["parent_id"] == -1]
    assert len(roots) == 1 and roots[0]["depth"] == 0
    assert all(r["depth"] == 2 for r in out if r["center_id"] < 4)
    # tagged pair kept its tag on the parent
    tagged_parent = by_id[by_id[0]["parent_id"]]
    assert tagged_parent["tags"] == ["t"]
