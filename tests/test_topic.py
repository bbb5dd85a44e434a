"""Unit tests for seeded k-means and topic-tree routing."""

from __future__ import annotations

from demy_spark.topic import (
    TopicNode,
    assign_to_centers,
    seed_centers_from_tags,
    seeded_kmeans,
    walk_topic_tree,
)


def _vecs(spark):
    # two tight blobs: around e1 and around e2
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.95, 0.0, 0.05]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.1, 0.9, 0.0]),
        (5, [0.0, 0.95, 0.05]),
    ]
    return spark.createDataFrame(rows, ["id", "vec"])


def test_assign_to_centers_cosine_argmax(spark):
    out = assign_to_centers(_vecs(spark), "id", "vec", [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    got = {r["id"]: r["cluster"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    sims = {r["id"]: r["sim"] for r in out.collect()}
    assert sims[0] == 1.0


def test_seeded_kmeans_converges(spark):
    # bad seeds still converge to the two blobs
    assigned, centers, iters = seeded_kmeans(
        _vecs(spark), "id", "vec", [[0.6, 0.4, 0.0], [0.4, 0.6, 0.0]], max_iters=10
    )
    got = {r["id"]: r["cluster"] for r in assigned.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    assert iters <= 5
    assert centers[0][0] > 0.9 and centers[1][1] > 0.9


def test_seed_centers_from_tags(spark):
    tags = spark.createDataFrame([(0, "a"), (3, "b")], ["id", "tag"])
    centers = seed_centers_from_tags(_vecs(spark), "id", "vec", tags)
    assert centers[0] == [1.0, 0.0, 0.0]  # tag 'a' ← row 0
    assert centers[1] == [0.0, 1.0, 0.0]  # tag 'b' ← row 3


def test_walk_topic_tree_two_levels(spark):
    tree = TopicNode(
        "root",
        children=[
            TopicNode(
                "x-ish",
                center=[1.0, 0.0, 0.0],
                children=[
                    TopicNode("x-pure", center=[1.0, 0.0, 0.0]),
                    TopicNode("x-mixed", center=[0.8, 0.2, 0.0]),
                ],
            ),
            TopicNode("y-ish", center=[0.0, 1.0, 0.0]),
        ],
    )
    vecs = _vecs(spark).unionByName(
        spark.createDataFrame([(6, [0.75, 0.25, 0.0])], ["id", "vec"])
    )
    out = walk_topic_tree(vecs, "id", "vec", tree)
    got = {r["id"]: r["topic"] for r in out.collect()}
    assert got[0] == "x-pure"
    assert got[1] == "x-pure"  # 6.3° off pure vs 7.7° off mixed
    assert got[6] == "x-mixed"  # 18.4° off pure vs 4.4° off mixed
    assert got[3] == "y-ish" and got[4] == "y-ish" and got[5] == "y-ish"


def test_analogy_direction_and_score(spark):
    from demy_spark.topic import analogy_direction, analogy_score

    # pairs all share the same offset d = (1, -1, 0)
    pairs = spark.createDataFrame(
        [
            ([0.0, 1.0, 0.0], [1.0, 0.0, 0.0]),
            ([2.0, 3.0, 1.0], [3.0, 2.0, 1.0]),
        ],
        ["a", "b"],
    )
    d = analogy_direction(pairs, "a", "b")
    assert d == [1.0, -1.0, 0.0]

    probes = spark.createDataFrame(
        [
            (1, [0.0, 5.0, 0.0], [1.0, 4.0, 0.0]),   # follows the analogy
            (2, [0.0, 5.0, 0.0], [-1.0, 6.0, 0.0]),  # opposite direction
        ],
        ["id", "x", "y"],
    )
    out = {r["id"]: r["analogy_score"] for r in analogy_score(probes, "x", "y", d).collect()}
    assert out[1] == 1.0
    assert out[2] == 0.0


def test_grow_topic_tree_splits_and_stops(spark):
    """Root spawns past childSplitSize; children with n_topwords ==
    n_centers cannot split further (ClusteringNode.score:320-331)."""
    from demy_spark.topic import grow_topic_tree

    tws = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]]
    rows = [(i, [1.0, 0.0]) for i in range(3)] + [
        (i, [0.0, 1.0]) for i in range(3, 6)
    ]
    df = spark.createDataFrame(rows, "vid long, v array<double>")
    out = {
        r["node"]: r
        for r in grow_topic_tree(
            df, "vid", "v", tws, n_centers=2, child_split_size=2.0
        ).collect()
    }
    assert out["root"]["spawned"] and out["root"]["pscore_sum"] == 6.0
    assert set(out) == {"root", "root/0", "root/1"}
    # child 0 owns topwords {0, 2}; the (1,0) rows route there with s=1
    assert out["root/0"]["n_rows"] == 3 and out["root/0"]["pscore_sum"] == 3.0
    assert not out["root/0"]["spawned"]  # 2 topwords == n_centers: leaf


def test_grow_topic_tree_parent_hits_gate(spark):
    """Children only spawn when EVERY parent center cleared the
    threshold (parent.cHits.forall(_ > childSplitSize), score:326)."""
    from demy_spark.topic import grow_topic_tree
    import math

    tws = [
        [math.cos(a * math.pi / 4), math.sin(a * math.pi / 4)]
        for a in range(8)
    ]
    rows = [(i, [1.0, 0.0]) for i in range(5)] + [
        (5, [math.cos(math.pi / 4), math.sin(math.pi / 4)])
    ]
    df = spark.createDataFrame(rows, "vid long, v array<double>")
    out = {
        r["node"]: r
        for r in grow_topic_tree(
            df, "vid", "v", tws, n_centers=2, child_split_size=4.5
        ).collect()
    }
    assert out["root"]["spawned"]  # 6.0 > 4.5
    # center 1 got only 1 hit <= 4.5, so NO child may spawn — even
    # root/0 whose own mass (5.0) clears the threshold
    assert out["root/0"]["pscore_sum"] == 5.0
    assert not out["root/0"]["spawned"]
    assert not out["root/1"]["spawned"]
    assert set(out) == {"root", "root/0", "root/1"}


def test_online_fit_replaces_topword(spark):
    """tryAsPoint (ClusteringNode.scala:415-448 option 3): a vector
    replaces its topword when it lowers the topword's GAP and is not
    closer to the node center than to its class's summed topwords.
    Hand-traced: r3 repeats r1's direction, so vCenter[0] points
    exactly at it (newGAP=0 < pGAP=0.1), and r2 drags the node's
    running center toward (-1,0) so r3 is closer to its class topword
    than to the center -> not tooClose -> replacement fires."""
    import pytest

    from demy_spark.topic import online_fit_updates

    rows = [(1, [0.8, 0.6]), (2, [-1.0, -0.02]), (3, [0.8, 0.6])]
    df = spark.createDataFrame(rows, "vid long, v array<double>")
    out = {
        r["i_point"]: r
        for r in online_fit_updates(
            df, "vid", "v", [[1.0, 0.0], [0.0, 1.0]], n_centers=2
        ).collect()
    }
    assert out[0]["n_replacements"] == 1
    assert out[1]["n_replacements"] == 0
    # the replacing vector (0.8, 0.6) has unit norm
    assert abs(out[0]["point_norm"] - 1.0) < 1e-9
    # r1 and r3 both scored 0.9 against the original topword (1,0)
    assert out[0]["p_score"] == pytest.approx(1.8)
    assert out[0]["p_gap"] == pytest.approx(0.0, abs=1e-9)


def test_online_fit_initial_zero_center_blocks_replacement(spark):
    """With zero vCenters, newGAP is 0.5 (zero-norm -> orthogonal
    convention) and pGAP starts at 0, so the very first vector can
    never replace a topword — matching the reference's behavior of
    mutating only after statistics accumulate."""
    from demy_spark.topic import online_fit_updates

    df = spark.createDataFrame([(1, [1.0, 0.0])], "vid long, v array<double>")
    out = online_fit_updates(
        df, "vid", "v", [[1.0, 0.0], [0.0, 1.0]], n_centers=2
    ).collect()
    assert all(r["n_replacements"] == 0 for r in out)


def test_node_params_roundtrip_and_reference_shape():
    """NodeParams artifact compatibility (NodeParams.scala:41-63):
    serialize to the flat index-linked camelCase list, rehydrate with a
    VectorIndex-style centers map, and load a reference-shaped dict
    carrying extra fields without complaint."""
    import json

    from demy_spark.topic import (
        TopicNode,
        topic_tree_from_params,
        topic_tree_to_params,
    )

    tree = TopicNode(
        "root",
        None,
        [
            TopicNode("health", [1.0, 0.0], [TopicNode("flu", [0.9, 0.1], [])]),
            TopicNode("sport", [0.0, 1.0], []),
        ],
    )
    params = topic_tree_to_params(tree)
    assert [p["name"] for p in params] == ["root", "health", "flu", "sport"]
    assert params[0]["children"] == [1, 3] and params[1]["children"] == [2]
    # every field of the reference's case class is present, camelCase
    assert {"strLinks", "filterMode", "childSplitSize", "hits"} <= set(params[0])
    json.dumps(params)  # JSON-serializable as-is

    back = topic_tree_from_params(
        params,
        centers={"health": [1.0, 0.0], "sport": [0.0, 1.0], "flu": [0.9, 0.1]},
    )
    assert back.name == "root" and back.center is None
    assert [c.name for c in back.children] == ["health", "sport"]
    assert back.children[0].children[0].center == [0.9, 0.1]

    # reference-written artifacts carry fields we don't model — ignored
    ref_shaped = [
        {
            "name": "root",
            "algo": "clustering",
            "children": [1],
            "strLinks": {"0": [1, 2]},
            "filterMode": "allIn",
            "hits": 120.0,
            "rocCurve": {},
            "purity": {"Gender": 0.5},
        },
        {"name": "leaf", "algo": "supervised", "children": []},
    ]
    t2 = topic_tree_from_params(ref_shaped, centers={"leaf": [0.5, 0.5]})
    assert t2.children[0].name == "leaf"
    assert t2.children[0].center == [0.5, 0.5]
