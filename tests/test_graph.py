"""operators/graph.pagerank: integer fixed-point PageRank.

Every assertion is EXACT (== on BIGINTs) against an independent
pure-Python reference implementation of the documented recurrence —
the operator's whole point is that its integer arithmetic is
bit-replayable, so the tests hold it to equality, not tolerance.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from demy_spark.operators.graph import pagerank

SCALE = 10**12


def ref_pagerank(edges, nodes, *, iterations=5, damping_pct=85, scale=SCALE):
    """The documented recurrence, driver-side: exact Python bigints."""
    agg: dict[tuple, int] = {}
    for s, t, w in edges:
        if s is None or t is None or w is None or w <= 0:
            continue
        agg[(s, t)] = agg.get((s, t), 0) + w
    tot: dict[object, int] = {}
    for (s, _), w in agg.items():
        tot[s] = tot.get(s, 0) + w
    nodes = [v for v in nodes if v is not None]
    n = len(nodes)
    if n == 0:
        return {}
    d = damping_pct
    r = {v: scale // n for v in nodes}
    dangling = [v for v in nodes if v not in tot]
    for _ in range(iterations):
        mass = sum(r[v] for v in dangling)
        c: dict[object, int] = {}
        for (s, t), w in agg.items():
            if s in r:
                c[t] = c.get(t, 0) + (r[s] * w) // tot[s]
        r = {
            v: ((100 - d) * scale) // (100 * n)
            + (d * (mass // n)) // 100
            + (d * c.get(v, 0)) // 100
            for v in nodes
        }
    return r


def run(spark, edges, nodes, *, weighted=True, **kw):
    schema = "s long, t long, w long" if weighted else "s long, t long"
    rows = edges if edges else []
    edf = spark.createDataFrame(rows, schema)
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    out = pagerank(
        edf,
        ndf,
        src="s",
        dst="t",
        node_col="node",
        weight_col="w" if weighted else None,
        **kw,
    )
    return {r["node"]: r["rank_fp"] for r in out.collect()}


def test_two_node_cycle_is_uniform(spark):
    # symmetric graph -> the stationary point IS the uniform start,
    # minus only floor losses; both nodes must be exactly equal
    got = run(spark, [(1, 2, 1), (2, 1, 1)], [1, 2])
    assert got == ref_pagerank([(1, 2, 1), (2, 1, 1)], [1, 2])
    assert got[1] == got[2]


def test_star_sink_accumulates_and_redistributes(spark):
    # 1,2,3 -> 4: node 4 is dangling, so its mass recycles uniformly;
    # it must still end far above the spokes, which stay symmetric
    edges = [(1, 4, 1), (2, 4, 1), (3, 4, 1)]
    got = run(spark, edges, [1, 2, 3, 4])
    assert got == ref_pagerank(edges, [1, 2, 3, 4])
    assert got[1] == got[2] == got[3] < got[4]


def test_dangling_mass_is_conserved_not_leaked(spark):
    # with every dst inside the node set, total rank can drift below
    # scale ONLY by floor losses: <= iterations * (N + 2) micro-units
    edges = [(1, 4, 1), (2, 4, 1), (3, 4, 1), (4, 1, 2)]
    iters, n = 7, 4
    got = run(spark, edges, [1, 2, 3, 4], iterations=iters)
    assert got == ref_pagerank(edges, [1, 2, 3, 4], iterations=iters)
    assert SCALE - iters * (n + 2) <= sum(got.values()) <= SCALE


def test_parallel_edges_equal_explicit_weights(spark):
    # multiplicity aggregation == a pre-aggregated weight column
    multi = run(spark, [(1, 2, 1), (1, 2, 1), (1, 3, 1), (2, 1, 1)], [1, 2, 3])
    weighted = run(spark, [(1, 2, 2), (1, 3, 1), (2, 1, 1)], [1, 2, 3])
    unweighted = run(
        spark, [(1, 2), (1, 2), (1, 3), (2, 1)], [1, 2, 3], weighted=False
    )
    assert multi == weighted == unweighted


def test_edges_to_outside_nodes_leak_rank_exactly(spark):
    # dst 99 is not a node: its share vanishes (documented), and src
    # rows outside the node frame contribute nothing — both replayed
    # by the reference, which keys strictly off the node set
    edges = [(1, 99, 1), (99, 2, 5), (2, 1, 1)]
    got = run(spark, edges, [1, 2])
    assert got == ref_pagerank(edges, [1, 2])


def test_null_and_nonpositive_edges_are_dropped(spark):
    dirty = [(1, None, 1), (None, 2, 1), (1, 2, None), (1, 2, 0), (1, 2, -3)]
    clean = [(2, 1, 1)]
    assert run(spark, dirty + clean, [1, 2]) == run(spark, clean, [1, 2])


def test_null_node_ids_are_dropped(spark):
    edf = spark.createDataFrame([(1, 2, 1)], "s long, t long, w long")
    ndf = spark.createDataFrame([(1,), (2,), (None,)], "node long")
    out = pagerank(edf, ndf, src="s", dst="t", node_col="node", weight_col="w")
    got = {r["node"]: r["rank_fp"] for r in out.collect()}
    assert set(got) == {1, 2}
    assert got == ref_pagerank([(1, 2, 1)], [1, 2])


def test_empty_edges_is_all_dangling_uniform(spark):
    got = run(spark, [], [1, 2, 3])
    assert got == ref_pagerank([], [1, 2, 3])
    assert len(set(got.values())) == 1


def test_empty_nodes_returns_empty(spark):
    edf = spark.createDataFrame([(1, 2, 1)], "s long, t long, w long")
    ndf = spark.createDataFrame([], "node long")
    out = pagerank(edf, ndf, src="s", dst="t", node_col="node", weight_col="w")
    assert out.columns == ["node", "rank_fp"]
    assert out.count() == 0


def test_zero_iterations_returns_uniform_init(spark):
    got = run(spark, [(1, 2, 1)], [1, 2, 3], iterations=0)
    assert got == {1: SCALE // 3, 2: SCALE // 3, 3: SCALE // 3}


def test_damping_extremes(spark):
    edges = [(1, 2, 1), (2, 3, 1), (3, 1, 1)]
    # d=0: pure teleport — every node is scale div (100*n) * 100-ish,
    # exactly the reference either way
    for d in (0, 100):
        got = run(spark, edges, [1, 2, 3], damping_pct=d)
        assert got == ref_pagerank(edges, [1, 2, 3], damping_pct=d)


def test_validation_errors(spark):
    edf = spark.createDataFrame([(1, 2, 1)], "s long, t long, w long")
    ndf = spark.createDataFrame([(1,)], "node long")
    for kw in (
        {"damping_pct": 101},
        {"iterations": -1},
        {"scale": 0},
        {"lineage": "nope"},
    ):
        with pytest.raises(ValueError):
            pagerank(
                edf, ndf, src="s", dst="t", node_col="node", weight_col="w", **kw
            )


def test_duplicate_node_rows_follow_relational_semantics(spark):
    # duplicate node ids are NOT deduplicated (garbage-in contract):
    # each copy holds its own rank and each copy's rank feeds every
    # out-edge — exactly what the unrolled SQL replay computes. Pin
    # the Spark result against a reference run on the EXPANDED frame.
    edf = spark.createDataFrame([(1, 2, 1), (2, 1, 1)], "s long, t long, w long")
    ndf = spark.createDataFrame([(1,), (1,), (2,)], "node long")
    out = pagerank(edf, ndf, src="s", dst="t", node_col="node", weight_col="w")
    rows = sorted((r["node"], r["rank_fp"]) for r in out.collect())
    # N counts ROWS (3); node 1's two copies stay identical; node 2
    # receives BOTH copies' contributions
    n, d = 3, 85
    r = {("1a"): SCALE // n, ("1b"): SCALE // n, ("2"): SCALE // n}
    for _ in range(5):
        c2 = (r["1a"] * 1) // 1 + (r["1b"] * 1) // 1
        c1 = (r["2"] * 1) // 1
        base = (15 * SCALE) // (100 * n)
        r = {
            "1a": base + (d * c1) // 100,
            "1b": base + (d * c1) // 100,
            "2": base + (d * c2) // 100,
        }
    assert rows == sorted(
        [(1, r["1a"]), (1, r["1b"]), (2, r["2"])]
    )


def test_randomized_graphs_match_reference_exactly(spark):
    # 6 seeded random multigraphs (mixed density, weights, dangling
    # nodes and out-of-node edges) — the invariant sweep: Spark ==
    # pure-Python bigint reference, exact equality on every node
    for seed in range(6):
        rng = random.Random(seed)
        n = rng.randint(3, 14)
        nodes = list(range(n))
        m = rng.randint(0, 4 * n)
        edges = [
            (
                rng.randrange(n + 2),  # may fall outside the node set
                rng.randrange(n + 2),
                rng.randint(1, 9),
            )
            for _ in range(m)
        ]
        iters = rng.randint(1, 6)
        got = run(spark, edges, nodes, iterations=iters)
        assert got == ref_pagerank(edges, nodes, iterations=iters), (
            seed,
            edges,
        )


def test_plan_has_no_cartesian_and_broadcasts_mass(spark):
    # the 1-row dangling-mass aggregate must enter as a broadcast
    # nested-loop join, never a CartesianProduct; the per-iteration
    # rank join must be an equi-join
    def plan_of(edges):
        edf = spark.createDataFrame(edges, "s long, t long, w long")
        ndf = spark.createDataFrame([(1,), (2,), (3,)], "node long")
        out = pagerank(
            edf,
            ndf,
            src="s",
            dst="t",
            node_col="node",
            weight_col="w",
            iterations=2,
            lineage="keep",  # keep the iterated plan inspectable
        )
        return out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )

    # node 3 is a sink: the 1-row mass aggregate must enter as a
    # broadcast nested-loop join (each un-checkpointed iteration
    # re-embeds the previous one's, so the count grows with lineage —
    # presence, not count, is the pin), and never a CartesianProduct
    dangling = plan_of([(1, 2, 1), (2, 1, 1), (1, 3, 1)])
    assert "CartesianProduct" not in dangling
    assert "BroadcastNestedLoopJoin" in dangling
    # rank/contrib/node joins are equi-joins (hash or sort-merge)
    assert "Join" in dangling.replace("BroadcastNestedLoopJoin", "")
    # no sink -> the mass branch is exactly zero and must be SKIPPED:
    # no nested-loop join of any kind in the whole iterated plan
    no_dangling = plan_of([(1, 2, 1), (2, 3, 1), (3, 1, 1)])
    assert "CartesianProduct" not in no_dangling
    assert "BroadcastNestedLoopJoin" not in no_dangling


def test_rank_column_is_bigint(spark):
    edf = spark.createDataFrame([(1, 2, 1)], "s long, t long, w long")
    ndf = spark.createDataFrame([(1,), (2,)], "node long")
    out = pagerank(edf, ndf, src="s", dst="t", node_col="node", weight_col="w")
    assert dict(out.dtypes)["rank_fp"] == "bigint"


def test_broadcast_and_shuffle_paths_agree_exactly(spark):
    """broadcast_nodes_max only HINTS the per-iteration join strategy
    (r13): the broadcast default and the forced co-keyed shuffle path
    (broadcast_nodes_max=0) must produce identical BIGINT ranks, both
    equal to the reference recurrence."""
    random.seed(13)
    edges = [
        (random.randrange(12), random.randrange(12), random.randrange(1, 4))
        for _ in range(40)
    ]
    nodes = list(range(12))
    a = run(spark, edges, nodes)
    b = run(spark, edges, nodes, broadcast_nodes_max=0)
    assert a == b == ref_pagerank(edges, nodes)


def test_iteration_conf_restores_aqe_and_refcounts(spark):
    """_iteration_conf (r13) pins AQE off only while held and restores
    the caller's value exactly once — the inner exit of a nested
    (concurrent-caller) hold must NOT restore early, which is what
    makes q152's overlapped pagerank modes safe."""
    from demy_spark.operators.graph import _iteration_conf

    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        with _iteration_conf(spark):
            assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
            with _iteration_conf(spark):
                assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
            assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_iterative_operators_restore_aqe_for_later_queries(spark):
    """Blast-radius fence (VERDICT r13 task 7): _iteration_conf is
    session-global WHILE HELD, so every public operator that holds it
    must have returned it to the caller's value by the time the next
    (non-iterative) query plans — a query issued after any of these
    EAGER calls must see AQE exactly as the caller set it."""
    from demy_spark.operators.dedup import assign_clusters
    from demy_spark.operators.graph import pagerank

    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        edges = spark.createDataFrame(
            [(1, 2), (2, 3)], "src long, dst long"
        )
        nodes = spark.createDataFrame([(1,), (2,), (3,)], "v long")
        pagerank(
            edges, nodes, src="src", dst="dst", node_col="v", iterations=2
        ).collect()
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "doc_a long, doc_b long"
        )
        ids = spark.createDataFrame([(1,), (2,), (3,), (4,)], "doc_id long")
        assign_clusters(pairs, ids, "doc_id", max_iters=2).collect()
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
