"""Connected components (dup-cluster assignment) vs a union-find oracle
on randomized graphs: isolated nodes, multi-edge, self-loops, long
paths (worst case for propagation rounds), and dup-style near-cliques."""

import random

from lopez_spark.graph.concomp import (
    connected_components,
    connected_components_alternating,
    connected_components_py,
)


def run_cc(spark, edge_list, node_list):
    nodes = spark.createDataFrame([(n,) for n in node_list], "node long")
    if edge_list:
        edges = spark.createDataFrame(edge_list, "src long, dst long")
    else:
        edges = spark.createDataFrame([], "src long, dst long")
    want = connected_components_py(edge_list, node_list)
    got = {
        r["node"]: r["comp"]
        for r in connected_components(edges, nodes).collect()
    }
    assert got == want
    got_alt = {
        r["node"]: r["comp"]
        for r in connected_components_alternating(edges, nodes).collect()
    }
    assert got_alt == want
    return got


def test_components_random_graphs(spark):
    rng = random.Random(99)
    for _ in range(3):
        n = 60
        nodes = list(range(n))
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(10, 50))
        ]
        run_cc(spark, edges, nodes)


def test_components_long_path_and_isolated(spark):
    # a 30-node path (diameter 29 — worst case for round count), plus
    # isolated nodes and a self-loop
    edges = [(i, i + 1) for i in range(29)] + [(40, 40)]
    got = run_cc(spark, edges, list(range(45)))
    assert all(got[i] == 0 for i in range(30))  # whole path collapses to 0
    assert got[40] == 40 and got[44] == 44  # self-loop / isolated stay put


def test_alternating_log_rounds_on_path(spark):
    """A 256-node path converges in O(log n) alternating rounds — the
    shape min-label propagation needs diameter (255) rounds for.
    ``driver_max=0`` forces the distributed contraction (the default
    would take the bounded-collect fast path at this size)."""
    n = 256
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    stats = {}
    got = {
        r["node"]: r["comp"]
        for r in connected_components_alternating(
            edges, nodes, _stats=stats, driver_max=0
        ).collect()
    }
    assert got == {i: 0 for i in range(n)}
    assert stats["rounds"] <= 12  # ~2·log2(256), far below diameter 255


def test_alternating_driver_path_matches_distributed(spark):
    """The ≤driver_max bounded-collect fast path must label exactly like
    the distributed contraction AND the union-find oracle (multi-edge,
    both orientations, self-loop, isolated node)."""
    rng = random.Random(7)
    n = 40
    edge_list = [(rng.randrange(n), rng.randrange(n)) for _ in range(60)] + [(5, 5)]
    node_list = list(range(n + 3))  # 3 isolated tail nodes
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    nodes = spark.createDataFrame([(x,) for x in node_list], "node long")
    want = connected_components_py(edge_list, node_list)
    stats_d = {}
    got_driver = {
        r["node"]: r["comp"]
        for r in connected_components_alternating(
            edges, nodes, _stats=stats_d
        ).collect()
    }
    assert stats_d.get("driver_path") is True
    got_dist = {
        r["node"]: r["comp"]
        for r in connected_components_alternating(
            edges, nodes, driver_max=0
        ).collect()
    }
    assert got_driver == want == got_dist


def test_components_dup_cliques(spark):
    # dup clusters as near-cliques: pairs (a,b) a<b within each cluster
    clusters = [[1, 5, 9], [12, 13], [20, 21, 22, 23]]
    edges = [
        (a, b) for cl in clusters for i, a in enumerate(cl) for b in cl[i + 1 :]
    ]
    got = run_cc(spark, edges, [n for cl in clusters for n in cl] + [99])
    assert got[9] == 1 and got[13] == 12 and got[23] == 20 and got[99] == 99
