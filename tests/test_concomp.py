"""Connected components (dup-cluster assignment) vs a union-find oracle
on randomized graphs: isolated nodes, multi-edge, self-loops, long
paths (worst case for propagation rounds), and dup-style near-cliques."""

import random

from lopez_spark.graph.concomp import connected_components, connected_components_py


def run_cc(spark, edge_list, node_list):
    nodes = spark.createDataFrame([(n,) for n in node_list], "node long")
    if edge_list:
        edges = spark.createDataFrame(edge_list, "src long, dst long")
    else:
        edges = spark.createDataFrame([], "src long, dst long")
    got = {
        r["node"]: r["comp"]
        for r in connected_components(edges, nodes).collect()
    }
    want = connected_components_py(edge_list, node_list)
    assert got == want
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


def test_components_dup_cliques(spark):
    # dup clusters as near-cliques: pairs (a,b) a<b within each cluster
    clusters = [[1, 5, 9], [12, 13], [20, 21, 22, 23]]
    edges = [
        (a, b) for cl in clusters for i, a in enumerate(cl) for b in cl[i + 1 :]
    ]
    got = run_cc(spark, edges, [n for cl in clusters for n in cl] + [99])
    assert got[9] == 1 and got[13] == 12 and got[23] == 20 and got[99] == 99
