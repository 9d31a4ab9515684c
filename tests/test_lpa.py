"""Synchronous label propagation (graph/lpa.py, Raghavan 2007)."""

from __future__ import annotations

from lopez_spark.graph.lpa import label_propagation, label_propagation_python


def test_python_replica_two_cliques_with_bridge():
    # two triangles joined by one bridge edge: communities = min ids
    cliques = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    bridge = [(2, 10)]
    out = label_propagation_python(cliques + bridge, iterations=5)
    assert out[0] == out[1] == out[2] == 0
    assert out[10] == out[11] == out[12]


def test_python_replica_tie_break_min_label():
    # path 0-1-2: node 1 sees {0, 2} once each -> takes 0
    out = label_propagation_python([(0, 1), (1, 2)], iterations=1)
    assert out[1] == 0
    # endpoints see only their single neighbor's label
    assert out[0] == 1 and out[2] == 1


def test_spark_matches_replica(spark):
    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12), (2, 10)]
    edges += [(i, i + 1) for i in range(20, 35)]
    edges += [(20, 34), (22, 30), (5, 5), (1, 0)]  # cycle, chord, loop, dup
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.label for r in label_propagation(df).collect()}
    assert got == label_propagation_python(edges)
