"""Degree-oriented triangle counting (graph/triangles.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lopez_spark.graph.triangles import triangle_counts, triangle_counts_python


def test_python_replica_closed_forms():
    # K4: every node in C(3,2)=3 triangles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert triangle_counts_python(k4) == {0: 3, 1: 3, 2: 3, 3: 3}
    # a square has no triangles; add one diagonal -> two triangles
    square = [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert triangle_counts_python(square) == {}
    assert triangle_counts_python(square + [(0, 2)]) == {
        0: 2, 1: 1, 2: 2, 3: 1,
    }


def test_self_loops_and_duplicates_ignored():
    tri = [(0, 1), (1, 2), (2, 0), (0, 0), (1, 0), (2, 1)]
    assert triangle_counts_python(tri) == {0: 1, 1: 1, 2: 1}


def test_spark_matches_replica_on_hub_graph(spark):
    # hub node 0 connected to everyone (worst case for unoriented
    # wedge joins), plus a sparse ring with chords
    edges = [(0, i) for i in range(1, 40)]
    edges += [(i, i + 1) for i in range(1, 39)]
    edges += [(i, i + 3) for i in range(1, 36, 2)]
    edges += [(5, 5), (7, 3)]  # self-loop + reversed duplicate
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_tri for r in triangle_counts(df).collect()}
    assert got == triangle_counts_python(edges)


def test_empty_and_triangle_free(spark):
    df = spark.createDataFrame([(0, 1), (2, 3)], "src long, dst long")
    assert triangle_counts(df).count() == 0
