"""OPIC (graph/opic.py) — Abiteboul 2003 online page importance,
batch-synchronous formulation.

Parity: the iterative-DataFrame job must match the dense numpy oracle
bit-for-bit-ish (1e-12).  Invariants the paper guarantees: total cash
is always 1, total history after T steps is exactly T, importance sums
to 1.  Behavior: a page every other page links to accumulates the most
history; an isolated sink still receives the dangling redistribution.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from lopez_spark.graph.opic import opic, opic_numpy


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_opic_matches_numpy(spark):
    rng = random.Random(13)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    expect = opic_numpy(edges)
    got = {
        r.node: r.importance
        for r in opic(_edges_df(spark, edges)).collect()
    }
    assert set(got) == set(expect)
    for n, v in expect.items():
        assert got[n] == pytest.approx(v, abs=1e-12)


def test_opic_mass_invariants(spark):
    rng = random.Random(29)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(80)})
    rows = opic(_edges_df(spark, edges), iterations=8).collect()
    assert sum(r.cash for r in rows) == pytest.approx(1.0, abs=1e-12)
    assert sum(r.history for r in rows) == pytest.approx(8.0, abs=1e-12)
    assert sum(r.importance for r in rows) == pytest.approx(1.0, abs=1e-12)


def test_opic_hub_outranks_periphery(spark):
    # star: every node links to 0; 0 links back to 1 only
    edges = [(i, 0) for i in range(1, 10)] + [(0, 1)]
    imp = {r.node: r.importance for r in opic(_edges_df(spark, edges)).collect()}
    assert imp[0] == max(imp.values())
    assert imp[0] > 3 * imp[5]


def test_opic_dangling_mass_redistributes(spark):
    # 0 -> 1, 1 dangles: without the virtual page 1's cash would leak;
    # with it, total importance still sums to 1 and node 0 keeps
    # receiving a share
    edges = [(0, 1)]
    rows = opic(_edges_df(spark, edges), iterations=6).collect()
    imp = {r.node: r.importance for r in rows}
    assert sum(imp.values()) == pytest.approx(1.0, abs=1e-12)
    assert imp[0] > 0.2


def test_opic_empty_graph(spark):
    out = opic(_edges_df(spark, []))
    assert out.count() == 0
