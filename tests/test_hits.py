"""HITS (graph/hits.py): straight-line numpy replica parity on a
deterministic graph, normalization invariants, and edge-case
handling — the same test strategy as the PageRank suite."""

from __future__ import annotations

import pytest

from lopez_spark.graph.hits import hits, hits_numpy


def _edges(n: int = 60) -> list[tuple[int, int]]:
    # deterministic scale-free-ish multigraph, deduped
    out = set()
    for i in range(n):
        for j in range(1 + i % 3):
            out.add((i, (i * 7 + j * 13 + 1) % n))
    return sorted((u, v) for u, v in out if u != v)


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(_edges(), "src long, dst long")


def test_hits_matches_numpy_replica(spark, edge_df):
    got = {r.node: (r.hub, r.auth) for r in hits(edge_df).collect()}
    want = hits_numpy(_edges())
    assert set(got) == set(want)
    for node, (h, a) in want.items():
        assert got[node][0] == pytest.approx(h, abs=1e-12), node
        assert got[node][1] == pytest.approx(a, abs=1e-12), node


def test_hits_l1_normalized_and_sinks(spark):
    # star: 0 -> 1..4 (0 is the only hub, 1..4 the only authorities)
    df = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    )
    rows = {r.node: (r.hub, r.auth) for r in hits(df).collect()}
    assert sum(h for h, _ in rows.values()) == pytest.approx(1.0)
    assert sum(a for _, a in rows.values()) == pytest.approx(1.0)
    assert rows[0][0] == pytest.approx(1.0) and rows[0][1] == 0.0
    for i in range(1, 5):
        assert rows[i][1] == pytest.approx(0.25) and rows[i][0] == 0.0


def test_hits_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert hits(df).count() == 0
