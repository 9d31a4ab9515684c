"""PageRank parity: Spark iterative join-agg vs numpy oracle with the
reference's exact semantics (duplicate-edge shares, dangling-mass
redistribution, fixed 8 iterations — ``lib-lopez/src/page_rank.rs``)."""

import numpy as np
import pytest

from lopez_spark.graph.pagerank import pagerank, pagerank_numpy
from lopez_spark.hashing import xxhash64_long


def _fixture_edges(n_nodes=60, n_edges=300):
    edges = []
    for i in range(n_edges):
        s = xxhash64_long(i * 2) % n_nodes
        d = xxhash64_long(i * 2 + 1) % n_nodes
        edges.append((int(s), int(d)))
    # add guaranteed dangling node + duplicate edges
    edges += [(1, n_nodes + 5), (2, 3), (2, 3)]
    return edges


def test_pagerank_matches_numpy(spark):
    edges = _fixture_edges()
    df = spark.createDataFrame(edges, "from_hash long, to_hash long")
    got = {r["node"]: r["rank"] for r in pagerank(df, partitions=4).collect()}
    want = pagerank_numpy(edges)
    assert set(got) == set(want)
    for node, rank in want.items():
        assert got[node] == pytest.approx(rank, rel=1e-9), node


def test_pagerank_sums_to_one(spark):
    edges = _fixture_edges()
    df = spark.createDataFrame(edges, "from_hash long, to_hash long")
    total = sum(r["rank"] for r in pagerank(df, partitions=4).collect())
    assert total == pytest.approx(1.0, abs=1e-9)


def test_pagerank_empty(spark):
    df = spark.createDataFrame([], "from_hash long, to_hash long")
    assert pagerank(df, partitions=2).count() == 0


def test_numpy_oracle_uniform_on_cycle():
    # ring graph: symmetric, every node rank = 1/n
    n = 10
    edges = [(i, (i + 1) % n) for i in range(n)]
    ranks = pagerank_numpy(edges)
    for v in ranks.values():
        assert v == pytest.approx(1.0 / n, rel=1e-12)
