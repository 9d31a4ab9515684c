"""TrustRank / personalized PageRank (graph/trustrank.py, the teleport
extension of graph/pagerank.py).

Parity: the DataFrame iteration must match the dense numpy oracle with
the same personalization semantics (restart + dangling mass ∝ teleport,
iteration starts from the teleport vector).  Behavior: a link farm with
no in-links from the trusted region earns spam mass ≈ 1; the trusted
core earns ≈ 0.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from lopez_spark.graph.pagerank import pagerank, pagerank_numpy
from lopez_spark.graph.trustrank import trustrank


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_personalized_pagerank_matches_numpy(spark):
    rng = random.Random(7)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    seeds = [n for n in range(30) if n % 5 == 0]
    tele = {n: 1.0 / len(seeds) for n in seeds}
    expect = pagerank_numpy(edges, teleport=tele)

    tele_df = spark.createDataFrame(
        [(n, w) for n, w in tele.items()], "node long, tele double"
    )
    got = {
        r.node: r.rank
        for r in pagerank(
            _edges_df(spark, edges), src="src", dst="dst", teleport=tele_df
        ).collect()
    }
    assert set(got) == set(expect)
    for n, v in expect.items():
        assert got[n] == pytest.approx(v, abs=1e-12)


def test_uniform_path_unchanged_by_teleport_parameter(spark):
    """teleport=None must stay bit-identical to the reference-faithful
    uniform semantics (pagerank_orders/pagerank_lineitem depend on it)."""
    rng = random.Random(11)
    edges = list({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
    expect = pagerank_numpy(edges)
    got = {
        r.node: r.rank
        for r in pagerank(_edges_df(spark, edges), src="src", dst="dst").collect()
    }
    for n, v in expect.items():
        assert got[n] == pytest.approx(v, abs=1e-12)


def test_trustrank_spam_farm_scores_high_mass(spark):
    # trusted core 0-4 (seed 0), densely interlinked; spam farm 10-19
    # all pointing at spam target 9, no in-links from the trusted side
    edges = []
    for i in range(5):
        for j in range(5):
            if i != j:
                edges.append((i, j))
    for i in range(10, 20):
        edges.append((i, 9))
        edges.append((9, i))  # farm is strongly connected internally
    seeds = spark.createDataFrame([(0,)], "node long")
    scores = {
        r.node: r
        for r in trustrank(_edges_df(spark, edges), seeds).collect()
    }
    assert scores[9].spam_mass > 0.95  # rank earned entirely sans trust
    assert scores[1].spam_mass < 0.05  # trusted core
    # trust actually flowed: seeds and their targets hold nonzero TR
    assert scores[0].trustrank > 0 and scores[1].trustrank > 0
    # farm received (numerically) no trust
    assert scores[9].trustrank == pytest.approx(0.0, abs=1e-15)


def test_trustrank_requires_present_seed(spark):
    seeds = spark.createDataFrame([(999,)], "node long")
    with pytest.raises(ValueError):
        trustrank(_edges_df(spark, [(0, 1)]), seeds)


def test_trustrank_masses_sum_to_one(spark):
    rng = random.Random(3)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(80)})
    seeds = spark.createDataFrame([(n,) for n in (0, 5, 10)], "node long")
    agg = trustrank(_edges_df(spark, edges), seeds).agg(
        F.sum("pagerank").alias("pr"), F.sum("trustrank").alias("tr")
    ).collect()[0]
    assert agg.pr == pytest.approx(1.0, abs=1e-9)
    assert agg.tr == pytest.approx(1.0, abs=1e-9)
