"""HITS hubs/authorities (Kleinberg 1999) as iterative DataFrame
join-aggregates — the companion to graph/pagerank.py (reference lopez
ships PageRank only, `lib-lopez/src/page_rank.rs`; HITS is the
beyond-reference twin every link-analysis toolbox pairs with it).

Same execution model as pagerank(): the edge exchange persists once
and only the score vectors move per iteration; below ~1M nodes the
vectors broadcast into the edge joins (one shuffle per half-step — the
groupBy), above they revert to partitioned joins, the only shape that
holds at 10^10 edges.  Normalization is L1 (sum) instead of the
classical L2 — rank-equivalent, and it keeps the oracle's unrolled SQL
free of sqrt (both engines agree at the 1e-6 gate grain on sums and
divisions, not necessarily on libm sqrt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ITERATIONS = 8


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = ITERATIONS,
    partitions: int | None = None,
) -> DataFrame:
    """Returns (node, hub, auth) for every node in the edge list:
    `iterations` rounds of a(v) = sum_{u->v} h(u), h(u) = sum_{u->v}
    a(v), each half-step L1-normalized.  Nodes with no in-edges get
    auth 0, no out-edges hub 0."""
    spark = edges.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.repartition(p, "src").persist()

    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        e.unpersist()
        nodes.unpersist()
        return spark.createDataFrame([], "node long, hub double, auth double")

    small = n <= 1_000_000

    def hinted(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small else df

    def normalized(raw: DataFrame, col: str) -> DataFrame:
        """nodes LEFT JOIN raw scores -> coalesce 0 -> divide by the
        total, folded in as a broadcast 1-row aggregate (no per-
        iteration driver action)."""
        total = raw.agg(F.sum(col).alias("_t"))
        return (
            nodes.join(hinted(raw), "node", "left")
            .crossJoin(F.broadcast(total))
            .select(
                "node",
                (F.coalesce(F.col(col), F.lit(0.0)) / F.col("_t")).alias(col),
            )
        )

    h = nodes.withColumn("hub", F.lit(1.0 / n))
    a = None
    for it in range(iterations):
        ar = (
            e.join(hinted(h.withColumnRenamed("node", "src")), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("auth"))
            .withColumnRenamed("dst", "node")
        )
        a = normalized(ar, "auth")
        hr = (
            e.join(hinted(a.withColumnRenamed("node", "dst")), "dst")
            .groupBy("src")
            .agg(F.sum("auth").alias("hub"))
            .withColumnRenamed("src", "node")
        )
        h = normalized(hr, "hub")
        if it % 2 == 1:
            h = h.localCheckpoint(eager=False)
            a = a.localCheckpoint(eager=False)

    out = h.join(a, "node").localCheckpoint(eager=True)
    e.unpersist()
    nodes.unpersist()
    return out


def hits_numpy(
    edge_list: list[tuple[int, int]], iterations: int = ITERATIONS
) -> dict[int, tuple[float, float]]:
    """Straight-line replica for tests: same init, same L1
    normalization, same iteration order."""
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    h = [1.0 / n] * n
    a = [0.0] * n
    for _ in range(iterations):
        a = [0.0] * n
        for u, v in edge_list:
            a[idx[v]] += h[idx[u]]
        s = sum(a)
        a = [x / s for x in a]
        h = [0.0] * n
        for u, v in edge_list:
            h[idx[u]] += a[idx[v]]
        s = sum(h)
        h = [x / s for x in h]
    return {v: (h[idx[v]], a[idx[v]]) for v in nodes}
