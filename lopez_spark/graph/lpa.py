"""Label propagation community detection (Raghavan 2007) as iterative
DataFrame join-aggregates — the deterministic synchronous variant:
every round, each node adopts its neighbors' plurality label with ties
broken toward the smallest label, all nodes updating simultaneously.

Asynchronous LPA (the paper's default) is order-dependent and
irreproducible on a cluster; the synchronous + lexicographic-tie-break
variant is a pure function of the graph, which is what a distributed
pipeline (and this engine's oracle gate) needs.  Same execution model
as graph/pagerank.py and graph/hits.py: the symmetrized edge exchange
persists once, only the (node, label) vector moves per round —
broadcast into the join below ~10^6 nodes, partitioned joins above.
Reference ships PageRank only (``lib-lopez/src/page_rank.rs``); LPA is
a beyond-reference companion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import plan_size_partitions

ITERATIONS = 5


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = ITERATIONS,
    partitions: int | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Returns (node, label) after ``iterations`` synchronous rounds
    over the undirected graph (self-loops dropped).  Labels start as
    node ids; an isolated node keeps its own label."""
    spark = edges.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    p = plan_size_partitions(edges, p)

    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    adj = (
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .repartition(p, "u")
        .distinct()
        .persist()
    )
    nodes = adj.select(F.col("u").alias("node")).repartition(p, "node").distinct().persist()
    n = nodes.count()
    small = n <= 1_000_000

    def hinted(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small else df

    labels = nodes.withColumn("label", F.col("node"))
    for it in range(iterations):
        votes = (
            adj.join(
                hinted(
                    labels.select(
                        F.col("node").alias("v"), F.col("label")
                    )
                ),
                "v",
            )
            .groupBy("u", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # plurality with smallest-label tie-break: max of (count, -label)
        labels = (
            votes.groupBy("u")
            .agg(
                (
                    -F.max(
                        F.struct(F.col("c"), (-F.col("label")).alias("nl"))
                    ).getField("nl")
                ).alias("label")
            )
            .select(F.col("u").alias("node"), "label")
        )
        if checkpoint and it % 2 == 1:
            labels = labels.localCheckpoint(eager=False)

    if not checkpoint:
        return labels
    out = labels.localCheckpoint(eager=True)
    adj.unpersist()
    nodes.unpersist()
    return out


def label_propagation_python(
    edge_list: list[tuple[int, int]], iterations: int = ITERATIONS
) -> dict[int, int]:
    """Straight-line replica: same init, same synchronous plurality /
    min-label tie-break."""
    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(iterations):
        new = {}
        for n, nbrs in adj.items():
            counts: dict[int, int] = {}
            for m in nbrs:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            new[n] = min(counts, key=lambda l: (-counts[l], l))
        labels = new
    return labels
