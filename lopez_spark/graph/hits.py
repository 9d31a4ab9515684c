"""HITS hubs/authorities (Kleinberg 1999) as iterative DataFrame
join-aggregates — the companion to graph/pagerank.py (reference lopez
ships PageRank only, `lib-lopez/src/page_rank.rs`; HITS is the
beyond-reference twin every link-analysis toolbox pairs with it).

Same execution model as pagerank(): the edge exchange persists once
and only the score vectors move per iteration; below ~1M nodes the
vectors broadcast into the edge joins (one shuffle per half-step — the
groupBy), above they revert to partitioned joins, the only shape that
holds at 10^10 edges.

Normalization is L1 (sum) and applied ONCE after the final iteration:
scaling a score vector by a constant scales every subsequent raw score
by the same constant, so per-half-step normalization changes nothing
mathematically — but it costs two broadcast-total jobs per half-step
(measured 22 s vs 4 s for 8 iterations on the gate graph).  Raw scores
grow ~(σ₁²)^k from a starting value of 1.0, so float64 holds far past
any practical iteration count (1e308 headroom); for extreme depth ×
density, rescale every K iterations — the lever is this same
`normalized` helper.  L1 instead of the classical L2 keeps the
oracle's unrolled SQL free of sqrt (both engines agree at the 1e-6
gate grain on sums and divisions, not necessarily on libm sqrt);
ranks are identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import plan_size_partitions

ITERATIONS = 8


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = ITERATIONS,
    partitions: int | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Returns (node, hub, auth) for every node in the edge list:
    `iterations` rounds of a(v) = sum_{u->v} h(u), h(u) = sum_{u->v}
    a(v), L1-normalized once at the end.  Nodes with no in-edges get
    auth 0, no out-edges hub 0 (zero rows are joined in once at the
    end — zeros change neither totals nor edge joins, so iterations
    run on present-node vectors only)."""
    spark = edges.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    p = plan_size_partitions(edges, p)

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.repartition(p, "src").persist()

    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .repartition(p, "node")
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
        """Divide by the L1 total, folded in as a broadcast 1-row
        aggregate (no driver action)."""
        total = raw.agg(F.sum(col).alias("_t"))
        return raw.crossJoin(F.broadcast(total)).select(
            "node", (F.col(col) / F.col("_t")).alias(col)
        )

    h = nodes.withColumn("hub", F.lit(1.0))
    a = None
    for it in range(iterations):
        a = (
            e.join(hinted(h.withColumnRenamed("node", "src")), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("auth"))
            .withColumnRenamed("dst", "node")
        )
        h = (
            e.join(hinted(a.withColumnRenamed("node", "dst")), "dst")
            .groupBy("src")
            .agg(F.sum("auth").alias("hub"))
            .withColumnRenamed("src", "node")
        )
        if checkpoint and it % 2 == 1:
            h = h.localCheckpoint(eager=False)
            a = a.localCheckpoint(eager=False)

    h = normalized(h, "hub")
    a = normalized(a, "auth")
    out = (
        nodes.join(hinted(h), "node", "left")
        .join(hinted(a), "node", "left")
        .select(
            "node",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("auth", F.lit(0.0)).alias("auth"),
        )
    )
    if checkpoint:
        out = out.localCheckpoint(eager=True)
        e.unpersist()
        nodes.unpersist()
    return out


def hits_numpy(
    edge_list: list[tuple[int, int]], iterations: int = ITERATIONS
) -> dict[int, tuple[float, float]]:
    """Straight-line replica for tests: same init (1.0), same
    unnormalized iteration order, same single final L1 division."""
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    h = [1.0] * n
    a = [0.0] * n
    for _ in range(iterations):
        a = [0.0] * n
        for u, v in edge_list:
            a[idx[v]] += h[idx[u]]
        h = [0.0] * n
        for u, v in edge_list:
            h[idx[u]] += a[idx[v]]
    sa = sum(a)
    sh = sum(h)
    return {v: (h[idx[v]] / sh, a[idx[v]] / sa) for v in nodes}
