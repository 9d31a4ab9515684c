"""TrustRank + spam mass (Gyöngyi, Garcia-Molina & Pedersen, "Combating
web spam with TrustRank", VLDB 2004; spam mass per Gyöngyi et al.,
"Link spam detection based on mass estimation", VLDB 2006).

A crawl frontier at web scale is poisoned by link farms: hosts whose
PageRank is manufactured, not earned.  TrustRank is personalized
PageRank whose teleport vector is concentrated on a human-vetted seed
set — trust flows out along links, and spam farms (rarely linked FROM
trusted pages) receive little.  The *relative spam mass* of a node is
the PageRank fraction NOT accounted for by trust:

    spam_mass(v) = (PR(v) − TR(v)) / PR(v)

Nodes near 1 earn their rank from untrusted regions; a crawler demotes
or budget-caps them (the same frontier knob the engine's spider-trap
verdicts feed, ``driver_queries.py`` ``crawl_trap_detect``).  The
reference computes plain PageRank only (``lib-lopez/src/page_rank.rs``)
— seeded trust propagation is the web-scale complement.

Execution (round 6): ONE fused iteration chain carrying BOTH rank
columns — the two power iterations share the edge list, the out-degree
table, and every per-iteration join, so each round is a single edge
join + ONE groupBy computing both contribution sums (the round-5 shape
ran two full independent PageRank chains: twice the shuffles, twice
the broadcasts, twice the node/degree prep).  The math per column is
unchanged — same contributions, same dangling redistribution, same
fixed iteration count — and everything inherits pagerank.py's
broadcast-below-10^6-nodes join strategy and lineage-truncation
discipline; no new shuffle shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .pagerank import DAMPING, ITERATIONS, pagerank, plan_size_partitions


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
    partitions: int | None = None,
) -> DataFrame:
    """(edges, trusted seed nodes) → (node, pagerank, trustrank,
    spam_mass).

    ``seeds`` is a one-column (node) DataFrame; the teleport vector is
    uniform over seeds that exist in the graph.  ``spam_mass`` is the
    relative mass in [−∞, 1]; trusted cores can go negative (they hold
    MORE trust than raw rank), spam approaches 1.
    """
    spark = edges.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    p = plan_size_partitions(edges, p)

    # out-degree attached via a window over the same src exchange the
    # repartition pays anyway; has_out rides the node base so dangling
    # mass is a filter, not a left-anti join — pagerank.py's round-6
    # shape, with the fused two-column state on top
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .repartition(p, "src")
        .withColumn("out_cnt", F.count(F.lit(1)).over(Window.partitionBy("src")))
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"), F.lit(1).alias("has_out"))
        .unionAll(e.select(F.col("dst").alias("node"), F.lit(0).alias("has_out")))
        .repartition(p, "node")
        .groupBy("node")
        .agg(F.max("has_out").alias("has_out"))
        .persist()
    )
    # one driver job for BOTH counts: graph size and present-seed count
    # read off the same pass over the node base (was nodes.count() plus
    # a separate seeds⋈nodes count)
    seed_flags = seeds.select("node").distinct().withColumn("is_seed", F.lit(1))
    flagged = nodes.join(F.broadcast(seed_flags), "node", "left").persist()
    stats = flagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("is_seed"), F.lit(0)).alias("n_seeds"),
    ).collect()[0]
    n, n_seeds = stats["n"], int(stats["n_seeds"])
    if n_seeds == 0:
        raise ValueError("TrustRank needs at least one seed present in the graph")

    small = n <= 1_000_000

    def hinted(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small else df

    # base vector: (node, has_out, tele) with tele 0 off the seed set —
    # reused by every iteration's restart/dangling redistribution
    base = flagged.select(
        "node", "has_out",
        F.when(F.col("is_seed") == 1, F.lit(1.0 / n_seeds))
        .otherwise(F.lit(0.0))
        .alias("tele"),
    ).persist()

    # state carries BOTH columns: uniform-restart rank and seeded trust
    state = base.select(
        "node", "has_out", F.lit(1.0 / n).alias("rank"), F.col("tele").alias("trank")
    )
    for it in range(iterations):
        contribs = (
            e.join(hinted(state.withColumnRenamed("node", "src")), "src")
            .groupBy("dst")
            .agg(
                F.sum(F.col("rank") / F.col("out_cnt")).alias("contrib"),
                F.sum(F.col("trank") / F.col("out_cnt")).alias("tcontrib"),
            )
        )
        dangling = state.filter(F.col("has_out") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("lost"),
            F.coalesce(F.sum("trank"), F.lit(0.0)).alias("tlost"),
        )
        state = (
            base.join(hinted(contribs.withColumnRenamed("dst", "node")), "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "has_out",
                "tele",
                (
                    damping * F.coalesce(F.col("contrib"), F.lit(0.0))
                    + (F.lit(1.0 - damping) + F.lit(damping) * F.col("lost")) / n
                ).alias("rank"),
                (
                    damping * F.coalesce(F.col("tcontrib"), F.lit(0.0))
                    + (F.lit(1.0 - damping) + F.lit(damping) * F.col("tlost"))
                    * F.col("tele")
                ).alias("trank"),
            )
            .select("node", "has_out", "rank", "trank")
        )
        if it % 2 == 1:
            state = state.localCheckpoint(eager=False)

    out = state.select(
        "node",
        F.col("rank").alias("pagerank"),
        F.col("trank").alias("trustrank"),
        ((F.col("rank") - F.col("trank")) / F.col("rank")).alias("spam_mass"),
    ).localCheckpoint(eager=True)
    e.unpersist()
    nodes.unpersist()
    flagged.unpersist()
    base.unpersist()
    return out
