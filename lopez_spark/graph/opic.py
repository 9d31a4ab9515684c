"""OPIC — Adaptive On-line Page Importance Computation (Abiteboul,
Preda & Cobéna, WWW 2003).

OPIC is *the* crawl-ordering importance metric: unlike PageRank it was
designed to be maintained online BY the crawler itself.  Every page
holds *cash* (importance in transit) and *history* (importance already
banked).  Fetching a page distributes its cash equally over its
out-links and banks it into history; the importance estimate at any
moment is (history + cash) / total, so the frontier can be reordered
after every wave without a global power-iteration pass.  The reference
ships batch PageRank only (``lib-lopez/src/page_rank.rs:4-155``,
damping + fixed iterations); OPIC is the web-scale scheduling
complement — the "greedy by cash" policy the paper shows converges to
the same importance fixpoint while the crawl is still running.

This is the batch-synchronous formulation (every page "fetched" each
step — the paper's Xi update with a uniform-random virtual page for
dangling mass):

    C_{t+1}(j) = Σ_{i→j} C_t(i)/out(i)  +  dangling_mass_t / n
    H_{t+1}(i) = H_t(i) + C_t(i)

Total cash is invariant (Σ C_t = 1), so after T steps Σ H_T = T and
the normalized estimate is  imp(i) = (H_T(i) + C_T(i)) / (T + 1).

Execution mirrors ``pagerank.py`` exactly: edges hash-partitioned by
``src`` once and persisted, the (cash, history) vector broadcast into
the edge join below 10^6 nodes (ONE shuffle per iteration — the
groupBy), partitioned-shuffle joins above it (the only shape that
holds when the vector itself is billions of rows), dangling mass as a
1-row broadcast aggregate (all iterations compile into one job, no
per-iteration driver action), lineage truncated every second
iteration.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .pagerank import plan_size_partitions

ITERATIONS = 8  # same fixed-iteration budget as the engine PageRank


def opic(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = ITERATIONS,
    partitions: int | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Returns (node, cash, history, importance) for every node in the
    edge list; ``importance`` sums to 1 across nodes."""
    spark = edges.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    p = plan_size_partitions(edges, p)

    # out-degree attached via a window over the same src exchange the
    # repartition pays anyway (no second shuffle, no per-iteration
    # e ⋈ out_cnt join); has_out rides the node base so dangling cash
    # is a filter, not a left-anti join — pagerank.py's round-6 shape
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
    n = nodes.count()
    if n == 0:
        e.unpersist()
        nodes.unpersist()
        return spark.createDataFrame(
            [], "node long, cash double, history double, importance double"
        )

    small = n <= 1_000_000

    def hinted(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small else df

    state = nodes.select(
        "node", "has_out", F.lit(1.0 / n).alias("cash"), F.lit(0.0).alias("history")
    )
    for it in range(iterations):
        contribs = (
            e.join(hinted(state.withColumnRenamed("node", "src")), "src")
            .withColumn("share", F.col("cash") / F.col("out_cnt"))
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        dangling = state.filter(F.col("has_out") == 0).agg(
            F.coalesce(F.sum("cash"), F.lit(0.0)).alias("lost")
        )
        state = (
            state.join(
                hinted(contribs.withColumnRenamed("dst", "node")), "node", "left"
            )
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "has_out",
                (
                    F.coalesce(F.col("contrib"), F.lit(0.0))
                    + F.col("lost") / F.lit(float(n))
                ).alias("cash"),
                (F.col("history") + F.col("cash")).alias("history"),
            )
        )
        if checkpoint and it % 2 == 1:
            state = state.localCheckpoint(eager=False)

    state = state.select("node", "cash", "history")
    if checkpoint:
        state = state.localCheckpoint(eager=True)
    e.unpersist()
    nodes.unpersist()
    return state.select(
        "node",
        "cash",
        "history",
        ((F.col("history") + F.col("cash")) / F.lit(float(iterations + 1))).alias(
            "importance"
        ),
    )


def opic_numpy(
    edge_list: list[tuple[int, int]], iterations: int = ITERATIONS
) -> dict[int, float]:
    """Oracle: dense synchronous OPIC with identical float64 op order."""
    nodes: dict[int, int] = {}
    for s, d in edge_list:
        nodes.setdefault(s, len(nodes))
        nodes.setdefault(d, len(nodes))
    n = len(nodes)
    if n == 0:
        return {}
    out_cnt = np.zeros(n)
    for s, _d in edge_list:
        out_cnt[nodes[s]] += 1
    cash = np.full(n, 1.0 / n)
    hist = np.zeros(n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        for s, d in edge_list:
            contrib[nodes[d]] += cash[nodes[s]] / out_cnt[nodes[s]]
        lost = cash[out_cnt == 0].sum()
        hist = hist + cash
        cash = contrib + lost / n
    imp = (hist + cash) / (iterations + 1)
    return {node: imp[i] for node, i in nodes.items()}
