"""PageRank (operator §2.7 in SURVEY.md).

Reference: ``power_iteration`` (``lib-lopez/src/page_rank.rs:4-155``),
invoked by ``backend/mod.rs:117-136`` with stride 2048, **8 iterations**,
damping 0.85, uniform init 1/N.  Faithful semantics:

  * node set = union of sources and targets of the edge list;
  * a source's rank is split across its *edge entries* (duplicate edges
    get duplicate shares — ``1/(offset_max-offset_min+1)``,
    ``page_rank.rs:76-78``);
  * dangling mass ("lost juice") is redistributed uniformly:
    ``new = 0.85*contrib + (0.15 + 0.85*lost_juice)/N``
    (``page_rank.rs:117-131``);
  * fixed iteration count, no convergence test.

The reference materializes all edges in driver RAM; here it is an
iterative DataFrame job: edges are hash-partitioned by ``src`` once and
persisted, so each iteration shuffles only the rank vector (Catalyst
reuses the edge exchange).  Rank lineage is truncated per iteration via
``localCheckpoint`` to keep plans flat at scale.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
ITERATIONS = 8  # lib-lopez/src/backend/mod.rs:123


def pagerank(
    edges: DataFrame,
    src: str = "from_hash",
    dst: str = "to_hash",
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
    partitions: int | None = None,
    checkpoint: bool = True,
    teleport: DataFrame | None = None,
) -> DataFrame:
    """Returns (node, rank) for every node in the edge list.

    ``teleport`` personalizes the random-surfer restart: a (node, tele)
    DataFrame whose ``tele`` column sums to 1.  Restart probability AND
    dangling mass then redistribute proportional to ``tele`` instead of
    uniformly, and iteration starts from the teleport vector — the
    personalized-PageRank formulation TrustRank (Gyöngyi 2004) uses
    with ``tele`` concentrated on a trusted seed set.  ``None`` keeps
    the reference-faithful uniform behavior exactly as before (the two
    gated PageRank queries' plans are unchanged).  The teleport vector
    joins under the same broadcast-below-10^6-nodes hint as the rank
    vector, so personalization adds no shuffle.
    """
    spark = edges.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.repartition(p, "src").persist()

    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct().persist()
    n = nodes.count()
    if n == 0:
        e.unpersist()
        nodes.unpersist()
        return spark.createDataFrame([], "node long, rank double")

    out_cnt = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_cnt")).persist()

    # rank-vector join strategy, chosen by the node count we already
    # have: a small rank vector (≤ ~1M rows ≈ 16 MB) broadcasts into
    # the edge join and the contribution merge, leaving ONE shuffle per
    # iteration (the groupBy) instead of four — at toy/oracle scale the
    # 8-iteration chain stops being dominated by empty 8-partition
    # exchange stages.  Above the threshold every join reverts to the
    # partitioned-shuffle plan, which is the only shape that holds when
    # the rank vector itself is billions of rows.
    small = n <= 1_000_000

    def hinted(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small else df

    if teleport is not None:
        tele_nodes = nodes.join(hinted(teleport), "node", "left").select(
            "node", F.coalesce(F.col("tele"), F.lit(0.0)).alias("tele")
        ).persist()
    else:
        tele_nodes = None

    if tele_nodes is not None:
        ranks = tele_nodes.select("node", F.col("tele").alias("rank"))
    else:
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(iterations):
        contribs = (
            e.join(hinted(ranks.withColumnRenamed("node", "src")), "src")
            .join(hinted(out_cnt), "src")
            .withColumn("share", F.col("rank") / F.col("out_cnt"))
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        # lost juice: total rank sitting on dangling nodes (no
        # out-edges) — folded in as a broadcast 1-row aggregate, NOT a
        # per-iteration driver action: all 8 iterations compile into
        # one Spark job instead of 8 action+job round-trips
        dangling = ranks.join(
            hinted(out_cnt.select(F.col("src").alias("node"))), "node", "left_anti"
        ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("lost"))
        base = tele_nodes if tele_nodes is not None else nodes
        restart = (
            (F.lit(1.0 - damping) + F.lit(damping) * F.col("lost")) * F.col("tele")
            if tele_nodes is not None
            else (F.lit(1.0 - damping) + F.lit(damping) * F.col("lost")) / n
        )
        ranks = (
            base.join(
                hinted(contribs.withColumnRenamed("dst", "node")), "node", "left"
            )
            .crossJoin(F.broadcast(dangling))
            .withColumn(
                "rank",
                damping * F.coalesce(F.col("contrib"), F.lit(0.0)) + restart,
            )
            .select("node", "rank")
        )
        # lineage cut every SECOND iteration: two chained join-agg
        # rounds stay well within planner comfort, and halving the
        # checkpoint count trims the per-iteration fixed overhead that
        # dominates at toy scale (VERDICT r2 #6); the final eager cut
        # below still bounds the whole chain
        if checkpoint and it % 2 == 1:
            ranks = ranks.localCheckpoint(eager=False)

    if checkpoint:
        # materialize the whole 8-iteration chain (one job) before
        # releasing the cached edge/out-degree exchanges it reads
        ranks = ranks.localCheckpoint(eager=True)
    e.unpersist()
    out_cnt.unpersist()
    nodes.unpersist()
    if tele_nodes is not None:
        tele_nodes.unpersist()
    return ranks


def pagerank_numpy(
    edge_list: list[tuple[int, int]],
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
    teleport: dict[int, float] | None = None,
) -> dict[int, float]:
    """Oracle: dense power iteration with identical semantics (float64).
    ``teleport`` mirrors :func:`pagerank`'s personalization (restart +
    dangling mass ∝ tele, iteration starts from the teleport vector)."""
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
    if teleport is None:
        tele = np.full(n, 1.0 / n)
        state = tele.copy()
    else:
        tele = np.zeros(n)
        for node, w in teleport.items():
            if node in nodes:
                tele[nodes[node]] = w
        state = tele.copy()
    for _ in range(iterations):
        contrib = np.zeros(n)
        for s, d in edge_list:
            contrib[nodes[d]] += state[nodes[s]] / out_cnt[nodes[s]]
        dangling = state[out_cnt == 0].sum()
        state = damping * contrib + (1.0 - damping + damping * dangling) * tele
    return {node: state[i] for node, i in nodes.items()}
