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

Round-6 overhead trims (guide §2.4 "remove shuffles outright"): the
out-degree attaches to the persisted edge frame as a window count over
``src`` — ONE shuffle that replaces the explicit repartition, the
out-degree groupBy AND the per-iteration ``e ⋈ out_cnt`` join — and the
node base carries a ``has_out`` flag so the per-iteration dangling-mass
aggregate is a filter over the rank vector instead of a left-anti
join.  Per-iteration work drops from 4 joins + ~5 broadcast builds to
2 joins + 3 broadcast builds; values are unchanged (same per-edge
``rank/out_cnt`` shares, same dangling/restart formulas — only the
aggregation grouping moves, which is nondeterministic across runs
anyway).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DAMPING = 0.85
ITERATIONS = 8  # lib-lopez/src/backend/mod.rs:123


def plan_size_partitions(df: DataFrame, cap: int) -> int:
    """Partition count for a PERSISTED iteration frame, derived from
    Catalyst's byte-size estimate of its plan at the AQE advisory
    partition size — the same bytes-per-partition rule AQE applies to
    ordinary shuffles, applied manually because cached plans are
    exempt from AQE coalescing
    (``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning`` is
    false by default, and turning it on measurably serialized cached
    multi-consumer chains — see OPTIMIZATION_r06.md §4).  A toy graph
    caches in 1 partition instead of ``spark.sql.shuffle.partitions``,
    so the ~25 stages of an 8-iteration power chain schedule 1 task
    each; at scale the estimate exceeds ``cap`` and this returns
    ``cap`` — the pre-round-6 behavior.  Estimates are coarse
    (column-pruned scan bytes fan through joins), but the only cost of
    an overestimate is extra (empty) tasks — never correctness."""
    spark = df.sparkSession
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        raw = spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m"
        ).lower().rstrip("b")
        mult = {"k": 1024, "m": 1024**2, "g": 1024**3}.get(raw[-1:], 1)
        advisory = int(raw.rstrip("kmg") or "1") * mult
        return max(1, min(cap, -(-size // max(advisory, 1))))
    except Exception:
        return cap


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
    p = plan_size_partitions(edges, p)

    # edges with out-degree attached in place: the explicit
    # repartition("src") satisfies the window's clustering requirement,
    # so the count-over-src adds NO second exchange — one shuffle total,
    # and it replaces the out-degree groupBy AND the per-iteration
    # e ⋈ out_cnt join (duplicate edges keep duplicate shares: the count
    # is over edge ROWS, page_rank.rs:76-78)
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .repartition(p, "src")
        .withColumn(
            "out_cnt", F.count(F.lit(1)).over(Window.partitionBy("src"))
        )
        .persist()
    )

    # node base with a has_out flag read off the same union pass the
    # old distinct paid (groupBy-max ≡ distinct + left-anti probe); the
    # explicit repartition pins the CACHED frame's partition count to
    # the size-derived p (the groupBy reuses the exchange — no second
    # shuffle)
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
        return spark.createDataFrame([], "node long, rank double")

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
        base = nodes.join(hinted(teleport), "node", "left").select(
            "node", "has_out",
            F.coalesce(F.col("tele"), F.lit(0.0)).alias("tele"),
        ).persist()
        ranks = base.select("node", "has_out", F.col("tele").alias("rank"))
    else:
        base = nodes
        ranks = base.select("node", "has_out", F.lit(1.0 / n).alias("rank"))
    for it in range(iterations):
        contribs = (
            e.join(hinted(ranks.withColumnRenamed("node", "src")), "src")
            .withColumn("share", F.col("rank") / F.col("out_cnt"))
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        # lost juice: total rank sitting on dangling nodes (no
        # out-edges) — a filter over the rank vector's has_out flag
        # folded in as a broadcast 1-row aggregate, NOT a per-iteration
        # driver action: all 8 iterations compile into one Spark job
        dangling = ranks.filter(F.col("has_out") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("lost")
        )
        restart = (
            (F.lit(1.0 - damping) + F.lit(damping) * F.col("lost")) * F.col("tele")
            if teleport is not None
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
            .select("node", "has_out", "rank")
        )
        # lineage cut every SECOND iteration: two chained join-agg
        # rounds stay well within planner comfort, and halving the
        # checkpoint count trims the per-iteration fixed overhead that
        # dominates at toy scale (VERDICT r2 #6); the final eager cut
        # below still bounds the whole chain
        if checkpoint and it % 2 == 1:
            ranks = ranks.localCheckpoint(eager=False)

    ranks = ranks.select("node", "rank")
    if checkpoint:
        # materialize the whole 8-iteration chain (one job) before
        # releasing the cached edge/node frames it reads
        ranks = ranks.localCheckpoint(eager=True)
    e.unpersist()
    nodes.unpersist()
    if teleport is not None:
        base.unpersist()
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
