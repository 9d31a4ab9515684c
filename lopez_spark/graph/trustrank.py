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

Execution: two runs of the engine's iterative-DataFrame PageRank (one
uniform, one seeded) over ONE shared partitioned+persisted edge list
shape, then a single join.  Everything inherits pagerank.py's
broadcast-below-10^6-nodes join strategy and lineage-truncation
discipline; no new shuffle shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import DAMPING, ITERATIONS, pagerank


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
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    present = seeds.select("node").distinct().join(nodes, "node")
    n_seeds = present.count()
    if n_seeds == 0:
        raise ValueError("TrustRank needs at least one seed present in the graph")
    tele = present.withColumn("tele", F.lit(1.0 / n_seeds))

    pr = pagerank(
        e, src="src", dst="dst", iterations=iterations,
        damping=damping, partitions=partitions,
    ).withColumnRenamed("rank", "pagerank")
    tr = pagerank(
        e, src="src", dst="dst", iterations=iterations,
        damping=damping, partitions=partitions, teleport=tele,
    ).withColumnRenamed("rank", "trustrank")
    return pr.join(tr, "node").withColumn(
        "spam_mass",
        (F.col("pagerank") - F.col("trustrank")) / F.col("pagerank"),
    )
