"""Connected components (dup-cluster assignment for near-dup pairs).

The training-pipeline use: near-dup *pairs* (minhash / simhash / phash /
embedding verified pairs) must become *clusters* with one canonical
representative per cluster (min doc_id) so "keep one per cluster" is a
single groupBy.

Algorithm: min-label propagation to fixpoint — each round every node
takes the min label over itself and its neighbors; rounds = component
diameter.  For dedup graphs this is the right scale trade-off:
components are near-cliques of duplicates (diameter 1–3), so 2–4
rounds of one shuffle each finish the job, with the edge exchange
persisted and reused across rounds (same pattern as
``graph/pagerank.py``).  For adversarial long-path graphs the
log-round alternating-star algorithm would replace the loop body; the
driver-side convergence check (one count per round) is the standard
stopping rule either way.

Verified against a pure-Python union-find oracle (pytest) and a
DuckDB recursive-CTE oracle (driver correctness gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 50  # backstop; dedup graphs converge in a handful


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    partitions: int | None = None,
) -> DataFrame:
    """(node, comp) for every node; comp = min node id in the component.

    ``edges`` may be directed/deduplicated — they are symmetrized here.
    Isolated nodes keep themselves as their component."""
    spark = edges.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .repartition(p, "a")
        .persist()
    )

    labels = nodes.select(F.col(node).alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    labels = labels.localCheckpoint(eager=True)

    for _ in range(MAX_ROUNDS):
        # each node's candidate label: min over neighbors' labels ∪ own
        msgs = (
            sym.join(labels.withColumnRenamed("node", "a"), "a")
            .select(F.col("b").alias("node"), "label")
            .unionByName(labels)
        )
        new_labels = msgs.groupBy("node").agg(F.min("label").alias("label"))
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.withColumnRenamed("label", "new")
            .join(labels, "node")
            .filter(F.col("new") != F.col("label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    sym.unpersist()
    return labels.select("node", F.col("label").alias("comp"))


def connected_components_py(
    edge_list: list[tuple[int, int]], node_list: list[int]
) -> dict[int, int]:
    """Union-find oracle (path compression + union by min label)."""
    parent: dict[int, int] = {n: n for n in node_list}
    for a, b in edge_list:
        parent.setdefault(a, a)
        parent.setdefault(b, b)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {n: find(n) for n in parent}
