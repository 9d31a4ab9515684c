"""Triangle counting with degree orientation — the standard
shuffle-join formulation that survives skewed degree distributions
(Suri & Vassilvitskii 2011, "Counting Triangles and the Curse of the
Last Reducer").

Each undirected edge is oriented from its lower endpoint to its higher
endpoint under the total order (degree, node id).  Every out-
neighborhood then has size O(sqrt(m)) regardless of how skewed the
original degrees are, so the wedge join (out-neighbors paired per
common source) is bounded even when one host/hub dominates the graph —
the difference between finishing and the last-reducer stall at 10^10
edges.  Triangles are wedges (u → v1, u → v2) closed by the oriented
edge (v1 → v2); each triangle is found exactly once.

The reference has no triangle counter (PageRank only,
``lib-lopez/src/page_rank.rs``); the gate's DuckDB oracle counts the
same graph with the naive id-ordered a<b<c formulation, so agreement
cross-checks two independent constructions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct undirected edges as (a, b) with a < b; self-loops
    dropped (they can't be in a triangle)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    return e.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    ).distinct()


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts (node, n_tri), nodes in ≥1 triangle.

    Three shuffles total: canonical-edge distinct, the wedge groupBy
    (via self-join on the oriented source), and the closing-edge join;
    the final per-node count reuses the exploded triangle stream."""
    und = _canonical_undirected(edges, src, dst)

    # degree under the undirected graph, then the (degree, id) total
    # order realized as a single sortable key: degree * 2^32 + id is
    # NOT safe for arbitrary ids, so keep the pair and compare
    # lexicographically via struct comparison.
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )

    da = deg.select(
        F.col("node").alias("a"), F.col("deg").alias("deg_a")
    )
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    keyed = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            F.struct(F.col("deg_a").alias("d"), F.col("a").alias("i")).alias("ka"),
            F.struct(F.col("deg_b").alias("d"), F.col("b").alias("i")).alias("kb"),
        )
    )
    # orient low -> high under (deg, id); carry the order key of the
    # head so wedge pairs can be ordered without re-joining degrees
    e_dir = keyed.select(
        F.when(F.col("ka") < F.col("kb"), F.col("a")).otherwise(F.col("b")).alias("t"),
        F.when(F.col("ka") < F.col("kb"), F.col("b")).otherwise(F.col("a")).alias("h"),
        F.when(F.col("ka") < F.col("kb"), F.col("kb")).otherwise(F.col("ka")).alias("kh"),
    )

    w1 = e_dir.select(
        F.col("t"), F.col("h").alias("v1"), F.col("kh").alias("k1")
    )
    w2 = e_dir.select(
        F.col("t"), F.col("h").alias("v2"), F.col("kh").alias("k2")
    )
    wedges = w1.join(w2, "t").filter(F.col("k1") < F.col("k2"))
    closing = e_dir.select(
        F.col("t").alias("v1"), F.col("h").alias("v2")
    )
    tris = wedges.join(closing, ["v1", "v2"]).select("t", "v1", "v2")

    return (
        tris.select(F.explode(F.array("t", "v1", "v2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )


def triangle_counts_python(
    edge_list: list[tuple[int, int]],
) -> dict[int, int]:
    """Straight-line replica for tests: brute-force over canonical
    edges."""
    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    nodes = sorted({x for e in und for x in e})
    adj = {n: set() for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    out: dict[int, int] = {}
    for a, b in und:
        for c in adj[a] & adj[b]:
            if a < b < c:
                for x in (a, b, c):
                    out[x] = out.get(x, 0) + 1
    return out
