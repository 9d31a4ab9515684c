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
``graph/pagerank.py``).  For graphs whose diameter is NOT tiny (long
chains of borderline near-dups, arbitrary link graphs),
:func:`connected_components_alternating` implements the two-phase
large-star/small-star contraction of Kiveris et al. 2014 ("Connected
Components in MapReduce and Beyond", public) — O(log n) rounds on any
shape, each round two band-keyed shuffles over the shrinking edge
set.  Both return identical labels (tested).

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


from pyspark.sql import Window  # noqa: E402  (used by the star phases)


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round: every node u connects its *larger*
    neighbors to m(u) = min(Γ(u) ∪ {u}).  Input/output edges are
    (a, b) pairs with a > b, distinct.

    m(u) is a window min over the neighbor list — the same single
    shuffle the groupBy would cost, but the per-neighbor m attaches in
    place, so there is NO join (and no sort-merge of the 2|E| neighbor
    stream against the per-node mins)."""
    nbr = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    w = Window.partitionBy("a")
    return (
        nbr.withColumn("m", F.least(F.col("a"), F.min("b").over(w)))
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: every node u connects its *smaller*
    neighbors (all of its b's, given the a > b orientation) and itself
    to m(u) = min of those.  Same join-free window-min shape as
    :func:`_large_star`, over the |E| oriented edges only.

    The output is NOT deduplicated: each alternating round runs
    ``_large_star(_small_star(e))`` and a window MIN is insensitive to
    duplicate rows, so the dedup rides the large-star pass's final
    ``distinct`` — one shuffle per round instead of two."""
    w = Window.partitionBy("a")
    j = e.withColumn("m", F.min("b").over(w))
    return (
        j.select(F.col("b").alias("a"), F.col("m").alias("b"))
        .unionByName(j.select("a", F.col("m").alias("b")))
        .filter(F.col("a") != F.col("b"))
    )


_DRIVER_EDGE_MAX = 65_536  # distinct dedup-pair edges the driver will hold


def connected_components_alternating(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    max_rounds: int = 100,
    _stats: dict | None = None,
    driver_max: int | None = None,
) -> DataFrame:
    """(node, comp) via alternating large-star/small-star contraction
    (Kiveris et al. 2014) — converges in O(log n) rounds on ANY graph
    shape, where min-label propagation needs diameter rounds (O(n) on
    a path).  At the fixpoint the edge set is a star forest
    (child, component-min); labels read straight off it.

    Per round: two shuffles over the current edge set (which only
    shrinks), one eager ``localCheckpoint`` to cut lineage, and one
    driver round-trip of a single (count, xor-of-hashes) signature row
    for the stopping rule — no edge data ever reaches the driver.  The
    64-bit signature makes the fixpoint test probabilistic with
    collision odds ~2^-64 per round; a collision could only stop one
    round early, never corrupt labels that were already assigned.

    Small-graph fast path (round 6, guide §1.2 "per-task work after
    the algorithm"): a dedup run's verified near-dup pairs are usually
    a tiny fraction of the corpus, while every alternating round costs
    ~3 shuffle stages plus a driver round-trip — pure fixed overhead at
    that size.  The distinct edge set is therefore probed with a
    bounded ``limit(max+1).collect()`` (the same ≤65,536-row discipline
    as the frontier histogram in crawler/frontier.py); when it fits,
    labels come from the in-memory union-find oracle
    (:func:`connected_components_py`, min-label semantics — identical
    output by the tested equivalence) and join back as one broadcast —
    2 jobs instead of ~15 stages.  Larger edge sets take the
    distributed contraction unchanged; ``driver_max=0`` forces it."""
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("a"),
            F.least(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    if driver_max is None:
        driver_max = _DRIVER_EDGE_MAX
    f_node, f_root = e.schema["a"].dataType, e.schema["b"].dataType
    integral = {"tinyint", "smallint", "int", "bigint"}
    if (
        driver_max > 0
        and f_node.simpleString() in integral
        and f_root.simpleString() in integral
    ):
        probe = e.limit(driver_max + 1).collect()
        if len(probe) <= driver_max:
            if _stats is not None:
                _stats["rounds"] = 0
                _stats["driver_path"] = True
            labels = connected_components_py(
                [(r["a"], r["b"]) for r in probe], []
            )
            spark = edges.sparkSession
            pairs = [(n, c) for n, c in labels.items() if n != c]
            # the label map ships as TWO CSV strings split + cast
            # JVM-side (one py4j call each): createDataFrame/parallelize
            # would route the rows through a pickled-Python RDD scan
            # (these query plans are guarded Python-free), and a
            # F.lit(list) literal pays one py4j gateway call PER ELEMENT
            # (measured ~5 s at 60k labels); hence the integral-keys
            # restriction above — non-integral ids take the distributed
            # path.  The frame only ever feeds one broadcast.
            if pairs:
                ns = ",".join(str(n) for n, _ in pairs)
                rs = ",".join(str(c) for _, c in pairs)
                lbl = (
                    spark.range(1)
                    .select(
                        F.explode(
                            F.arrays_zip(
                                F.expr(
                                    f"transform(split('{ns}', ','), "
                                    f"x -> CAST(x AS {f_node.simpleString()}))"
                                ).alias("n"),
                                F.expr(
                                    f"transform(split('{rs}', ','), "
                                    f"x -> CAST(x AS {f_root.simpleString()}))"
                                ).alias("r"),
                            )
                        ).alias("z")
                    )
                    .select(
                        F.col("z.n").alias("node"), F.col("z.r").alias("root")
                    )
                )
            else:
                lbl = spark.range(0).select(
                    F.lit(None).cast(f_node).alias("node"),
                    F.lit(None).cast(f_root).alias("root"),
                )
            return (
                nodes.select(F.col(node).alias("node"))
                .distinct()
                .join(F.broadcast(lbl), "node", "left")
                .select(
                    "node",
                    F.coalesce(F.col("root"), F.col("node")).alias("comp"),
                )
            )

    def signature(df: DataFrame):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("sig"),
        ).collect()[0]
        return (row["n"], row["sig"])

    prev = signature(e)
    rounds = 0
    for _ in range(max_rounds):
        # small-star first: it runs over the |E| oriented edges (no
        # symmetrization), contracting multi-parent nodes before the
        # 2|E|-row large-star pass touches the stream
        # lazy checkpoint: the signature aggregate below is the job
        # that materializes (and checkpoints) this round's edge set —
        # one job per round, not checkpoint + signature separately
        e = _large_star(_small_star(e)).localCheckpoint(eager=False)
        rounds += 1
        cur = signature(e)
        if cur == prev:
            break
        prev = cur
    if _stats is not None:
        _stats["rounds"] = rounds

    return (
        nodes.select(F.col(node).alias("node"))
        .distinct()
        .join(e.select(F.col("a").alias("node"), F.col("b").alias("root")), "node", "left")
        .select("node", F.coalesce(F.col("root"), F.col("node")).alias("comp"))
    )


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
