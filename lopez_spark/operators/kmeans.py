"""Distributed Lloyd's k-means over embedding columns — DataFrame jobs
only, the MLlib execution shape (reference: lopez has no ANN training;
this is the beyond-reference path that turns the PQ/IVF family's
deterministic device codebooks into trained ones).

Execution model (the one that holds at 10^10 vectors):

* **assignment** is per-row JVM compute — the current centroids are
  tiny (k x d doubles) and injected as literal arrays, so distance =
  ``zip_with``/``aggregate`` expressions, no Python, no join, no
  shuffle;
* **update** is one ``groupBy(cluster)`` shuffle producing k rows of
  per-dimension means — the classic map-side-combinable aggregation;
* the k x d result is collected to the driver between iterations
  (512 doubles here; k*d*8 bytes in general — the same per-iteration
  driver sync Spark MLlib's KMeans does).

Determinism across engines (the correctness gate runs a DuckDB oracle
of the SAME fixed-iteration algorithm):

* seeds are the k vectors ranked first by ``(md5(vec_id), vec_id)`` —
  hash-seeded, identical in both engines;
* every centroid update is quantized to the 1e-4 grid with
  round-half-up (``floor(x * 10000 + 0.5) / 10000``) so engine-side
  floating-point summation-order differences cannot leak into the next
  iteration;
* argmin ties break to the lowest cluster id;
* an empty cluster keeps its previous centroid.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 10_000  # centroid grid: 1e-4, round-half-up
ITERS = 3  # fixed Lloyd's rounds (unrolled identically in the oracle)


def qround(x: float, quant: int = QUANT) -> float:
    """Round-half-up onto the 1/quant grid — ``floor`` matches both
    engines on negatives (unlike banker's rounding)."""
    return math.floor(x * quant + 0.5) / quant


def _seed_vectors(emb: DataFrame, k: int) -> list[list[float]]:
    """The k seed vectors: embeddings ranked by (md5(vec_id), vec_id).
    Two tiny jobs; raw (unquantized) doubles — both engines read the
    same parquet so the bits agree."""
    seed_rows = (
        emb.select(
            "vec_id",
            F.md5(F.col("vec_id").cast("string")).alias("h"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )
    return [list(r.v) for r in seed_rows]


def _sq_dist(vec, cent: list[float]):
    """sum_d (vec[d] - cent[d])^2 as a sequential JVM fold (fixed
    evaluation order, matching the oracle's per-group SUM at the
    quantization grain)."""
    diffs = F.zip_with(
        vec, F.array(*[F.lit(c) for c in cent]), lambda x, c: (x - c) * (x - c)
    )
    return F.aggregate(diffs, F.lit(0.0), lambda a, x: a + x)


def _argmin(dists: list):
    """Index of the smallest distance, tie -> lowest index (CASE-first
    semantics, = the oracle's row_number ORDER BY dist, k)."""
    best = F.least(*dists)
    expr = F.lit(None)
    for j in reversed(range(len(dists))):
        expr = F.when(dists[j] == best, j).otherwise(expr)
    return expr


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = ITERS,
    seeds: list[list[float]] | None = None,
) -> list[list[float]]:
    """Full-vector Lloyd's: (vec_id, embedding) -> k centroids of
    len(embedding) quantized doubles.  ``seeds`` overrides the default
    hash-seeded init — pass the vectors from ``kmeans_parallel_init``
    for the Bahmani-2012 scalable seeding."""
    dims = emb.select(F.size("embedding")).first()[0]
    v = F.col("embedding").cast("array<double>")
    cents = [list(s) for s in seeds] if seeds is not None else _seed_vectors(emb, k)
    assert len(cents) == k
    for _ in range(iters):
        code = _argmin([_sq_dist(v, cents[j]) for j in range(k)])
        upd = (
            emb.select(code.alias("cl"), v.alias("v"))
            .groupBy("cl")
            .agg(*[F.avg(F.col("v")[d]).alias(f"a{d}") for d in range(dims)])
            .collect()
        )
        nxt = [c[:] for c in cents]  # empty cluster -> keep previous
        for r in upd:
            nxt[r["cl"]] = [qround(r[f"a{d}"]) for d in range(dims)]
        cents = nxt
    return cents


def pq_points(emb: DataFrame, sub: int) -> DataFrame:
    """(vec_id, embedding) -> long form (vec_id, s, d, x) with
    s = dim // sub, d = dim % sub — the oracle's `spts` CTE shape."""
    return emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "x"),
    ).select(
        "vec_id",
        F.expr(f"CAST(i DIV {sub} AS BIGINT)").alias("s"),
        F.expr(f"CAST(i % {sub} AS BIGINT)").alias("d"),
        "x",
    )


def book_df(spark, book: list[list[list[float]]]) -> DataFrame:
    """book[s][k][d] -> tiny long-form centroid DataFrame
    (s, k, d, c) for broadcast joins."""
    rows = [
        (s, kk, d, c)
        for s, bs in enumerate(book)
        for kk, cent in enumerate(bs)
        for d, c in enumerate(cent)
    ]
    return spark.createDataFrame(rows, schema="s long, k long, d long, c double")


def pq_kmeans_fit(
    emb: DataFrame, m: int = 8, k: int = 8, iters: int = ITERS
) -> list[list[list[float]]]:
    """Per-subspace Lloyd's for product quantization: (vec_id,
    embedding with m*sub dims) -> book[s][k][d].  All m subspaces
    train in the same jobs, RELATIONALLY (the shape that survives
    m*k in the hundreds, where per-row literal expression trees choke
    Catalyst): points explode once to (vec_id, s, d, x), the m*k*sub
    centroid table broadcasts, assignment is one aggregate + a
    min(struct(dist, k)) tie-break (lowest k, like the oracle's
    row_number ORDER BY dist, k), update is one (s, k, d) aggregate."""
    dims = emb.select(F.size("embedding")).first()[0]
    sub = dims // m
    spark = emb.sparkSession
    pts = pq_points(emb, sub)
    seeds = _seed_vectors(emb, k)
    book = [[seeds[j][s * sub : (s + 1) * sub] for j in range(k)] for s in range(m)]
    for _ in range(iters):
        cent = book_df(spark, book)
        dist = (
            pts.join(F.broadcast(cent), ["s", "d"])
            .groupBy("vec_id", "s", "k")
            .agg(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).alias("dist"))
        )
        asg = dist.groupBy("vec_id", "s").agg(
            F.min(F.struct("dist", "k"))["k"].alias("k")
        )
        upd = (
            asg.join(pts, ["vec_id", "s"])
            .groupBy("s", "k", "d")
            .agg(F.avg("x").alias("c"))
            .collect()
        )
        nxt = [[c[:] for c in bs] for bs in book]
        for r in upd:
            nxt[r["s"]][r["k"]][r["d"]] = qround(r["c"])
        book = nxt
    return book


def kmeans_parallel_init(
    emb: DataFrame, k: int = 8, ell: int = 8, rounds: int = 2
) -> list[tuple[int, int, list[float]]]:
    """Deterministic k-means|| initialization (Bahmani et al. 2012,
    "Scalable K-Means++", VLDB §3.1) — the distributed seeding that
    replaces k-means++'s k sequential full passes with `rounds` passes
    that each draw ~ell points in parallel, then reduces the small
    candidate set to k.

    Each round: with C the candidates so far, every point computes
    d2q(x) = floor(min_c ||x-c||^2 * 1e6) as per-row JVM literal folds
    (C stays tiny, <= 1 + ell*rounds), phi = SUM(d2q) in one map-side-
    combinable aggregate, and x is selected iff

        h32(x, r) * phi  <  ell * d2q(x) * 2^32

    where h32 is the first 8 md5 hex digits of "vec_id:r" — i.e. an
    (ell * d2q / phi)-probability Bernoulli draw with the randomness
    replaced by a hash, so both engines select the SAME points.  The
    comparison is exact-deterministic: phi and ell*d2q are integers
    (exact as doubles below 2^53 — at larger scale, divide phi and
    d2q by a common power of two first), *2^32 is exact scaling, and
    IEEE multiply is correctly rounded identically in Spark and
    DuckDB.

    Reduction: weight every candidate by the number of points whose
    argmin it is (tie -> lowest candidate index; one groupBy), keep
    the k heaviest (tie -> lowest candidate index) — the paper
    reclusters the weighted candidates with k-means++; top-k-by-weight
    is the deterministic, oracle-checkable reduction and the weights
    are returned so a caller can recluster.  Returns k tuples
    (candidate_index, vec_id, weight, vector), candidate_index
    ordered by (round_added, vec_id).
    """
    v = F.col("embedding").cast("array<double>")
    first = (
        emb.select(
            "vec_id",
            F.md5(F.col("vec_id").cast("string")).alias("h"),
            v.alias("v"),
        )
        .orderBy("h", "vec_id")
        .limit(1)
        .collect()[0]
    )
    cands: list[tuple[int, list[float]]] = [(first.vec_id, list(first.v))]
    for r in range(1, rounds + 1):
        d2q = (
            F.floor(F.least(*[_sq_dist(v, c) for _, c in cands]) * 1_000_000)
            if len(cands) > 1
            else F.floor(_sq_dist(v, cands[0][1]) * 1_000_000)
        ).cast("long")
        phi = emb.select(F.sum(d2q).alias("p")).first().p
        h32 = F.conv(
            F.substring(
                F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(f":{r}"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        sel = (
            emb.filter(
                h32.cast("double") * F.lit(float(phi))
                < (F.lit(ell) * d2q).cast("double") * F.lit(4294967296.0)
            )
            .select("vec_id", v.alias("v"))
            .orderBy("vec_id")
            .collect()
        )
        have = {c[0] for c in cands}
        cands += [(row.vec_id, list(row.v)) for row in sel if row.vec_id not in have]
    code = _argmin([_sq_dist(v, c) for _, c in cands])
    wts = {
        row.ci: row.w
        for row in emb.select(code.alias("ci"))
        .groupBy("ci")
        .agg(F.count(F.lit(1)).alias("w"))
        .collect()
    }
    ranked = sorted(range(len(cands)), key=lambda i: (-wts.get(i, 0), i))[:k]
    return [(i, cands[i][0], wts.get(i, 0), cands[i][1]) for i in ranked]
