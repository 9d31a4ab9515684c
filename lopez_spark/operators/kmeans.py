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


def _cents_lit(cents: list[list[float]]):
    """k x d centroid matrix as ONE nested literal array column —
    O(k*d) Literal leaves, vs the O(k^2*d) node count of the
    least()+CASE argmin over per-centroid fold trees it replaces
    (each dist subtree used to appear once under least() and again
    under its WHEN arm — quadratic Catalyst analysis per job).

    Built as a single SQL text via ``F.expr`` — one py4j round-trip;
    ``F.array(*map(F.lit, ...))`` costs one JVM call per element,
    which at 2048 doubles per trained codebook dominated the whole
    fit.  ``repr(float)`` round-trips exactly (shortest string that
    parses back to the same IEEE double, in Java as in Python)."""
    body = ",".join(
        "array(" + ",".join(f"CAST('{float(c)!r}' AS DOUBLE)" for c in cent) + ")"
        for cent in cents
    )
    return F.expr(f"array({body})")


def dist_array(vec, cents: list[list[float]]):
    """array<double> of squared distances to each centroid: ONE
    ``transform`` over the literal centroid matrix, each element the
    same sequential d=0..d-1 fold as :func:`_sq_dist` (bit-identical
    values, linear-size expression tree)."""
    return F.transform(
        _cents_lit(cents),
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda x, cc: (x - cc) * (x - cc)),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
    )


def argmin_idx(darr):
    """0-based index of the smallest value, tie -> lowest index
    (``array_position`` returns the FIRST occurrence — the same
    CASE-first / min(struct) tie-break as :func:`_argmin`)."""
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("long")


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
    v = F.col("embedding").cast("array<double>")
    cents = [list(s) for s in seeds] if seeds is not None else _seed_vectors(emb, k)
    assert len(cents) == k
    dims = len(cents[0])  # from the seeds already in hand — no extra job
    for _ in range(iters):
        code = argmin_idx(dist_array(v, cents))
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


def pq_subvecs(
    df: DataFrame,
    m: int,
    sub: int,
    id_cols: tuple[str, ...] = ("vec_id",),
    vec_col: str = "embedding",
) -> DataFrame:
    """(ids, vec) -> (ids, s, sv): one row per subspace carrying the
    sub-dim slice.  m*n skinny rows — the narrowest long form that
    still lets every PQ stage run as codegen'd arithmetic."""
    v = F.col(vec_col).cast("array<double>")
    return df.select(
        *id_cols,
        F.posexplode(F.array(*[F.slice(v, s * sub + 1, sub) for s in range(m)])).alias(
            "s", "sv"
        ),
    ).select(*id_cols, F.col("s").cast("long").alias("s"), "sv")


def pq_cent_df(spark, book: list[list[list[float]]]) -> DataFrame:
    """book[s][k][d] -> tiny (s, k, cv) centroid frame for broadcast
    joins (m*k rows, one array per row)."""
    rows = [(s, kk, list(cent)) for s, bs in enumerate(book) for kk, cent in enumerate(bs)]
    # ONE slice at creation (parallelize numSlices) — NOT .coalesce(1):
    # a coalesce over the default 32-slice local collection measured a
    # flat ~4 s per broadcast build (vs ~0.7 s this way)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        schema="s long, k long, cv array<double>",
    )


def _sv_cv_dist(sub: int):
    """sum_d (sv[d] - cv[d])^2 as inline codegen'd arithmetic, same
    sequential d-order as :func:`_sq_dist` (0.0 + t0 == t0 exactly, so
    dropping the explicit fold seed changes no bits)."""
    expr = None
    for d in range(sub):
        term = (F.col("sv")[d] - F.col("cv")[d]) * (F.col("sv")[d] - F.col("cv")[d])
        expr = term if expr is None else expr + term
    return expr


def pq_codes_long(
    df: DataFrame,
    book: list[list[list[float]]],
    id_cols: tuple[str, ...] = ("vec_id",),
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-encode every row: (ids, s, code) long form.  Subvectors
    explode to m*n skinny rows, the m*k centroid table broadcasts in
    (joined on s only — k-way row multiplication feeds straight into a
    partial min, never materialized), dist is inline codegen'd
    arithmetic, argmin = min(struct(dist, k)) (tie -> lowest k, like
    the oracle's row_number ORDER BY dist, k)."""
    m = len(book)
    sub = len(book[0][0])
    sv = pq_subvecs(df, m, sub, id_cols, vec_col)
    j = sv.join(F.broadcast(pq_cent_df(df.sparkSession, book)), "s").select(
        *id_cols, "s", "k", _sv_cv_dist(sub).alias("dist")
    )
    return j.groupBy(*id_cols, "s").agg(
        F.min(F.struct("dist", "k"))["k"].alias("code")
    )


def pq_kmeans_fit(
    emb: DataFrame, m: int = 8, k: int = 8, iters: int = ITERS
) -> list[list[list[float]]]:
    """Per-subspace Lloyd's for product quantization: (vec_id,
    embedding with m*sub dims) -> book[s][k][d].  All m subspaces
    train in the same jobs, over the narrow (vec_id, s, sv) long form:
    per iteration, assignment is a broadcast join on s with inline
    codegen'd distances reduced by a partial min(struct(dist, k))
    (the round-5 shape exploded to (vec, s, d, x) and shuffled the
    k-multiplied point stream through two wide aggregates), and the
    update is one (s, k) aggregate of sub averages; m*k rows collect
    per iteration."""
    seeds = _seed_vectors(emb, k)
    dims = len(seeds[0])  # from the seeds already in hand — no extra job
    sub = dims // m
    book = [[seeds[j][s * sub : (s + 1) * sub] for j in range(k)] for s in range(m)]
    sv = pq_subvecs(emb, m, sub)
    for _ in range(iters):
        j = sv.join(F.broadcast(pq_cent_df(emb.sparkSession, book)), "s").select(
            "vec_id", "s", "k", "sv", _sv_cv_dist(sub).alias("dist")
        )
        asg = j.groupBy("vec_id", "s").agg(
            F.min(F.struct("dist", "k"))["k"].alias("k"),
            F.first("sv").alias("sv"),  # identical across the group's k rows
        )
        upd = (
            asg.groupBy("s", "k")
            .agg(*[F.avg(F.col("sv")[d]).alias(f"a{d}") for d in range(sub)])
            .collect()
        )
        nxt = [[c[:] for c in bs] for bs in book]
        for r in upd:
            nxt[r["s"]][r["k"]] = [qround(r[f"a{d}"]) for d in range(sub)]
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
            F.floor(F.array_min(dist_array(v, [c for _, c in cands])) * 1_000_000)
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
    code = argmin_idx(dist_array(v, [c for _, c in cands]))
    wts = {
        row.ci: row.w
        for row in emb.select(code.alias("ci"))
        .groupBy("ci")
        .agg(F.count(F.lit(1)).alias("w"))
        .collect()
    }
    ranked = sorted(range(len(cands)), key=lambda i: (-wts.get(i, 0), i))[:k]
    return [(i, cands[i][0], wts.get(i, 0), cands[i][1]) for i in ranked]
