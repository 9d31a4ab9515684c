"""Distributed k-means (operators/kmeans.py) and the trained-PQ ANN
path: determinism, quantization, an independent numpy replica of the
exact fixed-iteration algorithm, and the measured recall improvement
of trained codebooks + re-rank over the untrained md5-device control
(round-4 VERDICT task #2)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from lopez_spark.operators.kmeans import (
    ITERS,
    QUANT,
    kmeans_fit,
    pq_kmeans_fit,
    qround,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _np_embeddings():
    import duckdb

    rows = duckdb.sql(
        f"SELECT embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    return np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])


def _np_seeds(n: int, k: int) -> list[int]:
    return sorted(range(n), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:k]


def _np_qround(x: np.ndarray) -> np.ndarray:
    return np.floor(x * QUANT + 0.5) / QUANT


def _np_pq_fit(emb: np.ndarray, m: int, k: int, iters: int) -> np.ndarray:
    """Straight-line replica of pq_kmeans_fit: hash seeds, argmin with
    lowest-k ties, quantized mean updates, empty cluster keeps
    previous."""
    n, dims = emb.shape
    sub = dims // m
    sd = _np_seeds(n, k)
    book = np.stack([[emb[sd[j], s * sub : (s + 1) * sub] for j in range(k)] for s in range(m)])
    x = emb.reshape(n, m, sub)
    for _ in range(iters):
        d = ((x[:, :, None, :] - book[None]) ** 2).sum(-1)  # n, m, k
        a = d.argmin(-1)  # numpy argmin = first (lowest) index on ties
        for s in range(m):
            for j in range(k):
                mask = a[:, s] == j
                if mask.any():
                    book[s, j] = _np_qround(x[mask, s].mean(0))
    return book


def test_qround_half_up_on_grid():
    assert qround(0.00005) == 0.0001
    assert qround(-0.00005) == 0.0  # floor(x*q + 0.5): half rounds UP
    assert qround(0.123456789) == 0.1235
    assert qround(-0.123456789) == -0.1235


def test_kmeans_fit_deterministic_and_quantized(emb):
    a = kmeans_fit(emb, k=4, iters=2)
    b = kmeans_fit(emb, k=4, iters=2)
    assert a == b
    assert len(a) == 4 and all(len(c) == 64 for c in a)
    for cent in a:
        for v in cent:
            assert v == qround(v)  # on the 1e-4 grid
            assert math.isfinite(v)


def test_pq_fit_matches_numpy_replica(emb):
    """The Spark relational trainer and a straight-line numpy replica
    of the same fixed-iteration algorithm produce the SAME books —
    the strongest single check that seeds/ties/quantization/empty-
    cluster semantics are what the DuckDB oracle also implements."""
    got = np.array(pq_kmeans_fit(emb, m=8, k=8, iters=ITERS))
    want = _np_pq_fit(_np_embeddings(), m=8, k=8, iters=ITERS)
    assert got.shape == want.shape == (8, 8, 8)
    assert np.array_equal(got, want), np.abs(got - want).max()


def test_full_kmeans_matches_numpy_replica(emb):
    got = np.array(kmeans_fit(emb, k=8, iters=ITERS))
    want = _np_pq_fit(_np_embeddings(), m=1, k=8, iters=ITERS)[0]
    assert np.array_equal(got, want)


def test_trained_recall_beats_untrained_control(spark):
    """VERDICT r4 task #2 'done' criterion: recall materially improved
    and asserted.  Untrained 8x8 ADC: 1/10 here; trained 16x32 +
    exact re-rank of the ADC-50 shortlist: 10/10."""
    from lopez_spark.plans.driver_queries import QUERIES

    untrained = QUERIES["ann_pq_recall"](spark, SF).collect()[0].n_hits
    trained = QUERIES["ann_pq_recall_trained"](spark, SF).collect()[0].n_hits
    assert trained >= untrained + 5, (trained, untrained)
    assert trained >= 9, trained


def test_kmeans_centroids_query_matches_duckdb_oracle(spark):
    """Cheap local replica of the driver gate for the new query (the
    full gate runs at sf0.01; this pins sf0.001 in the suite)."""
    import duckdb

    from lopez_spark.plans.driver_queries import ORACLES, QUERIES

    got = {
        (r.k, r.d): r.ce6
        for r in QUERIES["kmeans_centroids"](spark, SF).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    want = {(k, d): ce6 for k, d, ce6 in con.sql(ORACLES["kmeans_centroids"]()).fetchall()}
    assert got == want
    assert len(got) == 8 * 64


def _np_vecs_with_ids():
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in rows]
    return ids, np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])


def _np_kmpar(ids, X, k, ell, rounds):
    """Straight-line replica of kmeans_parallel_init: hash-min seed,
    hash-Bernoulli rounds with the integer-phi threshold, argmin
    weights, top-k by (weight desc, index)."""
    h = lambda s: hashlib.md5(s.encode()).hexdigest()
    seed = min(range(len(ids)), key=lambda i: (h(str(ids[i])), ids[i]))
    cand = [seed]
    for r in range(1, rounds + 1):
        d2 = ((X[:, None, :] - X[cand][None]) ** 2).sum(-1).min(1)
        d2q = np.floor(d2 * 1_000_000).astype(np.int64)
        phi = int(d2q.sum())
        h32 = np.array(
            [int(h(f"{ids[i]}:{r}")[:8], 16) for i in range(len(ids))],
            dtype=np.float64,
        )
        sel = h32 * float(phi) < (ell * d2q).astype(np.float64) * 4294967296.0
        new = sorted(
            (i for i in np.nonzero(sel)[0] if i not in cand),
            key=lambda i: ids[i],
        )
        cand += new
    d2 = ((X[:, None, :] - X[cand][None]) ** 2).sum(-1)
    a = d2.argmin(1)  # ties -> lowest candidate index
    w = np.bincount(a, minlength=len(cand))
    order = sorted(range(len(cand)), key=lambda ci: (-int(w[ci]), ci))[:k]
    return [(ci, ids[cand[ci]], int(w[ci])) for ci in order]


def test_kmeans_parallel_init_matches_numpy_replica(emb):
    from lopez_spark.operators.kmeans import kmeans_parallel_init

    got = [(ci, vid, wt) for ci, vid, wt, _v in kmeans_parallel_init(emb)]
    ids, X = _np_vecs_with_ids()
    assert got == _np_kmpar(ids, X, k=8, ell=8, rounds=2)
    assert len({ci for ci, _, _ in got}) == 8
    wts = [wt for _, _, wt in got]
    assert wts == sorted(wts, reverse=True) and all(w > 0 for w in wts)


def test_kmpar_seeds_beat_hash_seeds():
    """The point of k-means|| seeding: its candidates are spread by
    the d^2-weighted draw, so the initial potential phi (sum of
    squared distances to the nearest seed) must beat the arbitrary
    md5-hash seeds that kmeans_fit defaults to."""
    ids, X = _np_vecs_with_ids()
    kmpar = _np_kmpar(ids, X, k=8, ell=8, rounds=2)
    pos = {v: i for i, v in enumerate(ids)}
    kmpar_seeds = X[[pos[vid] for _, vid, _ in kmpar]]
    hash_seeds = X[_np_seeds(len(ids), 8)]
    phi = lambda S: ((X[:, None, :] - S[None]) ** 2).sum(-1).min(1).sum()
    assert phi(kmpar_seeds) < phi(hash_seeds)


def test_kmeans_fit_accepts_kmpar_seeds(emb):
    """kmeans_fit(seeds=...) wires the k-means|| candidates in as the
    Lloyd's init — the composed deployment recipe (seed scalably,
    then iterate)."""
    from lopez_spark.operators.kmeans import kmeans_fit, kmeans_parallel_init

    picked = kmeans_parallel_init(emb)
    cents = kmeans_fit(emb, k=8, iters=1, seeds=[v for _, _, _, v in picked])
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)
    # updates land on the 1e-4 quantization grid
    assert all(
        abs(x * QUANT - round(x * QUANT)) < 1e-9 for c in cents for x in c
    )
