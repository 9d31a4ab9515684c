"""PQ ANN: the Spark SQL pipeline vs an independent pure-numpy
reimplementation of the same codebook device, encode and ADC scan."""

import hashlib

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
_ALPHA = "0123456789abcdef"


def _cval(s, k, d):
    digit = hashlib.md5(f"pq{s}#{k}#{d}".encode()).hexdigest()[0]
    return (_ALPHA.index(digit) + 1 - 8.5) / 25.0


def _numpy_pq_top10(emb: pd.DataFrame, qid: int, M=8, K=8):
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in emb.itertuples()}
    book = np.array(
        [[[_cval(s, k, d) for d in range(8)] for k in range(K)]
         for s in range(M)]
    )  # (M, K, 8)
    def dists(v):
        sub = v.reshape(M, 1, 8)
        return ((sub - book) ** 2).sum(axis=2)  # (M, K)
    codes = {vid: np.argmin(dists(v), axis=1) for vid, v in vecs.items()}
    lut = dists(vecs[qid])  # (M, K)
    out = []
    for vid, c in codes.items():
        if vid == qid:
            continue
        adc = float(sum(lut[s, c[s]] for s in range(M)))
        out.append((int(np.floor(adc * 1_000_000)), vid))
    out.sort(key=lambda t: (t[0], t[1]))
    return [(vid, d) for d, vid in out[:10]]


def test_spark_pq_matches_numpy(spark):
    from lopez_spark.plans.driver_queries import _PQ_QUERY_VEC, QUERIES

    got = [
        (r["vec_id"], r["dist_e6"])
        for r in QUERIES["ann_pq_adc"](spark, SF).collect()
    ]
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    want = _numpy_pq_top10(emb, _PQ_QUERY_VEC)
    assert got == want


def test_codebook_device_in_value_range():
    vals = [_cval(s, k, d) for s in range(8) for k in range(8) for d in range(8)]
    assert min(vals) >= -0.3 and max(vals) <= 0.3
    # codebooks are distinct across subspaces/centroids (not degenerate)
    rows = {tuple(_cval(s, k, d) for d in range(8)) for s in range(8) for k in range(8)}
    assert len(rows) == 64
