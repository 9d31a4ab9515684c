"""Seen-set membership at 10^10-URL scale (operator F4/O13).

The reference's seen-set is a Postgres primary-key collision
(``ensure_names.sql`` / ``ensure_status.sql`` — on conflict do nothing).
A plain anti-join reproduces that exactly but shuffles every candidate
link against the full frontier.  At 10^10 URLs the north rule mandates
the two-tier design implemented here:

  * **broadcast Bloom filter** over the seen ``url_hash`` set — a
    *definite-negative* fast path: links whose hash is not in the Bloom
    are certainly new and skip the shuffle entirely;
  * **exact verification** for Bloom positives (the false-positive
    fraction) via the ordinary anti-join — false positives therefore
    cost a shuffle, never a dropped URL (correctness is never
    approximate);
  * a **per-partition cuckoo filter** for executor-local exact-ish
    membership with deletion support (used for intra-partition dedup
    of link bursts before the global phase).

Everything is vectorized numpy over Arrow batches — no per-row Python.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _splitmix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — derives independent hash streams from the
    already-xxhash64'd key (vectorized, uint64)."""
    x = (x + _MIX).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


class BloomFilter64:
    """Bloom filter over int64 keys, numpy-backed, mergeable, broadcastable."""

    def __init__(self, capacity: int, fpp: float = 0.01, m_bits: int | None = None):
        if m_bits is None:
            m_bits = max(64, int(-capacity * math.log(fpp) / (math.log(2) ** 2)))
        self.m = int(m_bits)
        self.k = max(1, round(self.m / max(capacity, 1) * math.log(2)))
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    def _indices(self, keys: np.ndarray) -> np.ndarray:
        """(k, n) bit indices via double hashing."""
        u = keys.astype(np.int64).view(np.uint64)
        h1 = _splitmix(u)
        h2 = _splitmix(u ^ _MIX) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m)).astype(np.int64)

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        idx = self._indices(np.asarray(keys))
        np.bitwise_or.at(self.bits, idx // 8, (1 << (idx % 8)).astype(np.uint8))

    def might_contain_many(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indices(np.asarray(keys))
        hit = (self.bits[idx // 8] & (1 << (idx % 8)).astype(np.uint8)) != 0
        return hit.all(axis=0)

    def merge(self, other: "BloomFilter64") -> "BloomFilter64":
        assert self.m == other.m and self.k == other.k
        self.bits |= other.bits
        return self

    # -- serialization for spark broadcast / treeReduce
    def dumps(self) -> tuple[int, int, bytes]:
        return (self.m, self.k, self.bits.tobytes())

    @classmethod
    def loads(cls, payload: tuple[int, int, bytes]) -> "BloomFilter64":
        m, k, raw = payload
        bf = cls.__new__(cls)
        bf.m, bf.k = m, k
        bf.bits = np.frombuffer(raw, dtype=np.uint8).copy()
        return bf


def build_bloom(df: DataFrame, key: str, capacity: int, fpp: float = 0.01) -> BloomFilter64:
    """Distributed Bloom build: one partial filter per partition,
    OR-merged executor-side via ``treeReduce`` — the driver receives a
    single m/8-byte buffer, never the P per-partition partials (the
    round-1 version collected all P of them: 32 partitions × 12 GB at
    the 10^10 north-rule capacity).  For capacities whose single filter
    exceeds broadcast limits, use the banded tier
    (:func:`build_banded_bloom` / :func:`seen_anti_join_banded`), which
    never materializes any full-size filter anywhere."""
    proto = BloomFilter64(capacity, fpp)
    m, k = proto.m, proto.k

    def partial(rows):
        bf = BloomFilter64(1, m_bits=m)
        bf.k = k
        keys = np.fromiter((r[0] for r in rows), dtype=np.int64)
        bf.add_many(keys)
        yield bf.bits.tobytes()

    def orb(a: bytes, b: bytes) -> bytes:
        return (
            np.frombuffer(a, dtype=np.uint8) | np.frombuffer(b, dtype=np.uint8)
        ).tobytes()

    rdd = df.select(key).rdd.mapPartitions(partial)
    if rdd.getNumPartitions() == 0:
        return proto
    merged = rdd.treeReduce(orb)
    proto.bits = np.frombuffer(merged, dtype=np.uint8).copy()
    return proto


# --------------------------------------------------------------- banded tier


class BandedBloomSpec:
    """Shape of a banded Bloom filter: ``bands`` shards keyed by
    ``pmod(key, bands)``, each an independent ``BloomFilter64`` sized to
    ``capacity / bands`` keys at ``fpp``.  At the north-rule capacity
    (10^10 keys, fpp 0.01 → ~12 GB of bits) no single 12 GB filter can
    exist on the driver or in a broadcast; banding keeps every physical
    filter ≤ ``max_band_bytes`` and the whole structure lives as a
    DataFrame of (band, bits) rows, co-partitioned with candidates."""

    def __init__(
        self,
        capacity: int,
        fpp: float = 0.01,
        max_band_bytes: int = 32 << 20,
        min_bands: int = 32,
    ):
        total_m = max(64, int(-capacity * math.log(fpp) / (math.log(2) ** 2)))
        # max_band_bytes caps each shard's memory; min_bands floors the
        # *parallelism* of every banded operation (build, merge, probe
        # cogroups are keyed by band — at 1 band a small-capacity config
        # would serialize the whole probe through one task)
        self.bands = max(min_bands, -(-total_m // (8 * max_band_bytes)))
        per_band = -(-capacity // self.bands)
        proto = BloomFilter64(per_band, fpp)
        self.m_band = proto.m
        self.k = proto.k
        self.capacity = capacity
        self.fpp = fpp

    def band_bytes(self) -> int:
        return (self.m_band + 7) // 8

    def empty_band(self) -> BloomFilter64:
        bf = BloomFilter64(1, m_bits=self.m_band)
        bf.k = self.k
        return bf


def build_banded_bloom(
    seen_df: DataFrame, key: str, spec: BandedBloomSpec
) -> DataFrame:
    """Build the banded Bloom as a DataFrame of (band int, bits binary).

    Fully distributed: keys shuffle to their band (one hash-partition
    pass over the *seen* set — bits, not keys, are what persists), each
    band's filter is built executor-side, and only bands that actually
    contain keys materialize.  Nothing full-size ever exists: not on the
    driver, not in any single task."""
    m, k, bands = spec.m_band, spec.k, spec.bands

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter64(1, m_bits=m)
        bf.k = k
        bf.add_many(pdf[key].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {"band": [int(pdf["__band"].iloc[0])], "bits": [bf.bits.tobytes()]}
        )

    return (
        seen_df.select(key)
        .withColumn("__band", F.pmod(F.col(key), F.lit(bands)).cast("int"))
        .groupBy("__band")
        .applyInPandas(build, "band int, bits binary")
    )


def merge_banded_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two banded blooms of the same spec (e.g. the standing
    seen-filter with a wave's discoveries) — a groupBy over band ids;
    each task ORs a handful of ≤max_band_bytes buffers."""

    def orfn(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = None
        for raw in pdf["bits"]:
            arr = np.frombuffer(raw, dtype=np.uint8)
            bits = arr.copy() if bits is None else (bits | arr)
        return pd.DataFrame(
            {"band": [int(pdf["band"].iloc[0])], "bits": [bits.tobytes()]}
        )

    return a.unionByName(b).groupBy("band").applyInPandas(orfn, "band int, bits binary")


def seen_anti_join_banded(
    new_df: DataFrame,
    seen_df: DataFrame,
    key: str,
    bloom_df: DataFrame,
    spec: BandedBloomSpec,
) -> DataFrame:
    """Banded-Bloom anti-join: candidates shuffle by band and cogroup
    with *their band's filter only* (bits travel once per band per
    task); definite-negatives pass through, Bloom-positives are exactly
    verified with the ordinary anti-join against the seen set — false
    positives cost a (small) shuffle, never a dropped URL.  Results are
    identical to the exact anti-join (tested).

    The candidate side shuffles once either way (the exact anti-join
    shuffles it too); what banding removes is the *seen side*: 8 bytes
    of bits per key → ~1.2 bits per key, and no broadcast.  The flagged
    stream is materialized once (lineage-cut) so the two output
    branches never recompute the cogroup."""
    m, k, bands = spec.m_band, spec.k, spec.bands
    # copy the fields: StructType.add would mutate new_df's cached schema
    out_schema = StructType(
        list(new_df.schema.fields) + [StructField("__maybe", BooleanType())]
    )

    def probe(n_pdf: pd.DataFrame, b_pdf: pd.DataFrame) -> pd.DataFrame:
        out = n_pdf.copy()
        if len(b_pdf) == 0:
            out["__maybe"] = False
            return out
        bf = BloomFilter64(1, m_bits=m)
        bf.k = k
        bf.bits = np.frombuffer(b_pdf["bits"].iloc[0], dtype=np.uint8)
        out["__maybe"] = bf.might_contain_many(
            n_pdf[key].to_numpy(dtype=np.int64)
        )
        return out

    flagged = (
        new_df.groupBy(F.pmod(F.col(key), F.lit(bands)).cast("int").alias("band"))
        .cogroup(bloom_df.groupBy("band"))
        .applyInPandas(probe, out_schema)
        .localCheckpoint(eager=True)
    )
    definite_new = flagged.filter(~F.col("__maybe")).drop("__maybe")
    candidates = flagged.filter(F.col("__maybe")).drop("__maybe")
    verified_new = candidates.join(seen_df.select(key), key, "left_anti")
    return definite_new.unionByName(verified_new)


def bloom_might_contain_udf(spark, bloom: BloomFilter64):
    """Arrow-batched membership test against a broadcast Bloom filter."""
    bc = spark.sparkContext.broadcast(bloom.dumps())

    @F.pandas_udf(BooleanType())
    def _contains(keys: pd.Series) -> pd.Series:
        bf = BloomFilter64.loads(bc.value)
        return pd.Series(bf.might_contain_many(keys.to_numpy(dtype=np.int64)))

    return _contains


def seen_anti_join(
    new_df: DataFrame,
    seen_df: DataFrame,
    key: str = "url_hash",
    bloom: BloomFilter64 | None = None,
) -> DataFrame:
    """Rows of ``new_df`` whose ``key`` is not in ``seen_df``.

    Without a Bloom: plain left-anti join (exact, the small-scale path).
    With a Bloom over ``seen_df``'s keys: definite-negatives bypass the
    shuffle; only Bloom-positives are exactly verified.  Results are
    identical by construction (tested)."""
    if bloom is None:
        return new_df.join(seen_df.select(key), key, "left_anti")
    contains = bloom_might_contain_udf(new_df.sparkSession, bloom)
    # materialize the flagged candidates ONCE (lineage-cut, executor
    # cache, GC-cleaned): the definite-new and verify branches would
    # otherwise each recompute the whole upstream (link cleaning +
    # aggregation) — measured 2× the wave's dedup cost
    flagged = new_df.withColumn("__maybe_seen", contains(F.col(key))).localCheckpoint(
        eager=True
    )
    definite_new = flagged.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    candidates = flagged.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    verified_new = candidates.join(seen_df.select(key), key, "left_anti")
    return definite_new.unionByName(verified_new)


def seen_anti_join_cogrouped(
    new_df: DataFrame,
    seen_df: DataFrame,
    key: str = "url_hash",
    partitions: int | None = None,
) -> DataFrame:
    """Per-partition cuckoo anti-join (the north rule's second tier):
    both sides are hash-co-partitioned on ``key``; within each cogroup a
    cuckoo filter built from the seen keys gives the definite-negative
    fast path (a cuckoo's false-positive rate is ~2^-13 at 16-bit
    fingerprints), and filter positives are verified exactly against
    the partition's seen array — false positives cost a sorted-probe,
    never a dropped URL.  Memory per partition ≈ 2.2 bytes/seen-key
    (vs 8 for raw int64), which is what makes a 10^10-key seen set fit
    a 1000-executor cluster.  No sort-merge join, no broadcast.
    Results identical to the exact anti-join (tested)."""
    spark = new_df.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    out_schema = new_df.schema

    def probe(new_pdfs: pd.DataFrame, seen_pdfs: pd.DataFrame) -> pd.DataFrame:
        if len(new_pdfs) == 0:
            return new_pdfs
        seen_keys = seen_pdfs[key].to_numpy(dtype=np.int64) if len(seen_pdfs) else np.array([], dtype=np.int64)
        if len(seen_keys) == 0:
            return new_pdfs
        cf = CuckooFilter64(capacity=max(len(seen_keys), 64))
        # bulk numpy insert: at the tier's regime (10^7 seen keys per
        # partition) a per-key Python loop here was the dominant cost
        ok = cf.insert_many(seen_keys)
        keys = new_pdfs[key].to_numpy(dtype=np.int64)
        if ok:
            maybe = cf.contains_many(keys)
        else:  # table overflow: verify everything exactly
            maybe = np.ones(len(keys), dtype=bool)
        # exact verification of cuckoo positives only
        verified_seen = np.zeros(len(keys), dtype=bool)
        if maybe.any():
            sorted_seen = np.sort(seen_keys)
            idx = np.searchsorted(sorted_seen, keys[maybe])
            idx = np.clip(idx, 0, len(sorted_seen) - 1)
            verified_seen[maybe] = sorted_seen[idx] == keys[maybe]
        return new_pdfs[~verified_seen]

    return (
        new_df.groupBy(F.pmod(F.col(key), F.lit(p)).alias("__b"))
        .cogroup(seen_df.select(key).groupBy(F.pmod(F.col(key), F.lit(p)).alias("__b")))
        .applyInPandas(lambda n, s: probe(n, s), out_schema)
    )


class CuckooFilter64:
    """Cuckoo filter over int64 keys: 4-slot buckets, 16-bit fingerprints,
    supports delete (Blooms don't) — used executor-side for exact-ish
    per-partition membership.  numpy storage; 0 = empty slot."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int):
        nb = 1
        while nb * self.SLOTS < capacity * 1.1:
            nb *= 2
        self.nb = nb
        self.table = np.zeros((nb, self.SLOTS), dtype=np.uint16)
        self._rng_state = np.uint64(0x243F6A8885A308D3)

    def _fp_and_buckets(self, key: int) -> tuple[int, int, int]:
        u = np.uint64(np.int64(key).view(np.uint64) if not isinstance(key, np.uint64) else key)
        h = int(_splitmix(np.array([u], dtype=np.uint64))[0])
        fp = (h & 0xFFFF) or 1
        i1 = (h >> 16) % self.nb
        i2 = (i1 ^ (fp * 0x5BD1)) % self.nb
        return fp, i1, i2

    def _try_insert(self, fp: int, bucket: int) -> bool:
        row = self.table[bucket]
        empty = np.nonzero(row == 0)[0]
        if len(empty):
            row[empty[0]] = fp
            return True
        return False

    def insert(self, key: int) -> bool:
        fp, i1, i2 = self._fp_and_buckets(key)
        return self._insert_fp(fp, i1, i2)

    def _insert_fp(self, fp: int, i1: int, i2: int) -> bool:
        if self._try_insert(fp, i1) or self._try_insert(fp, i2):
            return True
        # evict
        bucket = i1
        for _ in range(self.MAX_KICKS):
            self._rng_state = _splitmix(np.array([self._rng_state], dtype=np.uint64))[0]
            # int() first: np.uint64 % python-int silently promotes to
            # float64, whose 52-bit mantissa makes the low bits (and so
            # the slot choice) constant — a degenerate kick walk
            slot = int(self._rng_state) % self.SLOTS
            fp, self.table[bucket, slot] = int(self.table[bucket, slot]), fp
            bucket = (bucket ^ (fp * 0x5BD1)) % self.nb
            if self._try_insert(fp, bucket):
                return True
        return False  # table full

    def _bulk_place(self, fp_arr: np.ndarray, b_arr: np.ndarray) -> np.ndarray:
        """One vectorized placement pass: each pending fingerprint takes
        the ``rank``-th currently-empty slot of its bucket (rank = its
        position among this pass's keys targeting the same bucket, so
        concurrent writers never collide on a slot).  Returns the
        placed-mask; robust to holes left by ``delete`` (slots are
        located from the live empty-slot bitmap, not an occupancy
        count)."""
        n = len(fp_arr)
        if n == 0:
            return np.zeros(0, dtype=bool)
        order = np.argsort(b_arr, kind="stable")
        bs = b_arr[order]
        idx = np.arange(n)
        newgrp = np.r_[True, bs[1:] != bs[:-1]]
        rank = idx - np.maximum.accumulate(np.where(newgrp, idx, 0))
        # rank-th-empty-slot search, unrolled over the SLOTS columns
        # (a full (n, SLOTS) cumsum was the hot allocation at 10^7 rows)
        remaining = rank
        slot = np.full(n, -1, dtype=np.int8)
        for s in range(self.SLOTS):
            es = self.table[bs, s] == 0
            hit = es & (remaining == 0) & (slot < 0)
            slot[hit] = s
            remaining = remaining - es
        fits = slot >= 0
        self.table[bs[fits], slot[fits]] = fp_arr[order][fits]
        placed = np.zeros(n, dtype=bool)
        placed[order[fits]] = True
        return placed

    def insert_many(self, keys: np.ndarray) -> bool:
        """Vectorized bulk insert: all fingerprint/bucket pairs computed
        at once, two numpy placement passes (primary then alternate
        bucket), and the serial kick loop only for the overflow tail —
        the per-key Python loop this replaces was a 10^7-iteration
        interpreter walk per task at the cuckoo tier's target regime.
        Returns False iff any key could not be placed (caller then
        falls back to exact verification of everything)."""
        keys = np.asarray(keys, dtype=np.int64)
        if len(keys) == 0:
            return True
        u = keys.view(np.uint64)
        h = _splitmix(u)
        fp = (h & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        i1 = ((h >> np.uint64(16)) % np.uint64(self.nb)).astype(np.int64)
        i2 = (i1 ^ (fp.astype(np.int64) * 0x5BD1)) % self.nb
        # working copies: eviction rounds replace entries with their
        # victims (a floating fingerprint's two buckets are the one it
        # was evicted from and its partial-key alternate)
        fpw = fp.copy()
        ba, bb = i1.copy(), i2.copy()
        pending = np.arange(len(keys))
        for rnd in range(200):
            if len(pending) == 0:
                return True
            # placement phase: target the currently-emptier bucket
            # (greedy 2-choice over 4-slot buckets)
            p1, p2 = ba[pending], bb[pending]
            occ1 = (self.table[p1] != 0).sum(axis=1, dtype=np.int8)
            occ2 = (self.table[p2] != 0).sum(axis=1, dtype=np.int8)
            target = np.where(occ1 <= occ2, p1, p2)
            placed = self._bulk_place(fpw[pending], target)
            pending = pending[~placed]
            if len(pending) == 0:
                return True
            # eviction phase (the parallel cuckoo kick): one evictor per
            # bucket — swap our fingerprint in, the victim becomes the
            # pending entry and walks to ITS alternate bucket next round
            evb = (ba if rnd % 2 == 0 else bb)[pending]
            order = np.argsort(evb, kind="stable")
            first = np.r_[True, evb[order][1:] != evb[order][:-1]]
            sel = pending[order[first]]
            selb = evb[order[first]]
            slots = (
                _splitmix(sel.astype(np.uint64) + np.uint64(0x9E37 * (rnd + 1)))
                % np.uint64(self.SLOTS)
            ).astype(np.int64)
            victims = self.table[selb, slots].copy()
            self.table[selb, slots] = fpw[sel]
            fpw[sel] = victims
            valt = (selb ^ (victims.astype(np.int64) * 0x5BD1)) % self.nb
            ba[sel] = valt
            bb[sel] = selb
        ok = True
        for j in pending:  # residual tail: serial cuckoo kick chains
            ok &= self._insert_fp(int(fpw[j]), int(ba[j]), int(bb[j]))
        return ok

    def contains(self, key: int) -> bool:
        fp, i1, i2 = self._fp_and_buckets(key)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership probe (the batch hot path)."""
        u = np.asarray(keys, dtype=np.int64).view(np.uint64)
        h = _splitmix(u)
        fp = (h & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        i1 = ((h >> np.uint64(16)) % np.uint64(self.nb)).astype(np.int64)
        i2 = (i1 ^ (fp.astype(np.int64) * 0x5BD1)) % self.nb
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def delete(self, key: int) -> bool:
        fp, i1, i2 = self._fp_and_buckets(key)
        for b in (i1, i2):
            hits = np.nonzero(self.table[b] == fp)[0]
            if len(hits):
                self.table[b, hits[0]] = 0
                return True
        return False
