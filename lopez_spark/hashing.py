"""64-bit URL hashing.

The reference identifies every page by a 64-bit hash of its URL
(SipHash24, ``lib-lopez/src/hash.rs:5-10``; ``page_id = hash(url)`` in
``postgres-lopez/src/master.rs:74-77``).  This engine standardises on
XXH64 with seed 42 instead, because that is exactly what Spark's
built-in ``F.xxhash64`` computes JVM-side (whole-stage codegen, no
Python on the hot path).  The pure-Python implementation below serves
the *oracles* (fixtures / BFS reference crawler) so driver-side
expectations and executor-side plans agree bit-for-bit, and the
streamed path-ingest stages (`warc_records_from_paths` /
`wds_samples_from_paths`) which hash payloads inside mapInPandas.
The pure loop runs ~13 MB/s; when the C-backed ``xxhash`` package is
present (the production deployment — same XXH64 spec, bit-identical
output) it is used automatically and payload hashing stops being the
streamed-ingest bottleneck.

Parity with ``F.xxhash64(col)`` is asserted in
``tests/test_hashing.py``.
"""

from __future__ import annotations

try:  # C-backed XXH64 — same spec, ~GB/s; absent in this sandbox
    import xxhash as _xxh_c
except ImportError:  # pragma: no cover - exercised where the lib exists
    _xxh_c = None

MASK64 = 0xFFFFFFFFFFFFFFFF

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_XXHASH64_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * _P1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & MASK64


def xxhash64(data: bytes, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Standard XXH64 over ``data``; returns *signed* int64 to match
    Spark's LongType output of ``F.xxhash64``."""
    if _xxh_c is not None:  # pragma: no cover - lib absent in sandbox
        h = _xxh_c.xxh64_intdigest(data, seed)
        return h - (1 << 64) if h >= 1 << 63 else h
    length = len(data)
    idx = 0

    if length >= 32:
        v1 = (seed + _P1 + _P2) & MASK64
        v2 = (seed + _P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - _P1) & MASK64
        limit = length - 32
        while idx <= limit:
            v1 = _round(v1, int.from_bytes(data[idx : idx + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[idx + 8 : idx + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[idx + 16 : idx + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[idx + 24 : idx + 32], "little"))
            idx += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & MASK64

    h = (h + length) & MASK64

    while idx + 8 <= length:
        k1 = _round(0, int.from_bytes(data[idx : idx + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * _P1 + _P4) & MASK64
        idx += 8

    if idx + 4 <= length:
        h ^= (int.from_bytes(data[idx : idx + 4], "little") * _P1) & MASK64
        h = (_rotl(h, 23) * _P2 + _P3) & MASK64
        idx += 4

    while idx < length:
        h ^= (data[idx] * _P5) & MASK64
        h = (_rotl(h, 11) * _P1) & MASK64
        idx += 1

    h ^= h >> 33
    h = (h * _P2) & MASK64
    h ^= h >> 29
    h = (h * _P3) & MASK64
    h ^= h >> 32

    # to signed int64
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_str(s: str, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Hash a string's UTF-8 bytes — parity with ``F.xxhash64(string_col)``."""
    return xxhash64(s.encode("utf-8"), seed)


def xxhash64_long(value: int, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Hash a (signed) int64 — parity with ``F.xxhash64(long_col)``.

    Spark hashes LongType as a single 8-byte little-endian word through
    the XXH64 "hashLong" fast path.
    """
    h = (seed + _P5 + 8) & MASK64
    k1 = _round(0, value & MASK64)
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & MASK64
    h ^= h >> 33
    h = (h * _P2) & MASK64
    h ^= h >> 29
    h = (h * _P3) & MASK64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def umod(h: int, m: int) -> int:
    """Non-negative modulus of a signed 64-bit hash (fixture topology rule)."""
    return (h & MASK64) % m
