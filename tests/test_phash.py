"""DCT perceptual hash (ops/multimodal.py::phash_dct): determinism,
re-encode/brightness robustness vs cross-image separation on the
deterministic fixtures, and the Arrow stage's exact-int64 contract
(the float64-truncation regression)."""

from __future__ import annotations

import itertools

import numpy as np

from lopez_spark import fixtures as fx
from lopez_spark.ops.jpeg import decode_jpeg, encode_jpeg
from lopez_spark.ops.multimodal import perceptual_hash, phash_dct


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_deterministic_and_signed64():
    px = fx.oracle_pixels(0)
    h = phash_dct(px)
    assert h == phash_dct(px)
    assert -(2**63) <= h < 2**63
    # exactly half the 64 bits are set (median threshold)
    assert bin(h & ((1 << 64) - 1)).count("1") == 32


def test_phash_robust_to_reencode_and_brightness():
    """The property banded-Hamming dedup relies on: a q90 re-encode or
    a +6 brightness shift moves the hash a few bits; DIFFERENT images
    (even these noise-heavy fixtures, pHash's hardest case) stay
    >= 12 bits apart — clean separation."""
    hs = []
    for i in range(8):
        px = fx.oracle_pixels(i)
        h0 = phash_dct(px)
        hs.append(h0)
        h90 = phash_dct(decode_jpeg(encode_jpeg(px, 90)))
        assert _ham(h0, h90) <= 10, (i, _ham(h0, h90))
        bright = np.clip(px.astype(np.int64) + 6, 0, 255).astype(np.uint8)
        assert _ham(h0, phash_dct(bright)) <= 8, i
    for (i, a), (j, b) in itertools.combinations(enumerate(hs), 2):
        assert _ham(a, b) >= 12, (i, j, _ham(a, b))


def test_phash_scale_invariance_direction():
    """Hash is computed on a 32x32 thumbnail, so a 2x upscale of the
    same content moves it only a few bits."""
    px = fx.oracle_pixels(3)
    up = np.repeat(np.repeat(px, 2, axis=0), 2, axis=1)
    assert _ham(phash_dct(px), phash_dct(up)) <= 8


def test_perceptual_hash_stage_exact_int64(spark):
    """The Arrow stage returns the EXACT driver-side int64 even when
    the batch contains a failed row — a None in the pandas column must
    not route phash through float64 (which silently zeroes low bits
    beyond 2^53; found live and fixed with a nullable Int64 array)."""
    px = fx.oracle_pixels(2)
    expected = phash_dct(px)
    rows = [
        ("good", bytearray(fx.encode_image(px, "raw")), px.shape[1], px.shape[0], "raw"),
        ("garbage", bytearray(b"\x00\x01nope"), 8, 8, "jpeg"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    got = {r.image_id: (r.ok, r.phash) for r in perceptual_hash(df).collect()}
    assert got["good"] == (True, expected)
    assert got["garbage"][0] is False and got["garbage"][1] is None


def test_perceptual_hash_null_payload_contained(spark):
    """A NULL bytes cell (e.g. a frame_sample containment row joined
    into an image corpus) yields ok=False per row — bytes(None) is a
    TypeError that once escaped the containment tuple and killed the
    task (found live composing video_frame_dedup)."""
    px = fx.oracle_pixels(4)
    rows = [
        ("good", bytearray(fx.encode_image(px, "raw")), px.shape[1], px.shape[0], "raw"),
        ("nullrow", None, -1, -1, "err"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    got = {r.image_id: (r.ok, r.phash) for r in perceptual_hash(df).collect()}
    assert got["good"][0] is True
    assert got["nullrow"] == (False, None)
