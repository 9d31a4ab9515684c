"""Baseline TIFF codec (ops/tiff.py) — byte orders, compression,
predictor, strips, the 8 EXIF orientations, and rejection of
out-of-scope layouts (never a mis-decode)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from lopez_spark import fixtures as fx
from lopez_spark.ops.tiff import (
    apply_orientation,
    decode_tiff,
    encode_tiff,
    invert_orientation,
)


@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("comp,pred", [(1, 1), (8, 1), (8, 2)])
def test_roundtrip_matrix(bo, comp, pred):
    px = fx.oracle_pixels(1)
    data = encode_tiff(px, byte_order=bo, compression=comp, predictor=pred)
    assert np.array_equal(decode_tiff(data), px)


@pytest.mark.parametrize("rps", [1, 5, 7, 1000])
def test_multi_strip_layouts(rps):
    px = fx.oracle_pixels(2)
    data = encode_tiff(px, compression=8, rows_per_strip=rps)
    assert np.array_equal(decode_tiff(data), px)


@pytest.mark.parametrize("o", list(range(1, 9)))
def test_all_orientations_roundtrip_upright(o):
    px = fx.oracle_pixels(0)
    data = encode_tiff(px, orientation=o, compression=8, predictor=2)
    assert np.array_equal(decode_tiff(data), px)
    stored = decode_tiff(data, upright=False)
    assert np.array_equal(apply_orientation(stored, o), px)
    if o in (5, 6, 7, 8):  # quarter-turns swap the stored dims
        assert stored.shape[:2] == (px.shape[1], px.shape[0])


@pytest.mark.parametrize("o", list(range(1, 9)))
def test_orientation_inverse_property(o):
    px = fx.oracle_pixels(3)
    assert np.array_equal(apply_orientation(invert_orientation(px, o), o), px)


def test_orientation_6_is_90_cw():
    # a 1x2 image [A, B] rotated 90 CW renders as a 2x1 column [A; B]
    px = np.array([[[1, 1, 1], [2, 2, 2]]], dtype=np.uint8)
    up = apply_orientation(invert_orientation(px, 6), 6)
    assert np.array_equal(up, px)
    stored = invert_orientation(px, 6)  # 90 CCW of upright
    assert stored.shape[:2] == (2, 1)
    assert stored[0, 0, 0] == 2 and stored[1, 0, 0] == 1


def test_orientation_out_of_range():
    px = fx.oracle_pixels(0)
    with pytest.raises(ValueError):
        apply_orientation(px, 9)
    with pytest.raises(ValueError):
        encode_tiff(px, orientation=0)


def test_probe_and_codec_agree():
    from lopez_spark.ops.container_probe import probe_tiff

    px = fx.oracle_pixels(4)
    data = encode_tiff(px, byte_order=">", compression=8, predictor=2,
                       orientation=3, rows_per_strip=9)
    m = probe_tiff(data)
    stored = decode_tiff(data, upright=False)
    assert (m["width"], m["height"]) == (stored.shape[1], stored.shape[0])
    assert m["orientation"] == 3 and m["compression"] == 8


def test_rejects_out_of_scope_layouts():
    px = fx.oracle_pixels(0)
    data = bytearray(encode_tiff(px))
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(b"II\x2b\x00" + bytes(8))
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"ZZ" + bytes(8))
    # flip Compression (tag 259) to LZW (5) in place: must reject
    lzw = bytearray(encode_tiff(px, compression=1))
    i = lzw.find(struct.pack("<HH", 259, 3))
    lzw[i + 8 : i + 10] = struct.pack("<H", 5)
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(lzw))
    with pytest.raises(ValueError):
        decode_tiff(bytes(data[:30]))  # truncated IFD/strips


def test_corrupt_deflate_strip_rejects():
    px = fx.oracle_pixels(0)
    data = bytearray(encode_tiff(px, compression=8))
    data[-10:] = b"\x00" * 10  # stomp the strip tail
    with pytest.raises(ValueError, match="deflate|size|inflates|truncated"):
        decode_tiff(bytes(data))


def test_predictor_changes_bytes_not_pixels():
    px = fx.oracle_pixels(5)
    d1 = encode_tiff(px, compression=8, predictor=1)
    d2 = encode_tiff(px, compression=8, predictor=2)
    assert d1 != d2
    assert np.array_equal(decode_tiff(d1), decode_tiff(d2))


def test_decode_stats_arrow_stage_with_tiff(spark):
    from lopez_spark.hashing import xxhash64
    from lopez_spark.ops.multimodal import decode_stats

    rows = []
    for i in range(3):
        px = fx.oracle_pixels(i)
        data = encode_tiff(px, orientation=1 + i, compression=8)
        rows.append(
            (fx.image_id_of(i), bytearray(data), px.shape[1], px.shape[0],
             "tiff", xxhash64(px.tobytes()))
        )
    rows.append(("trunc", bytearray(rows[0][1][:25]), 4, 4, "tiff", 0))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, phash long"
    )
    got = {r["image_id"]: r for r in decode_stats(df).collect()}
    assert got["trunc"]["ok"] is False
    for i in range(3):
        r = got[fx.image_id_of(i)]
        assert r["ok"] and r["phash_matches"] and r["psnr_db"] >= 1e9
