"""BMP codec (ops/bmp.py) — 24-bit BGR + 8-bit palette, bottom-up /
top-down rows, 4-byte padding, per the public Windows BMP format."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lopez_spark.ops.bmp import decode_bmp, encode_bmp


@pytest.mark.parametrize("w,h", [(1, 1), (3, 5), (4, 4), (33, 17), (64, 48)])
def test_roundtrip_24bit(w, h):
    # widths chosen to hit every row-padding remainder (w*3 mod 4)
    rng = np.random.default_rng(w * 100 + h)
    px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    out = decode_bmp(encode_bmp(px))
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, px)


def test_top_down_rows():
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    data = bytearray(encode_bmp(px))
    # flip height sign to top-down and reverse the stored row order
    h = struct.unpack("<i", data[22:26])[0]
    data[22:26] = struct.pack("<i", -h)
    stride = (3 * 3 + 3) & ~3
    body = bytes(data[54:])
    rows = [body[i * stride : (i + 1) * stride] for i in range(h)]
    out = decode_bmp(bytes(data[:54]) + b"".join(reversed(rows)))
    assert np.array_equal(out, px)


def test_8bit_palette():
    # hand-build: 4-entry palette, 5x3 indexed image
    pal_rgb = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1, 2, 3, 0], [1, 1, 2, 2, 3], [3, 0, 1, 0, 2]], np.uint8)
    h, w = idx.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w] = idx[::-1]
    pal = np.zeros((4, 4), np.uint8)
    pal[:, :3] = pal_rgb[:, ::-1]  # BGRX
    off = 14 + 40 + 16
    data = (
        struct.pack("<2sIHHI", b"BM", off + rows.size, 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, rows.size, 0, 0, 4, 0)
        + pal.tobytes()
        + rows.tobytes()
    )
    assert np.array_equal(decode_bmp(data), pal_rgb[idx])


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"BM" + bytes(20),  # truncated header
        b"XX" + bytes(60),  # bad signature
    ],
)
def test_malformed_raises(bad):
    with pytest.raises(ValueError):
        decode_bmp(bad)


def test_truncated_pixels_and_unsupported_raise():
    px = np.zeros((8, 8, 3), np.uint8)
    data = bytearray(encode_bmp(px))
    with pytest.raises(ValueError):
        decode_bmp(bytes(data[:-10]))
    rle = bytearray(data)
    rle[30:34] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(ValueError):
        decode_bmp(bytes(rle))
    b16 = bytearray(data)
    b16[28:30] = struct.pack("<H", 16)
    with pytest.raises(ValueError):
        decode_bmp(bytes(b16))


def test_decode_stats_bmp_lossless(spark):
    from lopez_spark.hashing import xxhash64
    from lopez_spark.ops.multimodal import decode_stats

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(12, 9, 3)).astype(np.uint8)
    data = encode_bmp(px)
    df = spark.createDataFrame(
        [("b0", bytearray(data), 9, 12, "bmp", xxhash64(px.tobytes()))],
        "image_id string, bytes binary, w int, h int, fmt string, phash long",
    )
    row = decode_stats(df).collect()[0]
    assert row["ok"] and row["phash_matches"]
    assert row["psnr_db"] >= 1e9  # lossless sentinel
