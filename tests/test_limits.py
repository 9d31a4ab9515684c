"""Decompression-bomb / hostile-dimension guards (ops/limits.py).

Round-4 ADVICE: a 1.2 MB PNG payload inflated to 1.2 GB before the
dimension check, a 13-byte GIF header allocated a 64k x 64k x 3
(~12.9 GB) canvas before LZW validation, and MemoryError was absent
from the Arrow-stage containment tuples — one hostile payload could
OOM-kill an executor task despite the "malformed payloads yield
ok=False, never a task crash" contract.  These tests pin the guards:
every hostile payload below raises ValueError *fast*, before any
header-claimed allocation.  Pure numpy — no Spark session.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from lopez_spark.ops.gif import decode_gif, encode_gif
from lopez_spark.ops.jpeg import decode_jpeg
from lopez_spark.ops.limits import MAX_PIXELS, bounded_inflate, check_pixels
from lopez_spark.ops.png import _chunk, _SIG, decode_png, encode_png
from lopez_spark.ops.tiff import decode_tiff, encode_tiff
from lopez_spark.ops.vp8l import decode_webp, encode_webp


# ------------------------------------------------------------- primitives


def test_check_pixels_boundary():
    check_pixels(8192, 8192)  # 2^26 exactly: allowed
    with pytest.raises(ValueError, match="exceed decode cap"):
        check_pixels(8192, 8193)
    with pytest.raises(ValueError, match="GIF"):
        check_pixels(65535, 65535, "GIF")


def test_bounded_inflate_roundtrip_and_bomb():
    raw = bytes(range(256)) * 40
    assert bounded_inflate(zlib.compress(raw), len(raw)) == raw
    # short output is returned for the caller's exact-length check
    assert bounded_inflate(zlib.compress(raw[:100]), len(raw)) == raw[:100]
    # a 10 MB expansion against a 1 KB bound stops at the bound
    bomb = zlib.compress(b"\x00" * 10_000_000)
    with pytest.raises(ValueError, match="inflates past"):
        bounded_inflate(bomb, 1024)
    with pytest.raises(ValueError, match="deflate error"):
        bounded_inflate(b"not deflate at all", 1024)


# ------------------------------------------------------------------- PNG


def _png_with(ihdr: bytes, idat: bytes) -> bytes:
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def test_png_idat_bomb_rejected():
    # valid 16x16 RGB header, IDAT inflating to 10 MB (expected: 784 B)
    ihdr = struct.pack(">IIBBBBB", 16, 16, 8, 2, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * 10_000_000, 9)
    assert len(bomb) < 20_000  # it *is* a bomb
    with pytest.raises(ValueError, match="inflates past"):
        decode_png(_png_with(ihdr, bomb))


def test_png_giant_dims_rejected_before_inflate():
    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0)
    with pytest.raises(ValueError, match="exceed decode cap"):
        decode_png(_png_with(ihdr, zlib.compress(b"\x00" * 64)))


def test_png_valid_roundtrip_unchanged():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (21, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


# ------------------------------------------------------------------- GIF


def test_gif_giant_screen_rejected_before_canvas():
    # 13-byte header claiming 64k x 64k: previously a ~12.9 GB allocation
    data = b"GIF89a" + struct.pack("<HHBBB", 65535, 65535, 0, 0, 0) + b"\x3b"
    with pytest.raises(ValueError, match="exceed decode cap"):
        decode_gif(data)


def test_gif_valid_roundtrip_unchanged():
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    frame = np.indices((9, 11)).sum(axis=0).astype(np.uint8) % 4
    frames = decode_gif(encode_gif([frame], pal))
    assert np.array_equal(frames[0], pal[frame])


# ------------------------------------------------------------------ TIFF


def test_tiff_strip_bomb_rejected():
    px = np.zeros((8, 8, 3), np.uint8)
    data = bytearray(encode_tiff(px, compression=8))
    # splice a bomb over the strip: keep the offset, point the count at
    # an appended 10 MB-inflating stream
    bomb = zlib.compress(b"\x00" * 10_000_000, 9)
    off = len(data)
    data += bomb
    # IFD entries are 12 bytes: tag(2) type(2) count(4) value(4), LE.
    ifd = data.index(struct.pack("<HH", 273, 4))  # StripOffsets entry
    data[ifd + 8 : ifd + 12] = struct.pack("<I", off)
    cnt = data.index(struct.pack("<HH", 279, 4))  # StripByteCounts entry
    data[cnt + 8 : cnt + 12] = struct.pack("<I", len(bomb))
    with pytest.raises(ValueError, match="inflates past"):
        decode_tiff(bytes(data))


def test_tiff_giant_dims_rejected():
    px = np.zeros((4, 4, 3), np.uint8)
    data = bytearray(encode_tiff(px))
    for tag, val in ((256, 60000), (257, 60000)):
        e = data.index(struct.pack("<HH", tag, 4))
        data[e + 8 : e + 12] = struct.pack("<I", val)
    with pytest.raises(ValueError, match="exceed decode cap"):
        decode_tiff(bytes(data))


def test_tiff_valid_roundtrip_unchanged():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (10, 6, 3), dtype=np.uint8)
    assert np.array_equal(decode_tiff(encode_tiff(px, compression=8)), px)


# ------------------------------------------------------------------ JPEG


def test_jpeg_giant_sof_rejected():
    # minimal stream up to a hostile SOF0: SOI, DQT-less straight to SOF
    sof = struct.pack(">BHHB", 8, 65500, 65500, 1) + bytes([1, 0x11, 0])
    data = (
        b"\xff\xd8"  # SOI
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    )
    with pytest.raises(ValueError, match="exceed decode cap"):
        decode_jpeg(data)


# ------------------------------------------------------------------ VP8L


def test_vp8l_giant_dims_rejected():
    # header: sig 0x2F then 14-bit w-1, 14-bit h-1 LSB-first = 16384x16384
    bits = (16383) | (16383 << 14)  # w-1, h-1
    body = bytes([0x2F]) + struct.pack("<I", bits)
    riff = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP"
        + b"VP8L" + struct.pack("<I", len(body)) + body
    )
    with pytest.raises(ValueError, match="exceed decode cap"):
        decode_webp(riff)


def test_vp8l_valid_roundtrip_unchanged():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (7, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp(px))[..., :3], px)


def test_max_pixels_is_sane():
    # big enough for any real corpus image (8k video frame = 33 MP),
    # small enough that an RGB uint8 canvas stays under 256 MiB
    assert MAX_PIXELS >= 33_000_000
    assert MAX_PIXELS * 3 < 256 * 1024 * 1024
