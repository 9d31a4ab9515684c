"""Minimal, real BMP codec — pure numpy, no PIL.

Implements the public Windows BMP format (BITMAPINFOHEADER): 24-bit
uncompressed BGR and 8-bit palette images, bottom-up and top-down row
order, 4-byte row padding.  ``encode_bmp`` writes 24-bit BI_RGB so the
decoder is round-trip testable.  Malformed inputs raise ``ValueError``.

Unlike the entropy-coded formats (ops/jpeg.py, ops/gif.py), BMP decode
is pure array reshaping — it vectorizes completely and is production-
speed as-is inside an Arrow batch stage.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_bmp(px: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB → 24-bit bottom-up BI_RGB BMP bytes."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → uint8 (h, w, 3) RGB.  Supports BI_RGB 24-bit and
    8-bit palette, bottom-up or top-down."""
    if len(data) < 54:
        raise ValueError("BMP truncated in header")
    if data[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    off = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_signed, planes, bpp, compression = struct.unpack("<iiHHI", data[18:34])
    if w <= 0 or h_signed == 0:
        raise ValueError("invalid BMP dimensions")
    if planes != 1:
        raise ValueError(f"invalid BMP planes {planes}")
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (8, 24):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = h_signed < 0
    h = abs(h_signed)
    stride = ((w * bpp + 31) // 32) * 4
    end = off + stride * h
    if end > len(data) or off < 14 + hdr_size:
        raise ValueError("BMP truncated in pixel data")
    rows = np.frombuffer(data[off:end], dtype=np.uint8).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        return bgr[:, :, ::-1].copy()
    # 8-bit palette: n_colors BGRX entries right after the info header
    n_colors = struct.unpack("<I", data[46:50])[0] or 256
    pal_at = 14 + hdr_size
    pal = np.frombuffer(data[pal_at : pal_at + 4 * n_colors], dtype=np.uint8)
    if len(pal) != 4 * n_colors:
        raise ValueError("BMP truncated in color table")
    pal = pal.reshape(n_colors, 4)[:, 2::-1]  # BGRX → RGB
    idx = rows[:, :w]
    if int(idx.max(initial=0)) >= n_colors:
        raise ValueError("BMP pixel index out of color-table range")
    return pal[idx].copy()
