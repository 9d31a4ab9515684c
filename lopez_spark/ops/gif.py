"""Minimal, real GIF codec — pure Python/numpy, no PIL.

Implements the public GIF87a/GIF89a specification: logical screen
descriptor, global/local color tables, variable-width LZW decompression
(code-size growth in lockstep with dictionary growth, clear/EOI codes,
12-bit cap with deferred clear), the 4-pass row interlace, graphic
control extensions (transparency index, frame disposal none/keep /
restore-background / restore-previous), and multi-frame animation
compositing on the logical screen.  ``encode_gif`` writes palette-
indexed frames with real LZW compression so the decoder is round-trip
testable without PIL.  Malformed inputs raise ``ValueError``.

Like the JPEG entropy walk, LZW is inherently serial per payload —
fine as the per-row decode instrument inside an Arrow batch stage;
a C-backed codec is the documented production swap-in.
"""

from __future__ import annotations

import struct

import numpy as np

from lopez_spark.ops.limits import check_pixels

# interlace passes: (row offset, row step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# ------------------------------------------------------------------ LZW


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    """GIF variable-width LZW → uint8 index array of length n_pixels."""
    if not 2 <= min_code <= 8:
        raise ValueError(f"invalid LZW minimum code size {min_code}")
    clear = 1 << min_code
    eoi = clear + 1
    # dictionary as materialized byte strings: each new entry is one
    # C-speed bytes concat (prev + head), each expansion one bytearray
    # extend — no per-pixel Python writes (was ~57 ms for 256x256,
    # dominated by the per-pixel chain walk)
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = base.copy()
    size = min_code + 1
    prev = None
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    nd = len(data)
    while True:
        while nbits < size:
            if pos >= nd:
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits  # LSB-first
            pos += 1
            nbits += 8
        code = acc & ((1 << size) - 1)
        acc >>= size
        nbits -= size
        if code == clear:
            table = base.copy()
            size = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:  # first code after clear: a literal
            if code >= clear:
                raise ValueError("invalid first LZW code")
            if len(out) >= n_pixels:
                raise ValueError("GIF LZW output overflow")
            prev = table[code]
            out += prev
            if len(out) == n_pixels:
                break
            continue
        nt = len(table)
        if code < nt:
            entry = table[code]
        elif code == nt:  # KwKwK: prev + its own head
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW code")
        if len(out) + len(entry) > n_pixels:
            raise ValueError("GIF LZW output overflow")
        out += entry
        if nt < 4096:
            table.append(prev + entry[:1])
            if nt + 1 >= (1 << size) and size < 12:
                size += 1
        prev = entry
        if len(out) == n_pixels:
            break
    if len(out) != n_pixels:
        raise ValueError("GIF LZW ended short of the image size")
    return np.frombuffer(bytes(out), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    """uint8 index array → GIF variable-width LZW bytes (with leading
    clear code, trailing EOI, clear-on-full-dictionary)."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    size = min_code + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, size)
    cur = b""
    for px in indices.tolist():
        nxt = cur + bytes([px])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], size)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            # the decoder's dictionary runs one add behind (its first
            # code after a clear adds nothing), so the width grows one
            # add later than the naive `>=` bound
            if next_code > (1 << size) and size < 12:
                size += 1
        else:  # dictionary full: clear and restart
            emit(clear, size)
            size = min_code + 1
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
        cur = bytes([px])
    if cur:
        emit(table[cur], size)
    emit(eoi, size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Split payload into ≤255-byte length-prefixed sub-blocks."""
    out = bytearray()
    for i in range(0, len(data), 255):
        part = data[i : i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


# ---------------------------------------------------------------- encode


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    interlace: bool = False,
    disposals: list[int] | None = None,
    transparent: int | None = None,
    delay_cs: int = 4,
) -> bytes:
    """Palette-indexed frames → animated GIF89a (GIF87a shape when a
    single frame with no extensions).  ``frames`` are (h, w) uint8
    index arrays on the logical screen; ``palette`` is (n, 3) uint8
    with n a power of two ≥ 2."""
    if not frames:
        raise ValueError("need at least one frame")
    palette = np.asarray(palette, dtype=np.uint8)
    n_col = len(palette)
    if n_col < 2 or n_col & (n_col - 1):
        raise ValueError("palette size must be a power of two >= 2")
    depth = max(2, n_col.bit_length() - 1)  # LZW min code size >= 2
    h, w = frames[0].shape
    gct_bits = n_col.bit_length() - 2  # 2^(bits+1) entries
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (gct_bits & 7), 0, 0)
    out += palette.tobytes()
    for fi, frame in enumerate(frames):
        if frame.shape != (h, w):
            raise ValueError("all frames must cover the logical screen")
        if int(frame.max(initial=0)) >= n_col:
            raise ValueError("frame index out of palette range")
        disp = (disposals or [0] * len(frames))[fi]
        if len(frames) > 1 or transparent is not None or disp:
            packed = ((disp & 7) << 2) | (0 if transparent is None else 1)
            out += bytes([0x21, 0xF9, 4, packed]) + struct.pack(
                "<H", delay_cs
            ) + bytes([transparent or 0, 0])
        out += bytes([0x2C]) + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        px = frame
        if interlace:
            rows = [r for off, step in _INTERLACE for r in range(off, h, step)]
            px = frame[rows]
        out.append(depth)
        out += _sub_blocks(_lzw_encode(px.reshape(-1), depth))
    out.append(0x3B)
    return bytes(out)


# ---------------------------------------------------------------- decode


def decode_gif(data: bytes, max_frames: int = 0) -> list[np.ndarray]:
    """GIF bytes → list of uint8 (h, w, 3) RGB frames composited on
    the logical screen (transparency + disposal applied).
    ``max_frames`` > 0 stops early (cheap first-frame decode)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("GIF truncated in header")
    w, h, packed, bg, _ = struct.unpack("<HHBBB", data[6:13])
    if w == 0 or h == 0:
        raise ValueError("zero GIF dimensions")
    check_pixels(w, h, "GIF logical screen")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8)
        if len(gct) != 3 * n:
            raise ValueError("GIF truncated in global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    bg_canvas = canvas.copy()
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos + 1 > len(data):
                raise ValueError("GIF truncated in extension")
            label = data[pos]
            pos += 1
            payload = bytearray()
            while True:
                if pos >= len(data):
                    raise ValueError("GIF truncated in sub-blocks")
                ln = data[pos]
                pos += 1
                if ln == 0:
                    break
                payload += data[pos : pos + ln]
                pos += ln
            if label == 0xF9 and len(payload) >= 4:  # graphic control
                disposal = (payload[0] >> 2) & 7
                transparent = payload[3] if payload[0] & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        left, top, iw, ih, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if left + iw > w or top + ih > h:
            raise ValueError("GIF frame exceeds logical screen")
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            table = np.frombuffer(data[pos : pos + 3 * n], np.uint8)
            if len(table) != 3 * n:
                raise ValueError("GIF truncated in local color table")
            table = table.reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame has no color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while True:
            if pos >= len(data):
                raise ValueError("GIF truncated in image data")
            ln = data[pos]
            pos += 1
            if ln == 0:
                break
            lzw += data[pos : pos + ln]
            pos += ln
        idx = _lzw_decode(bytes(lzw), min_code, iw * ih).reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: un-permute the rows
            rows = [r for off, step in _INTERLACE for r in range(off, ih, step)]
            un = np.empty((ih, iw), dtype=np.uint8)
            un[rows] = idx
            idx = un
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF pixel index out of color-table range")
        before = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + ih, left : left + iw]
        rgb = table[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore background in the frame rect
            canvas[top : top + ih, left : left + iw] = bg_canvas[
                top : top + ih, left : left + iw
            ]
        elif disposal == 3 and before is not None:
            canvas = before
        transparent = None
        disposal = 0
        if max_frames and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("GIF contains no image")
    return frames
