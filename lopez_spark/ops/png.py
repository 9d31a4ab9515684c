"""Minimal, real PNG codec — pure numpy + zlib, no PIL.

Implements the public PNG specification (RFC 2083 / ISO 15948):
8-bit-depth, non-interlaced images; color types 0 (grayscale),
2 (RGB), 6 (RGBA) on decode, all five scanline filters
(None/Sub/Up/Average/Paeth); RGB encode with a selectable per-image
filter type.  This makes ``fmt='png'`` a REAL container format in the
multimodal ops (the reference's payloads are opaque bytes; mp4/mp3/
JPEG still require ffmpeg/PIL and stay documented integration points).

Scope notes: no interlace (Adam7), no 16-bit depth, no palette
(color type 3), no ancillary-chunk interpretation — out-of-scope
inputs raise ``ValueError`` with the reason, never mis-decode.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    # a = left, b = up, c = up-left (int16+ to avoid wrap)
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (h, w, 3) RGB → PNG bytes, one filter type for all rows."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_png expects uint8 (h, w, 3) RGB")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"unknown filter type {filter_type}")
    h, w, _ = arr.shape
    bpp = 3
    raw = bytearray()
    prior = np.zeros((w, bpp), dtype=np.uint8)
    for y in range(h):
        row = arr[y]
        left = np.vstack([np.zeros((1, bpp), np.uint8), row[:-1]])
        upleft = np.vstack([np.zeros((1, bpp), np.uint8), prior[:-1]])
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            filt = (row.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:
            filt = (row.astype(np.int16) - prior).astype(np.uint8)
        elif filter_type == 3:
            filt = (
                row.astype(np.int16)
                - ((left.astype(np.int16) + prior.astype(np.int16)) // 2)
            ).astype(np.uint8)
        else:  # Paeth
            filt = (row.astype(np.int16) - _paeth(left, prior, upleft)).astype(
                np.uint8
            )
        raw.append(filter_type)
        raw.extend(filt.tobytes())
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 (h, w, 3) RGB (gray broadcast, alpha dropped)."""
    if not data.startswith(_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = len(_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat.extend(body)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if ctype not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype} (0/2/6)")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG IDAT length does not match dimensions")
    out = np.zeros((h, w, ch), dtype=np.uint8)
    prior = np.zeros((w, ch), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (1 + stride)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (1 + stride) + 1
        ).reshape(w, ch)
        if ftype == 0:
            recon = line.copy()
        elif ftype == 2:
            recon = (line.astype(np.int16) + prior).astype(np.uint8)
        elif ftype in (1, 3, 4):
            recon = np.zeros_like(line)
            for x in range(w):  # sequential left-dependency
                left = recon[x - 1] if x else np.zeros(ch, np.uint8)
                if ftype == 1:
                    recon[x] = line[x] + left
                elif ftype == 3:
                    recon[x] = (
                        line[x].astype(np.int16)
                        + (left.astype(np.int16) + prior[x].astype(np.int16)) // 2
                    ).astype(np.uint8)
                else:
                    upleft = prior[x - 1] if x else np.zeros(ch, np.uint8)
                    recon[x] = line[x] + _paeth(left, prior[x], upleft)
        else:
            raise ValueError(f"unknown PNG scanline filter {ftype}")
        out[y] = recon
        prior = recon
    if ch == 1:
        return np.repeat(out, 3, axis=2)
    if ch == 4:
        return out[:, :, :3].copy()
    return out
