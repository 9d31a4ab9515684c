"""Minimal, real PNG codec — pure numpy + zlib, no PIL.

Implements the public PNG specification (RFC 2083 / ISO 15948) on
decode for **every defined color-type/bit-depth combination**:
grayscale at 1/2/4/8/16 bits, RGB at 8/16, palette (PLTE) at
1/2/4/8, gray+alpha and RGBA at 8/16 — all five scanline filters
(None/Sub/Up/Average/Paeth, applied bytewise at the pixel stride per
the spec), and **Adam7 interlacing** (each of the seven passes is an
independently filtered sub-image).  Output is always uint8 (h, w, 3)
RGB: 16-bit samples reduce to their high byte, sub-byte grayscale
scales by 255/(2^d−1), palette indices go through PLTE, alpha is
dropped.  ``encode_png`` writes 8-bit RGB (with a selectable filter
and optional Adam7 interlacing); ``encode_png_adv`` writes any
supported depth/color-type (the test-vector generator for the decode
matrix).  Malformed inputs raise ``ValueError`` — never a silent
mis-decode.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from lopez_spark.ops.limits import bounded_inflate, check_pixels

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}

# Adam7 pass grids: (x offset, x step, y offset, y step)
_ADAM7 = (
    (0, 8, 0, 8),
    (4, 8, 0, 8),
    (0, 4, 4, 8),
    (2, 4, 0, 4),
    (0, 2, 2, 4),
    (1, 2, 0, 2),
    (0, 1, 1, 2),
)


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


# ------------------------------------------------------------- filtering


def _filter_rows(rows: np.ndarray, bpp: int, filter_type: int) -> bytes:
    """(h, w_bytes) uint8 sample rows → filtered scanline stream with
    one filter-type byte per row (the encode direction)."""
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"unknown filter type {filter_type}")
    h, wb = rows.shape
    out = bytearray()
    prior = np.zeros(wb, dtype=np.uint8)
    for y in range(h):
        row = rows[y]
        left = np.zeros(wb, np.uint8)
        left[bpp:] = row[:-bpp]
        upleft = np.zeros(wb, np.uint8)
        upleft[bpp:] = prior[:-bpp]
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
        else:
            filt = (row.astype(np.int16) - _paeth(left, prior, upleft)).astype(
                np.uint8
            )
        out.append(filter_type)
        out.extend(filt.tobytes())
        prior = row
    return bytes(out)


def _unfilter(raw: memoryview, h: int, wb: int, bpp: int) -> np.ndarray:
    """Filtered scanline stream → (h, wb) uint8 reconstructed bytes.
    Sub (left-dependency) vectorizes as a uint8 cumsum over the pixel
    stride; Average/Paeth keep the per-pixel walk the spec requires."""
    if len(raw) != h * (1 + wb):
        raise ValueError("PNG scanline data does not match dimensions")
    out = np.zeros((h, wb), dtype=np.uint8)
    prior = np.zeros(wb, dtype=np.uint8)
    n = wb // bpp
    for y in range(h):
        ftype = raw[y * (1 + wb)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=wb, offset=y * (1 + wb) + 1
        )
        if ftype == 0:
            recon = line.copy()
        elif ftype == 2:
            recon = line + prior  # uint8 wraps mod 256 per spec
        elif ftype == 1:
            # recon[i] = line[i] + recon[i-bpp]: cumsum mod 256 per lane
            recon = np.cumsum(
                line.reshape(n, bpp), axis=0, dtype=np.uint8
            ).reshape(wb)
        elif ftype in (3, 4):
            recon = np.zeros(wb, np.uint8)
            lp = line.reshape(n, bpp)
            pp = prior.reshape(n, bpp)
            rp = recon.reshape(n, bpp)
            zero = np.zeros(bpp, np.uint8)
            for x in range(n):  # sequential left-dependency
                left = rp[x - 1] if x else zero
                if ftype == 3:
                    rp[x] = (
                        lp[x].astype(np.int16)
                        + (left.astype(np.int16) + pp[x].astype(np.int16)) // 2
                    ).astype(np.uint8)
                else:
                    upleft = pp[x - 1] if x else zero
                    rp[x] = lp[x] + _paeth(left, pp[x], upleft)
        else:
            raise ValueError(f"unknown PNG scanline filter {ftype}")
        out[y] = recon
        prior = recon
    return out


# ---------------------------------------------------------------- encode


def _pack_rows(samples: np.ndarray, depth: int) -> np.ndarray:
    """(h, w, ch) integer samples → (h, w_bytes) uint8 rows."""
    h, w, ch = samples.shape
    if depth == 8:
        return samples.astype(np.uint8).reshape(h, w * ch)
    if depth == 16:
        s = samples.astype(">u2")
        return np.frombuffer(s.tobytes(), np.uint8).reshape(h, w * ch * 2)
    # sub-byte depths: single channel only (gray / palette indices)
    bits = np.zeros((h, w * depth), dtype=np.uint8)
    for b in range(depth):
        bits[:, b::depth] = (samples[:, :, 0] >> (depth - 1 - b)) & 1
    return np.packbits(bits, axis=1)


def encode_png_adv(
    samples: np.ndarray,
    depth: int,
    color_type: int,
    palette: np.ndarray | None = None,
    interlace: bool = False,
    filter_type: int = 0,
) -> bytes:
    """Encode any supported depth/color-type (the decode-matrix test
    vector generator).  ``samples`` is (h, w, channels) ints — palette
    indices for color type 3; ``palette`` is (n, 3) uint8."""
    if color_type not in _DEPTHS or depth not in _DEPTHS[color_type]:
        raise ValueError(f"invalid depth {depth} for color type {color_type}")
    ch = _CHANNELS[color_type]
    if samples.ndim != 3 or samples.shape[2] != ch:
        raise ValueError(f"expected (h, w, {ch}) samples")
    h, w, _ = samples.shape
    bpp = max(1, ch * depth // 8)
    body = bytearray()
    if interlace:
        for sx, dx, sy, dy in _ADAM7:
            sub = samples[sy::dy, sx::dx]
            if sub.shape[0] and sub.shape[1]:
                body += _filter_rows(_pack_rows(sub, depth), bpp, filter_type)
    else:
        body += _filter_rows(_pack_rows(samples, depth), bpp, filter_type)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, int(interlace))
    out = _SIG + _chunk(b"IHDR", ihdr)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette required for color type 3")
        out += _chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
    return out + _chunk(b"IDAT", zlib.compress(bytes(body), 6)) + _chunk(b"IEND", b"")


def encode_png(
    arr: np.ndarray, filter_type: int = 0, interlace: bool = False
) -> bytes:
    """uint8 (h, w, 3) RGB → PNG bytes, one filter type for all rows."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_png expects uint8 (h, w, 3) RGB")
    return encode_png_adv(arr, 8, 2, interlace=interlace, filter_type=filter_type)


# ---------------------------------------------------------------- decode


def _to_samples(rows: np.ndarray, w: int, ch: int, depth: int) -> np.ndarray:
    """(h, w_bytes) recon bytes → (h, w, ch) uint8 sample values
    (16-bit reduces to the high byte; sub-byte depths unpack,
    unscaled — the caller scales gray or looks up palette)."""
    h = rows.shape[0]
    if depth == 8:
        return rows.reshape(h, w, ch)[:, :w]
    if depth == 16:
        return rows.reshape(h, w, ch, 2)[:, :, :, 0]
    bits = np.unpackbits(rows, axis=1)
    vals = np.zeros((h, w), dtype=np.uint8)
    for b in range(depth):
        vals |= bits[:, b : w * depth : depth] << (depth - 1 - b)
    return vals[:, :, None]


def _decode_subimage(
    raw: memoryview, w: int, h: int, ch: int, depth: int
) -> tuple[np.ndarray, int]:
    """One (sub-)image from the decompressed stream; returns the
    (h, w, ch) samples and the byte count consumed."""
    wb = -(-w * ch * depth // 8)
    bpp = max(1, ch * depth // 8)
    used = h * (1 + wb)
    rows = _unfilter(raw[:used], h, wb, bpp)
    return _to_samples(rows, w, ch, depth), used


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 (h, w, 3) RGB (any defined color-type/depth;
    gray broadcast, alpha dropped, palette resolved, Adam7 merged)."""
    if not data.startswith(_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = len(_SIG)
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("PNG chunk truncated")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"PLTE":
            if length % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.extend(body)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if ctype not in _DEPTHS or depth not in _DEPTHS[ctype]:
        raise ValueError(f"invalid PNG depth {depth} for color type {ctype}")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if w == 0 or h == 0:
        raise ValueError("zero PNG dimensions")
    check_pixels(w, h, "PNG")
    ch = _CHANNELS[ctype]
    # exact raw size the header implies: per row 1 filter byte +
    # ceil(w*ch*depth/8) sample bytes, over each (sub)image row —
    # refuse to inflate a byte past it (decompression-bomb guard)
    if interlace == 0:
        expected = h * (1 + (w * ch * depth + 7) // 8)
    else:
        expected = 0
        for sx, dx, sy, dy in _ADAM7:
            pw = -(-(w - sx) // dx) if w > sx else 0
            ph = -(-(h - sy) // dy) if h > sy else 0
            if pw and ph:
                expected += ph * (1 + (pw * ch * depth + 7) // 8)
    raw = memoryview(bounded_inflate(bytes(idat), expected, "PNG IDAT"))

    if interlace == 0:
        samples, used = _decode_subimage(raw, w, h, ch, depth)
        if used != len(raw):
            raise ValueError("PNG IDAT length does not match dimensions")
    else:  # Adam7: seven independently filtered passes
        samples = np.zeros((h, w, ch), dtype=np.uint8)
        off = 0
        for sx, dx, sy, dy in _ADAM7:
            pw = -(-(w - sx) // dx) if w > sx else 0
            ph = -(-(h - sy) // dy) if h > sy else 0
            if pw == 0 or ph == 0:
                continue
            sub, used = _decode_subimage(raw[off:], pw, ph, ch, depth)
            samples[sy::dy, sx::dx] = sub
            off += used
        if off != len(raw):
            raise ValueError("PNG IDAT length does not match dimensions")

    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = samples[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[idx]
    if ctype in (0, 4):  # grayscale (+alpha): scale sub-byte, broadcast
        g = samples[:, :, 0]
        if depth < 8:
            g = (g.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return np.ascontiguousarray(samples[:, :, :3])
