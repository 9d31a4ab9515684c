"""Baseline TIFF 6.0 codec — pure numpy per the public specification
(Adobe TIFF 6.0, 1992; EXIF orientation semantics per JEITA CP-3451).

Scope: 8-bit RGB (PhotometricInterpretation=2), strip-organized,
Compression 1 (none) and 8 (Adobe deflate/zlib) with horizontal-
differencing Predictor 2, both byte orders, multi-strip images, and
the 8 EXIF orientations (applied on decode so downstream operators
always see upright pixels).  Out-of-scope layouts (LZW/JPEG-in-TIFF,
palette, tiles, planar) reject with ``ValueError`` — never a
mis-decode.

Reference counterpart: the parse step every fetched page passes in the
reference engine (directives/mod.rs:58-70); TIFF is the image-axis
equivalent for scanned/archival corpora.  ``ops/container_probe.py::
probe_tiff`` is the cheap pre-decode gate; this module is the real
decode behind it.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

from lopez_spark.ops.limits import bounded_inflate, check_pixels

__all__ = ["apply_orientation", "decode_tiff", "encode_tiff"]

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def apply_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Map stored pixels to upright display order per the 8 EXIF
    orientation codes (JEITA CP-3451 §4.6.4 / TIFF tag 274)."""
    if orientation == 1:
        return px
    if orientation == 2:  # mirrored horizontally
        return px[:, ::-1]
    if orientation == 3:  # rotated 180
        return px[::-1, ::-1]
    if orientation == 4:  # mirrored vertically
        return px[::-1, :]
    if orientation == 5:  # transposed (diagonal top-left/bottom-right)
        return px.swapaxes(0, 1)
    if orientation == 6:  # rotated 90 CW: transpose then mirror columns
        return px.swapaxes(0, 1)[:, ::-1]
    if orientation == 7:  # transverse (diagonal top-right/bottom-left)
        return px[::-1, ::-1].swapaxes(0, 1)
    if orientation == 8:  # rotated 90 CCW
        return px.swapaxes(0, 1)[::-1, :]
    raise ValueError(f"EXIF orientation {orientation} out of range")


def invert_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Inverse of :func:`apply_orientation` — produce the stored-order
    pixels whose upright rendering is ``px`` (used by the encoder)."""
    if orientation in (1, 2, 3, 4, 5, 7):  # self-inverse transforms
        return apply_orientation(px, orientation)
    if orientation == 6:
        return apply_orientation(px, 8)
    if orientation == 8:
        return apply_orientation(px, 6)
    raise ValueError(f"EXIF orientation {orientation} out of range")


def _read_ifd0(data: bytes, bo: str) -> dict[int, tuple[int, list[int]]]:
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ValueError("TIFF IFD offset beyond payload")
    (n_entries,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    end = ifd_off + 2 + 12 * n_entries
    if end + 4 > len(data):
        raise ValueError("TIFF IFD entry table truncated")
    tags: dict[int, tuple[int, list[int]]] = {}
    for k in range(n_entries):
        e = ifd_off + 2 + 12 * k
        tag, typ = struct.unpack(bo + "HH", data[e : e + 4])
        (cnt,) = struct.unpack(bo + "I", data[e + 4 : e + 8])
        unit = _TYPE_SIZE.get(typ)
        if unit is None:
            continue
        size = unit * cnt
        if size <= 4:
            vbytes = data[e + 8 : e + 12]
        else:
            (voff,) = struct.unpack(bo + "I", data[e + 8 : e + 12])
            if voff + size > len(data):
                raise ValueError(f"TIFF tag {tag} value overruns payload")
            vbytes = data[voff : voff + size]
        if typ == 3:
            vals = list(struct.unpack(bo + f"{cnt}H", vbytes[: 2 * cnt]))
        elif typ == 4:
            vals = list(struct.unpack(bo + f"{cnt}I", vbytes[: 4 * cnt]))
        else:
            continue
        tags[tag] = (typ, vals)
    return tags


def _tag1(tags: dict, tag: int, default=None):
    if tag not in tags:
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default
    return tags[tag][1][0]


def decode_tiff(data: bytes, upright: bool = True) -> np.ndarray:
    """Decode a baseline RGB TIFF to uint8 (h, w, 3).  With
    ``upright`` (default) the EXIF orientation tag is applied so the
    result is in display order."""
    if len(data) < 8:
        raise ValueError("not a TIFF stream (short header)")
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF stream (bad byte-order mark)")
    if struct.unpack(bo + "H", data[2:4])[0] != 42:
        raise ValueError("not a TIFF stream (bad magic)")
    tags = _read_ifd0(data, bo)

    w = _tag1(tags, 256)
    h = _tag1(tags, 257)
    check_pixels(w, h, "TIFF")
    comp = _tag1(tags, 259, 1)
    photometric = _tag1(tags, 262, 2)
    spp = _tag1(tags, 277, 3)
    bps = tags.get(258, (3, [8, 8, 8]))[1]
    predictor = _tag1(tags, 317, 1)
    orientation = _tag1(tags, 274, 1)
    if photometric != 2 or spp != 3 or any(b != 8 for b in bps):
        raise ValueError(
            f"unsupported TIFF layout (photometric={photometric}, "
            f"spp={spp}, bps={bps}); RGB 8-bit only"
        )
    if comp not in (1, 8):
        raise ValueError(f"unsupported TIFF compression {comp} (none/deflate only)")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF not supported (strips only)")
    offsets = tags.get(273)
    counts = tags.get(279)
    if offsets is None or counts is None:
        raise ValueError("TIFF missing StripOffsets/StripByteCounts")
    rows_per_strip = _tag1(tags, 278, h)
    offsets, counts = offsets[1], counts[1]
    if len(offsets) != len(counts):
        raise ValueError("TIFF strip offset/count length mismatch")

    rows = []
    row_bytes = w * 3
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise ValueError(f"TIFF strip {si} overruns payload")
        raw = data[off : off + cnt]
        n_rows = min(rows_per_strip, h - si * rows_per_strip)
        if comp == 8 and n_rows > 0:
            # bound the inflate at the strip's exact raw size so a
            # hostile deflate stream can't balloon past the header dims
            raw = bounded_inflate(raw, n_rows * row_bytes, f"TIFF strip {si}")
        if n_rows <= 0 or len(raw) != n_rows * row_bytes:
            raise ValueError(
                f"TIFF strip {si} size {len(raw)} != {n_rows}x{row_bytes}"
            )
        strip = np.frombuffer(raw, dtype=np.uint8).reshape(n_rows, w, 3)
        if predictor == 2:  # horizontal differencing, per sample
            strip = np.cumsum(strip.astype(np.uint16), axis=1).astype(np.uint8)
        rows.append(strip)
    px = np.concatenate(rows, axis=0)
    if px.shape[0] != h:
        raise ValueError(f"TIFF strips cover {px.shape[0]} rows, header says {h}")
    return apply_orientation(px, orientation) if upright else px


def encode_tiff(
    px: np.ndarray,
    *,
    byte_order: str = "<",
    compression: int = 1,
    predictor: int = 1,
    orientation: int = 1,
    rows_per_strip: int | None = None,
) -> bytes:
    """Encode uint8 (h, w, 3) as baseline RGB TIFF.  ``px`` is the
    upright image; with ``orientation`` != 1 the pixels are stored in
    the rotated/mirrored order the tag describes (decode restores
    them)."""
    if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
        raise ValueError("encode_tiff expects uint8 (h, w, 3)")
    if compression not in (1, 8):
        raise ValueError("compression must be 1 (none) or 8 (deflate)")
    if predictor == 2 and compression == 1:
        raise ValueError("predictor 2 requires deflate compression")
    bo = byte_order
    if bo not in ("<", ">"):
        raise ValueError("byte_order must be '<' (II) or '>' (MM)")
    stored = invert_orientation(px, orientation)
    h, w = stored.shape[:2]
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        strip = stored[y0 : y0 + rps]
        if predictor == 2:
            s16 = strip.astype(np.int16)
            diff = s16.copy()
            diff[:, 1:] = s16[:, 1:] - s16[:, :-1]
            strip = (diff & 0xFF).astype(np.uint8)
        raw = strip.tobytes()
        strips.append(zlib.compress(raw, 6) if compression == 8 else raw)

    def entry(tag: int, typ: int, cnt: int, payload: bytes) -> bytes:
        return struct.pack(bo + "HHI", tag, typ, cnt) + payload

    def short(v: int) -> bytes:
        return struct.pack(bo + "H", v) + b"\x00\x00"

    def long_(v: int) -> bytes:
        return struct.pack(bo + "I", v)

    # layout: header(8) | IFD | bps array(6) | strip data...
    n_strips = len(strips)
    entries = []
    overflow: list[bytes] = []

    def add(tag, typ, cnt, inline=None, indirect=None):
        entries.append((tag, typ, cnt, inline, indirect))

    add(256, 4, 1, inline=long_(w))
    add(257, 4, 1, inline=long_(h))
    add(258, 3, 3, indirect=struct.pack(bo + "3H", 8, 8, 8))
    add(259, 3, 1, inline=short(compression))
    add(262, 3, 1, inline=short(2))
    add(274, 3, 1, inline=short(orientation))
    add(277, 3, 1, inline=short(3))
    add(278, 4, 1, inline=long_(rps))
    if predictor == 2:
        add(317, 3, 1, inline=short(2))
    if n_strips == 1:
        add(273, 4, 1, inline=None, indirect=None)  # patched below
        add(279, 4, 1, inline=long_(len(strips[0])))
    else:
        add(273, 4, n_strips, indirect=b"")  # patched below
        add(279, 4, n_strips,
            indirect=struct.pack(bo + f"{n_strips}I", *(len(s) for s in strips)))

    entries.sort(key=lambda t: t[0])
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    data_off = ifd_off + ifd_size  # indirect values start here

    # first pass: compute indirect offsets
    blobs: list[bytes] = []
    pos = data_off
    entry_bytes = []
    strip_table_pos = None
    for tag, typ, cnt, inline, indirect in entries:
        if tag == 273:
            if n_strips == 1:
                entry_bytes.append((tag, typ, cnt, None))  # patch later
            else:
                strip_table_pos = pos
                placeholder = bytes(4 * n_strips)
                blobs.append(placeholder)
                entry_bytes.append((tag, typ, cnt, long_(pos)))
                pos += len(placeholder)
        elif indirect is not None:
            blobs.append(indirect)
            entry_bytes.append((tag, typ, cnt, long_(pos)))
            pos += len(indirect)
        else:
            entry_bytes.append((tag, typ, cnt, inline))

    strip_start = pos
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)

    # second pass: emit with patched strip offsets
    out = bytearray()
    out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "H", 42)
    out += struct.pack(bo + "I", ifd_off)
    out += struct.pack(bo + "H", len(entry_bytes))
    for tag, typ, cnt, payload in entry_bytes:
        if tag == 273 and n_strips == 1:
            payload = long_(strip_start)
        out += entry(tag, typ, cnt, payload)
    out += struct.pack(bo + "I", 0)  # no next IFD
    for b in blobs:
        if strip_table_pos is not None and len(out) == strip_table_pos:
            b = struct.pack(bo + f"{n_strips}I", *strip_offsets)
        out += b
    for s in strips:
        out += s
    return bytes(out)
