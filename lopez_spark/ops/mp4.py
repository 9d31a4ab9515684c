"""Motion-JPEG in MP4 — real ISO-BMFF *stream* decode for the one
video codec the sandbox can actually decode.

ISO 14496-12 (public) stores media samples in ``mdat`` and describes
them with the sample tables under ``moov/trak/mdia/minf/stbl``:
``stsd`` (codec), ``stsz`` (sample sizes), ``stsc`` (samples→chunks),
``stco``/``co64`` (chunk offsets).  For the ``jpeg`` sample-entry
(Motion-JPEG: every sample an independent baseline JPEG) walking those
tables yields the exact byte range of each frame, which the pure-numpy
JPEG codec (``ops/jpeg.py``) then decodes — no ffmpeg.  Inter-frame
codecs (avc1/hev1/…) still raise with the ffmpeg integration point
documented; the container walk itself (``probe_mp4``) already parses
their metadata.

Like MJPEG-AVI, sample independence is the scale property: frame
sampling reads ONLY the sampled byte ranges.

Writer emits a minimal valid layout — ftyp, mdat, then moov with one
video trak, one chunk per sample (stsc = a single (1,1,1) entry) —
which is exactly the shape the reader's table walk generalizes from.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

__all__ = ["build_mp4_mjpeg", "iter_mp4_jpeg_samples"]

_JPEG_ENTRIES = {"jpeg", "mjpa", "mjpb", "MJPG"}


def _box(name: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + name + body


def _full(name: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(name, struct.pack(">I", (version << 24) | flags) + body)


def build_mp4_mjpeg(
    frames: list[bytes], w: int, h: int, fps: int = 25
) -> bytes:
    """JPEG frame payloads → single-track Motion-JPEG MP4 bytes
    (timescale = fps, one sample per frame, one chunk per sample)."""
    if not frames:
        raise ValueError("build_mp4_mjpeg needs at least one frame")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat = _box(b"mdat", b"".join(frames))
    # absolute offsets of each sample: after ftyp + mdat's 8-byte header
    base = len(ftyp) + 8
    offsets = []
    pos = base
    for f in frames:
        offsets.append(pos)
        pos += len(f)

    n = len(frames)
    dur = n  # timescale = fps, 1 tick per frame
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, dur)  # ctime mtime timescale dur
        + struct.pack(">iH", 0x00010000, 0x0100)  # rate, volume
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, dur)  # ctime mtime id rsvd dur
        + b"\x00" * 16
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, fps, dur, 0x55C4, 0),  # lang 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"mjpeg\x00",
    )
    entry = _box(
        b"jpeg",
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">I", n) + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dref = _full(
        b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")
    )
    minf = _box(
        b"minf",
        _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        + _box(b"dinf", dref)
        + stbl,
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _find(data: bytes, start: int, end: int, name: str):
    from .container_probe import _walk_boxes

    for n, (s, e) in _walk_boxes(data, start, end):
        if n == name:
            return s, e
    return None


def iter_mp4_jpeg_samples(data: bytes) -> Iterator[bytes]:
    """Walk the sample tables of the first Motion-JPEG video track and
    yield each sample's bytes (an independent JPEG).  Malformed
    containers raise ``ValueError``; a video track in any other codec
    raises ``NotImplementedError`` naming the codec (the ffmpeg
    integration point) — never a mis-decode."""
    from .container_probe import _walk_boxes

    boxes = dict(_walk_boxes(data, 0, len(data)))
    if "ftyp" not in boxes and "moov" not in boxes:
        raise ValueError("not an ISO-BMFF (mp4) stream: no ftyp/moov box")
    moov = boxes.get("moov")
    if moov is None:
        raise ValueError("mp4 missing moov box")
    other_codecs: list[str] = []
    for name, (s, e) in _walk_boxes(data, *moov):
        if name != "trak":
            continue
        mdia = _find(data, s, e, "mdia")
        if mdia is None:
            continue
        minf = _find(data, *mdia, "minf")
        if minf is None:
            continue
        stbl = _find(data, *minf, "stbl")
        if stbl is None:
            continue
        stsd = _find(data, *stbl, "stsd")
        if stsd is None:
            continue
        s3, e3 = stsd
        fourcc = data[s3 + 12 : s3 + 16].decode("ascii", "replace")
        if fourcc not in _JPEG_ENTRIES:
            hdlr = _find(data, *mdia, "hdlr")
            if hdlr is not None and data[hdlr[0] + 8 : hdlr[0] + 12] == b"vide":
                other_codecs.append(fourcc)
            continue
        yield from _walk_samples(data, stbl)
        return
    if other_codecs:
        raise NotImplementedError(
            f"mp4 video codec {other_codecs[0]!r} requires ffmpeg; only "
            "Motion-JPEG ('jpeg' sample entries) decodes in-sandbox"
        )
    raise ValueError("mp4 has no video track")


def _walk_samples(data: bytes, stbl: tuple[int, int]) -> Iterator[bytes]:
    """stsz + stsc + stco/co64 → per-sample byte ranges, stream order."""
    stsz = _find(data, *stbl, "stsz")
    stsc = _find(data, *stbl, "stsc")
    stco = _find(data, *stbl, "stco")
    co64 = _find(data, *stbl, "co64")
    if stsz is None or stsc is None or (stco is None and co64 is None):
        raise ValueError("mp4 sample tables incomplete (stsz/stsc/stco)")

    s, e = stsz
    uniform, n_samples = struct.unpack(">II", data[s + 4 : s + 12])
    if uniform:
        # bound first, and never materialize the uniform case at all —
        # a corrupt count (up to 2^32) with uniform=1 would still pass
        # a size bound yet allocate ~8 B/entry, the OOM class the
        # callers' ValueError containment cannot catch
        if uniform * n_samples > len(data):
            raise ValueError(
                f"mp4 stsz claims {n_samples} x {uniform} B > file size"
            )
        sizes = None  # constant `uniform` per sample
    else:
        if s + 12 + 4 * n_samples > e:
            raise ValueError("mp4 stsz table truncated")
        sizes = list(
            struct.unpack(f">{n_samples}I", data[s + 12 : s + 12 + 4 * n_samples])
        )

    if stco is not None:
        s, e = stco
        (n_chunks,) = struct.unpack(">I", data[s + 4 : s + 8])
        if s + 8 + 4 * n_chunks > e:
            raise ValueError("mp4 stco table truncated")
        chunk_offs = struct.unpack(
            f">{n_chunks}I", data[s + 8 : s + 8 + 4 * n_chunks]
        )
    else:
        s, e = co64
        (n_chunks,) = struct.unpack(">I", data[s + 4 : s + 8])
        if s + 8 + 8 * n_chunks > e:
            raise ValueError("mp4 co64 table truncated")
        chunk_offs = struct.unpack(
            f">{n_chunks}Q", data[s + 8 : s + 8 + 8 * n_chunks]
        )

    s, e = stsc
    (n_ent,) = struct.unpack(">I", data[s + 4 : s + 8])
    if s + 8 + 12 * n_ent > e:
        raise ValueError("mp4 stsc table truncated")
    ents = [
        struct.unpack(">III", data[s + 8 + 12 * i : s + 20 + 12 * i])
        for i in range(n_ent)
    ]  # (first_chunk 1-based, samples_per_chunk, sample_desc_idx)
    for i, (first, _, _) in enumerate(ents):
        # first_chunk is 1-based and strictly increasing per spec; a 0
        # would wrap range(first-1, ...) to chunk_offs[-1] and silently
        # yield WRONG bytes — reject, never mis-decode
        if first < 1 or (i > 0 and first <= ents[i - 1][0]):
            raise ValueError(f"mp4 stsc first_chunk sequence invalid: {first}")

    # expand per-chunk sample counts: entry i applies to chunks
    # [first_i, first_{i+1})
    si = 0
    for i, (first, per_chunk, _) in enumerate(ents):
        last = ents[i + 1][0] - 1 if i + 1 < n_ent else n_chunks
        for c in range(first - 1, last):
            off = chunk_offs[c]
            for _ in range(per_chunk):
                if si >= n_samples:
                    return
                size = uniform if sizes is None else sizes[si]
                if off + size > len(data):
                    raise ValueError("mp4 sample overruns file")
                yield bytes(data[off : off + size])
                off += size
                si += 1
    if si < n_samples:
        raise ValueError(
            f"mp4 sample tables cover {si} of {n_samples} samples"
        )
