"""MJPEG-in-AVI — a real, decodable video path with no external codec.

AVI is Microsoft's public RIFF container (the 1992 'AVI RIFF File
Reference'); MJPEG stores every frame as an independent baseline JPEG.
Together with the pure-numpy JPEG codec (``ops/jpeg.py``) this gives
the engine an end-to-end video decode path in-sandbox: container walk
here, per-frame pixel decode there.  Frame independence is also the
scale property — frame sampling seeks straight to the k-th '00dc'
chunk and decodes ONLY the sampled frames (no inter-frame state, unlike
P/B-frame codecs where ffmpeg remains the documented integration
point).

Reference counterpart: the parse step every fetched payload passes
(lib-lopez ``page/mod.rs`` — ours generalized to media containers).

Writer emits avih/strh/strf headers, the 'movi' LIST and an idx1 index
(keyframe-flagged, offsets relative to the 'movi' fourcc per the
convention); malformed input raises ``ValueError``, never mis-parses.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

__all__ = ["build_avi", "probe_avi", "iter_avi_frames"]


def build_avi(
    frames: list[bytes], w: int, h: int, fps: int = 25
) -> bytes:
    """JPEG frame payloads → single-stream MJPEG AVI bytes."""
    if not frames:
        raise ValueError("build_avi needs at least one frame")
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(frames),
        0,  # dwInitialFrames
        1,  # dwStreams
        max(len(f) for f in frames),
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4h",
        b"vids",
        b"MJPG",
        0,  # dwFlags
        0,  # wPriority
        0,  # wLanguage
        0,  # dwInitialFrames
        1,  # dwScale
        fps,  # dwRate (rate/scale = fps)
        0,  # dwStart
        len(frames),  # dwLength (in frames)
        max(len(f) for f in frames),
        -1,  # dwQuality
        0,  # dwSampleSize (0: variable-size samples)
        0, 0, int(w), int(h),  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",
        w * h * 3,  # biSizeImage (uncompressed bound)
        0, 0, 0, 0,
    )

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(subtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", subtype + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_body = b"movi"
    idx = b""
    for f in frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += struct.pack("<4sIII", b"00dc", 0x10, len(movi_body), len(f))
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_body)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _chunks(data: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Walk RIFF chunks in data[pos:end] → (fourcc, body_start, size)."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"AVI chunk {fourcc!r} overruns container ({size} bytes)"
            )
        yield fourcc, body, size
        pos = body + size + (size & 1)


def probe_avi(data: bytes) -> dict:
    """RIFF walk → {width, height, n_frames, fps, codec} from
    avih + the first 'vids' strh.  No frame decode."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    meta: dict = {}
    for fourcc, body, size in _chunks(data, 12, len(data)):
        if fourcc != b"LIST" or data[body : body + 4] != b"hdrl":
            continue
        for c2, b2, s2 in _chunks(data, body + 4, body + size):
            if c2 == b"avih":
                if s2 < 40:
                    raise ValueError("AVI avih header too short")
                v = struct.unpack("<10I", data[b2 : b2 + 40])
                meta.update(n_frames=v[4], width=v[8], height=v[9])
            elif c2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                for c3, b3, s3 in _chunks(data, b2 + 4, b2 + s2):
                    if c3 != b"strh" or s3 < 48:
                        continue
                    fcc_type = data[b3 : b3 + 4]
                    if fcc_type != b"vids":
                        continue
                    handler = data[b3 + 4 : b3 + 8]
                    scale, rate = struct.unpack(
                        "<II", data[b3 + 20 : b3 + 28]
                    )
                    meta["codec"] = handler.decode("ascii", "replace").strip()
                    meta["fps"] = (rate / scale) if scale else 0.0
        break
    if "n_frames" not in meta:
        raise ValueError("AVI missing hdrl/avih header")
    meta.setdefault("codec", "")
    meta.setdefault("fps", 0.0)
    return meta


def iter_avi_frames(data: bytes) -> Iterator[bytes]:
    """Yield video-frame payloads ('00dc'/'00db' chunks) in stream
    order from the 'movi' LIST — each one an independent JPEG for
    MJPEG, so callers can skip-decode (sample every k-th frame without
    touching the rest)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    found = False
    for fourcc, body, size in _chunks(data, 12, len(data)):
        if fourcc != b"LIST" or data[body : body + 4] != b"movi":
            continue
        found = True
        for c2, b2, s2 in _chunks(data, body + 4, body + size):
            if c2[2:4] in (b"dc", b"db"):
                yield bytes(data[b2 : b2 + s2])
    if not found:
        raise ValueError("AVI missing movi LIST")
