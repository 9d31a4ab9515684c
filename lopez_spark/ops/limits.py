"""Decode resource caps shared by the pure-python codecs.

A hostile payload can claim huge dimensions in a tiny header (GIF:
64k x 64k logical screen in 13 bytes; JPEG SOF: 65535 x 65535 in 17
bytes) or inflate a small deflate stream into gigabytes (PNG IDAT,
TIFF deflate strips).  The per-row containment contract in the Arrow
stages (`ops/multimodal.py`) maps decode errors to ok=False rows — but
an allocation that OOM-kills the executor task never reaches the
except clause.  These guards reject such payloads *before* allocating:

* :func:`check_pixels` — cap width*height before any canvas / coefficient
  buffer allocation.  2^26 pixels (67 MP, ~192 MiB as RGB uint8) is far
  above any real training-corpus image and far below task-killing.
* :func:`bounded_inflate` — zlib inflate that stops at the expected
  byte count (known exactly from the header dimensions) instead of
  trusting the stream, via ``decompressobj().decompress(data, max+1)``.

Raising ValueError keeps these inside the existing containment tuples.
"""

from __future__ import annotations

import zlib

MAX_PIXELS = 1 << 26  # 67,108,864 px


def check_pixels(w: int, h: int, what: str = "image") -> None:
    """Reject header-claimed dimensions whose pixel count exceeds
    :data:`MAX_PIXELS`, before any buffer is allocated for them."""
    if w * h > MAX_PIXELS:
        raise ValueError(
            f"{what} dimensions {w}x{h} exceed decode cap ({MAX_PIXELS} pixels)"
        )


def bounded_inflate(data: bytes, expected: int, what: str = "deflate stream") -> bytes:
    """zlib-inflate ``data`` refusing to produce more than ``expected``
    bytes (the exact raw size implied by the image header).  A stream
    that inflates past the bound is hostile or corrupt -> ValueError;
    shorter-than-expected output is returned as-is for the caller's
    existing exact-length checks to reject."""
    d = zlib.decompressobj()
    try:
        out = d.decompress(data, expected + 1)
    except zlib.error as err:
        raise ValueError(f"{what} deflate error: {err}") from err
    if len(out) > expected:
        raise ValueError(f"{what} inflates past expected {expected} bytes")
    try:
        out += d.flush()
    except zlib.error as err:
        raise ValueError(f"{what} deflate error: {err}") from err
    if len(out) > expected:
        raise ValueError(f"{what} inflates past expected {expected} bytes")
    if not d.eof:
        # zlib.decompress would have raised here; decompressobj just
        # returns partial output — keep the old integrity contract
        # (incl. adler32 verification, which only runs at stream end)
        raise ValueError(f"{what} deflate stream truncated or corrupt")
    return out
