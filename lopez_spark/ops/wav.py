"""Minimal, real WAV (RIFF) codec — pure numpy + struct, no audio lib.

Implements the public RIFF/WAVE format for uncompressed PCM: 16-bit
signed little-endian samples, mono or multi-channel (channels averaged
to mono on decode — feature extraction operates on a single stream,
matching the fixture codec's shape).  Out-of-scope inputs (compressed
codecs, other bit depths) raise ``ValueError`` with the reason, never
mis-decode.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(pcm: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono samples → RIFF/WAVE bytes (PCM 16-bit LE)."""
    if pcm.dtype != np.int16 or pcm.ndim != 1:
        raise ValueError("encode_wav expects 1-D int16 samples")
    data = pcm.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH",
        1,  # audio format: PCM
        1,  # channels
        sample_rate,
        sample_rate * 2,  # byte rate
        2,  # block align
        16,  # bits per sample
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (int16 mono samples, sample_rate).

    Multi-channel input is averaged to mono; only uncompressed 16-bit
    PCM (format tag 1) is supported."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt_tag = channels = rate = bits = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt_tag, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
        elif cid == b"data":
            if fmt_tag is None:
                raise ValueError("WAV data chunk before fmt chunk")
            if fmt_tag != 1:
                raise ValueError(
                    f"unsupported WAV format tag {fmt_tag} (only PCM=1)"
                )
            if bits != 16:
                raise ValueError(f"unsupported WAV bit depth {bits} (only 16)")
            pcm = np.frombuffer(body, dtype="<i2")
            if channels > 1:
                pcm = (
                    pcm[: len(pcm) - len(pcm) % channels]
                    .reshape(-1, channels)
                    .mean(axis=1)
                    .astype(np.int16)
                )
            samples = pcm.astype(np.int16)
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if samples is None:
        raise ValueError("WAV missing data chunk")
    return samples, int(rate)
