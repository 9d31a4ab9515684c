"""Audio fingerprint dedup — constellation landmark hashing (Wang
2003, "An Industrial-Strength Audio Search Algorithm", the public
Shazam paper).

Each clip reduces to a set of int64 landmark hashes: the per-frame
dominant mel band (the spectral "constellation") paired across a small
time fan-out — ``hash = pack(band[t], band[t+d], d)``.  Near-duplicate
clips (re-encodes, small noise, time shifts within a frame hop) share
most hashes; unrelated clips share almost none.  Dedup is then the
banded/bucketed shape every other near-dup operator here uses: explode
hashes → equi-join on the hash (never a cartesian) → count shared
hashes per candidate pair → threshold.

Pure numpy on the log-mel front-end (``ops/logmel.py``); float64 fixed
op order, so the executor-side Arrow stage and the driver-side oracle
recomputation agree bit-for-bit (the ``dedup_audio_fingerprint`` gate).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .logmel import logmel

__all__ = ["fingerprints", "audio_fingerprints"]

_FANOUT = 3  # pair each anchor frame with the next 1..3 frames


def fingerprints(
    pcm: np.ndarray,
    rate: int,
    n_fft: int = 512,
    hop: int = 256,
    n_mels: int = 64,
) -> np.ndarray:
    """Mono PCM → sorted unique int64 landmark hashes.  64 mel bands
    (finer than the feature front-end's 32) keep the hash space large
    enough that unrelated clips rarely collide above the dedup
    threshold.  A clip shorter than ``_FANOUT + 1`` frames yields an
    empty array (too short to anchor a pair), never an error."""
    lm = logmel(pcm, rate, n_fft=n_fft, hop=hop, n_mels=n_mels)
    if lm.shape[0] <= _FANOUT:
        return np.zeros(0, dtype=np.int64)
    peaks = np.argmax(lm, axis=1).astype(np.int64)  # constellation
    hashes = []
    for d in range(1, _FANOUT + 1):
        a, b = peaks[:-d], peaks[d:]
        hashes.append((a << 16) | (b << 8) | d)
    return np.unique(np.concatenate(hashes))


def audio_fingerprints(audios):
    """Arrow stage: (audio_id, bytes, fmt, sample_rate) → one row per
    landmark hash (audio_id, fp long).  Malformed/NULL payloads yield
    zero rows here — dedup treats an undecodable clip as having no
    landmarks (the decode gate reports those separately).  Join this
    to itself on fp and count per pair for near-dup candidates."""
    import pandas as pd

    from .. import fixtures as fx

    def run(batches):
        for pdf in batches:
            ids: list[str] = []
            fps: list[int] = []
            for audio_id, data, fmt, rate in zip(
                pdf["audio_id"], pdf["bytes"], pdf["fmt"], pdf["sample_rate"]
            ):
                try:
                    if data is None:
                        continue
                    if fmt == "araw":
                        pcm = fx.decode_audio(bytes(data))
                    elif fmt == "wav":
                        from .wav import decode_wav

                        pcm, rate = decode_wav(bytes(data))
                    else:
                        continue
                    for h in fingerprints(pcm, int(rate)):
                        ids.append(audio_id)
                        fps.append(int(h))
                except (ValueError, zlib.error, struct.error,
                        IndexError, TypeError, MemoryError):
                    continue  # undecodable clip -> no landmarks
            yield pd.DataFrame({"audio_id": ids, "fp": fps})

    return audios.select(
        "audio_id", "bytes", "fmt", "sample_rate"
    ).mapInPandas(run, "audio_id string, fp long")
