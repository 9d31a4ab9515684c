"""Log-mel spectrogram — the standard speech/audio training front-end
(Davis & Mermelstein 1980 mel-frequency analysis; the HTK mel scale
``m = 2595·log10(1 + f/700)`` and triangular filterbank are public and
ubiquitous: HTK Book §5.4, librosa/Kaldi defaults).  Pure numpy, fully
vectorized: strided framing + one batched rFFT + one matmul against the
filterbank — no per-sample Python.

Reference counterpart: the reference engine runs a parse/analyze step
over every fetched payload (lib-lopez ``page/mod.rs`` analyze outputs);
this is the audio-axis analogue — the feature tensor an audio-training
pipeline extracts from every clip before batching.

Determinism: float64 throughout with a fixed operation order, so the
executor-side Arrow stage and a driver-side recomputation of the same
function are bit-identical — which is what puts it on the value-hash
oracle gate (``multimodal_audio_logmel``).
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "hann_window", "mel_filterbank", "logmel", "mfcc", "logmel_stats",
]


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann taps (the analysis-window convention for STFT):
    ``0.5 - 0.5·cos(2πk/n)``, float64."""
    k = np.arange(n, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * k / float(n))


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_mels: int, n_fft: int, rate: int, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """Triangular HTK-mel filterbank, shape (n_mels, n_fft//2 + 1):
    ``n_mels + 2`` points equally spaced on the mel axis between fmin
    and fmax (default Nyquist); filter j rises over [p_j, p_j+1] and
    falls over [p_j+1, p_j+2] in Hz against the rFFT bin centers."""
    if fmax is None:
        fmax = rate / 2.0
    pts_hz = _mel_to_hz(
        np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    )
    bins_hz = np.arange(n_fft // 2 + 1, dtype=np.float64) * (rate / float(n_fft))
    lo = pts_hz[:-2][:, None]
    mid = pts_hz[1:-1][:, None]
    hi = pts_hz[2:][:, None]
    up = (bins_hz[None, :] - lo) / np.maximum(mid - lo, 1e-12)
    down = (hi - bins_hz[None, :]) / np.maximum(hi - mid, 1e-12)
    return np.clip(np.minimum(up, down), 0.0, None)


def logmel(
    pcm: np.ndarray,
    rate: int,
    n_fft: int = 512,
    hop: int = 256,
    n_mels: int = 32,
) -> np.ndarray:
    """Mono PCM → log10 mel-power frames, shape (n_frames, n_mels),
    float64.  Integer input is int16-range and rescaled by 1/32768;
    float input is taken as already-normalized [-1, 1] (the
    librosa/soundfile convention) and used as-is.  No centering/
    padding: frames are the complete ``n_fft``-sample windows at
    stride ``hop`` (a clip shorter than one window yields zero frames,
    never an error)."""
    pcm = np.asarray(pcm)
    if np.issubdtype(pcm.dtype, np.integer):
        x = pcm.astype(np.float64) / 32768.0
    else:
        x = pcm.astype(np.float64)
    if x.shape[0] < n_fft:
        return np.zeros((0, n_mels), dtype=np.float64)
    frames = np.lib.stride_tricks.sliding_window_view(x, n_fft)[::hop]
    spec = np.fft.rfft(frames * hann_window(n_fft)[None, :], axis=1)
    power = spec.real * spec.real + spec.imag * spec.imag
    mel = power @ mel_filterbank(n_mels, n_fft, rate).T
    return np.log10(mel + 1e-10)


def _dct2_ortho(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II basis, shape (n_out, n_in):
    ``C[k,j] = s_k·cos(π·k·(2j+1)/(2·n_in))`` with ``s_0 = √(1/n)``,
    ``s_k = √(2/n)`` — rows are orthonormal (pinned by test)."""
    k = np.arange(n_out, dtype=np.float64)[:, None]
    j = np.arange(n_in, dtype=np.float64)[None, :]
    c = np.cos(np.pi * k * (2.0 * j + 1.0) / (2.0 * n_in))
    c[0] *= np.sqrt(1.0 / n_in)
    c[1:] *= np.sqrt(2.0 / n_in)
    return c


def mfcc(
    pcm: np.ndarray,
    rate: int,
    n_mfcc: int = 13,
    n_fft: int = 512,
    hop: int = 256,
    n_mels: int = 32,
) -> np.ndarray:
    """Mel-frequency cepstral coefficients: orthonormal DCT-II of the
    log-mel frames, shape (n_frames, n_mfcc) — the classic compact
    speech feature (Davis & Mermelstein 1980)."""
    lm = logmel(pcm, rate, n_fft=n_fft, hop=hop, n_mels=n_mels)
    return lm @ _dct2_ortho(n_mfcc, n_mels).T


def logmel_stats(
    pcm: np.ndarray, rate: int, n_fft: int = 512, hop: int = 256, n_mels: int = 32
) -> dict:
    """Integer summary of the log-mel tensor for the value-hash gate:
    frame count, the dominant mel band (argmax of the per-band mean —
    ties break to the lowest band), mean/max log-energies, and the
    mean first cepstral coefficient (MFCC c1 — spectral tilt), all
    scaled by 10^3 (round-half-even on bit-identical float64)."""
    lm = logmel(pcm, rate, n_fft=n_fft, hop=hop, n_mels=n_mels)
    if lm.shape[0] == 0:
        return {
            "n_frames": 0,
            "n_mels": n_mels,
            "dominant_mel": -1,
            "mean_e3": 0,
            "max_e3": 0,
            "mfcc1_e3": 0,
        }
    band_mean = lm.mean(axis=0)
    c1 = lm @ _dct2_ortho(2, n_mels)[1]
    return {
        "n_frames": int(lm.shape[0]),
        "n_mels": n_mels,
        "dominant_mel": int(np.argmax(band_mean)),
        "mean_e3": int(round(float(lm.mean()) * 1000.0)),
        "max_e3": int(round(float(lm.max()) * 1000.0)),
        "mfcc1_e3": int(round(float(c1.mean()) * 1000.0)),
    }
