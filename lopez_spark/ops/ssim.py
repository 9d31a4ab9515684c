"""Structural similarity (SSIM) — Wang, Bovik, Sheikh & Simoncelli,
"Image Quality Assessment: From Error Visibility to Structural
Similarity", IEEE TIP 2004 (public).  Pure numpy, fully vectorized:
Gaussian-weighted local statistics via two separable 1-D convolutions
(sliding_window_view + tensordot), no per-pixel Python.

Reference counterpart: the reference engine exposes page-level quality
signals on every fetched item (lib-lopez ``page_rank``/analyze outputs);
SSIM is the image-axis analogue — a perceptual quality score between an
image and a degraded version of itself, used by curation pipelines as a
detail/compressibility signal (flat or blurry images survive aggressive
re-compression nearly unchanged; detail-rich ones do not).

Determinism: float64 throughout with a fixed operation order, so the
executor-side Arrow stage and a driver-side recomputation of the same
function are bit-identical — which is what puts it on the value-hash
oracle gate (``image_ssim_detail``).
"""
from __future__ import annotations

import numpy as np

__all__ = ["gaussian_kernel1d", "ssim"]


def gaussian_kernel1d(win: int, sigma: float = 1.5) -> np.ndarray:
    """Normalized 1-D Gaussian taps (float64), centered on the window."""
    x = np.arange(win, dtype=np.float64) - (win - 1) / 2.0
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def _conv_valid(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable 'valid' 2-D convolution of a (h, w) float64 image with
    the symmetric 1-D kernel ``k`` applied along both axes."""
    win = k.shape[0]
    # rows: (h, w-win+1, win) . (win,) -> (h, w-win+1)
    r = np.lib.stride_tricks.sliding_window_view(img, win, axis=1) @ k
    # cols: (h-win+1, w', win) . (win,) -> (h-win+1, w')
    return np.lib.stride_tricks.sliding_window_view(r, win, axis=0) @ k


def ssim(a: np.ndarray, b: np.ndarray, win: int = 11, sigma: float = 1.5) -> float:
    """Mean SSIM between two same-shaped uint8 images on Rec.601 luma.

    Standard constants C1=(0.01*255)^2, C2=(0.03*255)^2; Gaussian
    window (default 11x11, sigma 1.5), 'valid' windows only.  For
    images smaller than the window the window shrinks to the smaller
    image side (odd-clamped), keeping the score well-defined on tiny
    fixtures; identical inputs score exactly 1.0.
    """
    if a.shape != b.shape:
        raise ValueError(f"ssim: shape mismatch {a.shape} vs {b.shape}")
    if a.ndim == 3:  # Rec.601 luma, same weights as fixtures.psnr-side stats
        w601 = np.array([0.299, 0.587, 0.114], dtype=np.float64)
        x = a.astype(np.float64) @ w601
        y = b.astype(np.float64) @ w601
    else:
        x = a.astype(np.float64)
        y = b.astype(np.float64)
    h, w = x.shape
    win = min(win, h, w)
    if win % 2 == 0:  # keep the window odd so it has a center tap
        win -= 1
    if win < 1:
        raise ValueError(f"ssim: degenerate image {x.shape}")
    k = gaussian_kernel1d(win, sigma)

    mu_x = _conv_valid(x, k)
    mu_y = _conv_valid(y, k)
    exx = _conv_valid(x * x, k)
    eyy = _conv_valid(y * y, k)
    exy = _conv_valid(x * y, k)
    var_x = exx - mu_x * mu_x
    var_y = eyy - mu_y * mu_y
    cov = exy - mu_x * mu_y

    c1 = (0.01 * 255.0) ** 2
    c2 = (0.03 * 255.0) ** 2
    num = (2.0 * mu_x * mu_y + c1) * (2.0 * cov + c2)
    den = (mu_x * mu_x + mu_y * mu_y + c1) * (var_x + var_y + c2)
    return float(np.mean(num / den))
