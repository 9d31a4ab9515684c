"""Image-quality curation features (ops/multimodal.py):
variance-of-Laplacian blur, luma entropy, Hasler-Süsstrunk
colorfulness — closed-form cases and the Arrow stage."""

from __future__ import annotations

import numpy as np
import pytest

from lopez_spark import fixtures as fx
from lopez_spark.ops.multimodal import (
    colorfulness_hs,
    laplacian_variance,
    luma_entropy_bits,
)


def test_flat_image_scores_zero_everywhere():
    flat = np.full((16, 16, 3), 123, np.uint8)
    assert laplacian_variance(flat) == 0.0
    assert luma_entropy_bits(flat) == 0.0
    assert colorfulness_hs(flat) == pytest.approx(
        0.3 * np.sqrt(0.0**2 + (0.5 * (123 + 123) - 123) ** 2), abs=1e-12
    )


def test_grayscale_colorfulness_zero():
    rng = np.random.default_rng(1)
    g = rng.integers(0, 256, (20, 20), dtype=np.uint8)
    px = np.stack([g, g, g], axis=-1)
    assert colorfulness_hs(px) == 0.0


def test_checkerboard_known_entropy_and_blur():
    # 2-value checkerboard: entropy exactly 1 bit; Laplacian response
    # alternates ±4*d on interior pixels → variance = 16*d^2 exactly
    d = 100.0
    board = np.indices((8, 8)).sum(axis=0) % 2
    px = (board * int(d)).astype(np.uint8)[..., None].repeat(3, axis=-1)
    assert luma_entropy_bits(px) == pytest.approx(1.0, abs=1e-12)
    assert laplacian_variance(px) == pytest.approx(16 * d * d, rel=1e-12)


def test_blur_orders_sharp_vs_smoothed():
    rng = np.random.default_rng(2)
    sharp = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    # 3x3 box blur of the same content
    f = sharp.astype(np.float64)
    sm = (
        f[:-2, :-2] + f[:-2, 1:-1] + f[:-2, 2:]
        + f[1:-1, :-2] + f[1:-1, 1:-1] + f[1:-1, 2:]
        + f[2:, :-2] + f[2:, 1:-1] + f[2:, 2:]
    ) / 9.0
    blurred = np.clip(sm, 0, 255).astype(np.uint8)
    assert laplacian_variance(blurred) < 0.25 * laplacian_variance(sharp)


def test_tiny_image_blur_zero():
    assert laplacian_variance(np.zeros((2, 9, 3), np.uint8)) == 0.0


def test_full_range_ramp_entropy_8_bits():
    y = np.tile(np.arange(256, dtype=np.uint8), (4, 1))
    px = np.stack([y, y, y], axis=-1)
    assert luma_entropy_bits(px) == pytest.approx(8.0, abs=1e-12)


def test_quality_features_arrow_stage(spark):
    from lopez_spark.ops.multimodal import quality_features

    rows, want = [], {}
    for i in range(3):
        px = fx.oracle_pixels(i)
        img_id = fx.image_id_of(i)
        rows.append(
            (img_id, bytearray(fx.encode_image(px, "raw")),
             px.shape[1], px.shape[0], "raw")
        )
        want[img_id] = (
            laplacian_variance(px), luma_entropy_bits(px), colorfulness_hs(px)
        )
    rows.append(("bad", bytearray(b"junk"), 4, 4, "webp"))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    got = {r["image_id"]: r for r in quality_features(df).collect()}
    assert got["bad"]["ok"] is False and got["bad"]["blur_var"] is None
    for img_id, (blur, ent, col) in want.items():
        r = got[img_id]
        assert r["ok"] is True
        # bit-identical float64 paths driver vs executor
        assert (r["blur_var"], r["entropy_bits"], r["colorfulness"]) == (
            blur, ent, col
        )
