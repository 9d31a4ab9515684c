"""SSIM (ops/ssim.py, Wang et al. 2004) and the detail_score Arrow
stage: formula invariants, window adaptation, and per-row error
containment."""

from __future__ import annotations

import numpy as np
import pytest

from lopez_spark import fixtures as fx
from lopez_spark.ops.ssim import gaussian_kernel1d, ssim


def test_identical_images_score_exactly_one():
    px = fx.oracle_pixels(0)
    assert ssim(px, px) == 1.0


def test_symmetric():
    a = fx.oracle_pixels(1)
    rng = np.random.default_rng(7)
    b = np.clip(
        a.astype(np.int16) + rng.integers(-20, 21, a.shape), 0, 255
    ).astype(np.uint8)
    assert ssim(a, b) == pytest.approx(ssim(b, a), abs=1e-12)


def test_bounded_and_orders_degradation():
    from lopez_spark.ops.jpeg import decode_jpeg, encode_jpeg

    px = fx.oracle_pixels(2)
    s35 = ssim(px, decode_jpeg(encode_jpeg(px, 35)))
    s90 = ssim(px, decode_jpeg(encode_jpeg(px, 90)))
    assert 0.0 < s35 < s90 < 1.0


def test_flat_image_survives_recompression():
    from lopez_spark.ops.jpeg import decode_jpeg, encode_jpeg

    flat = np.full((32, 48, 3), 128, np.uint8)
    assert ssim(flat, decode_jpeg(encode_jpeg(flat, 35))) == pytest.approx(
        1.0, abs=1e-9
    )


def test_constant_offset_penalized_by_luminance_term():
    a = np.full((24, 24, 3), 100, np.uint8)
    b = np.full((24, 24, 3), 180, np.uint8)
    s = ssim(a, b)
    # luminance term: (2*100*180 + C1) / (100^2 + 180^2 + C1)
    c1 = (0.01 * 255.0) ** 2
    expect = (2 * 100.0 * 180.0 + c1) / (100.0**2 + 180.0**2 + c1)
    assert s == pytest.approx(expect, abs=1e-9)


@pytest.mark.parametrize("shape", [(3, 3), (1, 20), (7, 5), (11, 11)])
def test_window_shrinks_below_11(shape):
    rng = np.random.default_rng(shape[0] * 31 + shape[1])
    a = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    assert ssim(a, a) == 1.0


def test_grayscale_2d_input():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (30, 40), dtype=np.uint8)
    assert ssim(a, a) == 1.0
    b = 255 - a
    assert ssim(a, b) < 0.5


def test_shape_mismatch_raises():
    with pytest.raises(ValueError):
        ssim(np.zeros((4, 4, 3), np.uint8), np.zeros((4, 5, 3), np.uint8))


def test_gaussian_kernel_normalized_and_symmetric():
    k = gaussian_kernel1d(11)
    assert k.sum() == pytest.approx(1.0, abs=1e-12)
    assert np.allclose(k, k[::-1])
    assert k[5] == k.max()


def test_detail_score_arrow_stage(spark):
    """The mapInPandas stage matches the direct function call, and a
    malformed payload yields ok=False without killing the task."""
    from lopez_spark.ops.jpeg import decode_jpeg, encode_jpeg
    from lopez_spark.ops.multimodal import detail_score

    rows, want = [], {}
    for i in range(4):
        px = fx.oracle_pixels(i)
        img_id = fx.image_id_of(i)
        rows.append(
            (img_id, bytearray(fx.encode_image(px, "raw")),
             px.shape[1], px.shape[0], "raw")
        )
        want[img_id] = ssim(px, decode_jpeg(encode_jpeg(px, 35)))
    rows.append(("bad", bytearray(b"nope"), 8, 8, "png"))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    got = {r["image_id"]: r for r in detail_score(df, quality=35).collect()}
    assert len(got) == 5
    assert got["bad"]["ok"] is False and got["bad"]["ssim"] is None
    for img_id, s in want.items():
        assert got[img_id]["ok"] is True
        assert got[img_id]["ssim"] == s  # bit-identical float64 path
