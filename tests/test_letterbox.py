"""Letterbox training-input prep (ops/multimodal.py::letterbox_pixels
/ bilinear_resize): geometry, interpolation, and the Arrow stage."""

from __future__ import annotations

import numpy as np
import pytest

from lopez_spark import fixtures as fx
from lopez_spark.ops.multimodal import bilinear_resize, letterbox_pixels


def test_bilinear_identity():
    px = fx.oracle_pixels(0)
    assert np.array_equal(bilinear_resize(px, px.shape[1], px.shape[0]), px)


def test_bilinear_constant_image_stays_constant():
    px = np.full((10, 14, 3), 77, np.uint8)
    out = bilinear_resize(px, 37, 23)
    assert out.shape == (23, 37, 3)
    assert np.all(out == 77)


def test_bilinear_2x_ramp_midpoints():
    # doubling a 1-D ramp with half-pixel centers puts interpolated
    # samples at .25/.75 between the sources
    px = np.zeros((1, 4, 3), np.uint8)
    px[0, :, :] = np.array([0, 40, 80, 120])[:, None]
    out = bilinear_resize(px, 8, 1)[0, :, 0]
    assert out.tolist() == [0, 10, 30, 50, 70, 90, 110, 120]


def test_letterbox_wide_image_pads_top_bottom():
    px = np.full((10, 40, 3), 200, np.uint8)
    lb, scale, pad_x, pad_y = letterbox_pixels(px, 32, 32, fill=0)
    assert lb.shape == (32, 32, 3)
    assert scale == pytest.approx(0.8)
    assert (pad_x, pad_y) == (0, 12)
    assert np.all(lb[:12] == 0) and np.all(lb[20:] == 0)
    assert np.all(lb[12:20] == 200)


def test_letterbox_tall_image_pads_left_right():
    px = np.full((40, 10, 3), 9, np.uint8)
    lb, scale, pad_x, pad_y = letterbox_pixels(px, 32, 32, fill=114)
    assert scale == pytest.approx(0.8)
    assert (pad_x, pad_y) == (12, 0)
    assert np.all(lb[:, :12] == 114) and np.all(lb[:, 20:] == 114)


def test_letterbox_exact_fit_no_pad():
    px = fx.oracle_pixels(3)
    h, w = px.shape[:2]
    lb, scale, pad_x, pad_y = letterbox_pixels(px, w, h)
    assert scale == pytest.approx(1.0)
    assert (pad_x, pad_y) == (0, 0)
    assert np.array_equal(lb, px)


def test_letterbox_upscales_small_images():
    px = np.full((4, 4, 3), 50, np.uint8)
    lb, scale, _, _ = letterbox_pixels(px, 16, 16)
    assert scale == pytest.approx(4.0)
    assert np.all(lb == 50)


def test_letterbox_arrow_stage(spark):
    from lopez_spark.ops.multimodal import letterbox

    rows = []
    want = {}
    for i in range(4):
        px = fx.oracle_pixels(i)
        img_id = fx.image_id_of(i)
        rows.append(
            (img_id, bytearray(fx.encode_image(px, "raw")),
             px.shape[1], px.shape[0], "raw")
        )
        want[img_id] = letterbox_pixels(px, 64, 48)
    rows.append(("bad", bytearray(b"x"), 4, 4, "jpeg"))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    got = {r["image_id"]: r for r in letterbox(df, 64, 48).collect()}
    assert got["bad"]["ok"] is False and got["bad"]["bytes"] is None
    for img_id, (lb, scale, pad_x, pad_y) in want.items():
        r = got[img_id]
        assert r["ok"] and (r["w"], r["h"], r["fmt"]) == (64, 48, "raw")
        assert r["scale"] == scale and (r["pad_x"], r["pad_y"]) == (pad_x, pad_y)
        assert np.array_equal(fx.decode_image(bytes(r["bytes"]), 64, 48, "raw"), lb)
