"""Seeded image augmentation (ops/multimodal.py::augment) — the
reproducible-training contract: parameters are a pure function of
image_id, pixel math is integer-exact."""

from __future__ import annotations

import numpy as np

from lopez_spark import fixtures as fx
from lopez_spark.hashing import xxhash64
from lopez_spark.ops.multimodal import (
    augment,
    augment_params,
    augment_pixels,
)


def test_params_deterministic_and_bounded():
    for i in range(50):
        iid = fx.image_id_of(i)
        w = 16 + i % 40
        h = 20 + i % 30
        p1 = augment_params(iid, w, h)
        assert p1 == augment_params(iid, w, h)
        flipped, x0, y0, cw, ch, be3 = p1
        assert 0 <= x0 <= w - cw and 0 <= y0 <= h - ch
        assert w - w // 4 <= cw <= w and h - h // 4 <= ch <= h
        assert 800 <= be3 <= 1200
        assert isinstance(flipped, bool)


def test_pixels_hand_worked():
    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    # crop (1,1)-(3,3), flip, brightness 2.0 (clamps)
    out = augment_pixels(px, (True, 1, 1, 2, 2, 2000))
    expect = px[1:3, 1:3][:, ::-1].astype(np.uint32) * 2
    expect = np.minimum(expect, 255).astype(np.uint8)
    assert np.array_equal(out, expect)


def test_brightness_integer_semantics():
    px = np.full((1, 1, 3), 100, dtype=np.uint8)
    # 100 * 999 // 1000 = 99 (floor, not round)
    out = augment_pixels(px, (False, 0, 0, 1, 1, 999))
    assert out[0, 0, 0] == 99


def test_spark_stage_matches_replica(spark):
    n = 10
    rows = {r.image_id: r for r in augment(fx.images_df(spark, n, 2)).collect()}
    for i in range(n):
        r = fx.image_row(i)
        px = fx.decode_image(r.bytes, r.w, r.h, r.fmt)
        params = augment_params(r.image_id, r.w, r.h)
        aug = augment_pixels(px, params)
        got = rows[r.image_id]
        assert got.ok
        assert got.aug_hash == xxhash64(np.ascontiguousarray(aug).tobytes())
        # output payload round-trips to the same pixels
        back = fx.decode_image(
            bytes(got.bytes), got.crop_w, got.crop_h, "raw"
        )
        assert np.array_equal(back, aug)


def test_garbage_contained(spark):
    bad = spark.createDataFrame(
        [("garbage", bytearray(b"\x00nope"), 8, 8, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = augment(bad).collect()
    assert len(rows) == 1 and rows[0].ok is False
