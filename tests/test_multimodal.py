"""Multimodal ops: real decode path (raw/qraw), invariant machinery,
resize/embedding plumbing, stubbed external codecs."""

import numpy as np
import pytest

from lopez_spark import fixtures as fx
from lopez_spark.ops.multimodal import (
    decode_pixels,
    decode_stats,
    frame_sample,
    pixel_embedding,
    resize,
)


@pytest.fixture(scope="module")
def images(spark):
    return spark.createDataFrame(fx.images_pandas(30)).persist()


def test_decode_stats_invariant(spark, images):
    rows = decode_stats(images).collect()
    assert len(rows) == 30
    assert all(r["ok"] for r in rows)
    assert all(r["phash_matches"] for r in rows), "decoded-pixel hash must match stored phash"
    # lossless rows re-encode exactly; lossy rows still >= 40 dB
    assert min(r["psnr_db"] for r in rows) >= 40.0


def test_resize_shapes(spark, images):
    out = resize(images, 8, 8).collect()
    assert len(out) == 30
    for r in out:
        px = fx.decode_image(bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
        assert px.shape == (8, 8, 3)


def test_pixel_embedding(spark, images):
    vecs = {r["image_id"]: r["embedding"] for r in pixel_embedding(images).collect()}
    assert len(vecs) == 30
    v = np.array(vecs[fx.image_id_of(0)])
    assert v.shape == (64,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    # deterministic
    v2 = {r["image_id"]: r["embedding"] for r in pixel_embedding(images).collect()}
    assert vecs[fx.image_id_of(5)] == v2[fx.image_id_of(5)]


def test_unknown_fmt_is_stubbed():
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_pixels(b"\x89PNG...", 4, 4, "png")


def test_frame_sample_stub(spark, images):
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        frame_sample(images)
