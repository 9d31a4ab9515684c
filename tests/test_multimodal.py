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


def test_decode_stats_malformed_rows_yield_ok_false(spark):
    """Malformed / out-of-scope payloads (garbage JPEG, truncated PNG,
    PIL-needing webp) produce per-row ok=False — never a task crash."""
    from lopez_spark.ops.gif import encode_gif
    from lopez_spark.ops.png import encode_png

    good = fx.images_pandas(2)
    png = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    gif = encode_gif(
        [np.zeros((4, 4), dtype=np.uint8)],
        np.zeros((4, 3), dtype=np.uint8),
    )
    rows = [
        ("bad-jpeg", bytearray(b"\xff\xd8garbage"), 4, 4, "jpeg", 0),
        ("trunc-png", bytearray(png[: len(png) // 2]), 4, 4, "png", 0),
        ("webp", bytearray(b"RIFF....WEBP...."), 4, 4, "webp", 0),
        # empty SOS body -> IndexError inside the JPEG segment walk
        ("sos-empty", bytearray(b"\xff\xd8\xff\xda\x00\x02"), 4, 4, "jpeg", 0),
        # short DRI body -> struct.error
        ("dri-short", bytearray(b"\xff\xd8\xff\xdd\x00\x03\x01"), 4, 4, "jpeg", 0),
        ("trunc-gif", bytearray(gif[: len(gif) - 3]), 4, 4, "gif", 0),
    ] + [
        (r.image_id, bytearray(r.bytes), int(r.w), int(r.h), r.fmt, int(r.phash))
        for r in good.itertuples()
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, phash long"
    )
    got = {r["image_id"]: r for r in decode_stats(df).collect()}
    assert len(got) == 8
    for bad in ("bad-jpeg", "trunc-png", "webp", "sos-empty", "dri-short", "trunc-gif"):
        assert got[bad]["ok"] is False
    for g in good["image_id"]:
        assert got[g]["ok"] is True


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
    # png/jpeg/gif/bmp/webp/tiff are built-in codecs now and reject
    # garbage rather than mis-decoding it; formats without a built-in
    # decode (e.g. jp2) still document the PIL integration point
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_pixels(b"\x00\x00\x00\x0cjP  garbage", 4, 4, "jp2")
    with pytest.raises(ValueError):
        decode_pixels(b"II*\x00garbage", 4, 4, "tiff")
    with pytest.raises(ValueError, match="VP8L"):
        decode_pixels(b"RIFF\x04\x00\x00\x00WEBPXXXX", 4, 4, "webp")
    with pytest.raises(ValueError, match="signature"):
        decode_pixels(b"not a png", 4, 4, "png")
    with pytest.raises(ValueError, match="SOI"):
        decode_pixels(b"not a jpeg", 4, 4, "jpeg")


def test_jpeg_decode_applies_exif_orientation():
    import struct

    from lopez_spark.ops.jpeg import decode_jpeg, encode_jpeg
    from lopez_spark.ops.tiff import apply_orientation, invert_orientation

    px = fx.oracle_pixels(0)

    def exif_app1(orient: int) -> bytes:
        ifd = (
            struct.pack("<H", 1)
            + struct.pack("<HHI", 274, 3, 1)
            + struct.pack("<H", orient) + b"\x00\x00"
            + struct.pack("<I", 0)
        )
        tiff = b"II" + struct.pack("<H", 42) + struct.pack("<I", 8) + ifd
        body = b"Exif\x00\x00" + tiff
        return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body

    for o in (3, 6, 8):
        stored = np.ascontiguousarray(invert_orientation(px, o))
        d = encode_jpeg(stored, 98)
        d_exif = d[:2] + exif_app1(o) + d[2:]
        up = decode_pixels(d_exif, px.shape[1], px.shape[0], "jpeg")
        assert up.shape == px.shape  # quarter-turns restored
        assert np.array_equal(up, apply_orientation(decode_jpeg(d_exif), o))


def test_frame_sample_real_vraw_codec(spark):
    """frame_sample yields every-Nth frame, re-encoded losslessly: each
    sampled frame decodes back to the exact oracle frame, and composes
    with decode_stats-style downstream ops."""
    import pandas as pd

    from lopez_spark import fixtures as fx
    from lopez_spark.ops.multimodal import frame_sample

    rows = [fx.video_row(i, n_frames=8) for i in range(6)]
    videos = spark.createDataFrame(pd.DataFrame(rows))
    frames = frame_sample(videos, every_n=3).collect()
    assert len(frames) == 6 * 3  # frames 0, 3, 6 per video
    for r in frames:
        i = int(r["video_id"].split("-")[1])
        want = fx.oracle_video_frames(i, 8)[r["frame_no"]]
        got = fx.decode_image(bytes(r["bytes"]), r["w"], r["h"], "raw")
        assert (got == want).all()


def test_frame_sample_interframe_codecs_are_stubbed(spark):
    """Motion-JPEG mp4/avi now decode for real (ops/avi.py, ops/mp4.py);
    inter-frame codecs still raise naming the ffmpeg integration point:
    an avc1-entry MP4 refuses, and unknown container fmts (webm) stub."""
    import pandas as pd
    import pytest

    from lopez_spark import fixtures as fx
    from lopez_spark.ops.jpeg import encode_jpeg
    from lopez_spark.ops.mp4 import build_mp4_mjpeg
    from lopez_spark.ops.multimodal import frame_sample

    px = fx.oracle_pixels(0)
    data = bytearray(build_mp4_mjpeg([encode_jpeg(px, 90, "420")],
                                     px.shape[1], px.shape[0]))
    i = bytes(data).find(b"stsd") + 16
    data[i : i + 4] = b"avc1"
    videos = spark.createDataFrame(
        [("v", bytes(data), 0, 0, 0, "mp4")],
        "video_id string, bytes binary, w int, h int, n_frames int, fmt string",
    )
    with pytest.raises(Exception, match="ffmpeg"):
        frame_sample(videos).collect()

    row = fx.video_row(0)
    row["fmt"] = "webm"
    with pytest.raises(Exception, match="ffmpeg"):
        frame_sample(spark.createDataFrame(pd.DataFrame([row]))).collect()


def test_audio_features_match_numpy_oracle(spark):
    import numpy as np
    import pandas as pd

    from lopez_spark import fixtures as fx
    from lopez_spark.ops.multimodal import audio_features

    rows = [fx.audio_row(i) for i in range(5)]
    audios = spark.createDataFrame(pd.DataFrame(rows))
    got = {r["audio_id"]: r for r in audio_features(audios).collect()}
    assert len(got) == 5
    for i in range(5):
        pcm = fx.oracle_audio(i).astype(np.float64)
        r = got[f"aud-{i:08d}"]
        assert abs(r["rms"] - float(np.sqrt(np.mean(pcm**2)))) < 1e-9
        assert r["zero_crossings"] == int(np.count_nonzero(np.diff(np.signbit(pcm))))
        assert r["peak"] == int(np.max(np.abs(pcm)))
        assert r["n_samples"] == 4096


def test_jpeg_malformed_exif_still_decodes():
    """A JPEG whose pixel data decodes fine must not be rejected for a
    malformed or orientation-0 Exif APP1 block (common in the wild) —
    the decode path falls back to upright."""
    import struct

    from lopez_spark.ops.jpeg import decode_jpeg, encode_jpeg

    px = fx.oracle_pixels(1)
    d = encode_jpeg(np.ascontiguousarray(px), 95)
    ref = decode_jpeg(d)

    def app1(body: bytes) -> bytes:
        return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body

    garbage = d[:2] + app1(b"Exif\x00\x00not-a-tiff") + d[2:]
    ifd = (
        struct.pack("<H", 1)
        + struct.pack("<HHI", 274, 3, 1)
        + struct.pack("<H", 0)  # orientation 0 = "undefined"
        + b"\x00\x00"
        + struct.pack("<I", 0)
    )
    zero = d[:2] + app1(
        b"Exif\x00\x00" + b"II" + struct.pack("<H", 42)
        + struct.pack("<I", 8) + ifd
    ) + d[2:]
    for payload in (garbage, zero):
        got = decode_pixels(payload, px.shape[1], px.shape[0], "jpeg")
        assert np.array_equal(got, ref)


def test_scrub_metadata_stage(spark):
    """Arrow scrub stage: Exif/COM segments stripped, pixels intact,
    non-JPEG passthrough, garbage contained per-row."""
    import struct

    from lopez_spark.ops.jpeg import decode_jpeg, encode_jpeg
    from lopez_spark.ops.multimodal import scrub_metadata

    px = fx.oracle_pixels(4)
    clean = encode_jpeg(np.ascontiguousarray(px), 95)
    com = b"\xff\xfe" + struct.pack(">H", 8) + b"secret"
    tagged = clean[:2] + com + clean[2:]
    raw = fx.encode_image(px, "raw")
    df = spark.createDataFrame(
        [
            ("tagged", bytearray(tagged), "jpeg"),
            ("passthrough", bytearray(raw), "raw"),
            ("garbage", bytearray(b"not a jpeg"), "jpeg"),
        ],
        "image_id string, bytes binary, fmt string",
    )
    rows = {r["image_id"]: r for r in scrub_metadata(df).collect()}
    assert rows["tagged"]["ok"] and rows["tagged"]["n_removed"] == 1
    assert b"secret" not in bytes(rows["tagged"]["bytes"])
    assert np.array_equal(decode_jpeg(bytes(rows["tagged"]["bytes"])), decode_jpeg(clean))
    assert rows["passthrough"]["ok"] and rows["passthrough"]["n_removed"] == 0
    assert bytes(rows["passthrough"]["bytes"]) == raw
    assert rows["garbage"]["ok"] is False
