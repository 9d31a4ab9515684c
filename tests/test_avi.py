"""MJPEG-in-AVI: container round-trip, probe, skip-decode sampling,
PSNR through the real JPEG codec, and per-row error containment."""

import numpy as np
import pytest

from lopez_spark import fixtures as fx
from lopez_spark.ops.avi import build_avi, iter_avi_frames, probe_avi
from lopez_spark.ops.jpeg import decode_jpeg, encode_jpeg


def _video(n=4, q=90, subsampling="420"):
    base = fx.oracle_pixels(0)
    pxs = [np.roll(base, 5 * i, axis=1) for i in range(n)]
    h, w = base.shape[:2]
    frames = [encode_jpeg(p, q, subsampling) for p in pxs]
    return pxs, frames, w, h


def test_roundtrip_and_probe():
    pxs, frames, w, h = _video(5)
    data = build_avi(frames, w, h, fps=25)
    m = probe_avi(data)
    assert m == {
        "n_frames": 5, "width": w, "height": h, "codec": "MJPG", "fps": 25.0
    }
    got = list(iter_avi_frames(data))
    assert got == frames  # payloads byte-identical through the container


def test_malformed_raises():
    with pytest.raises(ValueError):
        probe_avi(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        probe_avi(b"garbage!" * 16)
    data = build_avi([b"x" * 100], 4, 4)
    with pytest.raises(ValueError):
        list(iter_avi_frames(data[:40]))  # truncated mid-chunk
    with pytest.raises(ValueError):
        build_avi([], 4, 4)


def test_frame_decode_psnr_and_skip_decode(spark):
    """Sampled frames decode to PSNR>=40 dB vs the originals; a
    corrupted NON-sampled frame never breaks the sampled ones (the
    skip-decode property: unsampled chunks are never parsed)."""
    from lopez_spark.ops.multimodal import frame_sample

    # q98 4:4:4 is the repo's PSNR>=40dB lossy invariant regime (the
    # noise-heavy fixture pixels defeat chroma subsampling by design)
    pxs, frames, w, h = _video(4, q=98, subsampling="444")
    good = build_avi(frames, w, h)
    corrupt = frames.copy()
    corrupt[1] = b"\xff\xd8 not really a jpeg \xff\xd9"  # frame 1: skipped
    tricky = build_avi(corrupt, w, h)
    df = spark.createDataFrame(
        [
            ("good", bytearray(good), w, h, 4, "avi"),
            ("tricky", bytearray(tricky), w, h, 4, "avi"),
            ("bad", bytearray(b"not an avi" * 30), 0, 0, 0, "avi"),
            ("nul", None, 0, 0, 0, "avi"),
        ],
        "video_id string, bytes binary, w int, h int, n_frames int, fmt string",
    )
    rows = frame_sample(df, every_n=2).collect()
    by = {}
    for r in rows:
        by.setdefault(r["video_id"], []).append(r)
    assert [r["frame_no"] for r in sorted(by["good"], key=lambda r: r["frame_no"])] == [0, 2]
    assert [r["frame_no"] for r in sorted(by["tricky"], key=lambda r: r["frame_no"])] == [0, 2]
    assert [r["frame_no"] for r in by["bad"]] == [-1]
    assert [r["frame_no"] for r in by["nul"]] == [-1]
    for r in by["good"]:
        px = fx.decode_image(bytes(r["bytes"]), r["w"], r["h"], "raw")
        ref = pxs[r["frame_no"]].astype(np.float64)
        mse = np.mean((px.astype(np.float64) - ref) ** 2)
        psnr = 10 * np.log10(255.0**2 / mse) if mse else np.inf
        assert psnr >= 40.0, (r["frame_no"], psnr)


def test_container_metadata_avi_row(spark):
    from lopez_spark.ops.multimodal import container_metadata

    pxs, frames, w, h = _video(3)
    df = spark.createDataFrame(
        [
            ("v0", bytearray(build_avi(frames, w, h, fps=10)), "avi"),
            ("vbad", bytearray(b"RIFFxxxxAVI " + b"\x00" * 30), "avi"),
        ],
        "media_id string, bytes binary, fmt string",
    )
    rows = {r["media_id"]: r for r in container_metadata(df).collect()}
    r = rows["v0"]
    assert r["ok"] and r["codec"] == "avi:MJPG:3f"
    assert (r["width"], r["height"]) == (w, h)
    assert abs(r["duration_s"] - 0.3) < 1e-9
    assert not rows["vbad"]["ok"] and rows["vbad"]["err"]
