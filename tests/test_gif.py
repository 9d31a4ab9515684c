"""GIF codec (ops/gif.py) — pure-Python/numpy GIF87a/89a per the public
spec: variable-width LZW, 4-pass interlace, transparency, frame
disposal, local color tables, multi-frame compositing.

Reference counterpart: the parse step every fetched page passes
(lib-lopez/src/directives/mod.rs:58-70) — a real container format on
the decode path, not a fixture codec.
"""

from __future__ import annotations

import numpy as np
import pytest

from lopez_spark.ops.gif import _lzw_decode, _lzw_encode, decode_gif, encode_gif

PAL4 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)


def _pal256(rng):
    return rng.integers(0, 256, size=(256, 3)).astype(np.uint8)


# ------------------------------------------------------------------ LZW


@pytest.mark.parametrize("min_code", [2, 4, 8])
@pytest.mark.parametrize("n", [1, 7, 300, 20_000])
def test_lzw_roundtrip_random(min_code, n):
    rng = np.random.default_rng(min_code * 1000 + n)
    idx = rng.integers(0, 1 << min_code, size=n).astype(np.uint8)
    assert np.array_equal(_lzw_decode(_lzw_encode(idx, min_code), min_code, n), idx)


def test_lzw_roundtrip_through_dictionary_clear():
    # 120k random symbols at min_code=8 overflows the 4096-entry
    # dictionary several times — exercises clear-and-restart on both
    # sides and every code width 9..12.
    rng = np.random.default_rng(42)
    idx = rng.integers(0, 256, size=120_000).astype(np.uint8)
    assert np.array_equal(_lzw_decode(_lzw_encode(idx, 8), 8, len(idx)), idx)


def test_lzw_roundtrip_repetitive_kwkwk():
    # long runs force the KwKwK case (code == next_code)
    idx = np.tile(np.array([3, 3, 3, 3, 1, 1, 2], np.uint8), 500)
    assert np.array_equal(_lzw_decode(_lzw_encode(idx, 2), 2, len(idx)), idx)


def test_lzw_truncated_and_short_streams_raise():
    idx = np.arange(64, dtype=np.uint8) % 4
    enc = _lzw_encode(idx, 2)
    with pytest.raises(ValueError):
        _lzw_decode(enc[: len(enc) // 2], 2, len(idx))
    with pytest.raises(ValueError):
        _lzw_decode(enc, 2, len(idx) + 10)  # ends short of n_pixels


# ---------------------------------------------------------------- frames


def test_single_frame_roundtrip_256_colors():
    rng = np.random.default_rng(7)
    pal = _pal256(rng)
    img = rng.integers(0, 256, size=(64, 48)).astype(np.uint8)
    frames = decode_gif(encode_gif([img], pal))
    assert len(frames) == 1
    assert frames[0].shape == (64, 48, 3)
    assert np.array_equal(frames[0], pal[img])


def test_interlaced_roundtrip():
    rng = np.random.default_rng(8)
    pal = _pal256(rng)
    for h in (1, 2, 5, 33):  # odd heights hit partial interlace passes
        img = rng.integers(0, 256, size=(h, 17)).astype(np.uint8)
        assert np.array_equal(
            decode_gif(encode_gif([img], pal, interlace=True))[0], pal[img]
        )


def test_small_palette_min_code_clamp():
    # 2- and 4-color palettes clamp the LZW min code size to 2
    rng = np.random.default_rng(9)
    img = rng.integers(0, 2, size=(9, 11)).astype(np.uint8)
    pal2 = PAL4[:2]
    assert np.array_equal(decode_gif(encode_gif([img], pal2))[0], pal2[img])
    img4 = rng.integers(0, 4, size=(9, 11)).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif([img4], PAL4))[0], PAL4[img4])


def test_animation_transparency_and_disposal_restore_bg():
    f0 = np.zeros((10, 10), np.uint8)
    f1 = np.full((10, 10), 2, np.uint8)
    f1[3:6, 3:6] = 1
    data = encode_gif([f0, f1], PAL4, disposals=[2, 0], transparent=2)
    out = decode_gif(data)
    assert len(out) == 2
    # frame 1: index-2 pixels are transparent → background (index 0,
    # black, restored by frame 0's disposal=2) shows through
    expect = np.zeros((10, 10, 3), np.uint8)
    expect[3:6, 3:6] = PAL4[1]
    assert np.array_equal(out[1], expect)


def test_disposal_restore_previous():
    f0 = np.full((4, 4), 1, np.uint8)
    f1 = np.full((4, 4), 2, np.uint8)
    f2 = np.full((4, 4), 3, np.uint8)
    f2[0, 0] = 0
    # frame 1 disposes to previous: frame 2 composites over frame 0's
    # canvas, visible through its transparent index 3
    data = encode_gif([f0, f1, f2], PAL4, disposals=[0, 3, 0], transparent=3)
    out = decode_gif(data)
    expect = np.tile(PAL4[1], (4, 4, 1))
    expect[0, 0] = PAL4[0]
    assert np.array_equal(out[2], expect)


def test_max_frames_early_stop():
    frames = [np.full((5, 5), i, np.uint8) for i in range(3)]
    data = encode_gif(frames, PAL4)
    assert len(decode_gif(data, max_frames=1)) == 1
    assert len(decode_gif(data, max_frames=2)) == 2
    assert len(decode_gif(data)) == 3


def test_local_color_table_overrides_global():
    # hand-build: global table says red, local table says green
    rng = np.random.default_rng(10)
    img = np.ones((3, 3), np.uint8)
    data = bytearray(encode_gif([img], PAL4))
    # rewrite the image descriptor to carry a local color table:
    # descriptor starts right after header(13) + GCT(12 bytes)
    desc_at = 13 + 12
    assert data[desc_at] == 0x2C
    local = PAL4[[0, 2, 1, 3]]  # swap red/green
    data[desc_at + 9] |= 0x81  # LCT flag + size bits (4 entries = size 1)
    out = bytes(data[: desc_at + 10]) + local.tobytes() + bytes(data[desc_at + 10 :])
    assert np.array_equal(decode_gif(out)[0], np.tile(PAL4[2], (3, 3, 1)))


# --------------------------------------------------------------- errors


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"GIF89a",
        b"NOTGIF" + bytes(20),
        b"GIF89a" + bytes(7),  # truncated header
    ],
)
def test_malformed_header_raises(bad):
    with pytest.raises(ValueError):
        decode_gif(bad)


def test_truncated_stream_raises():
    rng = np.random.default_rng(11)
    data = encode_gif([rng.integers(0, 4, size=(20, 20)).astype(np.uint8)], PAL4)
    for cut in (20, len(data) // 2, len(data) - 5):
        with pytest.raises(ValueError):
            decode_gif(data[:cut])


def test_frame_exceeding_screen_raises():
    data = bytearray(encode_gif([np.zeros((4, 4), np.uint8)], PAL4))
    desc_at = 13 + 12
    data[desc_at + 5 : desc_at + 7] = (9).to_bytes(2, "little")  # iw 4→9
    with pytest.raises(ValueError):
        decode_gif(bytes(data))


def test_pixel_index_out_of_table_raises():
    # encode with a 256-entry palette, then shrink the GCT size bits so
    # indices overflow the declared table
    rng = np.random.default_rng(12)
    pal = _pal256(rng)
    img = np.full((4, 4), 200, np.uint8)
    data = bytearray(encode_gif([img], pal))
    with pytest.raises(ValueError):
        # drop GCT to 4 entries (lie about its size; stream then
        # misparses or indexes out of range — either raises ValueError)
        hdr = bytes(data[:10]) + bytes([0x81]) + bytes(data[11:13])
        decode_gif(hdr + data[13 : 13 + 12] + bytes(data[13 + 768 :]))


# ----------------------------------------------------------- properties


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31),
    interlace=st.booleans(),
)
def test_roundtrip_property(w, h, seed, interlace):
    rng = np.random.default_rng(seed)
    pal = _pal256(rng)
    img = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    out = decode_gif(encode_gif([img], pal, interlace=interlace))
    assert np.array_equal(out[0], pal[img])


# ----------------------------------------------------------- integration


def test_frame_sample_animated_gif(spark):
    import pandas as pd

    from lopez_spark import fixtures as fx
    from lopez_spark.ops.multimodal import frame_sample

    frames = [np.full((6, 5), i, np.uint8) for i in range(4)]
    data = encode_gif(frames, PAL4)
    videos = spark.createDataFrame(
        pd.DataFrame(
            [{"video_id": "g0", "bytes": bytearray(data), "w": 0, "h": 0,
              "n_frames": 0, "fmt": "gif"}]
        )
    )
    rows = frame_sample(videos, every_n=2).collect()
    assert [r["frame_no"] for r in rows] == [0, 2]
    # sampled frames decode through the fixture codec and match the
    # composited GIF frames
    for r, k in zip(rows, (0, 2)):
        px = fx.decode_image(bytes(r["bytes"]), r["w"], r["h"], "raw")
        assert (r["w"], r["h"]) == (5, 6)
        assert np.array_equal(px, PAL4[frames[k]])


def test_decode_pixels_gif_first_frame():
    from lopez_spark.ops.multimodal import decode_pixels

    rng = np.random.default_rng(13)
    pal = _pal256(rng)
    img = rng.integers(0, 256, size=(12, 9)).astype(np.uint8)
    data = encode_gif([img, np.roll(img, 2, axis=0)], pal)
    px = decode_pixels(data, 9, 12, "gif")
    assert np.array_equal(px, pal[img])
