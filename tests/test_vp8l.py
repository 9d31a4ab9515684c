"""Lossless-WebP / VP8L codec (ops/vp8l.py) — RFC 9649 §3: prefix
codes, LZ77 + color cache, meta prefix groups, and the four transforms
(predictor, cross-color, subtract-green, color-indexing+bundling).

Reference counterpart: the parse step every fetched page passes
(lib-lopez/src/directives/mod.rs:58-70) — a real container format on
the decode path, not a fixture codec.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lopez_spark.ops.vp8l import (
    _DIST_MAP,
    _BitWriter,
    _prefix_encode,
    _write_prefix_code,
    decode_webp,
    encode_webp,
)


def _rgb(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


# ----------------------------------------------------------- round trips


def test_distance_map_matches_spec_prefix():
    assert len(_DIST_MAP) == 120
    assert _DIST_MAP[:18] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
        (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
        (0, 3), (3, 0), (1, 3), (-1, 3), (3, 1), (-3, 1),
    ]


@pytest.mark.parametrize("w,h", [(1, 1), (3, 5), (16, 16), (31, 17)])
def test_roundtrip_literals(w, h):
    rng = np.random.default_rng(w * 100 + h)
    px = _rgb(rng, h, w)
    out = decode_webp(encode_webp(px))
    assert out.shape == (h, w, 4)
    assert np.array_equal(out[..., :3], px)
    assert (out[..., 3] == 255).all()


def test_roundtrip_rgba_alpha():
    rng = np.random.default_rng(9)
    rgba = rng.integers(0, 256, size=(6, 7, 4)).astype(np.uint8)
    assert np.array_equal(decode_webp(encode_webp(rgba)), rgba)


def test_roundtrip_lz77_and_cache():
    img = np.zeros((16, 16, 3), np.uint8)
    img[4:9] = [10, 200, 30]
    img[:, 3] = 7
    for kw in ({"use_lz77": True}, {"cache_bits": 4},
               {"use_lz77": True, "cache_bits": 6}):
        assert np.array_equal(decode_webp(encode_webp(img, **kw))[..., :3], img)


@pytest.mark.parametrize("mode", range(14))
def test_roundtrip_all_predictor_modes(mode):
    rng = np.random.default_rng(mode)
    px = _rgb(rng, 13, 11)
    got = decode_webp(encode_webp(px, predictor=mode, transform_bits=2))
    assert np.array_equal(got[..., :3], px)


def test_roundtrip_cross_color_and_composition():
    rng = np.random.default_rng(3)
    px = _rgb(rng, 12, 10)
    assert np.array_equal(
        decode_webp(encode_webp(px, color=(43, 210, 17)))[..., :3], px
    )
    assert np.array_equal(
        decode_webp(
            encode_webp(px, predictor=11, color=(5, 6, 7),
                        subtract_green=True, transform_bits=2)
        )[..., :3],
        px,
    )


def test_roundtrip_subtract_green():
    rng = np.random.default_rng(4)
    px = _rgb(rng, 8, 21)
    assert np.array_equal(
        decode_webp(encode_webp(px, subtract_green=True))[..., :3], px
    )


@pytest.mark.parametrize("n_values", [2, 3, 11, 64])
def test_roundtrip_palette_bundling(n_values):
    # distinct-pixel counts straddle every bundling width (8/4/2/1 px
    # per green byte)
    rng = np.random.default_rng(n_values)
    vals = rng.integers(0, 256, size=(n_values, 3)).astype(np.uint8)
    idx = rng.integers(0, n_values, size=(9, 30))
    px = vals[idx]
    assert np.array_equal(decode_webp(encode_webp(px, palette=True))[..., :3], px)


def test_palette_requires_256_colors():
    rng = np.random.default_rng(5)
    with pytest.raises(ValueError):
        encode_webp(_rgb(rng, 64, 64), palette=True)


# ----------------------------------------- handcrafted decoder-only paths


def _vp8l_container(bits: bytes) -> bytes:
    body = b"\x2f" + bits
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _write_literal_codes(bw, g, r, b, a):
    """Single-symbol trees for a constant-pixel group."""
    for alphabet, sym in ((280, g), (256, r), (256, b), (256, a), (40, 0)):
        lengths = [0] * alphabet
        lengths[sym] = 1
        _write_prefix_code(bw, lengths)


def test_decode_meta_prefix_groups():
    # 8x2 image, meta_bits=2 -> meta image 2x1: group 0 for x<4 (green
    # 50), group 1 for x>=4 (green 99); all pixels literal.
    bw = _BitWriter()
    bw.write(7, 14)   # w-1
    bw.write(1, 14)   # h-1
    bw.write(0, 1)    # alpha hint
    bw.write(0, 3)    # version
    bw.write(0, 1)    # no transforms
    bw.write(0, 1)    # no color cache
    bw.write(1, 1)    # meta prefix codes present
    bw.write(0, 3)    # meta_bits = 2
    # meta image (2x1, level!=0): no cache bit, then 5 trees; green
    # needs symbols {0, 1} (group ids), others single-symbol
    bw.write(0, 1)
    g_lengths = [0] * 280
    g_lengths[0] = g_lengths[1] = 1
    gcode = _write_prefix_code(bw, g_lengths)
    for alphabet, sym in ((256, 0), (256, 0), (256, 0), (40, 0)):
        lengths = [0] * alphabet
        lengths[sym] = 1
        _write_prefix_code(bw, lengths)
    gcode.write(bw, 0)  # meta pixel (0,0): group 0
    gcode.write(bw, 1)  # meta pixel (1,0): group 1
    # two literal groups, constant green 50 / 99
    _write_literal_codes(bw, 50, 10, 20, 255)
    _write_literal_codes(bw, 99, 30, 40, 255)
    # 16 pixels: trees are all single-symbol -> zero data bits needed
    out = decode_webp(_vp8l_container(bw.bytes()))
    assert out.shape == (2, 8, 4)
    assert (out[:, :4] == [10, 50, 20, 255]).all()
    assert (out[:, 4:] == [30, 99, 40, 255]).all()


def test_decode_2d_distance_code():
    # 4x3 image: first row = 4 literals, then one backward reference of
    # length 8 at plane code 1 = (0, 1) -> distance = xsize (copy the
    # row above), exercising the 2-D distance map.
    bw = _BitWriter()
    bw.write(3, 14)
    bw.write(2, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # complete code: two len-2 symbols (1/2) + four len-3 (1/2)
    g_lengths = [0] * 280
    g_lengths[11] = g_lengths[22] = 2
    g_lengths[33] = g_lengths[44] = 3
    g_lengths[0] = 3
    g_lengths[256 + _prefix_encode(8)[0]] = 3
    gcode = _write_prefix_code(bw, g_lengths)
    rcode = _write_prefix_code(bw, [1 if s in (7, 9) else 0 for s in range(256)])
    bcode = _write_prefix_code(bw, [1 if s in (5, 6) else 0 for s in range(256)])
    acode = _write_prefix_code(bw, [0] * 255 + [1])
    d_lengths = [0] * 40
    d_lengths[_prefix_encode(1)[0]] = 1
    d_lengths[_prefix_encode(2)[0]] = 1
    dcode = _write_prefix_code(bw, d_lengths)
    row = [(11, 7, 5), (22, 9, 6), (33, 7, 6), (44, 9, 5)]
    for g, r, b in row:
        gcode.write(bw, g)
        rcode.write(bw, r)
        bcode.write(bw, b)
        acode.write(bw, 255)
    code, extra, nbits = _prefix_encode(8)
    gcode.write(bw, 256 + code)
    bw.write(extra, nbits)
    dc, de, dn = _prefix_encode(1)  # plane code 1 = (0, 1)
    dcode.write(bw, dc)
    bw.write(de, dn)
    out = decode_webp(_vp8l_container(bw.bytes()))
    first = np.array([[r, g, b, 255] for g, r, b in row], np.uint8)
    assert np.array_equal(out[0], first)
    assert np.array_equal(out[1], first)  # copied via distance = xsize
    assert np.array_equal(out[2], first)


# ----------------------------------------------------------- properties


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    seed=st.integers(0, 2**31),
    sg=st.booleans(),
    pred=st.one_of(st.none(), st.integers(0, 13)),
    lz=st.booleans(),
    cache=st.sampled_from([0, 3, 7]),
)
def test_roundtrip_property(w, h, seed, sg, pred, lz, cache):
    rng = np.random.default_rng(seed)
    # low-entropy palette-ish content exercises runs and cache hits
    px = (rng.integers(0, 5, size=(h, w, 3)) * 60).astype(np.uint8)
    data = encode_webp(
        px, subtract_green=sg, predictor=pred, use_lz77=lz,
        cache_bits=cache, transform_bits=2,
    )
    assert np.array_equal(decode_webp(data)[..., :3], px)


# --------------------------------------------------------------- errors


@pytest.mark.parametrize(
    "bad",
    [b"", b"RIFF", b"RIFF\x00\x00\x00\x00WEBX" + bytes(8), b"RIFF\x10\x00\x00\x00WEBPXXXX\x04\x00\x00\x00abcd"],
)
def test_garbage_raises(bad):
    with pytest.raises(ValueError):
        decode_webp(bad)


def test_truncated_stream_raises():
    rng = np.random.default_rng(6)
    data = encode_webp(_rgb(rng, 20, 20))
    for cut in (14, 20, len(data) // 2):
        with pytest.raises(ValueError):
            decode_webp(data[:cut] if cut > 20 else data[:12] + data[12:cut])


def test_lossy_vp8_raises_with_reason():
    body = bytes([0, 0, 0]) + b"\x9d\x01\x2a" + struct.pack("<HH", 4, 4)
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    with pytest.raises(ValueError, match="external codec"):
        decode_webp(data)


# ----------------------------------------------------------- integration


def test_decode_pixels_webp():
    from lopez_spark.ops.multimodal import decode_pixels

    rng = np.random.default_rng(8)
    px = _rgb(rng, 10, 14)
    data = encode_webp(px, subtract_green=True)
    assert np.array_equal(decode_pixels(data, 14, 10, "webp"), px)


def test_probe_and_decode_agree_on_dims():
    from lopez_spark.ops.container_probe import probe_webp

    rng = np.random.default_rng(10)
    px = _rgb(rng, 21, 5)
    data = encode_webp(px)
    m = probe_webp(data)
    assert (m["width"], m["height"], m["codec"]) == (5, 21, "VP8L")
