"""The built-in PNG codec (ops/png.py): real container-format decode
without PIL — roundtrips, all five scanline filters, gray/RGBA color
types, corruption detection, and the Spark decode_stats path."""

import struct
import zlib

import numpy as np
import pytest

from lopez_spark.ops.png import _SIG, _chunk, decode_png, encode_png


def _rand(h, w, seed):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter(ftype):
    px = _rand(13, 17, 100 + ftype)
    out = decode_png(encode_png(px, filter_type=ftype))
    assert np.array_equal(out, px), f"filter {ftype}"


def test_roundtrip_extreme_shapes():
    for h, w, seed in ((1, 1, 1), (1, 64, 2), (64, 1, 3), (40, 40, 4)):
        px = _rand(h, w, seed)
        assert np.array_equal(decode_png(encode_png(px, 4)), px)


def _raw_png(w, h, ctype, channels, pixel_bytes):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = bytearray()
    stride = w * channels
    for y in range(h):
        raw.append(0)
        raw.extend(pixel_bytes[y * stride : (y + 1) * stride])
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_grayscale_broadcasts_to_rgb():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = decode_png(_raw_png(4, 3, 0, 1, g.tobytes()))
    assert out.shape == (3, 4, 3)
    assert np.array_equal(out[:, :, 0], g)
    assert np.array_equal(out[:, :, 1], g)


def test_rgba_drops_alpha():
    rgba = np.random.default_rng(7).integers(0, 256, (5, 6, 4), dtype=np.uint8)
    out = decode_png(_raw_png(6, 5, 6, 4, rgba.tobytes()))
    assert np.array_equal(out, rgba[:, :, :3])


def test_crc_corruption_raises():
    data = bytearray(encode_png(_rand(4, 4, 9)))
    data[len(_SIG) + 8 + 3] ^= 0xFF  # flip a byte inside IHDR
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_interlaced_truncated_raises():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)  # interlace=1, no IDAT
    data = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises((ValueError, zlib.error)):
        decode_png(data)


def test_adam7_interlaced_roundtrip():
    """Adam7 streams (seven independently filtered passes) decode to
    exactly the straight-scan pixels, for every filter type."""
    for h, w in ((1, 1), (7, 9), (16, 16), (17, 23)):
        img = _rand(h, w, h * 41 + w)
        for ft in range(5):
            assert np.array_equal(
                img, decode_png(encode_png(img, ft, interlace=True))
            )


def test_full_color_type_depth_matrix():
    """Every defined (color type, bit depth) pair decodes: palette via
    PLTE, 16-bit high-byte reduction, sub-byte grayscale scaling,
    alpha dropped — straight and Adam7."""
    from lopez_spark.ops.png import encode_png_adv

    rng = np.random.default_rng(5)
    cases = [(0, d) for d in (1, 2, 4, 8, 16)] + [(2, 8), (2, 16)]
    cases += [(3, d) for d in (1, 2, 4, 8)] + [(4, 8), (4, 16), (6, 8), (6, 16)]
    for ctype, depth in cases:
        ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
        hi = min(1 << depth, 5) if ctype == 3 else 1 << depth
        samples = rng.integers(0, hi, (9, 7, ch), dtype=np.int64)
        pal = rng.integers(0, 256, (5, 3), dtype=np.uint8) if ctype == 3 else None
        for il in (False, True):
            out = decode_png(encode_png_adv(samples, depth, ctype, pal, interlace=il))
            if ctype == 3:
                exp = pal[samples[:, :, 0]]
            elif ctype in (0, 4):
                g = samples[:, :, 0]
                if depth < 8:
                    g = (g.astype(np.uint16) * 255 // ((1 << depth) - 1))
                elif depth == 16:
                    g = g >> 8
                exp = np.repeat(g.astype(np.uint8)[:, :, None], 3, axis=2)
            else:
                s = samples[:, :, :3]
                exp = (s >> 8 if depth == 16 else s).astype(np.uint8)
            assert np.array_equal(out, exp), (ctype, depth, il)


def test_palette_index_out_of_range_raises():
    from lopez_spark.ops.png import encode_png_adv

    pal = np.zeros((2, 3), dtype=np.uint8)
    idx = np.full((3, 3, 1), 7, dtype=np.int64)  # index 7, palette of 2
    with pytest.raises(ValueError, match="palette index"):
        decode_png(encode_png_adv(idx, 8, 3, pal))


def test_decode_stats_png_row(spark):
    """End-to-end through the Arrow decode stage: a PNG payload decodes
    without PIL, the recomputed hash matches, and the lossless
    round-trip clamps PSNR at the 1e9 sentinel."""
    from lopez_spark.hashing import xxhash64
    from lopez_spark.ops.multimodal import decode_stats

    px = _rand(16, 24, 42)
    row = {
        "image_id": "png-0",
        "bytes": encode_png(px, filter_type=4),
        "w": 24,
        "h": 16,
        "fmt": "png",
        "phash": xxhash64(px.tobytes()),
    }
    df = spark.createDataFrame(
        [row], "image_id string, bytes binary, w int, h int, fmt string, phash long"
    )
    got = decode_stats(df).collect()[0]
    assert got["ok"] is True
    assert got["phash_matches"] is True
    assert got["psnr_db"] == 1e9
