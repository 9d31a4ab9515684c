"""The built-in baseline JPEG codec (ops/jpeg.py): roundtrip quality,
the north rule's PSNR >= 40 dB lossy invariant on the fixture corpus,
format validation, and the Spark decode_stats path."""

import numpy as np
import pytest

from lopez_spark import fixtures as fx
from lopez_spark.ops.jpeg import decode_jpeg, encode_jpeg


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255 * 255 / mse)


def test_smooth_image_high_psnr():
    yy, xx = np.mgrid[0:24, 0:40]
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((xx + yy) * 2) % 256], axis=2
    ).astype(np.uint8)
    assert _psnr(img, decode_jpeg(encode_jpeg(img, 95))) > 50


@pytest.mark.parametrize("i", [0, 3, 11])
def test_fixture_corpus_meets_lossy_invariant(i):
    """PSNR >= 40 dB at the decode_stats re-encode quality (98) on real
    fixture images (gradient + noise — hostile content for a DCT)."""
    img = fx.oracle_pixels(i)
    assert _psnr(img, decode_jpeg(encode_jpeg(img, 98))) >= 40


def test_non_multiple_of_8_shapes():
    for h, w in ((1, 1), (7, 9), (17, 23), (8, 8)):
        img = np.random.default_rng(h * 100 + w).integers(
            0, 256, (h, w, 3), dtype=np.uint8
        )
        out = decode_jpeg(encode_jpeg(img, 98))
        assert out.shape == img.shape
        assert _psnr(img, out) >= 35  # pure noise at tiny sizes


def test_monochrome_block_is_near_exact():
    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, 95))
    assert np.abs(out.astype(int) - 77).max() <= 1


@pytest.mark.parametrize("ss", ["420", "422"])
def test_subsampled_roundtrip_meets_lossy_invariant(ss):
    """4:2:0 / 4:2:2 MCU-interleaved streams decode; the decode →
    re-encode round trip clears the PSNR >= 40 dB lossy invariant."""
    for i in (0, 4):
        img = fx.oracle_pixels(i)
        dec = decode_jpeg(encode_jpeg(img, 98, ss))
        assert dec.shape == img.shape
        assert _psnr(dec, decode_jpeg(encode_jpeg(dec, 98, ss))) >= 40
        assert _psnr(dec, decode_jpeg(encode_jpeg(dec, 98))) >= 40


def test_subsampled_smooth_image_decodes_close():
    """On smooth content (what subsampling is for) 4:2:0 stays close
    to the source image itself, not just round-trip stable."""
    yy, xx = np.mgrid[0:48, 0:64]
    img = np.stack(
        [(yy * 2) % 256, (xx * 3) % 256, (xx + yy) % 256], axis=2
    ).astype(np.uint8)
    for ss in ("420", "422"):
        assert _psnr(img, decode_jpeg(encode_jpeg(img, 98, ss))) >= 40


def test_subsampled_odd_shapes():
    for h, w in ((1, 1), (7, 9), (17, 23), (9, 16)):
        img = np.random.default_rng(h * 7 + w).integers(
            0, 256, (h, w, 3), dtype=np.uint8
        )
        for ss in ("420", "422"):
            assert decode_jpeg(encode_jpeg(img, 98, ss)).shape == img.shape


def test_rejects_unsupported_processes_and_garbage():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    enc = bytearray(encode_jpeg(img))
    i = enc.find(b"\xff\xc0")
    for sof in (0xC3, 0xC9, 0xCB):  # lossless / arithmetic-coded
        bad = bytearray(enc)
        bad[i + 1] = sof
        with pytest.raises(ValueError, match="coding process"):
            decode_jpeg(bytes(bad))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"GIF89a...")


def test_progressive_decodes_bit_identical_to_baseline():
    """The entropy layer is lossless both ways: a progressive (SOF2)
    stream of the same image — spectral selection + DC/AC successive
    approximation + EOB runs — must decode to exactly the baseline
    pixels, for every sampling layout."""
    for i, ss in ((0, "444"), (4, "420"), (11, "422")):
        img = fx.oracle_pixels(i)
        base = decode_jpeg(encode_jpeg(img, 98, ss))
        prog = decode_jpeg(encode_jpeg(img, 98, ss, progressive=True))
        assert np.array_equal(base, prog)


def test_progressive_odd_shapes_and_quality():
    for h, w in ((1, 1), (7, 9), (17, 23)):
        img = np.random.default_rng(h * 31 + w).integers(
            0, 256, (h, w, 3), dtype=np.uint8
        )
        for q in (50, 98):
            base = decode_jpeg(encode_jpeg(img, q, "420"))
            prog = decode_jpeg(encode_jpeg(img, q, "420", progressive=True))
            assert np.array_equal(base, prog)


def test_restart_markers_decode_bit_identical():
    """DRI/RSTn streams (baseline and progressive) decode identically
    to the unrestarted stream."""
    img = fx.oracle_pixels(2)
    base = decode_jpeg(encode_jpeg(img, 95, "420"))
    for ri in (1, 3, 7):
        assert np.array_equal(
            base, decode_jpeg(encode_jpeg(img, 95, "420", restart_interval=ri))
        )
        assert np.array_equal(
            base,
            decode_jpeg(
                encode_jpeg(img, 95, "420", progressive=True, restart_interval=ri)
            ),
        )


def test_grayscale_single_component_frames():
    """1-component frames decode (luma broadcast to RGB), sequential
    and progressive, matching each other bit-exactly."""
    img = fx.oracle_pixels(7)
    g = decode_jpeg(encode_jpeg(img, 95, "gray"))
    assert g.shape == img.shape
    assert np.array_equal(g[..., 0], g[..., 1])
    assert np.array_equal(g, decode_jpeg(encode_jpeg(img, 95, "gray", progressive=True)))
    luma = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    assert _psnr(luma.round().clip(0, 255).astype(np.uint8), g[..., 0]) >= 30


def test_progressive_truncated_stream_raises():
    img = fx.oracle_pixels(3)
    enc = encode_jpeg(img, 95, progressive=True)
    with pytest.raises(ValueError):
        decode_jpeg(enc[: len(enc) // 3])


def test_decode_stats_jpeg_row(spark):
    """End-to-end through the Arrow decode stage: a JPEG payload
    decodes without PIL and the lossy re-encode PSNR clears 40 dB."""
    from lopez_spark.hashing import xxhash64
    from lopez_spark.ops.multimodal import decode_stats

    px = fx.oracle_pixels(5)
    h, w = px.shape[:2]
    data = encode_jpeg(px, 98)
    decoded = decode_jpeg(data)  # stored phash is of the decoded pixels
    row = ("jpg-0", bytearray(data), w, h, "jpeg", xxhash64(decoded.tobytes()))
    df = spark.createDataFrame(
        [row], "image_id string, bytes binary, w int, h int, fmt string, phash long"
    )
    got = decode_stats(df).collect()[0]
    assert got["ok"] is True
    assert got["phash_matches"] is True
    assert got["psnr_db"] >= 40.0


def test_vectorized_emit_byte_identical_to_loop():
    """The vectorized baseline entropy emit must produce the same
    stream as the generic per-coefficient loop, bit for bit, across
    sampling layouts, qualities, and odd shapes."""
    from lopez_spark.ops import jpeg as J

    rng = np.random.default_rng(11)
    try:
        for _ in range(4):
            h, wdt = int(rng.integers(5, 70)), int(rng.integers(5, 70))
            img = rng.integers(0, 256, (h, wdt, 3)).astype(np.uint8)
            for sub in ("444", "422", "420", "gray"):
                for q in (35, 90, 98):
                    J._VEC_EMIT = True
                    a = encode_jpeg(img, q, subsampling=sub)
                    J._VEC_EMIT = False
                    b = encode_jpeg(img, q, subsampling=sub)
                    assert a == b, (h, wdt, sub, q)
    finally:
        J._VEC_EMIT = True


def test_stray_restart_without_dri_rejected():
    """RSTn inside entropy data of a scan with no DRI is malformed and
    must raise, never be spliced into the bitstream (the 'never a
    silent mis-decode' contract)."""
    img = fx.oracle_pixels(2)
    enc = encode_jpeg(img, 95)
    sos = enc.find(b"\xff\xda")
    spliced = enc[: sos + 120] + b"\xff\xd3" + enc[sos + 120 :]
    with pytest.raises(ValueError):
        decode_jpeg(spliced)


def test_decode_lut_cache_is_bounded():
    from lopez_spark.ops import jpeg as J

    J._LUT_CACHE.clear()
    rng = np.random.default_rng(0)
    for _ in range(3 * J._LUT_CACHE_MAX):
        im = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
        decode_jpeg(encode_jpeg(im, 90))
    assert len(J._LUT_CACHE) <= J._LUT_CACHE_MAX
