"""Log-mel front-end: filterbank properties, frequency localization,
framing edges, and the Arrow stage vs a driver-side recompute."""

import numpy as np
import pytest

from lopez_spark import fixtures as fx
from lopez_spark.ops.logmel import (
    _dct2_ortho,
    hann_window,
    logmel,
    logmel_stats,
    mel_filterbank,
    mfcc,
)


def test_hann_window_endpoints_and_symmetry():
    w = hann_window(512)
    assert w[0] == 0.0 and w.shape == (512,)
    assert np.allclose(w[1:], w[1:][::-1])  # periodic: symmetric sans k=0
    assert abs(w[256] - 1.0) < 1e-12  # peak at n/2


def test_filterbank_shape_and_triangles():
    fb = mel_filterbank(32, 512, 16000)
    assert fb.shape == (32, 257)
    assert np.all(fb >= 0.0) and np.all(fb <= 1.0 + 1e-12)
    # every filter is unimodal with a nonempty support, and the bank
    # covers the interior bins (no dead zone between triangles)
    for j in range(32):
        nz = np.flatnonzero(fb[j] > 0)
        assert nz.size > 0
    cover = fb.sum(axis=0)
    lo = np.flatnonzero(fb[0] > 0)[0]
    hi = np.flatnonzero(fb[-1] > 0)[-1]
    assert np.all(cover[lo : hi + 1] > 0)
    # filter peaks are ordered in frequency
    peaks = [np.argmax(fb[j]) for j in range(32)]
    assert peaks == sorted(peaks)


@pytest.mark.parametrize("f_hz", [250.0, 1000.0, 4000.0])
def test_sine_localizes_to_expected_mel_band(f_hz):
    rate, n_fft, n_mels = 16000, 512, 32
    t = np.arange(16384) / rate
    pcm = (20000 * np.sin(2 * np.pi * f_hz * t)).astype(np.int16)
    st = logmel_stats(pcm, rate, n_fft=n_fft, n_mels=n_mels)
    fb = mel_filterbank(n_mels, n_fft, rate)
    bin_of_f = int(round(f_hz * n_fft / rate))
    expect = int(np.argmax(fb[:, bin_of_f]))
    assert abs(st["dominant_mel"] - expect) <= 1


def test_dct2_rows_orthonormal_and_mfcc_shape():
    c = _dct2_ortho(32, 32)
    assert np.allclose(c @ c.T, np.eye(32), atol=1e-12)
    out = mfcc(fx.oracle_audio(1), 16000, n_mfcc=13)
    assert out.shape == (15, 13)
    # a spectrally-flat (constant log-mel) signal has zero energy in
    # every coefficient but c0 — DCT of a constant vector
    const = np.ones(32)
    coeffs = _dct2_ortho(13, 32) @ const
    assert abs(coeffs[0] - np.sqrt(32)) < 1e-12
    assert np.all(np.abs(coeffs[1:]) < 1e-12)


def test_short_clip_yields_zero_frames():
    lm = logmel(np.zeros(100, dtype=np.int16), 16000)
    assert lm.shape == (0, 32)
    st = logmel_stats(np.zeros(100, dtype=np.int16), 16000)
    assert st["n_frames"] == 0 and st["dominant_mel"] == -1


def test_frame_count_matches_stride_arithmetic():
    for n in (512, 513, 1024, 4096):
        lm = logmel(fx.oracle_audio(3, n_samples=n), 16000)
        assert lm.shape[0] == (n - 512) // 256 + 1


def test_arrow_stage_matches_driver_recompute(spark):
    from lopez_spark.ops.multimodal import audio_logmel
    from lopez_spark.ops.wav import encode_wav

    clips, truth = [], {}
    for i in range(5):
        pcm = fx.oracle_audio(i, n_samples=4096 + 1024 * i)
        clips.append((f"a{i}", bytearray(fx.encode_audio(pcm)), "araw", 16000))
        truth[f"a{i}"] = logmel_stats(pcm, 16000)
    wpcm = fx.oracle_audio(50, n_samples=6000)
    clips.append(("wav0", bytearray(encode_wav(wpcm, 16000)), "wav", 0))
    truth["wav0"] = logmel_stats(wpcm, 16000)
    clips.append(("bad", bytearray(b"junk" * 50), "araw", 16000))
    clips.append(("nul", None, "araw", 16000))
    df = spark.createDataFrame(
        clips, "audio_id string, bytes binary, fmt string, sample_rate int"
    )
    rows = {r["audio_id"]: r for r in audio_logmel(df).collect()}
    assert not rows["bad"]["ok"] and not rows["nul"]["ok"]
    for aid, st in truth.items():
        r = rows[aid]
        assert r["ok"]
        for k in ("n_frames", "n_mels", "dominant_mel", "mean_e3",
                  "max_e3", "mfcc1_e3"):
            assert r[k] == st[k], (aid, k, r[k], st[k])


def test_float_input_taken_as_normalized():
    """Normalized [-1,1] float PCM must equal the equivalent int16
    input, not be rescaled twice (regression: /32768 on floats pushed
    every bin to the log floor)."""
    pcm16 = fx.oracle_audio(2)
    as_float = pcm16.astype(np.float64) / 32768.0
    a = logmel(pcm16, 16000)
    b = logmel(as_float, 16000)
    assert np.array_equal(a, b)
    assert a.mean() > -9.0  # nowhere near the 1e-10 log floor
