"""Audio fingerprints: landmark properties, near-dup robustness,
discriminativity, and the Arrow stage."""

import numpy as np

from lopez_spark import fixtures as fx
from lopez_spark.ops.audio_fp import audio_fingerprints, fingerprints


def _clip(i, n_seg=16, seg=512):
    r = np.random.default_rng(500 + i)
    t = np.arange(seg) / 16000.0
    parts = [
        8000.0 * np.sin(2 * np.pi * f * t)
        for f in r.uniform(200.0, 7000.0, n_seg)
    ]
    pcm = np.concatenate(parts) + r.integers(-300, 300, n_seg * seg)
    return np.clip(pcm, -32768, 32767).astype(np.int16)


def test_fingerprints_deterministic_and_packed():
    a = fingerprints(_clip(0), 16000)
    assert np.array_equal(a, fingerprints(_clip(0), 16000))
    assert a.dtype == np.int64 and len(a) > 20
    assert np.all(a >= 0) and np.all((a & 0xFF) >= 1) and np.all((a & 0xFF) <= 3)
    # band fields stay within the 64-mel constellation
    assert np.all((a >> 16) < 64) and np.all(((a >> 8) & 0xFF) < 64)


def test_noise_robust_but_discriminative():
    base = _clip(1)
    noisy = np.clip(
        base.astype(np.int64)
        + np.random.default_rng(9).integers(-80, 80, base.shape),
        -32768, 32767,
    ).astype(np.int16)
    fa = set(map(int, fingerprints(base, 16000)))
    fb = set(map(int, fingerprints(noisy, 16000)))
    fo = set(map(int, fingerprints(_clip(2), 16000)))
    assert len(fa & fb) >= 0.6 * len(fa)  # near-dup: most landmarks survive
    assert len(fa & fo) <= 0.2 * len(fa)  # unrelated: few collide


def test_short_clip_yields_no_landmarks():
    assert fingerprints(np.zeros(700, dtype=np.int16), 16000).size == 0


def test_arrow_stage_matches_driver(spark):
    clips = [
        ("a", bytearray(fx.encode_audio(_clip(3))), "araw", 16000),
        ("b", bytearray(fx.encode_audio(_clip(4))), "araw", 16000),
        ("garbage", bytearray(b"xx" * 40), "araw", 16000),
        ("nul", None, "araw", 16000),
    ]
    df = spark.createDataFrame(
        clips, "audio_id string, bytes binary, fmt string, sample_rate int"
    )
    rows = audio_fingerprints(df).collect()
    got = {}
    for r in rows:
        got.setdefault(r["audio_id"], set()).add(r["fp"])
    assert set(got) == {"a", "b"}  # undecodable clips emit no landmarks
    assert got["a"] == set(map(int, fingerprints(_clip(3), 16000)))
    assert got["b"] == set(map(int, fingerprints(_clip(4), 16000)))
