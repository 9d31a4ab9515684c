"""The built-in WAV codec (ops/wav.py) and its audio_features path."""

import struct

import numpy as np
import pytest

from lopez_spark.ops.wav import decode_wav, encode_wav


def _tone(n=1000, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    sig = 8000 * np.sin(2 * np.pi * t / 50) + rng.normal(0, 500, n)
    return np.clip(sig, -32768, 32767).astype(np.int16)


def test_roundtrip_exact():
    pcm = _tone()
    out, rate = decode_wav(encode_wav(pcm, 22_050))
    assert rate == 22_050
    assert np.array_equal(out, pcm)


def test_stereo_averages_to_mono():
    pcm = _tone(500)
    stereo = np.column_stack([pcm, pcm]).ravel()
    raw = encode_wav(pcm)  # steal header layout, rebuild as 2-channel
    fmt = struct.pack("<HHIIHH", 1, 2, 16_000, 16_000 * 4, 4, 16)
    data = stereo.astype("<i2").tobytes()
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    out, _ = decode_wav(wav)
    assert np.array_equal(out, pcm)  # identical channels → mono = channel
    assert raw != wav


def test_rejects_non_pcm_and_garbage():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"ID3\x04...")
    pcm = _tone(10)
    wav = bytearray(encode_wav(pcm))
    wav[20] = 85  # format tag -> 0x55 (MP3)
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(bytes(wav))


def test_audio_features_wav_row(spark):
    """audio_features over a real WAV payload equals the same features
    over the raw PCM — through the Arrow stage, no audio backend."""
    from lopez_spark.ops.multimodal import audio_features

    pcm = _tone(2000, seed=11)
    df = spark.createDataFrame(
        [("w0", bytearray(encode_wav(pcm)), "wav")],
        "audio_id string, bytes binary, fmt string",
    )
    got = audio_features(df).collect()[0]
    f = pcm.astype(np.float64)
    assert got["n_samples"] == 2000
    assert got["peak"] == int(np.max(np.abs(f)))
    assert abs(got["rms"] - float(np.sqrt(np.mean(f**2)))) < 1e-9
