"""Motion-JPEG MP4: writer/reader round-trip, probe cross-check,
sample-table edge cases, codec refusal, and frame_sample integration."""

import struct

import numpy as np
import pytest

from lopez_spark import fixtures as fx
from lopez_spark.ops.container_probe import probe_mp4
from lopez_spark.ops.jpeg import encode_jpeg
from lopez_spark.ops.mp4 import build_mp4_mjpeg, iter_mp4_jpeg_samples


def _video(n=4, q=90):
    base = fx.oracle_pixels(2)
    pxs = [np.roll(base, 5 * i, axis=0) for i in range(n)]
    h, w = base.shape[:2]
    frames = [encode_jpeg(p, q, "420") for p in pxs]
    return pxs, frames, w, h


def test_roundtrip_and_probe_crosscheck():
    pxs, frames, w, h = _video(5)
    data = build_mp4_mjpeg(frames, w, h, fps=10)
    assert list(iter_mp4_jpeg_samples(data)) == frames
    # the independently-written container probe agrees with the writer
    m = probe_mp4(data)
    assert m["codecs"] == ["jpeg"]
    assert (m["width"], m["height"]) == (w, h)
    assert m["duration_s"] == 0.5  # 5 frames @ 10 fps


def test_multi_sample_chunks_walk():
    """A hand-packed stsc with multiple samples per chunk still yields
    every sample: rewrite the writer's 1-per-chunk tables into
    2-per-chunk and re-point stco at the packed layout."""
    pxs, frames, w, h = _video(4)
    data = bytearray(build_mp4_mjpeg(frames, w, h))
    # writer layout: samples are contiguous in mdat, so chunks of 2
    # start at samples 0 and 2 — patch stsc to one (1, 2, 1) entry and
    # stco to 2 chunks at those offsets
    ftyp_len = struct.unpack(">I", data[0:4])[0]
    base = ftyp_len + 8
    off0 = base
    off2 = base + len(frames[0]) + len(frames[1])
    i = bytes(data).find(b"stsc")
    data[i + 4 : i + 24] = struct.pack(">IIIII", 0, 1, 1, 2, 1)
    j = bytes(data).find(b"stco")
    # stco body: ver/flags, count, offsets — shrink from 4 to 2 entries
    new_stco = struct.pack(">I", 8 + 4 + 4 + 8) + b"stco" + struct.pack(
        ">III", 0, 2, off0
    ) + struct.pack(">I", off2)
    old_len = struct.unpack(">I", data[j - 4 : j])[0]
    data[j - 4 : j - 4 + old_len] = new_stco
    # fix enclosing box sizes (stbl/minf/mdia/trak/moov each shrank 8)
    for name in (b"stbl", b"minf", b"mdia", b"trak", b"moov"):
        k = bytes(data).find(name)
        sz = struct.unpack(">I", data[k - 4 : k])[0]
        data[k - 4 : k] = struct.pack(">I", sz - 8)
    assert list(iter_mp4_jpeg_samples(bytes(data))) == frames


def test_non_jpeg_codec_refuses():
    pxs, frames, w, h = _video(2)
    data = bytearray(build_mp4_mjpeg(frames, w, h))
    i = bytes(data).find(b"stsd")
    entry_fourcc = i + 4 + 4 + 4 + 4  # name, ver/flags, count, entry size
    assert data[entry_fourcc : entry_fourcc + 4] == b"jpeg"
    data[entry_fourcc : entry_fourcc + 4] = b"avc1"
    avc = bytes(data)
    with pytest.raises(NotImplementedError, match="avc1"):
        list(iter_mp4_jpeg_samples(avc))


def test_malformed_raises():
    with pytest.raises(ValueError):
        list(iter_mp4_jpeg_samples(b"garbage" * 30))
    pxs, frames, w, h = _video(2)
    data = build_mp4_mjpeg(frames, w, h)
    with pytest.raises(ValueError):
        list(iter_mp4_jpeg_samples(data[: len(data) // 2]))
    with pytest.raises(ValueError):
        build_mp4_mjpeg([], 4, 4)


def test_frame_sample_mp4(spark):
    from lopez_spark.ops.multimodal import frame_sample

    pxs, frames, w, h = _video(4, q=98)
    data = build_mp4_mjpeg(frames, w, h)
    df = spark.createDataFrame(
        [
            ("m0", bytearray(data), 0, 0, 0, "mp4"),
            ("mbad", bytearray(b"\x00\x00\x00\x08ftyp" + b"junk" * 20), 0, 0, 0, "mp4"),
        ],
        "video_id string, bytes binary, w int, h int, n_frames int, fmt string",
    )
    rows = frame_sample(df, every_n=2).collect()
    good = sorted(
        (r for r in rows if r["video_id"] == "m0"), key=lambda r: r["frame_no"]
    )
    assert [r["frame_no"] for r in good] == [0, 2]
    assert all((r["w"], r["h"]) == (w, h) for r in good)
    bad = [r for r in rows if r["video_id"] == "mbad"]
    assert len(bad) == 1 and bad[0]["frame_no"] == -1 and bad[0]["fmt"] == "err"


def test_hostile_stsz_count_rejected_cheaply():
    """A corrupt uniform-stsz claiming 2^32 samples must raise
    ValueError BEFORE materializing the sizes list (no MemoryError)."""
    pxs, frames, w, h = _video(2)
    data = bytearray(build_mp4_mjpeg(frames, w, h))
    i = bytes(data).find(b"stsz")
    # stsz body: ver/flags, sample_size, sample_count
    data[i + 8 : i + 16] = struct.pack(">II", 1, 0xFFFFFFFF)
    with pytest.raises(ValueError, match="stsz"):
        list(iter_mp4_jpeg_samples(bytes(data)))


def test_stsc_first_chunk_zero_rejected():
    """first_chunk=0 would wrap to chunk_offs[-1] and silently yield
    the WRONG frames — must raise, never mis-decode."""
    pxs, frames, w, h = _video(2)
    data = bytearray(build_mp4_mjpeg(frames, w, h))
    i = bytes(data).find(b"stsc")
    data[i + 12 : i + 16] = struct.pack(">I", 0)  # first_chunk 1 -> 0
    with pytest.raises(ValueError, match="stsc"):
        list(iter_mp4_jpeg_samples(bytes(data)))


def test_uniform_stsz_never_materializes_sizes():
    """uniform=1 with a count that passes the byte bound must still
    complete in O(1) memory and reject cleanly (tables can't cover that
    many samples), not allocate an 8-bytes-per-entry list."""
    pxs, frames, w, h = _video(2)
    data = bytearray(build_mp4_mjpeg(frames, w, h))
    i = bytes(data).find(b"stsz")
    data[i + 8 : i + 16] = struct.pack(">II", 1, len(data))  # passes bound
    with pytest.raises(ValueError):
        list(iter_mp4_jpeg_samples(bytes(data)))
