"""Container metadata probes: minimal valid MP4/MP3 streams built
byte-by-byte in the test (the public formats' own structures) and
probed without any codec."""

import struct

import pytest

from lopez_spark.ops.container_probe import probe_mp3, probe_mp4


def _box(name: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + name + body


def _minimal_mp4() -> bytes:
    mvhd = bytes([0, 0, 0, 0]) + struct.pack(">II", 0, 0)  # ver+flags, times
    mvhd += struct.pack(">II", 1000, 5400)  # timescale, duration (5.4 s)
    mvhd += bytes(80)
    tkhd = bytes(76) + struct.pack(">II", 640 << 16, 360 << 16)
    avc1 = struct.pack(">I", 16) + b"avc1" + bytes(8)
    stsd = bytes([0, 0, 0, 0]) + struct.pack(">I", 1) + avc1
    stbl = _box(b"stsd", stsd)
    minf = _box(b"stbl", stbl)
    mdia = _box(b"minf", minf)
    trak = _box(b"tkhd", tkhd) + _box(b"mdia", mdia)
    moov = _box(b"mvhd", mvhd) + _box(b"trak", trak)
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + _box(b"moov", moov)


def test_probe_mp4_minimal():
    meta = probe_mp4(_minimal_mp4())
    assert meta["duration_s"] == 5.4
    assert meta["timescale"] == 1000
    assert (meta["width"], meta["height"]) == (640, 360)
    assert meta["codecs"] == ["avc1"]


def test_probe_mp4_rejects_garbage():
    with pytest.raises(ValueError):
        probe_mp4(b"\x00" * 3)
    with pytest.raises(ValueError, match="ftyp"):
        probe_mp4(_box(b"free", b"\x00" * 16))


def _mp3_frame(bitrate_idx=9, sr_idx=0, pad=0) -> bytes:
    # MPEG1 Layer III: sync=7FF, version=3, layer=1, no-crc=1
    hdr = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
    hdr |= (bitrate_idx << 12) | (sr_idx << 10) | (pad << 9)
    kbps = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0][
        bitrate_idx
    ]
    rate = [44100, 48000, 32000][sr_idx]
    flen = 1152 // 8 * kbps * 1000 // rate + pad
    return struct.pack(">I", hdr) + bytes(flen - 4)


def test_probe_mp3_frames_and_duration():
    data = _mp3_frame() * 38  # 38 x 1152 samples @ 44100 ≈ 0.993 s
    meta = probe_mp3(data)
    assert meta["frames"] == 38
    assert meta["sample_rate"] == 44100
    assert meta["bitrate_kbps"] == 128
    assert abs(meta["duration_s"] - 38 * 1152 / 44100) < 1e-3


def test_probe_mp3_skips_id3_and_rejects_garbage():
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + bytes(10)
    meta = probe_mp3(tag + _mp3_frame() * 3)
    assert meta["frames"] == 3
    with pytest.raises(ValueError, match="sync"):
        probe_mp3(b"\x00" * 64)


def test_container_metadata_spark_stage(spark):
    from lopez_spark.ops.multimodal import container_metadata

    rows = [
        ("v0", bytearray(_minimal_mp4()), "mp4"),
        ("a0", bytearray(_mp3_frame() * 5), "mp3"),
        ("bad", bytearray(b"\x00" * 32), "mp4"),
        # truncated mvhd body: probe_mp4 surfaces struct.error — the
        # stage must turn it into ok=False, not a task crash
        ("trunc", bytearray(_minimal_mp4()[:40]), "mp4"),
        ("truncmp3", bytearray(_mp3_frame()[:3]), "mp3"),
    ]
    df = spark.createDataFrame(rows, "media_id string, bytes binary, fmt string")
    got = {r["media_id"]: r for r in container_metadata(df).collect()}
    assert got["v0"]["ok"] and got["v0"]["codec"] == "avc1"
    assert (got["v0"]["width"], got["v0"]["height"]) == (640, 360)
    assert got["a0"]["ok"] and abs(got["a0"]["duration_s"] - 5 * 1152 / 44100) < 1e-3
    assert got["bad"]["ok"] is False and got["bad"]["err"]
    assert got["trunc"]["ok"] is False and got["trunc"]["err"]
    assert got["truncmp3"]["ok"] is False and got["truncmp3"]["err"]


def test_probe_webp_variants_and_garbage():
    from lopez_spark.ops.container_probe import probe_webp

    def riff(chunk):
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    # VP8L lossless: 14-bit packed dims
    bits = (640 - 1) | ((360 - 1) << 14)
    vp8l = b"VP8L" + struct.pack("<I", 5) + bytes([0x2F]) + struct.pack("<I", bits)
    assert probe_webp(riff(vp8l)) == {"width": 640, "height": 360, "codec": "VP8L"}
    # VP8 lossy key frame: sync 9D 01 2A then u16le dims
    body = bytes(3) + b"\x9d\x01\x2a" + struct.pack("<HH", 800, 600)
    vp8 = b"VP8 " + struct.pack("<I", len(body)) + body
    assert probe_webp(riff(vp8)) == {"width": 800, "height": 600, "codec": "VP8"}
    # VP8X extended: 24-bit canvas dims minus one
    body = bytes(4) + (1023).to_bytes(3, "little") + (767).to_bytes(3, "little")
    vp8x = b"VP8X" + struct.pack("<I", len(body)) + body
    assert probe_webp(riff(vp8x)) == {"width": 1024, "height": 768, "codec": "VP8X"}
    for bad in (b"", b"RIFFxxxxWAVE", riff(b"ALPH" + struct.pack("<I", 0)),
                riff(vp8l)[:16]):
        with pytest.raises(ValueError):
            probe_webp(bad)


def test_container_metadata_webp_rows(spark):
    from lopez_spark import fixtures as fx
    from lopez_spark.ops.multimodal import container_metadata

    rows = [
        (r["media_id"], bytearray(r["bytes"]), r["fmt"])
        for r in (fx.media_row(i) for i in range(12))
        if r["fmt"] == "webp"
    ]
    df = spark.createDataFrame(rows, "media_id string, bytes binary, fmt string")
    got = {r["media_id"]: r for r in container_metadata(df).collect()}
    ok_rows = [r for r in got.values() if r["ok"]]
    assert ok_rows, "at least one valid webp fixture expected"
    for r in ok_rows:
        assert r["codec"] == "VP8L" and r["width"] >= 16 and r["height"] >= 16


def _tiff(bo="<", w=640, h=480, orient=1, pages=1, magic=42):
    """Hand-built minimal TIFF: IFD0 with width(LONG)/height(SHORT)/
    orientation, then a next-IFD chain of bare width/height pages."""
    def entry(tag, typ, val):
        if typ == 3:
            packed = struct.pack(bo + "H", val) + b"\x00\x00"
        else:
            packed = struct.pack(bo + "I", val)
        return struct.pack(bo + "HHI", tag, typ, 1) + packed

    chunks, pos = [], 8
    for p in range(pages):
        if p == 0:
            entries = [entry(256, 4, w), entry(257, 3, h), entry(274, 3, orient)]
        else:
            entries = [entry(256, 4, max(1, w >> p)), entry(257, 4, max(1, h >> p))]
        sub = struct.pack(bo + "H", len(entries)) + b"".join(entries)
        pos += len(sub) + 4
        nxt = pos if p < pages - 1 else 0
        chunks.append(sub + struct.pack(bo + "I", nxt))
    hdr = (b"II" if bo == "<" else b"MM") + struct.pack(bo + "H", magic)
    return hdr + struct.pack(bo + "I", 8) + b"".join(chunks)


@pytest.mark.parametrize("bo", ["<", ">"])
def test_probe_tiff_both_byte_orders(bo):
    from lopez_spark.ops.container_probe import probe_tiff

    m = probe_tiff(_tiff(bo=bo, w=1920, h=1080, orient=6, pages=1))
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["orientation"] == 6 and m["n_pages"] == 1
    assert m["compression"] == 1  # default when the tag is absent


def test_probe_tiff_multipage_counts_ifd_chain():
    from lopez_spark.ops.container_probe import probe_tiff

    m = probe_tiff(_tiff(pages=3))
    assert m["n_pages"] == 3
    assert (m["width"], m["height"]) == (640, 480)  # IFD0 tags only


def test_probe_tiff_indirect_value_and_fixture_corpus():
    from lopez_spark import fixtures as fx
    from lopez_spark.ops.container_probe import probe_tiff

    # fixture payloads carry a RATIONAL XResolution behind an offset
    ok = 0
    for i in range(40):
        r = fx.media_row(i)
        if r["fmt"] != "tiff":
            continue
        try:
            m = probe_tiff(r["bytes"])
        except ValueError:
            assert i % 7 == 3  # only the deliberately-truncated row
            continue
        ok += 1
        assert m["width"] >= 16 and m["height"] >= 16
        assert 1 <= m["orientation"] <= 8 and m["samples_per_pixel"] == 3
    assert ok >= 6


def test_probe_tiff_rejects_malformed():
    from lopez_spark.ops.container_probe import probe_tiff

    with pytest.raises(ValueError, match="byte-order"):
        probe_tiff(b"XX\x2a\x00" + bytes(8))
    with pytest.raises(ValueError, match="magic"):
        probe_tiff(_tiff(magic=43))
    with pytest.raises(ValueError, match="truncated|beyond"):
        probe_tiff(_tiff()[:12])
    with pytest.raises(ValueError, match="orientation"):
        probe_tiff(_tiff(orient=9))
    # IFD chain loop must terminate, not hang
    data = bytearray(_tiff(pages=1))
    data[-4:] = struct.pack("<I", 8)  # next-IFD points back to IFD0
    with pytest.raises(ValueError, match="loops"):
        probe_tiff(bytes(data))
    with pytest.raises(ValueError, match="ImageWidth"):
        probe_tiff(b"II\x2a\x00" + struct.pack("<I", 8)
                   + struct.pack("<H", 0) + struct.pack("<I", 0))


def test_container_metadata_tiff_rows(spark):
    from lopez_spark import fixtures as fx
    from lopez_spark.ops.multimodal import container_metadata

    rows = [
        (r["media_id"], bytearray(r["bytes"]), r["fmt"])
        for r in (fx.media_row(i) for i in range(40))
        if r["fmt"] == "tiff"
    ]
    df = spark.createDataFrame(rows, "media_id string, bytes binary, fmt string")
    got = list(container_metadata(df).collect())
    ok_rows = [r for r in got if r["ok"]]
    bad_rows = [r for r in got if not r["ok"]]
    assert len(ok_rows) >= 6 and len(bad_rows) >= 1  # truncated fixture
    for r in ok_rows:
        assert r["codec"].startswith("tiff:") and ":o" in r["codec"]


def test_probe_jpeg_sof_dims_and_exif_orientation():
    from lopez_spark import fixtures as fx
    from lopez_spark.ops.container_probe import probe_jpeg

    for i in range(8):
        if i == 5:
            continue
        m = probe_jpeg(fx.encode_jpeg_probe(i))
        assert m["orientation"] == 1 + i % 8
        assert m["progressive"] is (i % 3 == 2)
        assert m["width"] >= 16 and m["height"] >= 16


def test_probe_jpeg_on_real_codec_output():
    from lopez_spark import fixtures as fx
    from lopez_spark.ops.container_probe import probe_jpeg
    from lopez_spark.ops.jpeg import encode_jpeg

    px = fx.oracle_pixels(0)
    m = probe_jpeg(encode_jpeg(px, 90))
    assert (m["width"], m["height"]) == (px.shape[1], px.shape[0])
    assert m["progressive"] is False and m["orientation"] == 1
    mp = probe_jpeg(encode_jpeg(px, 90, progressive=True))
    assert mp["progressive"] is True


def test_probe_jpeg_rejects_malformed():
    from lopez_spark import fixtures as fx
    from lopez_spark.ops.container_probe import probe_jpeg

    with pytest.raises(ValueError, match="SOI"):
        probe_jpeg(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="overruns"):
        probe_jpeg(fx.encode_jpeg_probe(0)[:9])
    # headerless entropy noise after SOI: marker sync must fail, not loop
    with pytest.raises(ValueError):
        probe_jpeg(b"\xff\xd8" + b"\x12\x34" * 8)
    # Exif orientation out of range propagates as ValueError
    data = bytearray(fx.encode_jpeg_probe(0))
    i = data.find(struct.pack("<HHI", 274, 3, 1))
    data[i + 8 : i + 10] = struct.pack("<H", 11)
    with pytest.raises(ValueError, match="orientation"):
        probe_jpeg(bytes(data))


def test_container_metadata_jpeg_rows(spark):
    from lopez_spark import fixtures as fx
    from lopez_spark.ops.multimodal import container_metadata

    rows = [
        (f"jpg-{i:08d}", bytearray(fx.encode_jpeg_probe(i)), "jpeg")
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "media_id string, bytes binary, fmt string")
    got = {r["media_id"]: r for r in container_metadata(df).collect()}
    assert all(r["ok"] for r in got.values())
    assert got["jpg-00000002"]["codec"] == "jpeg:prog:o3"
    assert got["jpg-00000000"]["codec"] == "jpeg:base:o1"


def test_probe_gif_static_animated_and_garbage():
    from lopez_spark.ops.container_probe import probe_gif

    def gif(frames, w=7, h=5, gct=False):
        hdr = b"GIF89a" + struct.pack("<HH", w, h)
        hdr += bytes([0x80 | 0x00 if gct else 0x00, 0, 0])
        if gct:
            hdr += bytes(3 * 2)  # 2-entry global color table
        body = b""
        for _ in range(frames):
            body += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
            body += bytes([2]) + bytes([1, 0x44]) + b"\x00"  # lzw min + 1 block
        # graphic control extension before trailer exercises 0x21 skip
        body += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        return hdr + body + b"\x3b"

    m = probe_gif(gif(1))
    assert (m["width"], m["height"], m["n_frames"]) == (7, 5, 1)
    assert probe_gif(gif(3, gct=True))["n_frames"] == 3
    with pytest.raises(ValueError):
        probe_gif(b"NOTAGIF")
    with pytest.raises(ValueError):
        probe_gif(b"GIF89a" + bytes(7))  # no image descriptor
