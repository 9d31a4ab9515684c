"""Deterministic synthetic web over an image+caption table (FIXTURES.md).

The crawl corpus is the table shape mandated by BASELINE.json
``input_hint``::

    image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
    caption:string, phash:int64

Every topological fact (host, out-links, HTTP status, robots rules) is
a pure function of ``image_id`` via xxhash64, so the Spark fetch stage
(executors) and the pure-Python BFS oracle (driver) see the *same* web
without storing edges.  This replaces the reference's live HTTP
downloader (``lib-lopez/src/crawler/downloader/mod.rs:73-160``) with a
deterministic lookup, as a sandbox stand-in for network fetch.

Nothing here touches Spark: importable on executors and by oracles.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

import numpy as np

from .hashing import umod, xxhash64, xxhash64_str

FIXTURE_SEED = 42
N_HOSTS = 37
QUANT_STEP = 4  # uniform quantization step → PSNR ≈ 42.9 dB ≥ 40 dB invariant

_NOUNS = ["dog", "cat", "tree", "river", "mountain", "car", "house", "bird", "boat", "cloud"]
_VERBS = ["near", "under", "above", "beside", "chasing", "watching", "behind"]


def hk(image_id: str, k: int) -> int:
    """k-th independent 64-bit hash stream of an image id.

    Topology-only hash (link graph / statuses / hosts) — needs to be
    deterministic and uniform, not Spark-compatible, so it uses C-speed
    crc32 pairs instead of pure-Python xxhash64 (~10× faster; this is
    the per-page hot path of the synthetic fetch stage).  URL/page ids
    (`url_hash`) stay on xxhash64 for JVM parity."""
    b = f"{image_id}#{k}".encode()
    return (zlib.crc32(b, 0x9E3779B9) << 32) | zlib.crc32(b)


def image_id_of(i: int) -> str:
    return f"img-{i:08d}"


# ------------------------------------------------------------------ topology


def host_index(image_id: str) -> int:
    """~30% of pages land on the hot host h0 (exercises skew salting)."""
    if umod(hk(image_id, 0), 10) < 3:
        return 0
    return 1 + umod(hk(image_id, 10), N_HOSTS - 1)


def url_of(image_id: str) -> str:
    return f"https://h{host_index(image_id)}.example.test/{image_id}"


def image_id_from_url(url: str) -> str | None:
    """Inverse of url_of for canonical fixture URLs."""
    if ".example.test/" not in url:
        return None
    path = url.split(".example.test/", 1)[1]
    iid = path.split("?")[0]
    return iid or None


def http_status(image_id: str) -> int:
    """200 | 3xx redirect (301/302/303/307/308 — the reference follows
    *any* 3xx via ``is_redirection()``, downloader/mod.rs:92) | 404 bad
    status | 0 = simulated timeout/error."""
    if umod(hk(image_id, 23), 23) == 0:
        return (301, 302, 303, 307, 308)[umod(hk(image_id, 43), 5)]
    if umod(hk(image_id, 29), 29) == 0:
        return 404
    if umod(hk(image_id, 31), 31) == 0:
        return 0
    return 200


def redirect_target(image_id: str, n: int) -> str:
    return image_id_of(umod(hk(image_id, 41), n))


def raw_links(image_id: str, n: int) -> list[tuple[str, str]]:
    """(reason, raw-href) pairs as they'd appear in the page's DOM —
    includes canonicalization noise (fragments, unsorted params, junk
    schemes) that F10/F11 must scrub.  Reasons mirror
    ``lib-lopez/src/crawler/reason.rs:4-8``."""
    out: list[tuple[str, str]] = []
    k = umod(hk(image_id, 2), 8)
    for j in range(k):
        target = image_id_of(umod(hk(image_id, 3 + j), n))
        href = url_of(target)
        noise = umod(hk(image_id, 100 + j), 5)
        if noise == 0:
            href += "#section-2"  # fragment → stripped
        elif noise == 1:
            href += "?utm_b=2&utm_a=1"  # params → filtered/sorted per policy
        elif noise == 2:
            href = href.replace("https://", "HTTPS://")  # scheme case
        out.append(("ahref", href))
    if umod(hk(image_id, 9), 19) == 0:
        out.append(("canonical", url_of(image_id_of(umod(hk(image_id, 40), n)))))
    # junk the reference's checked_join rejects (worker/mod.rs:107-121)
    if umod(hk(image_id, 50), 11) == 0:
        out.append(("ahref", "#top"))
        out.append(("ahref", "mailto:someone@example.test"))
        out.append(("ahref", ""))
    return out


def html_of(image_id: str, n: int) -> str:
    """The fixture page rendered as real HTML: every ahref raw link as
    ``<a href>`` and the canonical link as ``<link rel="canonical">`` —
    so ``tree_search`` over this page recovers exactly ``raw_links``
    (as a multiset; anchors before canonicals, like real extraction)."""
    links = raw_links(image_id, n)
    head = "".join(
        f'<link rel="canonical" href="{href}">'
        for reason, href in links
        if reason == "canonical"
    )
    body = "".join(
        f'<a href="{href}">{i}</a>'
        for i, (reason, href) in enumerate(links)
        if reason == "ahref"
    )
    return (
        f"<html><head><title>{image_id}</title>{head}</head>"
        f'<body><p class="caption">{caption_of(image_id)}</p>{body}</body></html>'
    )


def robots_txt_of(host_idx: int) -> str | None:
    """Per-origin robots fixtures: every 5th host disallows ids ending
    in "00" via a wildcard+anchor rule (~1% of pages — exercises the
    ``*``/``$`` matcher), every 13th disallows one exact id, every 7th
    sets ``Crawl-delay: 1``."""
    lines = ["User-agent: *"]
    any_rule = False
    if host_idx % 5 == 0:
        lines.append("Disallow: /img-*00$")
        any_rule = True
    if host_idx % 13 == 0:
        lines.append("Disallow: /img-00000004")
        any_rule = True
    if host_idx % 7 == 0:
        lines.append("Crawl-delay: 1")
        any_rule = True
    return "\n".join(lines) if any_rule else None


def seeds(n: int) -> list[str]:
    return [url_of(image_id_of(0)), url_of(image_id_of(1)), url_of(image_id_of(min(7, n - 1)))]


# ------------------------------------------------------------------- payload


def oracle_pixels(i: int) -> np.ndarray:
    """Ground-truth pixels: deterministic gradient + noise, uint8 (h,w,3)."""
    image_id = image_id_of(i)
    w = 16 + umod(hk(image_id, 1), 48)
    h = 16 + umod(hk(image_id, 2), 48)
    rng = np.random.default_rng(FIXTURE_SEED + i)
    yy, xx = np.mgrid[0:h, 0:w]
    grad = ((xx * 255) // max(w - 1, 1) + (yy * 255) // max(h - 1, 1)) // 2
    noise = rng.integers(0, 32, size=(h, w, 3), dtype=np.int64)
    px = np.clip(grad[..., None] + noise, 0, 255).astype(np.uint8)
    return px


def fmt_of(image_id: str) -> str:
    return "qraw" if umod(hk(image_id, 4), 10) == 0 else "raw"


def encode_image(px: np.ndarray, fmt: str) -> bytes:
    """'raw' = zlib of exact pixels; 'qraw' = uniform quantization then
    zlib — a stand-in for lossy codecs (no Pillow in sandbox) with a
    provable PSNR ≥ 40 dB."""
    if fmt == "qraw":
        px = (px // QUANT_STEP) * QUANT_STEP + QUANT_STEP // 2
        px = px.astype(np.uint8)
    return zlib.compress(px.tobytes(), level=1)


def decode_image(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode either fixture codec back to uint8 (h,w,3)."""
    buf = zlib.decompress(data)
    return np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


# ------------------------------------------------------------ video / audio


def oracle_video_frames(i: int, n_frames: int = 8) -> np.ndarray:
    """Ground-truth video: frame k is the base image cyclically shifted
    k columns (deterministic motion), uint8 (f, h, w, 3)."""
    base = oracle_pixels(i)
    return np.stack([np.roll(base, k, axis=1) for k in range(n_frames)])


def encode_video(frames: np.ndarray) -> bytes:
    """'vraw' fixture codec: zlib over the concatenated raw frames."""
    return zlib.compress(frames.tobytes(), level=1)


def decode_video(data: bytes, n_frames: int, w: int, h: int) -> np.ndarray:
    buf = zlib.decompress(data)
    return np.frombuffer(buf, dtype=np.uint8).reshape(n_frames, h, w, 3)


def video_row(i: int, n_frames: int = 8) -> dict:
    frames = oracle_video_frames(i, n_frames)
    f, h, w = frames.shape[:3]
    return {
        "video_id": f"vid-{i:08d}",
        "bytes": encode_video(frames),
        "w": w,
        "h": h,
        "n_frames": f,
        "fmt": "vraw",
    }


def oracle_audio(i: int, n_samples: int = 4096) -> np.ndarray:
    """Ground-truth audio: deterministic int16 PCM — a hash-seeded sum
    of two square-ish waves plus noise (pure integer math)."""
    rng = np.random.default_rng(FIXTURE_SEED * 7 + i)
    t = np.arange(n_samples)
    p1 = 16 + umod(hk(image_id_of(i), 61), 48)
    p2 = 64 + umod(hk(image_id_of(i), 62), 192)
    wave = 6000 * ((t // p1) % 2) + 3000 * ((t // p2) % 2) - 4500
    noise = rng.integers(-500, 500, size=n_samples)
    return np.clip(wave + noise, -32768, 32767).astype(np.int16)


def encode_audio(pcm: np.ndarray) -> bytes:
    """'araw' fixture codec: zlib over int16 little-endian PCM."""
    return zlib.compress(pcm.astype("<i2").tobytes(), level=1)


def decode_audio(data: bytes) -> np.ndarray:
    return np.frombuffer(zlib.decompress(data), dtype="<i2")


def audio_row(i: int, n_samples: int = 4096) -> dict:
    pcm = oracle_audio(i, n_samples)
    return {
        "audio_id": f"aud-{i:08d}",
        "bytes": encode_audio(pcm),
        "n_samples": n_samples,
        "sample_rate": 16000,
        "fmt": "araw",
    }


# ------------------------------------------------------------ containers

_MP4_CODECS = ["avc1", "hev1", "mp4v", "av01"]


def _mp4_box(name: bytes, body: bytes) -> bytes:
    import struct

    return struct.pack(">I", len(body) + 8) + name + body


def encode_mp4_probe(i: int) -> bytes:
    """Deterministic minimal ISO-BMFF stream: ftyp + moov(mvhd, trak
    (tkhd dims + stsd codec entry)) with parameters derived from i —
    enough structure for the container_probe box walk, no media data."""
    import struct

    mid = f"med-{i:08d}"
    timescale = 600 * (1 + umod(hk(mid, 80), 4))  # 600..2400
    duration = timescale * (2 + umod(hk(mid, 81), 9)) + umod(hk(mid, 82), timescale)
    w = 320 + 16 * umod(hk(mid, 83), 61)
    h = 240 + 16 * umod(hk(mid, 84), 34)
    codec = _MP4_CODECS[umod(hk(mid, 85), len(_MP4_CODECS))]
    mvhd = bytes(4) + struct.pack(">II", 0, 0)
    mvhd += struct.pack(">II", timescale, duration) + bytes(80)
    tkhd = bytes(76) + struct.pack(">II", w << 16, h << 16)
    entry = struct.pack(">I", 16) + codec.encode() + bytes(8)
    stsd = bytes(4) + struct.pack(">I", 1) + entry
    mdia = _mp4_box(b"minf", _mp4_box(b"stbl", _mp4_box(b"stsd", stsd)))
    trak = _mp4_box(b"tkhd", tkhd) + _mp4_box(b"mdia", mdia)
    moov = _mp4_box(b"mvhd", mvhd) + _mp4_box(b"trak", trak)
    ftyp = _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + _mp4_box(b"moov", moov)


def encode_mp3_probe(i: int) -> bytes:
    """Deterministic MPEG-1 Layer III frame-header stream (sync walk
    only — no audio payload semantics)."""
    import struct

    mid = f"med-{i:08d}"
    br_idx = 1 + umod(hk(mid, 86), 14)  # 1..14 (valid)
    sr_idx = umod(hk(mid, 87), 3)
    n_frames = 8 + umod(hk(mid, 88), 40)
    hdr = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
    hdr |= (br_idx << 12) | (sr_idx << 10)
    kbps = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0][br_idx]
    rate = [44100, 48000, 32000][sr_idx]
    flen = 1152 // 8 * kbps * 1000 // rate
    frame = struct.pack(">I", hdr) + bytes(flen - 4)
    return frame * n_frames


def encode_webp_probe(i: int) -> bytes:
    """Deterministic RIFF/WebP stream: VP8L (lossless) header chunk
    with 14-bit packed dims (RFC 9649 layout) — header only, no
    bitstream (the probe never decodes)."""
    import struct

    mid = f"med-{i:08d}"
    w = 16 + umod(hk(mid, 90), 4000)
    h = 16 + umod(hk(mid, 91), 3000)
    bits = (w - 1) | ((h - 1) << 14)
    body = bytes([0x2F]) + struct.pack("<I", bits) + bytes(11)
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def encode_gif_probe(i: int) -> bytes:
    """Deterministic GIF89a stream: logical-screen dims + n image
    descriptors with empty-ish LZW sub-blocks (header-walk fodder; the
    probe never decodes)."""
    import struct

    mid = f"med-{i:08d}"
    w = 8 + umod(hk(mid, 92), 1000)
    h = 8 + umod(hk(mid, 93), 800)
    n_frames = 1 + umod(hk(mid, 94), 5)
    out = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0, 0, 0])
    for k in range(n_frames):
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
        out += bytes([2, 1, (i + k) & 0xFF, 0])  # lzw min, 1-byte block, end
    return out + b"\x3b"


def encode_tiff_probe(i: int) -> bytes:
    """Deterministic TIFF 6.0 stream: byte order alternates II/MM,
    IFD0 carries width/height/orientation/compression/samples tags
    (SHORT + LONG types, one value behind an offset so the indirect
    path is exercised), and a next-IFD chain makes some payloads
    multi-page — header-walk fodder; the probe never decodes strips."""
    import struct

    mid = f"med-{i:08d}"
    k = i // 5  # ordinal among the tiff fixtures: cycle every variant
    bo = "<" if k % 2 == 0 else ">"
    w = 16 + umod(hk(mid, 96), 6000)
    h = 16 + umod(hk(mid, 97), 4000)
    orient = 1 + k % 8
    comp = (1, 5, 7, 8)[k % 4]  # none/LZW/JPEG/deflate
    n_pages = 1 + k % 3

    def entry(tag: int, typ: int, cnt: int, val: int) -> bytes:
        if typ == 3:
            packed = struct.pack(bo + "H", val) + b"\x00\x00"
        else:
            packed = struct.pack(bo + "I", val)
        return struct.pack(bo + "HHI", tag, typ, cnt) + packed

    # IFD0 at offset 8; ImageLength stored as LONG behind an offset
    # (count*size > 4 is faked via count=1 LONG inline is 4 bytes, so
    # use a RATIONAL-sized XResolution tag for the indirect case).
    ifd0_entries = [
        entry(256, 4, 1, w),            # ImageWidth, LONG
        entry(257, 3, 1, h),            # ImageLength, SHORT
        entry(259, 3, 1, comp),         # Compression
        entry(274, 3, 1, orient),       # Orientation
        entry(277, 3, 1, 3),            # SamplesPerPixel
    ]
    # XResolution (tag 282, RATIONAL = 8 bytes) → indirect value
    n0 = len(ifd0_entries) + 1
    ifd0_size = 2 + 12 * n0 + 4
    rat_off = 8 + ifd0_size
    ifd0_entries.append(
        struct.pack(bo + "HHI", 282, 5, 1) + struct.pack(bo + "I", rat_off)
    )
    ifd0_entries.sort(key=lambda e: struct.unpack(bo + "H", e[:2])[0])
    rational = struct.pack(bo + "II", 72, 1)
    pos = rat_off + 8
    chunks = []
    next_off = pos if n_pages > 1 else 0
    chunks.append(
        struct.pack(bo + "H", n0)
        + b"".join(ifd0_entries)
        + struct.pack(bo + "I", next_off)
    )
    chunks.append(rational)
    for p in range(1, n_pages):
        sub = (
            struct.pack(bo + "H", 2)
            + entry(256, 4, 1, max(1, w >> p))
            + entry(257, 4, 1, max(1, h >> p))
        )
        pos += len(sub) + 4
        nxt = pos if p < n_pages - 1 else 0
        chunks.append(sub + struct.pack(bo + "I", nxt))
    hdr = (b"II" if bo == "<" else b"MM") + struct.pack(bo + "H", 42)
    return hdr + struct.pack(bo + "I", 8) + b"".join(chunks)


def encode_jpeg_probe(i: int) -> bytes:
    """Deterministic JPEG header stream: SOI, APP0 JFIF, APP1 Exif
    (an embedded little/big-endian TIFF IFD carrying Orientation),
    DQT filler, then SOF0 or SOF2 with the dims — marker-walk fodder;
    the probe never entropy-decodes."""
    import struct

    mid = f"jpg-{i:08d}"
    w = 16 + umod(hk(mid, 101), 5000)
    h = 16 + umod(hk(mid, 102), 4000)
    orient = 1 + i % 8
    progressive = i % 3 == 2
    bo = "<" if i % 2 == 0 else ">"

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    # APP1 Exif: IFD0 with the single Orientation SHORT entry
    ifd = struct.pack(bo + "H", 1)
    ifd += struct.pack(bo + "HHI", 274, 3, 1) + struct.pack(bo + "H", orient) + b"\x00\x00"
    ifd += struct.pack(bo + "I", 0)
    tiff = (b"II" if bo == "<" else b"MM") + struct.pack(bo + "H", 42)
    tiff += struct.pack(bo + "I", 8) + ifd
    out += seg(0xE1, b"Exif\x00\x00" + tiff)
    out += seg(0xDB, bytes(65))  # DQT filler the walk must skip
    sof_body = bytes([8]) + struct.pack(">HH", h, w) + bytes([3,
        1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += seg(0xC2 if progressive else 0xC0, sof_body)
    return out + seg(0xDA, bytes(10)) + b"\xff\xd9"


def media_row(i: int) -> dict:
    """(media_id, bytes, fmt) row for the container-probe stage: fmt
    cycles mp4/mp3/webp/gif/tiff; every 7th payload truncated (the
    malformed case a real corpus always contains — must yield
    ok=False, not a crash)."""
    mid = f"med-{i:08d}"
    fmt = ("mp4", "mp3", "webp", "gif", "tiff")[i % 5]
    data = {
        "mp4": encode_mp4_probe,
        "mp3": encode_mp3_probe,
        "webp": encode_webp_probe,
        "gif": encode_gif_probe,
        "tiff": encode_tiff_probe,
    }[fmt](i)
    if i % 7 == 3:
        data = data[: 11 + umod(hk(mid, 89), 37)]
    return {"media_id": mid, "bytes": data, "fmt": fmt}


def caption_of(image_id: str) -> str:
    h1, h2, h3 = hk(image_id, 5), hk(image_id, 6), hk(image_id, 7)
    return (
        f"a photo of {_NOUNS[umod(h1, len(_NOUNS))]} "
        f"{_VERBS[umod(h2, len(_VERBS))]} {_NOUNS[umod(h3, len(_NOUNS))]}"
    )


@dataclass
class ImageRow:
    image_id: str
    bytes: bytes
    w: int
    h: int
    fmt: str
    caption: str
    phash: int


def image_row(i: int) -> ImageRow:
    image_id = image_id_of(i)
    px = oracle_pixels(i)
    h, w = px.shape[:2]
    fmt = fmt_of(image_id)
    data = encode_image(px, fmt)
    decoded = decode_image(data, w, h, fmt)
    return ImageRow(
        image_id=image_id,
        bytes=data,
        w=w,
        h=h,
        fmt=fmt,
        caption=caption_of(image_id),
        phash=xxhash64(decoded.tobytes()),
    )


def images_pandas(n: int):
    """The corpus as a pandas DataFrame (small scales / tests)."""
    import pandas as pd

    rows = [image_row(i) for i in range(n)]
    return pd.DataFrame(
        {
            "image_id": [r.image_id for r in rows],
            "bytes": [r.bytes for r in rows],
            "w": np.array([r.w for r in rows], dtype=np.int32),
            "h": np.array([r.h for r in rows], dtype=np.int32),
            "fmt": [r.fmt for r in rows],
            "caption": [r.caption for r in rows],
            "phash": np.array([r.phash for r in rows], dtype=np.int64),
        }
    )


def images_df(spark, n: int, partitions: int | None = None):
    """The corpus as a Spark DataFrame.  For large n this generates
    *per-partition* on executors (mapInPandas over an id range) — never
    materializes rows on the driver; this is the pattern that scales the
    nominal frontier to 10^10 ids."""
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("image_id", StringType()),
            StructField("bytes", BinaryType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("fmt", StringType()),
            StructField("caption", StringType()),
            StructField("phash", LongType()),
        ]
    )

    def gen(iterator):
        for pdf in iterator:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                rows = [image_row(i) for i in range(lo, hi)]
                yield pd.DataFrame(
                    {
                        "image_id": [r.image_id for r in rows],
                        "bytes": [r.bytes for r in rows],
                        "w": np.array([r.w for r in rows], dtype=np.int32),
                        "h": np.array([r.h for r in rows], dtype=np.int32),
                        "fmt": [r.fmt for r in rows],
                        "caption": [r.caption for r in rows],
                        "phash": np.array([r.phash for r in rows], dtype=np.int64),
                    }
                )

    p = partitions or max(1, min(64, n // 250))
    step = (n + p - 1) // p
    ranges = [(lo, min(lo + step, n)) for lo in range(0, n, step)]
    bounds = spark.createDataFrame(ranges, "lo: long, hi: long").repartition(len(ranges))
    return bounds.mapInPandas(gen, schema)
