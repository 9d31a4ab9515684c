"""Container metadata probes — pure struct parsing, no codecs.

A 100 TB curation pipeline filters on cheap container metadata
(duration, dimensions, codec, bitrate) long before paying for a real
decode.  These probes implement the public container formats' header
structures:

  * MP4/ISO-BMFF (ISO 14496-12): box walk → mvhd duration/timescale,
    tkhd track dimensions, stsd sample-entry codec fourcc.
  * MP3 (MPEG-1/2 audio): frame-header sync walk → version/layer,
    bitrate, sample rate, channel mode, frame count → duration
    estimate.

Decoding the streams still requires ffmpeg (documented integration
point) — the probes never pretend otherwise; malformed input raises
``ValueError``.
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------- MP4


def probe_mp4(data: bytes) -> dict:
    """ISO-BMFF box walk → {duration_s, timescale, width, height,
    codecs: [fourcc]}.  Requires an ftyp/moov at the top level."""
    boxes = dict(_walk_boxes(data, 0, len(data)))
    if "ftyp" not in boxes and "moov" not in boxes:
        raise ValueError("not an ISO-BMFF (mp4) stream: no ftyp/moov box")
    out = {"duration_s": None, "timescale": None, "width": None, "height": None,
           "codecs": []}
    moov = boxes.get("moov")
    if moov is None:
        return out
    for name, (s, e) in _walk_boxes(data, *moov):
        if name == "mvhd":
            ver = data[s]
            if ver == 1:
                ts, dur = struct.unpack(">IQ", data[s + 20 : s + 32])
            else:
                ts, dur = struct.unpack(">II", data[s + 12 : s + 20])
            out["timescale"] = ts
            out["duration_s"] = round(dur / ts, 3) if ts else None
        elif name == "trak":
            for n2, (s2, e2) in _walk_boxes(data, s, e):
                if n2 == "tkhd":
                    # width/height: last 8 bytes, 16.16 fixed point
                    w_fx, h_fx = struct.unpack(">II", data[e2 - 8 : e2])
                    if w_fx and h_fx:
                        out["width"] = w_fx >> 16
                        out["height"] = h_fx >> 16
                elif n2 == "mdia":
                    out["codecs"].extend(_mdia_codecs(data, s2, e2))
    return out


def _walk_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        name = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"mp4 box {name!r} overruns its container")
        try:
            yield name.decode("ascii"), (pos + hdr, pos + size)
        except UnicodeDecodeError as err:
            raise ValueError(f"mp4 box name {name!r} not ascii") from err
        pos += size


def _mdia_codecs(data: bytes, start: int, end: int):
    for name, (s, e) in _walk_boxes(data, start, end):
        if name == "minf":
            for n2, (s2, e2) in _walk_boxes(data, s, e):
                if n2 == "stbl":
                    for n3, (s3, e3) in _walk_boxes(data, s2, e2):
                        if n3 == "stsd":
                            (cnt,) = struct.unpack(">I", data[s3 + 4 : s3 + 8])
                            pos = s3 + 8
                            for _ in range(cnt):
                                if pos + 8 > e3:
                                    break
                                yield data[pos + 4 : pos + 8].decode(
                                    "ascii", "replace"
                                )
                                (esz,) = struct.unpack(
                                    ">I", data[pos : pos + 4]
                                )
                                pos += max(esz, 8)


# --------------------------------------------------------------- WebP


def probe_webp(data: bytes) -> dict:
    """RIFF/WebP header probe → {width, height, codec} without any
    codec: walks the RIFF chunk list and reads the dimensions from the
    first VP8 (lossy key-frame header, sync 9D 01 2A), VP8L (lossless,
    14-bit packed dims) or VP8X (extended, 24-bit canvas dims) chunk —
    the public container layout (RFC 9649).  Malformed input raises
    ``ValueError``."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP stream")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8 ":
            if len(body) < 10:
                raise ValueError("VP8 chunk truncated")
            if body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("VP8 key-frame sync code missing")
            w, h = struct.unpack("<HH", body[6:10])
            return {"width": w & 0x3FFF, "height": h & 0x3FFF, "codec": "VP8"}
        if fourcc == b"VP8L":
            if len(body) < 5 or body[0] != 0x2F:
                raise ValueError("VP8L signature missing")
            (bits,) = struct.unpack("<I", body[1:5])
            return {
                "width": (bits & 0x3FFF) + 1,
                "height": ((bits >> 14) & 0x3FFF) + 1,
                "codec": "VP8L",
            }
        if fourcc == b"VP8X":
            if len(body) < 10:
                raise ValueError("VP8X chunk truncated")
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            return {"width": w, "height": h, "codec": "VP8X"}
        pos += 8 + size + (size & 1)  # RIFF chunks pad to even
    raise ValueError("no VP8/VP8L/VP8X chunk found")


# --------------------------------------------------------------- GIF


def probe_gif(data: bytes) -> dict:
    """GIF header probe → {width, height, codec, n_frames} without
    decoding: signature (GIF87a/GIF89a), logical-screen descriptor
    dims, then a block walk counting image descriptors (0x2C) —
    skipping the global/local color tables and extension sub-blocks per
    the public GIF89a spec.  n_frames > 1 means animated.  Malformed
    input raises ``ValueError``."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream (bad signature)")
    w, h = struct.unpack("<HH", data[6:10])
    packed = data[10]
    pos = 13
    if packed & 0x80:  # global color table: 3 * 2^(N+1) bytes
        pos += 3 * (2 << (packed & 0x07))
    frames = 0
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x2C:  # image descriptor
            frames += 1
            if pos + 10 > len(data):
                raise ValueError("GIF image descriptor truncated")
            lp = data[pos + 9]
            pos += 10
            if lp & 0x80:  # local color table
                pos += 3 * (2 << (lp & 0x07))
            pos += 1  # LZW minimum code size
            while pos < len(data) and data[pos] != 0:  # data sub-blocks
                pos += 1 + data[pos]
            pos += 1  # block terminator
        elif b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    if frames == 0:
        raise ValueError("GIF contains no image descriptor")
    return {"width": w, "height": h, "codec": "gif", "n_frames": frames}


# --------------------------------------------------------------- TIFF

_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
                   10: 8, 11: 4, 12: 8}


def probe_tiff(data: bytes, max_ifds: int = 10_000) -> dict:
    """TIFF 6.0 header + IFD walk (the EXIF container layout) →
    {width, height, orientation, compression, samples_per_pixel,
    n_pages} without decoding any strip/tile data: byte-order mark
    (II/MM) + magic 42, then the IFD0 entry table (tag/type/count/value
    12-byte entries, inline values ≤ 4 bytes per the public spec) and
    the next-IFD chain for the page count.  Malformed input raises
    ``ValueError``."""
    if len(data) < 8:
        raise ValueError("not a TIFF stream (short header)")
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF stream (bad byte-order mark)")
    (magic,) = struct.unpack(bo + "H", data[2:4])
    if magic != 42:
        raise ValueError(f"not a TIFF stream (magic {magic}, want 42)")
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])

    out = {"width": None, "height": None, "orientation": 1,
           "compression": 1, "samples_per_pixel": None, "n_pages": 0}
    seen_offsets = set()
    while ifd_off:
        if ifd_off in seen_offsets or len(seen_offsets) >= max_ifds:
            raise ValueError("TIFF IFD chain loops")
        seen_offsets.add(ifd_off)
        if ifd_off + 2 > len(data):
            raise ValueError("TIFF IFD offset beyond payload")
        (n_entries,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
        end = ifd_off + 2 + 12 * n_entries
        if end + 4 > len(data):
            raise ValueError("TIFF IFD entry table truncated")
        if out["n_pages"] == 0:  # tags read from IFD0 only
            for k in range(n_entries):
                e = ifd_off + 2 + 12 * k
                tag, typ = struct.unpack(bo + "HH", data[e : e + 4])
                (cnt,) = struct.unpack(bo + "I", data[e + 4 : e + 8])
                size = _TIFF_TYPE_SIZE.get(typ, 0) * cnt
                if size == 0:
                    continue
                if size <= 4:
                    vbytes = data[e + 8 : e + 12]
                else:
                    (voff,) = struct.unpack(bo + "I", data[e + 8 : e + 12])
                    if voff + size > len(data):
                        raise ValueError(f"TIFF tag {tag} value overruns payload")
                    vbytes = data[voff : voff + size]
                if typ == 3:
                    val = struct.unpack(bo + "H", vbytes[:2])[0]
                elif typ == 4:
                    val = struct.unpack(bo + "I", vbytes[:4])[0]
                else:
                    continue  # only SHORT/LONG tags matter here
                if tag == 256:
                    out["width"] = val
                elif tag == 257:
                    out["height"] = val
                elif tag == 259:
                    out["compression"] = val
                elif tag == 274:
                    if val == 0:  # 0 = "undefined", common in the wild
                        continue  # keep the upright default
                    if not 1 <= val <= 8:
                        raise ValueError(f"TIFF orientation {val} out of range")
                    out["orientation"] = val
                elif tag == 277:
                    out["samples_per_pixel"] = val
        out["n_pages"] += 1
        (ifd_off,) = struct.unpack(bo + "I", data[end : end + 4])
    if out["n_pages"] == 0:
        raise ValueError("TIFF contains no IFD")
    if out["width"] is None or out["height"] is None:
        raise ValueError("TIFF IFD0 missing ImageWidth/ImageLength")
    return out


# --------------------------------------------------------------- JPEG

_SOF_MARKERS = {0xC0: False, 0xC1: False, 0xC2: True, 0xC3: False,
                0xC5: False, 0xC6: True, 0xC7: False, 0xC9: False,
                0xCA: True, 0xCB: False, 0xCD: False, 0xCE: True,
                0xCF: False}


def _exif_orientation(tiff: bytes) -> int:
    """Orientation (tag 274) from the TIFF stream embedded in a JPEG
    APP1 Exif segment; 1 when absent.  Malformed embedded TIFF raises
    ``ValueError`` like every other probe."""
    if len(tiff) < 8:
        raise ValueError("Exif TIFF header truncated")
    if tiff[:2] == b"II":
        bo = "<"
    elif tiff[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("Exif TIFF byte-order mark missing")
    if struct.unpack(bo + "H", tiff[2:4])[0] != 42:
        raise ValueError("Exif TIFF magic missing")
    (off,) = struct.unpack(bo + "I", tiff[4:8])
    if off + 2 > len(tiff):
        raise ValueError("Exif IFD0 offset beyond segment")
    (n,) = struct.unpack(bo + "H", tiff[off : off + 2])
    if off + 2 + 12 * n > len(tiff):
        raise ValueError("Exif IFD0 truncated")
    for k in range(n):
        e = off + 2 + 12 * k
        tag, typ = struct.unpack(bo + "HH", tiff[e : e + 4])
        if tag == 274 and typ == 3:
            val = struct.unpack(bo + "H", tiff[e + 8 : e + 10])[0]
            if val == 0:
                return 1  # 0 = "undefined", common in the wild → upright
            if not 1 <= val <= 8:
                raise ValueError(f"Exif orientation {val} out of range")
            return val
    return 1


def probe_jpeg(data: bytes) -> dict:
    """JPEG segment walk → {width, height, progressive, orientation}
    without entropy decoding: SOI, then marker segments until a frame
    header (any SOFn) supplies the dimensions; an APP1 Exif segment —
    an embedded TIFF stream, probed with the same IFD walk — supplies
    the orientation (1 when absent).  The pre-decode gate that lets a
    pipeline reject wrong-sized/rotated images before paying for a
    real decode.  Malformed input raises ``ValueError``."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (no SOI)")
    out = {"width": None, "height": None, "progressive": None, "orientation": 1}
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG marker sync lost at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # legal fill byte before a marker
            pos += 1
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI/RSTn: bare
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if seglen < 2 or pos + 2 + seglen > len(data):
            raise ValueError(f"JPEG segment 0x{marker:02x} overruns payload")
        body = data[pos + 4 : pos + 2 + seglen]
        if marker in _SOF_MARKERS:
            if len(body) < 5:
                raise ValueError("JPEG SOF truncated")
            out["height"], out["width"] = struct.unpack(">HH", body[1:5])
            out["progressive"] = _SOF_MARKERS[marker]
            return out  # dims found; entropy data follows
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            out["orientation"] = _exif_orientation(body[6:])
        if marker == 0xDA:  # SOS before any SOF: malformed
            break
        pos += 2 + seglen
    raise ValueError("no JPEG frame header (SOFn) found")


# --------------------------------------------------------------- MP3

_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                  256, 320, 0]
_BITRATES_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                  160, 0]
_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
          0: [11025, 12000, 8000]}


def probe_mp3(data: bytes, max_frames: int = 10_000) -> dict:
    """MP3 frame-header walk → {frames, sample_rate, bitrate_kbps,
    channels, duration_s}.  Skips an ID3v2 tag if present; requires at
    least two valid consecutive frame headers (the standard
    false-sync guard)."""
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        sz = (
            (data[6] & 0x7F) << 21
            | (data[7] & 0x7F) << 14
            | (data[8] & 0x7F) << 7
            | (data[9] & 0x7F)
        )
        pos = 10 + sz
    frames = 0
    rate = kbps = channels = None
    samples_per_frame = 1152
    while pos + 4 <= len(data) and frames < max_frames:
        hdr = struct.unpack(">I", data[pos : pos + 4])[0]
        if (hdr >> 21) & 0x7FF != 0x7FF:
            if frames:
                break
            raise ValueError("no MP3 frame sync")
        version = (hdr >> 19) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (hdr >> 17) & 3  # 1 = Layer III
        if version == 1 or layer != 1:
            raise ValueError("unsupported MPEG version/layer (Layer III only)")
        br_idx = (hdr >> 12) & 0xF
        sr_idx = (hdr >> 10) & 3
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("free-form/invalid MP3 bitrate or sample rate")
        pad = (hdr >> 9) & 1
        mode = (hdr >> 6) & 3
        table = _BITRATES_V1L3 if version == 3 else _BITRATES_V2L3
        kbps = table[br_idx]
        rate = _RATES[version][sr_idx]
        samples_per_frame = 1152 if version == 3 else 576
        frame_len = samples_per_frame // 8 * kbps * 1000 // rate + pad
        channels = 1 if mode == 3 else 2
        frames += 1
        pos += frame_len
    if frames < 2:
        raise ValueError("fewer than 2 valid MP3 frames")
    return {
        "frames": frames,
        "sample_rate": rate,
        "bitrate_kbps": kbps,
        "channels": channels,
        "duration_s": round(frames * samples_per_frame / rate, 3),
    }


def strip_jpeg_metadata(data: bytes) -> tuple[bytes, int, int]:
    """Privacy scrub for JPEG payloads: drop every APP1-APP15 and COM
    segment (Exif with its GPS/serial tags, XMP, ICC, Photoshop IRBs,
    free-text comments) while keeping the image stream itself intact —
    SOI, APP0/JFIF, DQT, DHT, DRI, SOFn, every SOS with its entropy
    data, EOI.  Returns (scrubbed_bytes, n_segments_removed,
    bytes_removed); decoding the scrubbed stream yields bit-identical
    pixels (Exif orientation is deliberately gone: a corpus pipeline
    scrubs AFTER orientation normalization).  Malformed input raises
    ``ValueError`` like the probes."""
    from .jpeg import _entropy_end

    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (no SOI)")
    out = bytearray(b"\xff\xd8")
    n_removed = 0
    bytes_removed = 0
    pos = 2
    n = len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG marker sync lost at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # legal fill byte before a marker
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            out += b"\xff\xd9"
            pos += 2
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            out += data[pos : pos + 2]
            pos += 2
            continue
        if pos + 4 > n:
            raise ValueError("JPEG truncated in segment header")
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if seglen < 2 or pos + 2 + seglen > n:
            raise ValueError(f"JPEG segment 0x{marker:02x} overruns payload")
        nxt = pos + 2 + seglen
        if marker == 0xDA:  # SOS: header + entropy data to next marker
            end = _entropy_end(data, nxt)
            out += data[pos:end]
            pos = end
            continue
        if 0xE1 <= marker <= 0xEF or marker == 0xFE:  # APPn>0 / COM
            n_removed += 1
            bytes_removed += 2 + seglen
        else:
            out += data[pos:nxt]
        pos = nxt
    return bytes(out), n_removed, bytes_removed
