"""Minimal, real baseline JPEG codec — pure numpy, no PIL.

Implements the public JPEG standard (ITU-T T.81) for baseline
sequential DCT: JFIF segment structure, DQT/DHT/SOF0/SOS parsing,
canonical Huffman entropy coding with byte stuffing, 8×8 matrix
DCT/IDCT, YCbCr with 4:4:4 / 4:2:2 / 4:2:0 chroma sampling
(MCU-interleaved scan per T.81 A.2.3; box chroma down/up-sampling).
The encoder emits its Huffman and quant tables in the stream and the
decoder reads whatever tables and sampling factors the stream carries
(any H_i,V_i ∈ {1,2,4} with integer Hmax/H_i ratios — which covers
every JFIF file in practice, incl. the 4:2:0 that dominates real
corpora), so decode works for arbitrary baseline streams, not just
our own.  Out-of-scope inputs (progressive SOF2, 12-bit precision,
arithmetic coding, restart markers) raise ``ValueError`` with the
reason — never a silent mis-decode.

This is the north rule's "lossy format" path: the decode → re-encode
round trip at the default quality satisfies the PSNR ≥ 40 dB per-row
invariant on the fixture corpus (tests/test_jpeg.py).
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------- tables

_QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
_QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# our emitted Huffman shapes (decoder reads DHT, so any valid table works):
# DC: 12 symbols, all 4-bit codes; AC: 162 symbols, all 8-bit codes.
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_VALS = [
    (r << 4) | s for r in range(16) for s in range(1, 11)
] + [0x00, 0xF0]  # (run,size) pairs, EOB, ZRL
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]

_M = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _M[_u, _x] = (np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16
        )


def _canonical(bits: list[int], vals: list[int]):
    """(bits per length, symbols) → {symbol: (code, length)} (T.81 C.2)."""
    out = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _scaled_quant(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (tbl * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, length: int) -> int:
        while self.n < length:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # stuffed
                else:
                    raise ValueError("unexpected marker inside entropy data")
            self.acc = (self.acc << 8) | byte
            self.n += 8
        out = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return out


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _value_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _extend(bits: int, t: int) -> int:
    return bits if bits >= (1 << (t - 1)) else bits - (1 << t) + 1


# ----------------------------------------------------------------- encode


# (H, V) sampling factors per component for each supported layout
_SAMPLING = {
    "444": ((1, 1), (1, 1), (1, 1)),
    "422": ((2, 1), (1, 1), (1, 1)),
    "420": ((2, 2), (1, 1), (1, 1)),
}


def _box_downsample(plane: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """Box-average ``plane`` by (fy, fx); odd edges padded by replication
    first (the standard chroma downsampler shape)."""
    if fx == 1 and fy == 1:
        return plane
    h, w = plane.shape
    ph, pw = -(-h // fy) * fy, -(-w // fx) * fx
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))


def encode_jpeg(arr: np.ndarray, quality: int = 95, subsampling: str = "444") -> bytes:
    """uint8 (h, w, 3) RGB → baseline JFIF bytes; ``subsampling`` in
    {'444', '422', '420'} (MCU-interleaved scan for the latter two)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 (h, w, 3) RGB")
    if subsampling not in _SAMPLING:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    factors = _SAMPLING[subsampling]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    h, w, _ = arr.shape
    qy = _scaled_quant(_QUANT_LUMA, quality)
    qc = _scaled_quant(_QUANT_CHROMA, quality)

    rgb = arr.astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]

    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    dc_tbl = _canonical(_DC_BITS, _DC_VALS)
    ac_tbl = _canonical(_AC_BITS, _AC_VALS)

    # all DCTs at once: downsample + pad each component plane to its
    # MCU-aligned block grid (edge replication), view as (bh, bw, 8, 8)
    # blocks, one einsum per component — only entropy coding stays serial
    zz_all = []
    for ci, plane in enumerate(planes):
        hi, vi = factors[ci]
        comp = _box_downsample(plane, hmax // hi, vmax // vi)
        bwc, bhc = mcux * hi, mcuy * vi  # MCU-aligned block grid
        ch, cw = comp.shape
        padded = np.pad(
            comp, ((0, bhc * 8 - ch), (0, bwc * 8 - cw)), mode="edge"
        )
        blocks = padded.reshape(bhc, 8, bwc, 8).transpose(0, 2, 1, 3) - 128.0
        coeff = np.einsum("ui,byij,vj->byuv", _M, blocks, _M)
        q = qy if ci == 0 else qc
        zz = (
            np.round(coeff / q)
            .astype(np.int64)
            .reshape(bhc, bwc, 64)[:, :, _ZZ]
        )
        # baseline categories: AC fits 10 bits, DC diff 11 — extreme
        # blocks (e.g. Nyquist checkerboards) at quant=1 can exceed
        # them; clamp like production encoders do
        zz[:, :, 1:] = np.clip(zz[:, :, 1:], -1023, 1023)
        zz[:, :, 0] = np.clip(zz[:, :, 0], -1023, 1016)
        zz_all.append(zz)

    bw_out = _BitWriter()
    prev_dc = [0, 0, 0]
    # MCU-interleaved scan (T.81 A.2.3): for 4:4:4 this degenerates to
    # the per-block-position (by, bx, ci) order — bit-identical to the
    # pre-subsampling encoder
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                hi, vi = factors[ci]
                for v in range(vi):
                    for u in range(hi):
                        zz = zz_all[ci][my * vi + v, mx * hi + u]
                        # DC
                        diff = int(zz[0] - prev_dc[ci])
                        prev_dc[ci] = int(zz[0])
                        t = _category(diff)
                        code, ln = dc_tbl[t]
                        bw_out.write(code, ln)
                        if t:
                            bw_out.write(_value_bits(diff, t), t)
                        # AC
                        run = 0
                        for k in range(1, 64):
                            val = int(zz[k])
                            if val == 0:
                                run += 1
                                continue
                            while run >= 16:
                                code, ln = ac_tbl[0xF0]  # ZRL
                                bw_out.write(code, ln)
                                run -= 16
                            t = _category(val)
                            code, ln = ac_tbl[(run << 4) | t]
                            bw_out.write(code, ln)
                            bw_out.write(_value_bits(val, t), t)
                            run = 0
                        if run:
                            code, ln = ac_tbl[0x00]  # EOB
                            bw_out.write(code, ln)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(q.ravel()[_ZZ].astype(np.uint8)))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes(
            [
                1, (factors[0][0] << 4) | factors[0][1], 0,
                2, (factors[1][0] << 4) | factors[1][1], 1,
                3, (factors[2][0] << 4) | factors[2][1], 1,
            ]
        ),
    )
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (
        b"\xff\xd8"
        + app0
        + dqt(0, qy)
        + dqt(1, qc)
        + dht(0, 0, _DC_BITS, _DC_VALS)
        + dht(1, 0, _AC_BITS, _AC_VALS)
        + dht(0, 1, _DC_BITS, _DC_VALS)
        + dht(1, 1, _AC_BITS, _AC_VALS)
        + sof
        + sos
        + bw_out.flush()
        + b"\xff\xd9"
    )


# ----------------------------------------------------------------- decode


def _decode_tables(data: bytes):
    """Walk segments up to SOS; return (quant, huff, frame, entropy)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG segment desync")
        marker = (data[pos] << 8) | data[pos + 1]
        if marker == 0xFFD9:
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        if marker == 0xFFDB:
            i = 0
            while i < len(body):
                pq, tid = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZZ] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                quant[tid] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xFFC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                huff[(cls, tid)] = _canonical(bits, vals)
                i += 17 + nv
        elif marker == 0xFFC0:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, samp, qid = body[6 + 3 * c : 9 + 3 * c]
                hi, vi = samp >> 4, samp & 0xF
                if hi not in (1, 2, 4) or vi not in (1, 2, 4):
                    raise ValueError(f"unsupported sampling factors {hi}x{vi}")
                comps.append((cid, qid, hi, vi))
            frame = (h, w, comps)
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7):
            raise ValueError("only baseline sequential (SOF0) is supported")
        elif marker == 0xFFDD:
            if struct.unpack(">H", body[:2])[0] != 0:
                raise ValueError("restart markers (DRI) not supported")
        elif marker == 0xFFDA:
            ns = body[0]
            scan = [(body[1 + 2 * c], body[2 + 2 * c]) for c in range(ns)]
            return quant, huff, frame, scan, data[pos + 2 + ln :]
        pos += 2 + ln
    raise ValueError("JPEG missing SOS")


def _huff_decode(reader: _BitReader, table: dict) -> int:
    # tables are canonical: decode by extending one bit at a time
    inv = table.get("__inv")
    if inv is None:
        inv = {cl: s for s, cl in table.items()}
        table["__inv"] = inv
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read(1)
        sym = inv.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 (h, w, 3) RGB.  Handles any sampling
    layout the SOF0 declares (4:4:4 / 4:2:2 / 4:2:0 / …) via the
    MCU-interleaved scan; chroma is upsampled by pixel replication."""
    quant, huff, frame, scan, entropy = _decode_tables(data)
    if frame is None:
        raise ValueError("JPEG missing SOF0")
    h, w, comps = frame
    if len(comps) != 3 or len(scan) != 3:
        raise ValueError("only 3-component YCbCr JPEG supported")
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    for _, _, hi, vi in comps:
        if hmax % hi or vmax % vi:
            raise ValueError("non-integer sampling ratios not supported")
    end = entropy.rfind(b"\xff\xd9")
    reader = _BitReader(entropy[: end if end >= 0 else len(entropy)])

    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    # entropy decode (serial by nature) fills per-component coefficient
    # grids; all IDCTs then run as one einsum per component
    zz_all = [
        np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
        for _, _, hi, vi in comps
    ]
    prev_dc = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                _, _, hi, vi = comps[ci]
                dc_t = huff[(0, scan[ci][1] >> 4)]
                ac_t = huff[(1, scan[ci][1] & 0xF)]
                for v in range(vi):
                    for u in range(hi):
                        t = _huff_decode(reader, dc_t)
                        diff = _extend(reader.read(t), t) if t else 0
                        prev_dc[ci] += diff
                        zz = zz_all[ci][my * vi + v, mx * hi + u]
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(reader, ac_t)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            t = sym & 0xF
                            if k > 63:
                                raise ValueError("AC coefficient index overflow")
                            zz[k] = _extend(reader.read(t), t)
                            k += 1

    planes = []
    for ci in range(3):
        _, qid, hi, vi = comps[ci]
        bhc, bwc = mcuy * vi, mcux * hi
        coeff = np.zeros((bhc, bwc, 64))
        coeff[:, :, _ZZ] = zz_all[ci]
        coeff = coeff.reshape(bhc, bwc, 8, 8) * quant[qid]
        blocks = np.einsum("iu,byuv,jv->byij", _M.T.copy(), coeff, _M.T.copy()) + 128.0
        plane = blocks.transpose(0, 2, 1, 3).reshape(bhc * 8, bwc * 8)
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:  # crop to true component size, then replicate
            ch, cw = -(-h * vi // vmax), -(-w * hi // hmax)
            plane = plane[:ch, :cw].repeat(fy, axis=0).repeat(fx, axis=1)
        planes.append(plane)

    y = planes[0][:h, :w]
    cb = planes[1][:h, :w] - 128.0
    cr = planes[2][:h, :w] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
