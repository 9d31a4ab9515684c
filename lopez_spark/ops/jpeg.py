"""Minimal, real JPEG codec — pure numpy, no PIL.

Implements the public JPEG standard (ITU-T T.81) for DCT coding:
JFIF segment structure, DQT/DHT/SOF0/SOF2/DRI/SOS parsing, canonical
Huffman entropy coding with byte stuffing, 8×8 matrix DCT/IDCT,
YCbCr with 4:4:4 / 4:2:2 / 4:2:0 chroma sampling (MCU-interleaved
scan per T.81 A.2.3; box chroma down/up-sampling).  Decode covers
both **baseline sequential (SOF0)** and **progressive (SOF2)** —
spectral selection, successive approximation (DC point transform,
AC refinement with EOB-run semantics per T.81 G.1.2), restart
markers (DRI/RSTn), and single-component (grayscale) frames.  The
encoder emits its Huffman and quant tables in the stream and the
decoder reads whatever tables and sampling factors the stream
carries (any H_i,V_i ∈ {1,2,4} with integer Hmax/H_i ratios — which
covers every JFIF file in practice, incl. the 4:2:0 progressive
streams that dominate real corpora), so decode works for arbitrary
streams, not just our own.  ``encode_jpeg(..., progressive=True)``
writes a multi-scan SOF2 stream (jpegtran-style scan script) so the
progressive path is round-trip testable without PIL: baseline and
progressive encodes of the same image decode bit-identically (the
entropy layer is lossless both ways).  Out-of-scope inputs (12-bit
precision, arithmetic coding, lossless/hierarchical processes)
raise ``ValueError`` with the reason — never a silent mis-decode.

This is the north rule's "lossy format" path: the decode → re-encode
round trip at the default quality satisfies the PSNR ≥ 40 dB per-row
invariant on the fixture corpus (tests/test_jpeg.py).
"""

from __future__ import annotations

import struct

import numpy as np

from lopez_spark.ops.limits import check_pixels

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
    """Deferred bit packer: ``write`` only records (code, length) pairs;
    the packing — placing each code at its cumulative bit offset,
    1-padding to a byte boundary, 0xFF byte stuffing — happens once per
    entropy segment in vectorized numpy (codes occupy disjoint bit
    spans, so per-byte contributions sum without carries and four
    ``bincount`` scatters assemble the stream)."""

    def __init__(self):
        self.codes: list[int] = []
        self.lens: list[int] = []
        self.chunks: list[tuple[np.ndarray, np.ndarray]] = []
        self.parts: list[bytes] = []

    def write(self, code: int, length: int) -> None:
        self.codes.append(code)
        self.lens.append(length)

    def write_chunk(self, codes: np.ndarray, lens: np.ndarray) -> None:
        """Append a pre-vectorized (codes, lens) run without a list
        round trip (the bulk emit path)."""
        if self.codes:
            self.chunks.append(
                (
                    np.asarray(self.codes, dtype=np.uint64),
                    np.asarray(self.lens, dtype=np.uint64),
                )
            )
            self.codes = []
            self.lens = []
        self.chunks.append(
            (codes.astype(np.uint64), lens.astype(np.uint64))
        )

    def _pack(self) -> bytes:
        if self.codes:
            self.chunks.append(
                (
                    np.asarray(self.codes, dtype=np.uint64),
                    np.asarray(self.lens, dtype=np.uint64),
                )
            )
            self.codes = []
            self.lens = []
        if not self.chunks:
            return b""
        if len(self.chunks) == 1:
            codes, lens = self.chunks[0]
        else:
            codes = np.concatenate([c for c, _ in self.chunks])
            lens = np.concatenate([ln for _, ln in self.chunks])
        self.chunks = []
        ends = np.cumsum(lens)
        starts = ends - lens
        total = int(ends[-1]) if len(ends) else 0
        if total == 0:
            return b""
        nbytes = (total + 7) // 8
        # mask to declared width, then left-align each code inside the
        # 32-bit window that starts at its byte: len + (start&7) <= 23
        codes &= (np.uint64(1) << lens) - np.uint64(1)
        w = codes << (np.uint64(32) - lens - (starts & np.uint64(7)))
        byte0 = (starts >> np.uint64(3)).astype(np.int64)
        acc = np.zeros(nbytes + 4, dtype=np.float64)
        for k in range(4):
            acc += np.bincount(
                byte0 + k,
                weights=(
                    (w >> np.uint64(8 * (3 - k))) & np.uint64(0xFF)
                ).astype(np.float64),
                minlength=nbytes + 4,
            )[: nbytes + 4]
        out = acc[:nbytes].astype(np.uint8)
        if total & 7:  # pad with 1s
            out[-1] |= (1 << (8 - (total & 7))) - 1
        stuff = np.flatnonzero(out == 0xFF)
        if len(stuff):
            out = np.insert(out, stuff + 1, np.uint8(0))
        return out.tobytes()

    def marker(self, byte2: int) -> None:
        """Byte-align and emit a bare marker (RSTn) — unstuffed."""
        self.parts.append(self._pack())
        self.parts.append(bytes([0xFF, byte2]))

    def flush(self) -> bytes:
        self.parts.append(self._pack())
        out = b"".join(self.parts)
        self.parts = []
        return out


class _FastBits:
    """Table-driven entropy reader: the whole scan's entropy segment is
    unstuffed ONCE (vectorized 0xFF scan; RSTn boundaries recorded, the
    markers removed), then every Huffman symbol is one 16-bit peek into
    a per-table LUT and every receive is one peek+shift — no per-bit
    Python loop.  Same peek+LUT shape that took the VP8L decoder from
    1.3 to 6-8 img/s; here it replaces the bit-at-a-time `_BitReader`
    walk that dominated decode (~610 ms for 256×256)."""

    __slots__ = ("w24", "pos", "nbits", "bounds", "bidx")

    def __init__(self, data: bytes, allow_restarts: bool = True):
        arr = np.frombuffer(data, dtype=np.uint8)
        drop: list[int] = []
        bounds: list[int] = []  # original byte offsets past each RSTn
        n = len(arr)
        for j in np.flatnonzero(arr == 0xFF).tolist():
            if j + 1 >= n:
                drop.append(j)  # lone trailing 0xFF: ends the stream
                break
            nxt = int(arr[j + 1])
            if nxt == 0x00:
                drop.append(j + 1)  # stuffed: keep the 0xFF data byte
            elif 0xD0 <= nxt <= 0xD7 and allow_restarts:
                drop.append(j)
                drop.append(j + 1)
                bounds.append(j + 2)
            else:
                # RSTn in a scan with no DRI is as malformed as any
                # other marker — never splice it into the bitstream
                raise ValueError("unexpected marker inside entropy data")
        if drop:
            keep = np.ones(n, dtype=bool)
            keep[drop] = False
            unstuffed = arr[keep].tobytes()
            dropped = np.asarray(drop)
            self.bounds = [
                b - int(np.searchsorted(dropped, b)) for b in bounds
            ]
        else:
            unstuffed = data if isinstance(data, bytes) else arr.tobytes()
            self.bounds = bounds
        self.nbits = 8 * len(unstuffed)
        u = np.frombuffer(unstuffed + b"\x00\x00", dtype=np.uint8).astype(
            np.uint32
        )
        # w24[i] = bytes i..i+2 big-endian: peek16 at bit p is
        # (w24[p>>3] >> (8 - (p&7))) & 0xFFFF.  A Python list indexes
        # ~3x faster than the ndarray in the symbol loop but costs ~36
        # bytes/entry; for outsized entropy segments (rare multi-MB
        # frames) keep the compact ndarray — same code path, graceful
        # slowdown instead of a per-decode memory spike.
        w24 = (u[:-2] << 16) | (u[1:-1] << 8) | u[2:]
        self.w24 = w24.tolist() if len(w24) <= (1 << 21) else w24
        self.pos = 0
        self.bidx = 0

    def huff(self, lut: list[int]) -> int:
        pos = self.pos
        if pos >= self.nbits:
            raise ValueError("JPEG entropy stream truncated")
        e = lut[int(self.w24[pos >> 3] >> (8 - (pos & 7))) & 0xFFFF]
        if e == 0:
            raise ValueError("invalid Huffman code in JPEG stream")
        pos += e & 31
        if pos > self.nbits:
            raise ValueError("JPEG entropy stream truncated")
        self.pos = pos
        return e >> 5

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        pos = self.pos
        end = pos + length
        if end > self.nbits:
            raise ValueError("JPEG entropy stream truncated")
        self.pos = end
        # int(): the oversized-segment fallback keeps w24 as ndarray,
        # and np.uint32 would wrap in the caller's signed arithmetic
        return (
            int(self.w24[pos >> 3] >> (8 - (pos & 7))) & 0xFFFF
        ) >> (16 - length)

    def restart(self) -> None:
        """Consume the RSTn marker expected at the current byte-aligned
        position (T.81 E.2.4) — it must sit exactly where the decoder
        stands (only that segment's pad bits may be skipped), else the
        stream is malformed."""
        if self.bidx >= len(self.bounds):
            raise ValueError("expected JPEG restart marker")
        b = self.bounds[self.bidx]
        self.bidx += 1
        if b != (self.pos + 7) >> 3:
            raise ValueError("expected JPEG restart marker")
        self.pos = 8 * b


_LUT_CACHE: dict[tuple, list[int]] = {}
# each cached LUT is a 65536-entry Python list (~2.3 MB with its int
# objects).  Fixed Annex K tables hit forever; optimized-coding JPEGs
# (libjpeg optimize_coding) carry image-specific tables, so bound the
# cache or a long-lived executor leaks ~5-9 MB per such image.
_LUT_CACHE_MAX = 8


def _decode_lut(bits: list[int], vals: list[int]) -> list[int]:
    """Canonical Huffman table → 2^16-entry peek LUT: entry = (symbol
    << 5) | code_length, 0 = invalid prefix.  Cached by table content
    (bounded FIFO) — real corpora overwhelmingly reuse the Annex K
    tables, so the build cost is paid once per process, not per
    image."""
    key = (bytes(bits), bytes(vals))
    lut = _LUT_CACHE.get(key)
    if lut is None:
        arr = np.zeros(1 << 16, dtype=np.int32)
        code = 0
        i = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                arr[lo : lo + (1 << (16 - length))] = (vals[i] << 5) | length
                code += 1
                i += 1
            code <<= 1
        lut = arr.tolist()
        if len(_LUT_CACHE) >= _LUT_CACHE_MAX:
            _LUT_CACHE.pop(next(iter(_LUT_CACHE)))
        _LUT_CACHE[key] = lut
    return lut


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


def _emit_dc_first(wr: _BitWriter, dc_tbl: dict, zz0: int, pred: int, al: int) -> int:
    """DC first-scan emit (T.81 G.1.2.1): code the point-transformed
    diff; returns the new predictor (in the shifted domain)."""
    tmp = int(zz0) >> al  # arithmetic shift per spec
    diff = tmp - pred
    t = _category(diff)
    code, ln = dc_tbl[t]
    wr.write(code, ln)
    if t:
        wr.write(_value_bits(diff, t), t)
    return tmp


def _emit_ac_first(
    wr: _BitWriter, ac_tbl: dict, zz: np.ndarray, ss: int, se: int, al: int
) -> None:
    """AC first-scan emit for one block (baseline when ss=1, se=63,
    al=0 — byte-identical to the classic sequential emit).  EOB runs
    are flushed per block (our fixed table carries only the EOB0
    symbol), which every decoder accepts."""
    run = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        v = (abs(v) >> al) * (1 if v > 0 else -1)  # truncate toward zero
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_tbl[0xF0]  # ZRL
            wr.write(code, ln)
            run -= 16
        t = _category(v)
        code, ln = ac_tbl[(run << 4) | t]
        wr.write(code, ln)
        wr.write(_value_bits(v, t), t)
        run = 0
    if run:
        code, ln = ac_tbl[0x00]  # EOB
        wr.write(code, ln)


def _emit_ac_refine(
    wr: _BitWriter, ac_tbl: dict, zz: np.ndarray, ss: int, se: int, al: int
) -> None:
    """AC successive-approximation refinement emit for one block
    (T.81 G.1.2.3): newly-significant coefficients (|v|>>al == 1) get
    a (run,1) code + sign bit; history-nonzero ones get correction
    bits buffered and flushed after the next emitted symbol; the
    trailing end-of-band is flushed as EOB0 per block."""
    vals = [int(zz[k]) for k in range(ss, se + 1)]
    ts = [abs(v) >> al for v in vals]
    eob = -1  # index of the last newly-significant coefficient
    for i, t in enumerate(ts):
        if t == 1:
            eob = i
    br: list[int] = []  # buffered correction bits
    run = 0
    for i, t in enumerate(ts):
        if t == 0:
            run += 1
            continue
        # flush pending ZRLs at EVERY nonzero (history or new) so the
        # buffered bits stay within the span of the symbol that carries
        # them — the decoder consumes them interleaved during its walk.
        # Beyond the last new coefficient the run folds into the EOB.
        while run > 15 and i <= eob:
            code, ln = ac_tbl[0xF0]
            wr.write(code, ln)
            for b in br:
                wr.write(b, 1)
            br.clear()
            run -= 16
        if t > 1:  # already significant in a prior scan: correction bit
            br.append(t & 1)
            continue
        # newly significant (t == 1)
        code, ln = ac_tbl[(run << 4) | 1]
        wr.write(code, ln)
        wr.write(1 if vals[i] > 0 else 0, 1)
        for b in br:
            wr.write(b, 1)
        br.clear()
        run = 0
    if run or br:
        code, ln = ac_tbl[0x00]  # EOB0: run of exactly one block
        wr.write(code, ln)
        for b in br:
            wr.write(b, 1)


# tests flip this to pin the vectorized baseline emit byte-identical
# to the generic per-coefficient loop (the progressive/restart path)
_VEC_EMIT = True


def _bit_length_vec(v: np.ndarray) -> np.ndarray:
    """Vectorized T.81 category (bit length of |v|).  Exact for the
    baseline range (|v| <= 2047): powers of two are exact in float64,
    so floor(log2) never straddles a category boundary."""
    a = np.abs(v)
    t = np.zeros(len(v), dtype=np.int64)
    nz = a > 0
    t[nz] = np.floor(np.log2(a[nz])).astype(np.int64) + 1
    return t


def _emit_baseline_vec(
    wr: _BitWriter,
    zz: np.ndarray,
    comp_ids: np.ndarray,
    dc_tbl: dict,
    ac_tbl: dict,
) -> None:
    """Vectorized baseline-scan entropy emit: ``zz`` is (N, 64) blocks
    already in emission order.  Every symbol of the scan — DC diff
    codes, ZRLs, (run,size) AC codes, value bits, per-block EOBs — is
    computed as flat numpy arrays, given a unique (block, coefficient,
    kind) sort key, and appended to the writer in one ordered pass.
    Byte-identical to the per-coefficient loop (tests pin this)."""
    n = zz.shape[0]
    dc_codes = np.zeros(12, dtype=np.int64)
    dc_lens = np.zeros(12, dtype=np.int64)
    for sym, (code, ln) in dc_tbl.items():
        if isinstance(sym, int) and sym < 12:
            dc_codes[sym], dc_lens[sym] = code, ln
    ac_codes = np.zeros(256, dtype=np.int64)
    ac_lens = np.zeros(256, dtype=np.int64)
    for sym, (code, ln) in ac_tbl.items():
        if isinstance(sym, int):
            ac_codes[sym], ac_lens[sym] = code, ln

    # DC: per-component sequential prediction over the emission order
    dc = zz[:, 0].astype(np.int64)
    diffs = np.empty(n, dtype=np.int64)
    for c in np.unique(comp_ids):
        m = comp_ids == c
        sub = dc[m]
        d = np.empty_like(sub)
        d[0] = sub[0]
        d[1:] = sub[1:] - sub[:-1]
        diffs[m] = d
    t_dc = _bit_length_vec(diffs)
    vb_dc = np.where(diffs >= 0, diffs, diffs + (1 << t_dc) - 1)
    bidx = np.arange(n, dtype=np.int64) << 11  # 64 coeffs x 32 kinds

    # AC: nonzeros, zero runs split into ZRLs + (run, size) symbols
    flat = zz[:, 1:]
    nzb, nzk = np.nonzero(flat)
    k = nzk + 1
    vals = flat[nzb, nzk].astype(np.int64)
    first = np.empty(len(k), dtype=bool)
    if len(k):
        first[0] = True
        first[1:] = nzb[1:] != nzb[:-1]
    prevk = np.empty(len(k), dtype=np.int64)
    if len(k):
        prevk[0] = 0
        prevk[1:] = k[:-1]
        prevk[first] = 0
    runs = k - prevk - 1
    zrl_n = runs >> 4
    rem = runs & 15
    t_ac = _bit_length_vec(vals)
    sym_ac = (rem << 4) | t_ac
    vb_ac = np.where(vals >= 0, vals, vals + (1 << t_ac) - 1)

    # per-block EOB where the last nonzero sits before coefficient 63
    lastk = np.zeros(n, dtype=np.int64)
    if len(k):
        np.maximum.at(lastk, nzb, k)
    eob_b = np.flatnonzero(lastk < 63)

    total_zrl = int(zrl_n.sum())
    zrl_src = np.repeat(np.arange(len(k), dtype=np.int64), zrl_n)
    zrl_j = (
        np.arange(total_zrl, dtype=np.int64)
        - np.repeat(np.cumsum(zrl_n) - zrl_n, zrl_n)
    )
    key_base = (nzb << 11) + (k << 5)
    keys = np.concatenate(
        [
            bidx,  # DC code
            bidx[t_dc > 0] + 1,  # DC value bits
            key_base[zrl_src] + zrl_j,  # ZRLs (j < 16)
            key_base + 16,  # AC (run,size) code
            key_base[t_ac > 0] + 17,  # AC value bits
            (eob_b << 11) + (63 << 5) + 24,  # EOB
        ]
    )
    codes = np.concatenate(
        [
            dc_codes[t_dc],
            vb_dc[t_dc > 0],
            np.full(total_zrl, int(ac_codes[0xF0]), dtype=np.int64),
            ac_codes[sym_ac],
            vb_ac[t_ac > 0],
            np.full(len(eob_b), int(ac_codes[0x00]), dtype=np.int64),
        ]
    )
    lens = np.concatenate(
        [
            dc_lens[t_dc],
            t_dc[t_dc > 0],
            np.full(total_zrl, int(ac_lens[0xF0]), dtype=np.int64),
            ac_lens[sym_ac],
            t_ac[t_ac > 0],
            np.full(len(eob_b), int(ac_lens[0x00]), dtype=np.int64),
        ]
    )
    order = np.argsort(keys)
    wr.write_chunk(codes[order], lens[order])


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 95,
    subsampling: str = "444",
    progressive: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w, 3) RGB → JFIF bytes; ``subsampling`` in
    {'444', '422', '420'} (MCU-interleaved scan for the latter two).
    ``progressive=True`` emits a multi-scan SOF2 stream (DC-first at
    Al=1, split AC spectral bands at Al=2, two AC refinement passes,
    DC refinement — the jpegtran-style script, exercising every
    progressive decode path); ``restart_interval`` emits DRI + RSTn
    markers every that many MCUs; ``subsampling='gray'`` emits a
    single-component (luma-only) frame."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 (h, w, 3) RGB")
    if subsampling not in _SAMPLING and subsampling != "gray":
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    factors = ((1, 1),) if subsampling == "gray" else _SAMPLING[subsampling]
    ncomp = len(factors)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    h, w, _ = arr.shape
    qy = _scaled_quant(_QUANT_LUMA, quality)
    qc = _scaled_quant(_QUANT_CHROMA, quality)

    rgb = arr.astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    luma = 0.299 * r + 0.587 * g + 0.114 * b
    planes = [luma]
    if ncomp == 3:
        planes += [
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

    if not 0 <= restart_interval <= 0xFFFF:
        raise ValueError("restart_interval out of range")

    # true (non-MCU-padded) block grids per component — non-interleaved
    # progressive AC scans cover exactly these blocks (T.81 A.2.2)
    true_grid = []
    for ci in range(ncomp):
        hi, vi = factors[ci]
        cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
        true_grid.append((-(-ch // 8), -(-cw // 8)))

    def interleaved_blocks():
        """(mcu_index, ci, by, bx) in MCU-interleaved order (A.2.3)."""
        for my in range(mcuy):
            for mx in range(mcux):
                i = my * mcux + mx
                for ci in range(ncomp):
                    hi, vi = factors[ci]
                    for v in range(vi):
                        for u in range(hi):
                            yield i, ci, my * vi + v, mx * hi + u

    def emit_scan(wr: _BitWriter, scomps, ss, se, ah, al) -> None:
        prev = [0, 0, 0]
        rst = 0

        def maybe_restart(i: int) -> None:
            nonlocal rst, prev
            if restart_interval and i and i % restart_interval == 0:
                wr.marker(0xD0 + (rst & 7))
                rst += 1
                prev = [0, 0, 0]

        if len(scomps) > 1:  # interleaved: the baseline scan or DC scans
            last = -1
            for i, ci, by, bx in interleaved_blocks():
                if i != last:
                    maybe_restart(i)
                    last = i
                zz = zz_all[ci][by, bx]
                if ah == 0:
                    prev[ci] = _emit_dc_first(wr, dc_tbl, zz[0], prev[ci], al)
                    if se > 0:
                        _emit_ac_first(wr, ac_tbl, zz, 1, se, al)
                else:  # DC refinement: one raw bit per block
                    wr.write((int(zz[0]) >> al) & 1, 1)
        else:  # non-interleaved scan over the component's true grid
            ci = scomps[0]
            bh_t, bw_t = true_grid[ci]
            i = 0
            for by in range(bh_t):
                for bx in range(bw_t):
                    maybe_restart(i)
                    i += 1
                    zz = zz_all[ci][by, bx]
                    if ss == 0:  # DC (single-component frame) ± AC
                        if ah == 0:
                            prev[ci] = _emit_dc_first(
                                wr, dc_tbl, zz[0], prev[ci], al
                            )
                            if se > 0:
                                _emit_ac_first(wr, ac_tbl, zz, 1, se, al)
                        else:
                            wr.write((int(zz[0]) >> al) & 1, 1)
                    elif ah == 0:
                        _emit_ac_first(wr, ac_tbl, zz, ss, se, al)
                    else:
                        _emit_ac_refine(wr, ac_tbl, zz, ss, se, al)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(q.ravel()[_ZZ].astype(np.uint8)))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    def sos(scomps, ss, se, ah, al) -> bytes:
        body = bytes([len(scomps)])
        for ci in scomps:
            tid = 0 if ci == 0 else 1
            body += bytes([ci + 1, (tid << 4) | tid])
        return seg(0xFFDA, body + bytes([ss, se, (ah << 4) | al]))

    sof_comps = []
    for ci in range(ncomp):
        sof_comps += [
            ci + 1,
            (factors[ci][0] << 4) | factors[ci][1],
            0 if ci == 0 else 1,
        ]
    sof = seg(
        0xFFC2 if progressive else 0xFFC0,
        struct.pack(">BHHB", 8, h, w, ncomp) + bytes(sof_comps),
    )
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")

    if progressive:
        # jpegtran-style script: DC first (Al=1), split AC bands at
        # Al=2, AC refinements 2→1→0, DC refinement — every decode
        # path (spectral selection, DC/AC successive approximation,
        # EOB runs) is exercised by one stream
        allc = list(range(ncomp))
        scans = [(allc, 0, 0, 0, 1)]
        scans += [([c], 1, 5, 0, 2) for c in allc]
        scans += [([c], 6, 63, 0, 2) for c in allc]
        scans += [([c], 1, 63, 2, 1) for c in allc]
        scans += [(allc, 0, 0, 1, 0)]
        scans += [([c], 1, 63, 1, 0) for c in allc]
    else:
        scans = [(list(range(ncomp)), 0, 63, 0, 0)]

    out = (
        b"\xff\xd8"
        + app0
        + dqt(0, qy)
        + dht(0, 0, _DC_BITS, _DC_VALS)
        + dht(1, 0, _AC_BITS, _AC_VALS)
    )
    if ncomp == 3:
        out += (
            dqt(1, qc)
            + dht(0, 1, _DC_BITS, _DC_VALS)
            + dht(1, 1, _AC_BITS, _AC_VALS)
        )
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    out += sof
    for scomps, ss, se, ah, al in scans:
        wr = _BitWriter()
        if not progressive and not restart_interval and _VEC_EMIT:
            # hot path (the q98 gate re-encode): emission-order blocks
            # assembled by pure reshape/transpose, symbols vectorized
            parts = []
            ids = []
            for ci in range(ncomp):
                hi, vi = factors[ci]
                per_mcu = (
                    zz_all[ci]
                    .reshape(mcuy, vi, mcux, hi, 64)
                    .transpose(0, 2, 1, 3, 4)
                    .reshape(mcuy * mcux, vi * hi, 64)
                )
                parts.append(per_mcu)
                ids.append(np.full(vi * hi, ci, dtype=np.int64))
            zzo = np.concatenate(parts, axis=1).reshape(-1, 64)
            comp_ids = np.tile(np.concatenate(ids), mcux * mcuy)
            _emit_baseline_vec(wr, zzo, comp_ids, dc_tbl, ac_tbl)
        else:
            emit_scan(wr, scomps, ss, se, ah, al)
        out += sos(scomps, ss, se, ah, al) + wr.flush()
    return out + b"\xff\xd9"


# ----------------------------------------------------------------- decode

def _entropy_end(data: bytes, pos: int) -> int:
    """Offset of the first marker that terminates entropy-coded data
    (anything but stuffed 0xFF00 and RST0–7)."""
    i = pos
    while True:
        j = data.find(b"\xff", i)
        if j < 0 or j + 1 >= len(data):
            return len(data)
        nxt = data[j + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            i = j + 2
            continue
        return j


class _Decoder:
    """Scan-based JPEG decoder: one segment walk accumulating DCT
    coefficients across scans (baseline = the single-scan case of the
    progressive machinery), then one vectorized dequant+IDCT pass."""

    def __init__(self, data: bytes):
        self.data = data
        self.quant: dict[int, np.ndarray] = {}
        self.huff: dict[tuple[int, int], list[int]] = {}
        self.frame = None  # (h, w, comps, progressive)
        self.ri = 0
        self.coef: list[np.ndarray] = []
        self.mcu = (0, 0)
        self.true_grid: list[tuple[int, int]] = []
        self.hvmax = (1, 1)
        self.eobrun = 0
        self.got_scan = False

    # ------------------------------------------------- segment walk

    def run(self) -> np.ndarray:
        data = self.data
        if data[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG (missing SOI)")
        pos = 2
        while pos + 2 <= len(data):
            if data[pos] != 0xFF:
                raise ValueError("JPEG segment desync")
            marker = data[pos + 1]
            if marker == 0xD9:  # EOI
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
                pos += 2
                continue
            if pos + 4 > len(data):
                raise ValueError("JPEG truncated in segment header")
            (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            body = data[pos + 4 : pos + 2 + ln]
            pos += 2 + ln
            if marker == 0xDB:
                self._dqt(body)
            elif marker == 0xC4:
                self._dht(body)
            elif marker in (0xC0, 0xC1, 0xC2):
                self._sof(body, progressive=marker == 0xC2)
            elif marker in (
                0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
            ):
                raise ValueError(
                    "unsupported JPEG coding process "
                    "(only baseline/progressive Huffman DCT)"
                )
            elif marker == 0xDD:
                self.ri = struct.unpack(">H", body[:2])[0]
            elif marker == 0xDA:
                pos = self._scan(body, pos)
            # APPn / COM / DNL: skipped by length
        if self.frame is None or not self.got_scan:
            raise ValueError("JPEG missing SOS")
        return self._finish()

    def _dqt(self, body: bytes) -> None:
        i = 0
        while i < len(body):
            pq, tid = body[i] >> 4, body[i] & 0xF
            if pq != 0:
                raise ValueError("16-bit quant tables not supported")
            tbl = np.zeros(64, dtype=np.int32)
            tbl[_ZZ] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
            self.quant[tid] = tbl.reshape(8, 8)
            i += 65

    def _dht(self, body: bytes) -> None:
        i = 0
        while i < len(body):
            cls, tid = body[i] >> 4, body[i] & 0xF
            bits = list(body[i + 1 : i + 17])
            nv = sum(bits)
            vals = list(body[i + 17 : i + 17 + nv])
            self.huff[(cls, tid)] = _decode_lut(bits, vals)
            i += 17 + nv

    def _sof(self, body: bytes, progressive: bool) -> None:
        if self.frame is not None:
            raise ValueError("multiple SOF markers")
        prec, h, w, nc = struct.unpack(">BHHB", body[:6])
        if prec != 8:
            raise ValueError(f"unsupported JPEG precision {prec}")
        if nc not in (1, 3):
            raise ValueError("only 1- or 3-component JPEG supported")
        if h == 0 or w == 0:
            raise ValueError("zero JPEG dimensions")
        check_pixels(w, h, "JPEG")
        comps = []
        for c in range(nc):
            cid, samp, qid = body[6 + 3 * c : 9 + 3 * c]
            hi, vi = samp >> 4, samp & 0xF
            if hi not in (1, 2, 4) or vi not in (1, 2, 4):
                raise ValueError(f"unsupported sampling factors {hi}x{vi}")
            comps.append((cid, qid, hi, vi))
        hmax = max(c[2] for c in comps)
        vmax = max(c[3] for c in comps)
        for _, _, hi, vi in comps:
            if hmax % hi or vmax % vi:
                raise ValueError("non-integer sampling ratios not supported")
        mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
        self.frame = (h, w, comps, progressive)
        self.mcu = (mcux, mcuy)
        self.hvmax = (hmax, vmax)
        self.coef = [
            np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
            for _, _, hi, vi in comps
        ]
        self.true_grid = []
        for _, _, hi, vi in comps:
            cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
            self.true_grid.append((-(-ch // 8), -(-cw // 8)))

    # ------------------------------------------------------- scans

    def _scan(self, body: bytes, pos: int) -> int:
        if self.frame is None:
            raise ValueError("SOS before SOF")
        _, _, comps, progressive = self.frame
        ns = body[0]
        if len(body) < 4 + 2 * ns:
            raise ValueError("truncated SOS header")
        byid = {c[0]: i for i, c in enumerate(comps)}
        scomps = []
        for c in range(ns):
            cs, tids = body[1 + 2 * c], body[2 + 2 * c]
            if cs not in byid:
                raise ValueError(f"SOS references unknown component {cs}")
            scomps.append((byid[cs], tids >> 4, tids & 0xF))
        ss, se, a = body[1 + 2 * ns : 4 + 2 * ns]
        ah, al = a >> 4, a & 0xF
        if not progressive:
            if ss != 0 or se != 63 or ah != 0 or al != 0:
                raise ValueError("invalid sequential scan header")
        else:
            if ss == 0 and se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            if ss > 0 and ns != 1:
                raise ValueError("progressive AC scan must be single-component")
            if ss > se or se > 63:
                raise ValueError("invalid spectral band")
            if ah != 0 and ah != al + 1:
                raise ValueError("invalid successive approximation (Ah != Al+1)")
        end = _entropy_end(self.data, pos)
        reader = _FastBits(self.data[pos:end], allow_restarts=bool(self.ri))
        self.eobrun = 0
        self._decode_scan(reader, scomps, ss, se, ah, al)
        self.got_scan = True
        return end

    def _decode_scan(self, reader, scomps, ss, se, ah, al) -> None:
        _, _, comps, _ = self.frame
        mcux, mcuy = self.mcu
        pred = [0] * len(comps)
        n = 0

        def maybe_restart() -> None:
            nonlocal pred
            if self.ri and n and n % self.ri == 0:
                reader.restart()
                pred = [0] * len(comps)
                self.eobrun = 0

        if len(scomps) > 1:  # MCU-interleaved (sequential or DC scans)
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart()
                    n += 1
                    for ci, dct, act in scomps:
                        _, _, hi, vi = comps[ci]
                        for v in range(vi):
                            for u in range(hi):
                                zz = self.coef[ci][my * vi + v, mx * hi + u]
                                self._block(reader, zz, ci, dct, act, ss, se, ah, al, pred)
        else:  # non-interleaved: the component's true block grid
            ci, dct, act = scomps[0]
            bh_t, bw_t = self.true_grid[ci]
            for by in range(bh_t):
                for bx in range(bw_t):
                    maybe_restart()
                    n += 1
                    zz = self.coef[ci][by, bx]
                    self._block(reader, zz, ci, dct, act, ss, se, ah, al, pred)

    def _table(self, cls: int, tid: int) -> list[int]:
        tbl = self.huff.get((cls, tid))
        if tbl is None:
            raise ValueError(f"missing Huffman table ({cls},{tid})")
        return tbl

    def _block(self, reader, zz, ci, dct, act, ss, se, ah, al, pred) -> None:
        if ss == 0:
            if ah == 0:  # DC first (G.1.2.1; baseline when al == 0)
                t = reader.huff(self._table(0, dct))
                if t > 11:
                    raise ValueError("invalid DC category")
                diff = _extend(reader.read(t), t) if t else 0
                pred[ci] += diff
                zz[0] = pred[ci] << al
            else:  # DC refinement: one raw bit
                if reader.read(1):
                    zz[0] = int(zz[0]) | (1 << al)
            if se > 0:  # sequential scan carries AC in the same pass
                self._ac_first(reader, zz, self._table(1, act), 1, se, al)
        elif ah == 0:
            self._ac_first(reader, zz, self._table(1, act), ss, se, al)
        else:
            self._ac_refine(reader, zz, self._table(1, act), ss, se, al)

    def _ac_first(self, reader, zz, ac_t, ss, se, al) -> None:
        if self.eobrun > 0:
            self.eobrun -= 1
            return
        # the decode hot loop (every AC coefficient of every block goes
        # through here): peek+LUT inlined on local variables, reader
        # position written back once per block
        w24 = reader.w24
        nbits = reader.nbits
        pos = reader.pos
        k = ss
        while k <= se:
            if pos >= nbits:
                raise ValueError("JPEG entropy stream truncated")
            e = ac_t[int(w24[pos >> 3] >> (8 - (pos & 7))) & 0xFFFF]
            if e == 0:
                raise ValueError("invalid Huffman code in JPEG stream")
            pos += e & 31
            sym = e >> 5
            s = sym & 0xF
            if s == 0:
                r = sym >> 4
                if r == 15:  # ZRL
                    k += 16
                    continue
                eob = (1 << r) - 1  # EOBn: this block + 2^r-1 more
                if r:
                    if pos + r > nbits:
                        raise ValueError("JPEG entropy stream truncated")
                    eob += (
                        int(w24[pos >> 3] >> (8 - (pos & 7))) & 0xFFFF
                    ) >> (16 - r)
                    pos += r
                self.eobrun = eob
                break
            k += sym >> 4
            if k > se:
                raise ValueError("AC coefficient index overflow")
            if pos + s > nbits:
                raise ValueError("JPEG entropy stream truncated")
            bits = (int(w24[pos >> 3] >> (8 - (pos & 7))) & 0xFFFF) >> (16 - s)
            pos += s
            zz[k] = (
                bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1
            ) << al
            k += 1
        if pos > nbits:
            raise ValueError("JPEG entropy stream truncated")
        reader.pos = pos

    def _ac_refine(self, reader, zz, ac_t, ss, se, al) -> None:
        # T.81 G.1.2.3: correction bits for history-nonzero
        # coefficients; runs count zero-history positions only
        p1 = 1 << al
        k = ss
        if self.eobrun == 0:
            while k <= se:
                sym = reader.huff(ac_t)
                r, s = sym >> 4, sym & 0xF
                if s == 0 and r != 15:
                    self.eobrun = 1 << r
                    if r:
                        self.eobrun += reader.read(r)
                    break
                if s:
                    if s != 1:
                        raise ValueError("invalid AC refinement magnitude")
                    news = p1 if reader.read(1) else -p1
                else:
                    news = 0  # ZRL: run of 16 zero-history positions
                while k <= se:
                    cur = int(zz[k])
                    if cur != 0:
                        if reader.read(1) and not cur & p1:
                            zz[k] = cur + (p1 if cur >= 0 else -p1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if news:
                    if k > se:
                        raise ValueError("AC refinement index overflow")
                    zz[k] = news
                k += 1
        if self.eobrun > 0:
            while k <= se:  # EOB block: corrections only
                cur = int(zz[k])
                if cur != 0 and reader.read(1) and not cur & p1:
                    zz[k] = cur + (p1 if cur >= 0 else -p1)
                k += 1
            self.eobrun -= 1

    # ------------------------------------------------------ finish

    def _finish(self) -> np.ndarray:
        h, w, comps, _ = self.frame
        mcux, mcuy = self.mcu
        hmax, vmax = self.hvmax
        planes = []
        for ci, (_, qid, hi, vi) in enumerate(comps):
            if qid not in self.quant:
                raise ValueError(f"missing quant table {qid}")
            bhc, bwc = mcuy * vi, mcux * hi
            coeff = np.zeros((bhc, bwc, 64))
            coeff[:, :, _ZZ] = self.coef[ci]
            coeff = coeff.reshape(bhc, bwc, 8, 8) * self.quant[qid]
            blocks = (
                np.einsum("iu,byuv,jv->byij", _M.T.copy(), coeff, _M.T.copy())
                + 128.0
            )
            plane = blocks.transpose(0, 2, 1, 3).reshape(bhc * 8, bwc * 8)
            fy, fx = vmax // vi, hmax // hi
            if fy > 1 or fx > 1:  # crop to true size, then replicate
                ch, cw = -(-h * vi // vmax), -(-w * hi // hmax)
                plane = plane[:ch, :cw].repeat(fy, axis=0).repeat(fx, axis=1)
            planes.append(plane)
        if len(comps) == 1:  # grayscale: broadcast luma
            y = np.clip(np.round(planes[0][:h, :w]), 0, 255).astype(np.uint8)
            return np.repeat(y[:, :, None], 3, axis=2)
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


def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF bytes → uint8 (h, w, 3) RGB.  Baseline (SOF0) and
    progressive (SOF2) Huffman DCT; any sampling layout the SOF
    declares (4:4:4 / 4:2:2 / 4:2:0 / …) via the MCU-interleaved
    scan; restart markers; grayscale broadcast to RGB; chroma
    upsampled by pixel replication."""
    return _Decoder(data).run()
