"""Minimal, real lossless-WebP (VP8L) codec — pure Python/numpy.

Implements the public WebP lossless bitstream specification (RFC 9649
§3, "Specification for WebP Lossless Bitstream"): LSB-first bit
stream, canonical prefix codes (simple 1/2-symbol form and the
code-length-coded form with 16/17/18 repeats), optional meta prefix
groups, LZ77 backward references with the 2-D distance mapping and
prefix-coded length/distance extra bits, the color cache, and all four
transforms — predictor (14 modes), cross-color, subtract-green, and
color-indexing with pixel bundling.  ``encode_webp`` writes real VP8L
streams (literals + run-length LZ77 + optional cache and transforms)
inside a RIFF container so the decoder is round-trip testable without
libwebp.  Malformed inputs raise ``ValueError``.

The 2-D distance-map table is generated from the spec's ordering rule
(the 120 nearest (dx, dy) neighbors by squared Euclidean distance;
ties: larger dy first, then smaller |dx|, positive dx before
negative); the generated prefix matches the table printed in the
spec.  Like the JPEG/GIF entropy walks, per-payload decode is serial
Python — the per-row instrument inside an Arrow batch stage, with a
C-backed codec as the documented production swap-in.
"""

from __future__ import annotations

import struct

import numpy as np

from lopez_spark.ops.limits import check_pixels

# code-length-code symbol order (spec 5.2.2)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_NUM_LENGTH_CODES = 24  # green alphabet: 256 literals + 24 length codes (+cache)
_NUM_DIST_CODES = 40


def _plane_code_table() -> list[tuple[int, int]]:
    """The 120 closest (dx, dy) neighbors in the spec's order."""
    cand = []
    for dy in range(0, 16):
        for dx in range(-8, 9):
            if dy == 0 and dx <= 0:
                continue
            cand.append((dx * dx + dy * dy, -dy, abs(dx), 0 if dx > 0 else 1, dx, dy))
    cand.sort()
    return [(dx, dy) for *_, dx, dy in cand[:120]]


_DIST_MAP = _plane_code_table()


# ------------------------------------------------------------------ bit io


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.nbits = len(data) * 8
        # per-byte little-endian 32-bit windows, precomputed once: a
        # peek is one list index + shift instead of a bytes slice +
        # int.from_bytes per symbol.  Past ~2M entries keep the compact
        # ndarray (same code path, int() below strips the np scalar).
        u = np.frombuffer(data + b"\x00\x00\x00\x00", dtype=np.uint8).astype(
            np.uint32
        )
        ch = u[:-4] | (u[1:-3] << 8) | (u[2:-2] << 16) | (u[3:-1] << 24)
        self.ch32 = ch.tolist() if len(ch) <= (1 << 21) else ch

    def read(self, n: int) -> int:
        pos = self.pos
        if pos + n > self.nbits:
            raise ValueError("VP8L stream truncated")
        self.pos = pos + n
        return int(self.ch32[pos >> 3] >> (pos & 7)) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        """Up to 16 bits, zero-padded past the end (the matched code's
        real length is re-checked by advance)."""
        pos = self.pos
        return int(self.ch32[pos >> 3] >> (pos & 7)) & ((1 << n) - 1)

    def advance(self, n: int) -> None:
        self.pos += n
        if self.pos > self.nbits:
            raise ValueError("VP8L stream truncated")


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def bytes(self) -> bytes:
        if self.nbits:
            return bytes(self.out) + bytes([self.acc & 0xFF])
        return bytes(self.out)


# ------------------------------------------------------------ prefix codes


class _PrefixCode:
    """Canonical prefix code: decode by MSB-first tree walk over the
    LSB-first bit stream (spec 5.2.1); encode via the same canonical
    assignment (DEFLATE-style: by length, then symbol order — except
    the simple form, where code 0 goes to the first listed symbol)."""

    def __init__(self):
        self.single: int | None = None
        self.dec: dict[tuple[int, int], int] = {}
        self.enc: dict[int, tuple[int, int]] = {}
        self.max_len = 0
        self.table: list[int] = []  # peeked bits -> (sym << 5) | len
        self.mask = 0  # (1 << max_len) - 1, cached for the hot path

    def _build_table(self) -> None:
        # flat int entries (sym << 5) | len, 0 = invalid prefix — one
        # list index decodes a symbol in ``read`` with no tuple unpack
        ml = self.max_len
        self.mask = (1 << ml) - 1
        self.table = [0] * (1 << ml)
        for (ln, code), sym in self.dec.items():
            rev = int(f"{code:0{ln}b}"[::-1], 2)  # stream is LSB-first
            for pad in range(1 << (ml - ln)):
                self.table[rev | (pad << ln)] = (sym << 5) | ln

    @classmethod
    def simple(cls, symbols: list[int]) -> "_PrefixCode":
        c = cls()
        if len(symbols) == 1:
            c.single = symbols[0]
            c.enc[symbols[0]] = (0, 0)
        else:
            for i, s in enumerate(symbols):
                c.dec[(1, i)] = s
                c.enc[s] = (i, 1)
            c.max_len = 1
            c._build_table()
        return c

    @classmethod
    def from_lengths(cls, lengths: list[int]) -> "_PrefixCode":
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("VP8L prefix code with no symbols")
        c = cls()
        if len(used) == 1:
            c.single = used[0][1]
            c.enc[c.single] = (0, 0)
            return c
        max_len = max(ln for ln, _ in used)
        if max_len > 15:
            raise ValueError("VP8L code length > 15")
        bl_count = [0] * (max_len + 1)
        for ln, _ in used:
            bl_count[ln] += 1
        # completeness (spec: the code must be full)
        kraft = sum(n << (max_len - ln) for ln, n in enumerate(bl_count) if ln)
        if kraft != 1 << max_len:
            raise ValueError("VP8L prefix code not complete")
        next_code = [0] * (max_len + 2)
        code = 0
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        for ln, sym in sorted(used):
            c.dec[(ln, next_code[ln])] = sym
            c.enc[sym] = (next_code[ln], ln)
            next_code[ln] += 1
        c.max_len = max_len
        c._build_table()
        return c

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        # fused peek + table + advance on local state: this is the
        # per-symbol hot path (4-5 calls per literal pixel)
        pos = br.pos
        e = self.table[int(br.ch32[pos >> 3] >> (pos & 7)) & self.mask]
        if e == 0:
            raise ValueError("invalid VP8L prefix code word")
        pos += e & 31
        if pos > br.nbits:
            raise ValueError("VP8L stream truncated")
        br.pos = pos
        return e >> 5

    def write(self, bw: _BitWriter, sym: int) -> None:
        code, ln = self.enc[sym]
        for i in range(ln - 1, -1, -1):  # MSB of the canonical code first
            bw.write((code >> i) & 1, 1)


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        syms = [s0]
        if num_symbols == 2:
            syms.append(br.read(8))
        if any(s >= alphabet_size for s in syms):
            raise ValueError("VP8L simple-code symbol out of alphabet")
        return _PrefixCode.simple(syms)
    num_codes = br.read(4) + 4
    if num_codes > len(_CLC_ORDER):
        raise ValueError("too many code-length codes")
    cl_lengths = [0] * len(_CLC_ORDER)
    for i in range(num_codes):
        cl_lengths[_CLC_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode.from_lengths(cl_lengths)
    lengths = [0] * alphabet_size
    if br.read(1):  # explicit max-symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_code.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            slot = code_len - 16
            extra = (2, 3, 7)[slot]
            repeat = br.read(extra) + (3, 3, 11)[slot]
            fill = prev_len if code_len == 16 else 0
            if symbol + repeat > alphabet_size:
                raise ValueError("VP8L code-length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _PrefixCode.from_lengths(lengths)


def _huffman_lengths(freqs: list[int], max_len: int = 15) -> list[int]:
    """Depth-limited Huffman code lengths (flatten-and-rebuild on
    overflow: raise the frequency floor until the tree fits)."""
    import heapq

    n = len(freqs)
    used = [i for i, f in enumerate(freqs) if f > 0]
    lengths = [0] * n
    if not used:
        raise ValueError("empty histogram")
    if len(used) == 1:
        lengths[used[0]] = 1
        return lengths
    floor = 1
    while True:
        depths = [0] * n
        heap = [(max(freqs[i], floor), k, (i,)) for k, i in enumerate(used)]
        heapq.heapify(heap)
        cnt = len(heap)
        while len(heap) > 1:
            f1, _, s1 = heapq.heappop(heap)
            f2, _, s2 = heapq.heappop(heap)
            for s in s1 + s2:
                depths[s] += 1
            cnt += 1
            heapq.heappush(heap, (f1 + f2, cnt, s1 + s2))
        if max(depths[i] for i in used) <= max_len:
            for i in used:
                lengths[i] = depths[i]
            return lengths
        floor = max(floor * 2, sum(freqs) >> (max_len - 1))


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> _PrefixCode:
    """Emit a prefix code: simple form when <=2 symbols, else the full
    code-length-coded form (no 16/17/18 repeats — valid, just larger)."""
    used = [s for s, ln in enumerate(lengths) if ln > 0]
    if len(used) <= 2 and all(lengths[s] <= 1 for s in used) and max(used) <= 255:
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        big = used[0] > 1
        bw.write(1 if big else 0, 1)
        bw.write(used[0], 8 if big else 1)
        if len(used) == 2:
            bw.write(used[1], 8)
        return _PrefixCode.simple(used)
    bw.write(0, 1)  # code-length-coded
    cl_freq = [0] * len(_CLC_ORDER)
    for ln in lengths:
        cl_freq[ln] += 1
    cl_lengths = _huffman_lengths(cl_freq, max_len=7)
    # num_codes must cover every used cl symbol in _CLC_ORDER order
    last = max(i for i, s in enumerate(_CLC_ORDER) if cl_lengths[s] > 0)
    num_codes = max(4, last + 1)
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(cl_lengths[_CLC_ORDER[i]], 3)
    cl_code = _PrefixCode.from_lengths(cl_lengths)
    bw.write(0, 1)  # no explicit max-symbol: all lengths follow
    for ln in lengths:
        cl_code.write(bw, ln)
    return _PrefixCode.from_lengths(lengths)


# ----------------------------------------------------------- LZ77 coding


def _prefix_decode(code: int, br: _BitReader) -> int:
    """Length/distance prefix decoding (spec 5.2.3): 1-based value."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """1-based value → (code, extra_bits_value, extra_bits_count)."""
    v = value - 1
    if v < 4:
        return v, 0, 0
    bits = v.bit_length() - 1  # highest set bit
    rest = v - (1 << bits)
    if rest < (1 << (bits - 1)):
        code = 2 * bits
        extra = rest
    else:
        code = 2 * bits + 1
        extra = rest - (1 << (bits - 1))
    return code, extra, bits - 1


def _plane_to_distance(plane_code: int, xsize: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    dx, dy = _DIST_MAP[plane_code - 1]
    return max(1, dy * xsize + dx)


# --------------------------------------------------------------- decode


def _read_group(br: _BitReader, cache_size: int) -> list[_PrefixCode]:
    green = _read_prefix_code(br, 256 + _NUM_LENGTH_CODES + cache_size)
    red = _read_prefix_code(br, 256)
    blue = _read_prefix_code(br, 256)
    alpha = _read_prefix_code(br, 256)
    dist = _read_prefix_code(br, _NUM_DIST_CODES)
    return [green, red, blue, alpha, dist]


def _decode_entropy_image(
    br: _BitReader, w: int, h: int, level0: bool
) -> np.ndarray:
    """Decode one spatially-coded image (spec 5) → uint32 ARGB flat
    array of length w*h.  ``level0`` enables the meta-prefix recursion
    (transforms are handled by the caller)."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"invalid VP8L color-cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_bits = 0
    n_groups = 1
    meta_w = 0
    if level0 and br.read(1):  # meta prefix codes
        meta_bits = br.read(3) + 2
        meta_w = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta_img = _decode_entropy_image(br, meta_w, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
    groups = [_read_group(br, cache_size) for _ in range(n_groups)]

    cache = [0] * cache_size
    # Python-list output: scalar reads/writes and LZ77 slice copies are
    # several times cheaper than per-element ndarray access; converted
    # to uint32 once at the end
    out: list[int] = [0] * (w * h)
    pos = 0
    total = w * h
    last_cached = 0
    meta_l = meta.tolist() if meta is not None else None

    def cache_insert_upto(upto: int) -> None:
        nonlocal last_cached
        if not cache_size:
            return
        while last_cached < upto:
            px = out[last_cached]
            cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            last_cached += 1

    while pos < total:
        if meta_l is not None:
            x, y = pos % w, pos // w
            g = groups[meta_l[(y >> meta_bits) * meta_w + (x >> meta_bits)]]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:  # literal
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            out[pos] = (alpha << 24) | (red << 16) | (s << 8) | blue
            pos += 1
        elif s < 256 + _NUM_LENGTH_CODES:  # backward reference
            length = _prefix_decode(s - 256, br)
            dist_code = g[4].read(br)
            dist = _plane_to_distance(_prefix_decode(dist_code, br), w)
            if dist > pos or pos + length > total:
                raise ValueError("VP8L backward reference out of range")
            if dist >= length:  # disjoint: one slice copy
                out[pos : pos + length] = out[pos - dist : pos - dist + length]
            else:  # overlapping: repeat the dist-periodic pattern
                chunk = out[pos - dist : pos]
                out[pos : pos + length] = (
                    chunk * (length // dist + 1)
                )[:length]
            pos += length
        else:  # color-cache hit
            if not cache_size:
                raise ValueError("VP8L cache symbol without a color cache")
            cache_insert_upto(pos)
            out[pos] = cache[s - 256 - _NUM_LENGTH_CODES]
            pos += 1
    cache_insert_upto(pos)
    return np.array(out, dtype=np.uint32)


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int32) + b.astype(np.int32)) >> 1


def _predict(mode: int, L, T, TL, TR) -> np.ndarray:
    """One of the 14 spatial predictors over 4-channel uint8 vectors."""
    if mode == 0:
        return np.array([255, 0, 0, 0], np.int32)  # ARGB black
    if mode == 1:
        return L.astype(np.int32)
    if mode == 2:
        return T.astype(np.int32)
    if mode == 3:
        return TR.astype(np.int32)
    if mode == 4:
        return TL.astype(np.int32)
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select
        p = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
        pt = int(np.abs(p - T).sum())
        pl = int(np.abs(p - L).sum())
        return (T if pt <= pl else L).astype(np.int32)
    if mode == 12:  # ClampAddSubtractFull
        return np.clip(
            L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32), 0, 255
        )
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(L, T)
        return np.clip(ave + ((ave - TL.astype(np.int32)) >> 1), 0, 255)
    raise ValueError(f"invalid VP8L predictor mode {mode}")


def _unpack(flat: np.ndarray, w: int, h: int) -> np.ndarray:
    """uint32 ARGB flat → (h, w, 4) uint8 [A, R, G, B]."""
    px = np.zeros((h * w, 4), dtype=np.uint8)
    px[:, 0] = (flat >> 24) & 0xFF
    px[:, 1] = (flat >> 16) & 0xFF
    px[:, 2] = (flat >> 8) & 0xFF
    px[:, 3] = flat & 0xFF
    return px.reshape(h, w, 4)


def _pack(px: np.ndarray) -> np.ndarray:
    """(h, w, 4) uint8 [A, R, G, B] → uint32 ARGB flat."""
    a = px.reshape(-1, 4).astype(np.uint32)
    return (a[:, 0] << 24) | (a[:, 1] << 16) | (a[:, 2] << 8) | a[:, 3]


def _inverse_predictor(flat: np.ndarray, w: int, h: int, bits: int, modes: np.ndarray) -> np.ndarray:
    """In-place spatial-predictor inverse (spec 4.1): residuals +
    prediction mod 256, scan order, flat-array TR wrap like the
    reference decoders."""
    px = _unpack(flat, w, h).reshape(-1, 4).astype(np.uint8)
    mw = -(-w // (1 << bits))
    for i in range(w * h):
        x, y = i % w, i // w
        if i == 0:
            pred = np.array([255, 0, 0, 0], np.int32)
        elif y == 0:
            pred = px[i - 1].astype(np.int32)
        elif x == 0:
            pred = px[i - w].astype(np.int32)
        else:
            mode = int(modes[(y >> bits) * mw + (x >> bits)])
            L = px[i - 1]
            T = px[i - w]
            TL = px[i - w - 1]
            TR = px[i - w + 1]  # wraps to row start at the right edge
            pred = _predict(mode, L, T, TL, TR)
        px[i] = (px[i].astype(np.int32) + pred) & 0xFF
    return _pack(px.reshape(h, w, 4))


def _ct_delta(t: np.ndarray | int, c: np.ndarray | int):
    """ColorTransformDelta: int8(t) * int8(c) >> 5 (arithmetic)."""
    ts = (np.asarray(t).astype(np.int32) ^ 0x80) - 0x80
    cs = (np.asarray(c).astype(np.int32) ^ 0x80) - 0x80
    return (ts * cs) >> 5


def _inverse_color_transform(flat, w, h, bits, elements) -> np.ndarray:
    px = _unpack(flat, w, h).reshape(-1, 4).astype(np.int32)
    mw = -(-w // (1 << bits))
    idx = np.arange(w * h)
    block = ((idx // w) >> bits) * mw + ((idx % w) >> bits)
    e = elements[block]  # uint32 rows: 0xff | r2b | g2b | g2r packed ARGB-style
    g2r = (e >> 0) & 0xFF
    g2b = (e >> 8) & 0xFF
    r2b = (e >> 16) & 0xFF
    green = px[:, 2]
    red = (px[:, 1] + _ct_delta(g2r, green)) & 0xFF
    blue = (px[:, 3] + _ct_delta(g2b, green) + _ct_delta(r2b, red)) & 0xFF
    px[:, 1] = red
    px[:, 3] = blue
    return _pack(px.reshape(h, w, 4).astype(np.uint8))


def _inverse_subtract_green(flat: np.ndarray) -> np.ndarray:
    g = (flat >> 8) & 0xFF
    r = (((flat >> 16) & 0xFF) + g) & 0xFF
    b = ((flat & 0xFF) + g) & 0xFF
    return (flat & np.uint32(0xFF00FF00)) | (r.astype(np.uint32) << 16) | b.astype(np.uint32)


def _bundle_bits(n_colors: int) -> int:
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


def decode_vp8l_chunk(body: bytes) -> np.ndarray:
    """VP8L chunk body → (h, w, 4) uint8 RGBA."""
    if len(body) < 5 or body[0] != 0x2F:
        raise ValueError("VP8L signature missing")
    br = _BitReader(body[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    check_pixels(w, h, "VP8L")
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")

    # transforms (level 0 only; each type at most once, inverse in
    # reverse read order)
    transforms = []
    dec_w = w
    seen_types = set()
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen_types:
            raise ValueError("duplicate VP8L transform")
        seen_types.add(ttype)
        if ttype in (0, 1):  # predictor / cross-color
            bits = br.read(3) + 2
            mw = -(-dec_w // (1 << bits))
            mh = -(-h // (1 << bits))
            data = _decode_entropy_image(br, mw, mh, False)
            transforms.append((ttype, bits, data))
        elif ttype == 2:  # subtract green
            transforms.append((2, None, None))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal = _decode_entropy_image(br, n_colors, 1, False)
            # palette entries are component-wise delta-coded
            p = _unpack(pal, n_colors, 1).reshape(n_colors, 4)
            p = np.cumsum(p.astype(np.uint32), axis=0).astype(np.uint8)
            wb = _bundle_bits(n_colors)
            transforms.append((3, (n_colors, wb), _pack(p.reshape(1, n_colors, 4))))
            dec_w = -(-dec_w // (1 << wb))

    flat = _decode_entropy_image(br, dec_w, h, True)

    cur_w = dec_w
    for ttype, arg, data in reversed(transforms):
        if ttype == 3:
            n_colors, wb = arg
            if wb:
                ppb = 8 >> wb  # bits per packed pixel
                g = (flat.reshape(h, cur_w) >> 8) & 0xFF
                idx = np.zeros((h, cur_w << wb), dtype=np.uint32)
                for k in range(1 << wb):
                    idx[:, k :: (1 << wb)] = (g >> (k * ppb)) & ((1 << ppb) - 1)
                idx = idx[:, :w].reshape(-1)
            else:
                idx = (flat >> 8) & 0xFF
            table = np.zeros(max(256, int(idx.max(initial=0)) + 1), dtype=np.uint32)
            table[: len(data)] = data
            flat = table[idx]
            cur_w = w
        elif ttype == 2:
            flat = _inverse_subtract_green(flat)
        elif ttype == 1:
            flat = _inverse_color_transform(flat, cur_w, h, arg, data)
        else:
            modes = (data >> 8) & 0xFF
            flat = _inverse_predictor(flat, cur_w, h, arg, modes)
    if cur_w != w:
        raise ValueError("VP8L width mismatch after transforms")
    argb = _unpack(flat, w, h)
    return argb[:, :, [1, 2, 3, 0]]  # ARGB → RGBA


def decode_webp(data: bytes) -> np.ndarray:
    """RIFF/WebP bytes → (h, w, 4) uint8 RGBA.  Lossless (VP8L) only;
    lossy VP8 requires an external codec and raises."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP stream")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("WEBP chunk truncated")
        if fourcc == b"VP8L":
            return decode_vp8l_chunk(body)
        if fourcc == b"VP8 ":
            raise ValueError("lossy VP8 decode requires an external codec")
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8L chunk found")


# --------------------------------------------------------------- encode


def _encode_entropy_image(
    bw: _BitWriter,
    flat: np.ndarray,
    w: int,
    level0: bool,
    use_lz77: bool = False,
    cache_bits: int = 0,
) -> None:
    """Emit one spatially-coded image: optional run-length LZ77
    (distance 1 → plane code 2) and color cache, single prefix group."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        bw.write(0, 1)  # no meta prefix codes

    # tokenize: (kind, payload) with kind 0=literal px, 1=(len,) run, 2=cache idx
    cache = [None] * cache_size
    tokens: list[tuple[int, int]] = []
    n = len(flat)
    i = 0
    vals = [int(v) for v in flat]
    while i < n:
        if use_lz77 and i > 0 and vals[i] == vals[i - 1]:
            run = 1
            while i + run < n and vals[i + run] == vals[i + run - 1] and run < 4096:
                run += 1
            tokens.append((1, run))
            if cache_size:
                for j in range(i, i + run):
                    cache[(0x1E35A7BD * vals[j] & 0xFFFFFFFF) >> (32 - cache_bits)] = vals[j]
            i += run
            continue
        px = vals[i]
        if cache_size:
            slot = (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[slot] == px:
                tokens.append((2, slot))
                i += 1
                continue
            cache[slot] = px
        tokens.append((0, px))
        i += 1

    g_freq = [0] * (256 + _NUM_LENGTH_CODES + cache_size)
    r_freq = [0] * 256
    b_freq = [0] * 256
    a_freq = [0] * 256
    d_freq = [0] * _NUM_DIST_CODES
    for kind, payload in tokens:
        if kind == 0:
            g_freq[(payload >> 8) & 0xFF] += 1
            r_freq[(payload >> 16) & 0xFF] += 1
            b_freq[payload & 0xFF] += 1
            a_freq[(payload >> 24) & 0xFF] += 1
        elif kind == 1:
            code, _, _ = _prefix_encode(payload)
            g_freq[256 + code] += 1
            d_freq[_prefix_encode(2)[0]] += 1  # plane code 2 = (1, 0)
        else:
            g_freq[256 + _NUM_LENGTH_CODES + payload] += 1
    for freq in (r_freq, b_freq, a_freq, d_freq):
        if not any(freq):
            freq[0] = 1  # unused tree: 1-symbol simple code
    codes = [
        _write_prefix_code(bw, _huffman_lengths(f))
        for f in (g_freq, r_freq, b_freq, a_freq, d_freq)
    ]
    green, red, blue, alpha, dist = codes
    for kind, payload in tokens:
        if kind == 0:
            green.write(bw, (payload >> 8) & 0xFF)
            red.write(bw, (payload >> 16) & 0xFF)
            blue.write(bw, payload & 0xFF)
            alpha.write(bw, (payload >> 24) & 0xFF)
        elif kind == 1:
            code, extra, nbits = _prefix_encode(payload)
            green.write(bw, 256 + code)
            bw.write(extra, nbits)
            dcode, dextra, dnbits = _prefix_encode(2)
            dist.write(bw, dcode)
            bw.write(dextra, dnbits)
        else:
            green.write(bw, 256 + _NUM_LENGTH_CODES + payload)


def _forward_predictor(px: np.ndarray, w: int, h: int, bits: int, mode: int) -> np.ndarray:
    """Residuals for a constant predictor mode (ARGB uint8 (h*w,4))."""
    res = np.zeros_like(px)
    for i in range(w * h):
        x, y = i % w, i // w
        if i == 0:
            pred = np.array([255, 0, 0, 0], np.int32)
        elif y == 0:
            pred = px[i - 1].astype(np.int32)
        elif x == 0:
            pred = px[i - w].astype(np.int32)
        else:
            pred = _predict(mode, px[i - 1], px[i - w], px[i - w - 1], px[i - w + 1])
        res[i] = (px[i].astype(np.int32) - pred) & 0xFF
    return res


def encode_webp(
    px: np.ndarray,
    *,
    subtract_green: bool = False,
    predictor: int | None = None,
    color: tuple[int, int, int] | None = None,
    palette: bool = False,
    use_lz77: bool = False,
    cache_bits: int = 0,
    transform_bits: int = 4,
) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w, 4) RGBA → lossless WebP (RIFF +
    VP8L).  ``predictor`` applies the spatial transform with one
    constant mode; ``color`` a constant (g2r, g2b, r2b) cross-color
    element; ``palette`` color-indexing (requires ≤256 distinct
    pixels; bundles when ≤16).  Transforms compose except palette,
    which must stand alone (matching what this encoder can invert)."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] not in (3, 4):
        raise ValueError("encode_webp expects (h, w, 3|4)")
    h, w = px.shape[:2]
    if w > 1 << 14 or h > 1 << 14:
        raise ValueError("image exceeds VP8L 16383x16383 limit")
    argb = np.zeros((h, w, 4), dtype=np.uint8)
    argb[:, :, 0] = px[:, :, 3] if px.shape[2] == 4 else 255
    argb[:, :, 1:4] = px[:, :, :3]
    flat = _pack(argb)

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if px.shape[2] == 4 else 0, 1)
    bw.write(0, 3)  # version

    enc_w = w
    if palette:
        if subtract_green or predictor is not None or color is not None:
            raise ValueError("palette does not compose with other transforms here")
        colors, inverse = np.unique(flat, return_inverse=True)
        if len(colors) > 256:
            raise ValueError("palette transform needs <=256 distinct pixels")
        n_colors = len(colors)
        bw.write(1, 1)
        bw.write(3, 2)  # color indexing
        bw.write(n_colors - 1, 8)
        pal_px = _unpack(colors.astype(np.uint32), n_colors, 1).reshape(n_colors, 4)
        deltas = np.diff(pal_px.astype(np.int32), axis=0, prepend=np.zeros((1, 4), np.int32)) & 0xFF
        _encode_entropy_image(
            bw, _pack(deltas.astype(np.uint8).reshape(1, n_colors, 4)), n_colors, False
        )
        wb = _bundle_bits(n_colors)
        if wb:
            ppb = 8 >> wb
            idx = inverse.reshape(h, w).astype(np.uint32)
            enc_w = -(-w // (1 << wb))
            packed = np.zeros((h, enc_w), dtype=np.uint32)
            for k in range(1 << wb):
                col = idx[:, k :: (1 << wb)]
                packed[:, : col.shape[1]] |= col << (k * ppb)
            flat = ((packed.reshape(-1) << 8) | 0xFF000000).astype(np.uint32)
        else:
            flat = ((inverse.reshape(-1).astype(np.uint32)) << 8) | 0xFF000000
        bw.write(0, 1)  # no more transforms
        _encode_entropy_image(bw, flat, enc_w, True, use_lz77, cache_bits)
    else:
        # read order: predictor, color, subtract-green (decoder inverts
        # in reverse: +green, +color, +prediction)
        pxf = argb.reshape(-1, 4)
        if predictor is not None:
            if not 0 <= predictor <= 13:
                raise ValueError("predictor mode must be 0..13")
            bw.write(1, 1)
            bw.write(0, 2)
            bw.write(transform_bits - 2, 3)
            mw = -(-w // (1 << transform_bits))
            mh = -(-h // (1 << transform_bits))
            sub = np.full(mw * mh, 0xFF000000 | (predictor << 8), dtype=np.uint32)
            _encode_entropy_image(bw, sub, mw, False)
        if color is not None:
            g2r, g2b, r2b = (c & 0xFF for c in color)
            bw.write(1, 1)
            bw.write(1, 2)
            bw.write(transform_bits - 2, 3)
            mw = -(-w // (1 << transform_bits))
            mh = -(-h // (1 << transform_bits))
            sub = np.full(
                mw * mh, 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r, dtype=np.uint32
            )
            _encode_entropy_image(bw, sub, mw, False)
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)
        bw.write(0, 1)  # no more transforms
        # forward transforms in REVERSE read order (the decoder inverts
        # in reverse read order, so the stream is
        # sg_f(color_f(pred_f(img))))
        if predictor is not None:
            pxf = _forward_predictor(pxf, w, h, transform_bits, predictor)
        if color is not None:
            g2r, g2b, r2b = (c & 0xFF for c in color)
            pxi = pxf.astype(np.int32)
            green = pxi[:, 2]
            red_orig = pxi[:, 1].copy()
            pxi[:, 1] = (pxi[:, 1] - _ct_delta(g2r, green)) & 0xFF
            pxi[:, 3] = (
                pxi[:, 3] - _ct_delta(g2b, green) - _ct_delta(r2b, red_orig)
            ) & 0xFF
            pxf = pxi.astype(np.uint8)
        if subtract_green:
            g = pxf[:, 2].astype(np.int32)
            pxf = pxf.astype(np.int32)
            pxf[:, 1] = (pxf[:, 1] - g) & 0xFF
            pxf[:, 3] = (pxf[:, 3] - g) & 0xFF
            pxf = pxf.astype(np.uint8)
        _encode_entropy_image(bw, _pack(pxf.reshape(h, w, 4)), enc_w, True, use_lz77, cache_bits)

    body = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
