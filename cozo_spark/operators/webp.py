"""Lossless WebP (VP8L) codec, pure stdlib+numpy — closes the
highest-frequency multimodal gap (operators/multimodal.py decode_image
gated WebP on codec libraries this container doesn't ship; modern web
crawls serve WebP heavily).

Implements the public WebP Lossless Bitstream Specification (RFC 9649 /
developers.google.com "WebP Lossless Bitstream Specification"):

- RIFF/WEBP container walk (plain VP8L and VP8X-extended layouts),
- LSB-first bit reader over the VP8L payload,
- canonical prefix codes: simple (1-2 symbol) and full code-length-coded
  (deflate-style, with the 16/17/18 repeat codes, the kCodeLengthCodeOrder
  permutation, and the optional max_symbol early stop),
- color cache (hash 0x1e35a7bd, 1-11 bits),
- meta prefix codes (entropy image selecting per-block code groups),
- LZ77 backward references with the 120-entry 2D near-neighborhood
  distance mapping,
- all four inverse transforms: PREDICTOR (14 modes, flat-array border
  semantics), COLOR (signed 3.5 fixed-point cross-channel deltas),
  SUBTRACT_GREEN, COLOR_INDEXING (incl. sub-byte pixel bundling for
  palettes <= 16 colors).

Lossy VP8 stays gated with a clear error (a full VP8 intra decoder is a
different project; install an image lib and add a branch in
multimodal.decode_image — nothing Spark-side changes).

The encoder exists so the decoder is testable without any codec library
(same fixture discipline as operators/jpeg.py): it emits real VP8L
streams — per-image canonical Huffman codes built from actual symbol
frequencies, optional subtract-green / fixed-mode predictor / fixed-delta
color transform / palette (bundled and plain) / color cache / greedy
RLE+neighbor LZ77 / meta prefix groups — and round-trips are verified
pixel-exact in tests/test_webp.py.

Reference parity note: the cozo reference ships no image codecs; this
backs the multimodal column operators (SURVEY.md §2 multimodal row).

Execution model: decode runs inside the existing mapInPandas Arrow
kernels (multimodal.py) — per-batch Python is the documented fallback
path; swap in a codec lib for throughput, nothing Spark-side changes.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O (VP8L packs bits LSB-first within bytes)
# ---------------------------------------------------------------------------


class _BitReader:
    """Incremental LSB-first reader: O(1) per read via a small accumulator
    fed one byte at a time (a whole-payload big-int window re-shifted per
    read is O(payload) per read — O(payload²) total, minutes on a real
    crawl-sized image)."""

    __slots__ = ("data", "byte", "acc", "nacc")

    def __init__(self, data: bytes, start_byte: int = 0):
        self.data = data
        self.byte = start_byte
        self.acc = 0
        self.nacc = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nacc < n:
            if self.byte >= len(self.data):
                raise ValueError("VP8L: bitstream truncated")
            self.acc |= self.data[self.byte] << self.nacc
            self.byte += 1
            self.nacc += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nacc -= n
        return v


class _BitWriter:
    __slots__ = ("bits", "pos")

    def __init__(self):
        self.bits = 0
        self.pos = 0

    def write(self, value: int, n: int) -> None:
        if n:
            self.bits |= (value & ((1 << n) - 1)) << self.pos
            self.pos += n

    def getvalue(self) -> bytes:
        return self.bits.to_bytes((self.pos + 7) // 8 or 1, "little")


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------

# order in which code-length-code lengths are stored (RFC 9649 §6.2.2)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
              14, 15)
_MAX_CODE_LEN = 15


def _canonical_assign(lengths) -> dict:
    """sym -> (code, len) with deflate-style canonical assignment (codes of
    the same length are consecutive in symbol order; shorter lengths come
    numerically first)."""
    bl_count: dict = {}
    for ln in lengths:
        if ln:
            bl_count[ln] = bl_count.get(ln, 0) + 1
    code = 0
    next_code = {}
    for ln in range(1, max(bl_count, default=0) + 1):
        code = (code + bl_count.get(ln - 1, 0)) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _PrefixCode:
    """Decoder side: read one symbol by walking bits MSB-of-code-first.

    `single` (0-bit) codes arise from 1-symbol simple codes AND from
    normal codes whose length table has exactly one nonzero entry — both
    consume no bits per symbol."""

    __slots__ = ("table", "single")

    def __init__(self, lengths=None, single=None, table=None):
        self.single = single
        if table is not None:
            self.table = table
            return
        if lengths is not None:
            used = [s for s, ln in enumerate(lengths) if ln]
            if not used:
                raise ValueError("VP8L: empty prefix code")
            if len(used) == 1:
                self.single = used[0]
                self.table = None
                return
            if max(lengths) > _MAX_CODE_LEN:
                raise ValueError("VP8L: code length > 15")
            self.table = {(ln, code): sym for sym, (code, ln)
                          in _canonical_assign(lengths).items()}
            return
        self.table = None

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        acc = 0
        for ln in range(1, _MAX_CODE_LEN + 1):
            acc = (acc << 1) | br.read(1)
            sym = self.table.get((ln, acc))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid prefix code in stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        s0 = br.read(8) if br.read(1) else br.read(1)
        if num_symbols == 1:
            return _PrefixCode(single=s0)
        s1 = br.read(8)
        # first listed symbol gets code 0 (NOT canonical-by-value)
        return _PrefixCode(table={(1, 0): s0, (1, 1): s1})
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CLC_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(lengths=cl_lengths)
    if br.read(1):  # explicit number of coded symbols
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym < alphabet_size:
                    lengths[sym] = prev_len
                    sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
    return _PrefixCode(lengths=lengths)


# ---------------------------------------------------------------------------
# LZ77 helpers
# ---------------------------------------------------------------------------


def _prefix_value(code: int, br: _BitReader) -> int:
    """Length/distance prefix decoding (RFC 9649 §6.2.3): codes 0-3 are
    literal values 1-4; above that, (code&1) selects the sub-range and
    (code-2)>>1 extra bits follow."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int):
    """value -> (code, extra_nbits, extra_value); inverse of _prefix_value."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    b = (v >> extra) & 1
    return 2 * extra + 2 + b, extra, v - ((2 + b) << extra)


# 120-entry near-neighborhood (dx, dy) map for distance codes 1..120
# (RFC 9649 §5.2.2) — offsets ordered by closeness to the current pixel.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3),
    (5, 8), (-5, 8), (8, 4), (3, 8), (-3, 8), (8, 5), (8, 6), (7, 6),
)


def _plane_to_dist(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dy * xsize + dx
    return d if d >= 1 else 1


def _dist_to_plane_code(dist: int, xsize: int) -> int:
    for i, (dx, dy) in enumerate(_DIST_MAP):
        d = dy * xsize + dx
        if d == dist and d >= 1:
            return i + 1
    return dist + 120


# ---------------------------------------------------------------------------
# color cache
# ---------------------------------------------------------------------------

_CACHE_MUL = 0x1E35A7BD


def _cache_slot(argb: int, cache_bits: int) -> int:
    return ((_CACHE_MUL * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


# ---------------------------------------------------------------------------
# image-stream decode
# ---------------------------------------------------------------------------


def _div_ceil(a: int, b: int) -> int:
    return (a + b - 1) // b


def _decode_entropy_pixels(br: _BitReader, xsize: int, ysize: int,
                            allow_meta: bool):
    """The spatially-coded pixel layer shared by the main image and every
    sub-resolution image (transform data, palettes, entropy image)."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L: bad color-cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    prefix_bits = 0
    meta_w = 0
    num_groups = 1
    if allow_meta and br.read(1):
        prefix_bits = br.read(3) + 2
        meta_w = _div_ceil(xsize, 1 << prefix_bits)
        meta_h = _div_ceil(ysize, 1 << prefix_bits)
        meta_img = _decode_entropy_pixels(br, meta_w, meta_h, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        num_groups = int(meta.max()) + 1

    groups = []
    for _ in range(num_groups):
        groups.append((
            _read_prefix_code(br, 256 + 24 + cache_size),  # green+len+cache
            _read_prefix_code(br, 256),                    # red
            _read_prefix_code(br, 256),                    # blue
            _read_prefix_code(br, 256),                    # alpha
            _read_prefix_code(br, 40),                     # distance
        ))

    n = xsize * ysize
    out = np.zeros(n, dtype=np.uint32)
    cache = [0] * cache_size
    pos = 0
    grp = groups[0]
    last_block = -1
    while pos < n:
        if meta is not None:
            x = pos % xsize
            y = pos // xsize
            blk = (y >> prefix_bits) * meta_w + (x >> prefix_bits)
            if blk != last_block:
                grp = groups[int(meta[blk])]
                last_block = blk
        s = grp[0].read(br)
        if s < 256:
            red = grp[1].read(br)
            blue = grp[2].read(br)
            alpha = grp[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache_size:
                cache[_cache_slot(px, cache_bits)] = px
            pos += 1
        elif s < 280:
            length = _prefix_value(s - 256, br)
            dcode = _prefix_value(grp[4].read(br), br)
            dist = _plane_to_dist(dcode, xsize)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: LZ77 reference out of range")
            for _ in range(length):  # overlap-safe (RLE when dist < length)
                px = int(out[pos - dist])
                out[pos] = px
                if cache_size:
                    cache[_cache_slot(px, cache_bits)] = px
                pos += 1
        else:
            out[pos] = cache[s - 280]
            pos += 1
    return out


def _decode_image_stream(br: _BitReader, xsize: int, ysize: int):
    """Top-level (transform-bearing) image stream -> (ysize, xsize) ARGB."""
    transforms = []
    seen = set()
    cur_x = xsize
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype == 2:  # SUBTRACT_GREEN
            transforms.append(("subtract_green",))
        elif ttype in (0, 1):  # PREDICTOR / COLOR
            size_bits = br.read(3) + 2
            bw = _div_ceil(cur_x, 1 << size_bits)
            bh = _div_ceil(ysize, 1 << size_bits)
            sub = _decode_entropy_pixels(br, bw, bh, False)
            transforms.append(
                ("predictor" if ttype == 0 else "color", size_bits, sub, bw))
        elif ttype == 3:  # COLOR_INDEXING
            n_colors = br.read(8) + 1
            pal = _decode_entropy_pixels(br, n_colors, 1, False)
            # palette entries are component-wise deltas from the previous
            chans = np.stack([(pal >> sh) & 0xFF for sh in (24, 16, 8, 0)])
            chans = np.cumsum(chans, axis=1, dtype=np.uint64) & 0xFF
            pal = ((chans[0] << 24) | (chans[1] << 16) | (chans[2] << 8)
                   | chans[3]).astype(np.uint32)
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append(("palette", pal, width_bits, cur_x))
            cur_x = _div_ceil(cur_x, 1 << width_bits)
    data = _decode_entropy_pixels(br, cur_x, ysize, True)
    w = cur_x
    for tr in reversed(transforms):
        if tr[0] == "palette":
            data, w = _inverse_palette(data, w, ysize, tr[1], tr[2], tr[3])
        elif tr[0] == "subtract_green":
            data = _inverse_subtract_green(data)
        elif tr[0] == "color":
            data = _inverse_color(data, w, ysize, tr[1], tr[2], tr[3])
        else:
            data = _inverse_predictor(data, w, ysize, tr[1], tr[2], tr[3])
    if w != xsize:
        raise ValueError("VP8L: transform width bookkeeping mismatch")
    return data.reshape(ysize, xsize)


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------


def _inverse_subtract_green(data: np.ndarray) -> np.ndarray:
    g = (data >> 8) & 0xFF
    r = ((data >> 16) + g) & 0xFF
    b = (data + g) & 0xFF
    return ((data & 0xFF00FF00) | (r << 16) | b).astype(np.uint32)


def _ct_delta(t: int, c: int) -> int:
    """(int8 t * int8 c) >> 5 with arithmetic shift (RFC 9649 §4.2.3)."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inverse_color(data, w, h, size_bits, sub, bw) -> np.ndarray:
    out = data.copy()
    for p in range(w * h):
        x = p % w
        y = p // w
        cte = int(sub[(y >> size_bits) * bw + (x >> size_bits)])
        g2r = cte & 0xFF          # blue channel of the transform pixel
        g2b = (cte >> 8) & 0xFF   # green channel
        r2b = (cte >> 16) & 0xFF  # red channel
        px = int(out[p])
        green = (px >> 8) & 0xFF
        red = ((px >> 16) + _ct_delta(g2r, green)) & 0xFF
        blue = (px + _ct_delta(g2b, green) + _ct_delta(r2b, red)) & 0xFF
        out[p] = (px & 0xFF00FF00) | (red << 16) | blue
    return out


def _forward_color(data, w, h, size_bits, sub, bw) -> np.ndarray:
    out = data.copy()
    for p in range(w * h):
        x = p % w
        y = p // w
        cte = int(sub[(y >> size_bits) * bw + (x >> size_bits)])
        g2r = cte & 0xFF
        g2b = (cte >> 8) & 0xFF
        r2b = (cte >> 16) & 0xFF
        px = int(out[p])
        green = (px >> 8) & 0xFF
        red0 = (px >> 16) & 0xFF
        red = (red0 - _ct_delta(g2r, green)) & 0xFF
        blue = ((px & 0xFF) - _ct_delta(g2b, green)
                - _ct_delta(r2b, red0)) & 0xFF
        out[p] = (px & 0xFF00FF00) | (red << 16) | blue
    return out


def _avg2(a: int, b: int) -> int:
    # per-channel (a + b) / 2 without cross-channel carries
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        v = ((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_sub_half(ab: int, c: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        a = (ab >> sh) & 0xFF
        d = a - ((c >> sh) & 0xFF)
        # C-style truncating division by 2
        v = a + (d // 2 if d >= 0 else -((-d) // 2))
        out |= max(0, min(255, v)) << sh
    return out


def _select(l: int, t: int, tl: int) -> int:
    p_l = 0
    p_t = 0
    for sh in (0, 8, 16, 24):
        lc = (l >> sh) & 0xFF
        tc = (t >> sh) & 0xFF
        pc = lc + tc - ((tl >> sh) & 0xFF)
        p_l += abs(pc - lc)
        p_t += abs(pc - tc)
    return l if p_l < p_t else t


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(l, t), tl)
    raise ValueError(f"VP8L: bad predictor mode {mode}")


def _add_pixels(px: int, pred: int) -> int:
    # per-channel (px + pred) mod 256
    out = 0
    for sh in (0, 8, 16, 24):
        out |= ((((px >> sh) & 0xFF) + ((pred >> sh) & 0xFF)) & 0xFF) << sh
    return out


def _sub_pixels(px: int, pred: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        out |= ((((px >> sh) & 0xFF) - ((pred >> sh) & 0xFF)) & 0xFF) << sh
    return out


def _predictor_neighbors(out, p, x, y, w):
    """Flat-array addressing gives the spec's border semantics for free:
    TR of the rightmost column is the CURRENT row's first pixel (already
    decoded), exactly data[(y-1)*w + x + 1] on a contiguous buffer."""
    l = int(out[p - 1])
    t = int(out[p - w])
    tr = int(out[p - w + 1])
    tl = int(out[p - w - 1])
    return l, t, tr, tl


def _inverse_predictor(data, w, h, size_bits, sub, bw) -> np.ndarray:
    out = data.copy()
    for p in range(w * h):
        x = p % w
        y = p // w
        if p == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(out[p - 1])        # top row: L
        elif x == 0:
            pred = int(out[p - w])        # left column: T
        else:
            mode = (int(sub[(y >> size_bits) * bw + (x >> size_bits)])
                    >> 8) & 0xFF
            pred = _predict(mode, *_predictor_neighbors(out, p, x, y, w))
        out[p] = _add_pixels(int(out[p]), pred)
    return out


def _forward_predictor(data, w, h, size_bits, sub, bw) -> np.ndarray:
    src = data  # predictions read RECONSTRUCTED (original) neighbors
    out = data.copy()
    for p in range(w * h):
        x = p % w
        y = p // w
        if p == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(src[p - 1])
        elif x == 0:
            pred = int(src[p - w])
        else:
            mode = (int(sub[(y >> size_bits) * bw + (x >> size_bits)])
                    >> 8) & 0xFF
            pred = _predict(mode, *_predictor_neighbors(src, p, x, y, w))
        out[p] = _sub_pixels(int(src[p]), pred)
    return out


def _inverse_palette(data, w, h, pal, width_bits, full_w):
    if width_bits == 0:
        idx = ((data >> 8) & 0xFF).astype(np.int64)
    else:
        bpp = 8 >> width_bits
        per = 1 << width_bits
        g = ((data.reshape(h, w) >> 8) & 0xFF).astype(np.int64)
        xs = np.arange(full_w)
        packed = g[:, xs >> width_bits]
        idx = ((packed >> (bpp * (xs & (per - 1)))) & ((1 << bpp) - 1))
        idx = idx.reshape(-1)
    safe = np.where(idx < len(pal), idx, 0)
    px = pal[safe]
    px = np.where(idx < len(pal), px, np.uint32(0))
    return px.astype(np.uint32), full_w


# ---------------------------------------------------------------------------
# container + public decode
# ---------------------------------------------------------------------------


def decode_vp8l(data: bytes) -> np.ndarray:
    """VP8L chunk payload -> (H, W, 4) uint8 RGBA."""
    if not data or data[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _BitReader(data, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-used hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unknown version")
    argb = _decode_image_stream(br, w, h)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[..., 0] = (argb >> 16) & 0xFF
    out[..., 1] = (argb >> 8) & 0xFF
    out[..., 2] = argb & 0xFF
    out[..., 3] = (argb >> 24) & 0xFF
    return out


def decode_webp(content: bytes) -> np.ndarray:
    """RIFF/WEBP container -> (H, W, 3) uint8 RGB (alpha dropped, matching
    decode_image's contract). Lossless (VP8L) decodes for real with the
    from-scratch decoder above — plain and VP8X-extended layouts, pinned
    against FOREIGN libwebp bitstreams (tests/test_webp_native.py). Lossy
    (VP8) decodes through the system libwebp when present (r8,
    operators/webp_native.py — the from-scratch RFC 6386 path is blocked
    on ~2,000 spec constants unavailable offline; inventing them would
    pass same-hand roundtrips while corrupting real files) and keeps the
    narrowed gate otherwise."""
    if len(content) < 16 or content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP container")
    off = 12
    while off + 8 <= len(content):
        fourcc = content[off:off + 4]
        (size,) = struct.unpack("<I", content[off + 4:off + 8])
        payload = content[off + 8:off + 8 + size]
        if fourcc == b"VP8L":
            return decode_vp8l(payload)[..., :3]
        if fourcc == b"VP8 ":
            from cozo_spark.operators import webp_native

            if webp_native.available():
                return webp_native.decode_rgb(content)
            raise NotImplementedError(
                "lossy WebP (VP8) decode requires the system libwebp "
                "shared library, which is not present on this host; "
                "lossless WebP (VP8L) decodes lib-free")
        # VP8X / ALPH / ICCP / EXIF / XMP / ANIM: keep scanning
        off += 8 + size + (size & 1)
    raise ValueError("WEBP container has no VP8L or VP8 chunk")


# ---------------------------------------------------------------------------
# encoder (fixture generator — real VP8L streams, per-image Huffman codes)
# ---------------------------------------------------------------------------


def _huffman_lengths(freqs: dict, max_len: int = _MAX_CODE_LEN) -> dict:
    """sym -> code length from frequencies (plain Huffman; depths beyond
    max_len are avoided by frequency flattening, adequate for fixtures)."""
    import heapq

    items = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    if not items:
        return {}
    if len(items) == 1:
        return {items[0][2][0]: 1}
    while True:
        heap = list(items)
        heapq.heapify(heap)
        depth: dict = {s: 0 for s in freqs}
        tie = len(items)
        while len(heap) > 1:
            f1, _, s1 = heapq.heappop(heap)
            f2, _, s2 = heapq.heappop(heap)
            for s in s1 + s2:
                depth[s] += 1
            tie += 1
            heapq.heappush(heap, (f1 + f2, tie, s1 + s2))
        if max(depth.values()) <= max_len:
            return depth
        items = [(max(1, f >> 2), i, s) for f, i, s in items]


class _CodeWriter:
    """One prefix code: holds sym -> (code, len) and writes symbols
    MSB-of-code-first into the LSB-first bit stream."""

    def __init__(self, assign: dict):
        self.assign = assign

    def write_symbol(self, bw: _BitWriter, sym: int) -> None:
        code, ln = self.assign[sym]
        for i in range(ln - 1, -1, -1):
            bw.write((code >> i) & 1, 1)


def _emit_prefix_code(bw: _BitWriter, freqs: dict,
                      alphabet_size: int) -> _CodeWriter:
    """Write a prefix-code description; return the writer for its symbols."""
    used = sorted(s for s, f in freqs.items() if f > 0)
    if not used:
        used = [0]
        freqs = {0: 1}
    if len(used) == 1 and used[0] < 256:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        s = used[0]
        if s < 2:
            bw.write(0, 1)
            bw.write(s, 1)
        else:
            bw.write(1, 1)
            bw.write(s, 8)
        return _CodeWriter({s: (0, 0)})
    if len(used) == 2 and max(used) < 256:
        bw.write(1, 1)  # simple
        bw.write(1, 1)  # two symbols
        s0, s1 = used
        if s0 < 2:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        bw.write(s1, 8)
        return _CodeWriter({s0: (0, 1), s1: (1, 1)})
    # normal: code-length-coded lengths over the full alphabet
    if len(used) == 1:
        # symbols >= 256 can't use the simple form; avoid the 1-symbol
        # normal special case by padding a never-emitted second symbol
        freqs = dict(freqs)
        freqs[0 if used[0] != 0 else 1] = 1
    depth = _huffman_lengths({s: f for s, f in freqs.items() if f > 0})
    lengths = [0] * alphabet_size
    for s, ln in depth.items():
        lengths[s] = ln
    bw.write(0, 1)  # not simple
    # RLE the length array into code-length symbols
    cl_seq: list = []
    i = 0
    while i < alphabet_size:
        ln = lengths[i]
        run = 1
        while i + run < alphabet_size and lengths[i + run] == ln:
            run += 1
        if ln == 0:
            left = run
            while left >= 11:
                rep = min(left, 138)
                cl_seq.append((18, rep - 11, 7))
                left -= rep
            while left >= 3:
                rep = min(left, 10)
                cl_seq.append((17, rep - 3, 3))
                left -= rep
            for _ in range(left):
                cl_seq.append((0, 0, 0))
        else:
            cl_seq.append((ln, 0, 0))
            left = run - 1
            while left >= 3:
                rep = min(left, 6)
                cl_seq.append((16, rep - 3, 2))
                left -= rep
            for _ in range(left):
                cl_seq.append((ln, 0, 0))
        i += run
    cl_freq: dict = {}
    for sym, _, _ in cl_seq:
        cl_freq[sym] = cl_freq.get(sym, 0) + 1
    if len(cl_freq) == 1:
        only = next(iter(cl_freq))
        cl_freq[0 if only != 0 else 1] = 1  # keep the cl tree 2-symbol
    # the code-length-code lengths are stored in 3-bit fields: depth <= 7
    cl_depth = _huffman_lengths(cl_freq, max_len=7)
    cl_lengths = [0] * 19
    for s, ln in cl_depth.items():
        cl_lengths[s] = ln
    bw.write(15, 4)  # num_code_lengths = 19
    for sym in _CLC_ORDER:
        bw.write(cl_lengths[sym], 3)
    cl_writer = _CodeWriter(_canonical_assign(cl_lengths))
    bw.write(0, 1)  # no explicit max_symbol
    for sym, extra, nbits in cl_seq:
        cl_writer.write_symbol(bw, sym)
        if nbits:
            bw.write(extra, nbits)
    return _CodeWriter(_canonical_assign(lengths))


def _tokenize(argb, xsize, cache_bits: int, use_lz77: bool):
    """Greedy literal / cache-hit / backward-reference tokenization that
    simulates the decoder's cache state exactly."""
    n = len(argb)
    cache = [0] * ((1 << cache_bits) if cache_bits else 0)
    toks = []
    pos = 0
    while pos < n:
        px = int(argb[pos])
        if use_lz77 and pos > 0:
            # prefer runs of the previous pixel (dist 1) or the pixel one
            # row up (dist xsize) — covers RLE and vertical repetition
            best_d = 0
            best_l = 0
            for d in (1, xsize):
                if d > pos:
                    continue
                ln = 0
                while (pos + ln < n and ln < 4096
                       and int(argb[pos + ln]) == int(argb[pos + ln - d])):
                    ln += 1
                if ln > best_l:
                    best_l, best_d = ln, d
            if best_l >= 3:
                toks.append(("copy", best_l,
                             _dist_to_plane_code(best_d, xsize)))
                for i in range(best_l):
                    c = int(argb[pos + i])
                    if cache_bits:
                        cache[_cache_slot(c, cache_bits)] = c
                pos += best_l
                continue
        if cache_bits:
            slot = _cache_slot(px, cache_bits)
            if cache[slot] == px and pos > 0:
                toks.append(("cache", slot))
                pos += 1
                continue
            cache[slot] = px
        toks.append(("lit", px))
        pos += 1
    return toks


def _emit_entropy_image(bw: _BitWriter, argb, xsize: int, *,
                        cache_bits: int = 0, use_lz77: bool = False,
                        meta_bits: int = 0, allow_meta: bool = True) -> None:
    """Write one spatially-coded image (color-cache bit, optional meta
    prefix groups, prefix codes, pixel stream)."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    num_groups = 1
    if allow_meta and meta_bits:
        ysize = len(argb) // xsize
        bw.write(1, 1)
        bw.write(meta_bits - 2, 3)
        mw = _div_ceil(xsize, 1 << meta_bits)
        mh = _div_ceil(ysize, 1 << meta_bits)
        # 2 groups, chosen checkerboard-by-block; the entropy image stores
        # the group index in (red<<8)|green -> green holds index
        meta_px = np.fromfunction(
            lambda y, x: ((x + y) % 2).astype(np.uint32), (mh, mw)
        ).reshape(-1)
        meta_argb = (0xFF000000 | (meta_px << 8)).astype(np.uint32)
        _emit_entropy_image(bw, meta_argb, mw, allow_meta=False)
        # the decoder sizes the group list from the meta image's max index
        # — a 1x1 (or single-row/col even-sum) grid is all-zero, so
        # emitting a fixed 2 groups would desynchronize the stream
        num_groups = int(meta_px.max()) + 1
    elif allow_meta:
        bw.write(0, 1)

    toks = _tokenize(argb, xsize, cache_bits, use_lz77)
    cache_size = (1 << cache_bits) if cache_bits else 0
    # count symbols (identical stats for every group — indexing is what the
    # multi-group fixture exercises, not divergent codes)
    fg: dict = {}
    fr: dict = {}
    fb: dict = {}
    fa: dict = {}
    fd: dict = {}
    for t in toks:
        if t[0] == "lit":
            px = t[1]
            fg[(px >> 8) & 0xFF] = fg.get((px >> 8) & 0xFF, 0) + 1
            fr[(px >> 16) & 0xFF] = fr.get((px >> 16) & 0xFF, 0) + 1
            fb[px & 0xFF] = fb.get(px & 0xFF, 0) + 1
            fa[(px >> 24) & 0xFF] = fa.get((px >> 24) & 0xFF, 0) + 1
        elif t[0] == "cache":
            s = 280 + t[1]
            fg[s] = fg.get(s, 0) + 1
        else:
            lcode, _, _ = _prefix_encode(t[1])
            fg[256 + lcode] = fg.get(256 + lcode, 0) + 1
            dsym, _, _ = _prefix_encode(t[2])
            fd[dsym] = fd.get(dsym, 0) + 1
    writers = []
    for _ in range(num_groups):
        writers.append((
            _emit_prefix_code(bw, fg, 256 + 24 + cache_size),
            _emit_prefix_code(bw, fr, 256),
            _emit_prefix_code(bw, fb, 256),
            _emit_prefix_code(bw, fa, 256),
            _emit_prefix_code(bw, fd, 40),
        ))
    wg = writers[0]
    for t in toks:
        if t[0] == "lit":
            px = t[1]
            wg[0].write_symbol(bw, (px >> 8) & 0xFF)
            wg[1].write_symbol(bw, (px >> 16) & 0xFF)
            wg[2].write_symbol(bw, px & 0xFF)
            wg[3].write_symbol(bw, (px >> 24) & 0xFF)
        elif t[0] == "cache":
            wg[0].write_symbol(bw, 280 + t[1])
        else:
            lcode, lbits, lextra = _prefix_encode(t[1])
            wg[0].write_symbol(bw, 256 + lcode)
            bw.write(lextra, lbits)
            dsym, dbits, dextra = _prefix_encode(t[2])
            wg[4].write_symbol(bw, dsym)
            bw.write(dextra, dbits)
    # NOTE on meta groups: identical codes are written per group, so
    # symbol emission with group 0's writer is stream-correct for all
    # positions — the decoder still exercises per-block group lookup.


def encode_webp_lossless(
    img: np.ndarray, *, subtract_green: bool = False,
    predictor: int | None = None, color_deltas: tuple | None = None,
    palette: bool = False, cache_bits: int = 0, use_lz77: bool = False,
    meta_bits: int = 0, size_bits: int = 4,
) -> bytes:
    """(H, W, 3|4) uint8 -> lossless WebP bytes.

    Options exist to exercise every decoder path: SUBTRACT_GREEN,
    PREDICTOR (one fixed mode 0-13 for all blocks), COLOR (one fixed
    (g2r, g2b, r2b) delta triple), COLOR_INDEXING (auto-bundled for <= 16
    colors), color cache, greedy LZ77 (RLE + row-above references), and
    2-group meta prefix codes. Transforms compose in the written order
    predictor -> color -> subtract_green -> palette."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[0], img.shape[1]
    alpha = (img[..., 3].astype(np.uint32) if img.shape[2] == 4
             else np.full((h, w), 255, dtype=np.uint32))
    argb = ((alpha << 24)
            | (img[..., 0].astype(np.uint32) << 16)
            | (img[..., 1].astype(np.uint32) << 8)
            | img[..., 2].astype(np.uint32)).reshape(-1)

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if img.shape[2] == 4 else 0, 1)
    bw.write(0, 3)  # version

    cur_x = w
    if predictor is not None:
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(size_bits - 2, 3)
        bwid = _div_ceil(cur_x, 1 << size_bits)
        bhgt = _div_ceil(h, 1 << size_bits)
        sub = np.full(bwid * bhgt, 0xFF000000 | (predictor << 8),
                      dtype=np.uint32)
        _emit_entropy_image(bw, sub, bwid, allow_meta=False)
        argb = _forward_predictor(argb, cur_x, h, size_bits, sub, bwid)
    if color_deltas is not None:
        g2r, g2b, r2b = (d & 0xFF for d in color_deltas)
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(size_bits - 2, 3)
        bwid = _div_ceil(cur_x, 1 << size_bits)
        bhgt = _div_ceil(h, 1 << size_bits)
        cte = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
        sub = np.full(bwid * bhgt, cte, dtype=np.uint32)
        _emit_entropy_image(bw, sub, bwid, allow_meta=False)
        argb = _forward_color(argb, cur_x, h, size_bits, sub, bwid)
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        g = (argb >> 8) & 0xFF
        r = ((argb >> 16) - g) & 0xFF
        b = (argb - g) & 0xFF
        argb = ((argb & 0xFF00FF00) | (r << 16) | b).astype(np.uint32)
    if palette:
        colors = np.unique(argb)
        if len(colors) > 256:
            raise ValueError("palette encoding needs <= 256 distinct colors")
        n_colors = len(colors)
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(n_colors - 1, 8)
        # delta-code the palette per channel
        chans = np.stack([(colors >> sh) & 0xFF for sh in (24, 16, 8, 0)])
        deltas = chans.copy()
        deltas[:, 1:] = (chans[:, 1:] - chans[:, :-1]) & 0xFF
        pal_px = ((deltas[0] << 24) | (deltas[1] << 16) | (deltas[2] << 8)
                  | deltas[3]).astype(np.uint32)
        _emit_entropy_image(bw, pal_px, n_colors, allow_meta=False)
        lookup = {int(c): i for i, c in enumerate(colors)}
        idx = np.array([lookup[int(p)] for p in argb], dtype=np.uint32)
        if n_colors <= 2:
            width_bits = 3
        elif n_colors <= 4:
            width_bits = 2
        elif n_colors <= 16:
            width_bits = 1
        else:
            width_bits = 0
        if width_bits:
            bpp = 8 >> width_bits
            per = 1 << width_bits
            new_x = _div_ceil(cur_x, per)
            g = np.zeros(h * new_x, dtype=np.uint32)
            im = idx.reshape(h, cur_x)
            for y in range(h):
                for x in range(cur_x):
                    p = y * new_x + (x >> width_bits)
                    g[p] |= im[y, x] << (bpp * (x & (per - 1)))
            cur_x = new_x
            idx = g
        argb = (0xFF000000 | (idx << 8)).astype(np.uint32)
    bw.write(0, 1)  # no more transforms

    _emit_entropy_image(bw, argb, cur_x, cache_bits=cache_bits,
                        use_lz77=use_lz77, meta_bits=meta_bits)

    payload = bw.getvalue()
    if len(payload) & 1:
        padded = payload + b"\x00"
    else:
        padded = payload
    riff = (b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + padded)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
