"""Baseline JPEG codec, pure stdlib+numpy — the compressed-codec gap the
multimodal pipeline gated on (operators/multimodal.py decode_image).

Implements the ISO/IEC 10918-1 BASELINE process from the public spec:
sequential DCT, 8-bit, Huffman entropy coding — SOI/APPn/DQT/SOF0/DHT/
DRI/SOS/RSTn/EOI markers, interleaved MCUs with sampling factors up to
2x2 (4:4:4, 4:2:2, 4:2:0), byte-unstuffing, restart intervals, canonical
Huffman tables decoded FROM the stream's DHT segments (no baked-in
tables), dequantize -> dezigzag -> orthonormal 2-D IDCT (numpy einsum
over all blocks at once) -> chroma upsample -> JFIF YCbCr->RGB.

PROGRESSIVE (SOF2) Huffman files are decoded too (r6): spectral-selection
and successive-approximation scans per Annex G — interleaved and
non-interleaved DC first/refine passes, AC first passes with EOB runs,
and the AC refinement pass's correction-bit protocol, accumulating
coefficients across scans and reconstructing at EOI. A matching
progressive encoder (libjpeg-style scan script, buffered correction
bits) exists so decode is pinned BIT-IDENTICAL to the baseline encoding
of the same quantized coefficients. Arithmetic-coded and
lossless/hierarchical processes still raise NotImplementedError.

The encoder exists so the decoder is testable without any codec library:
it emits 4:4:4 or 4:2:0 baseline files with per-image canonical Huffman
tables built from actual symbol frequencies. Lossy round-trips are
verified against the encoder's own dequantized reconstruction (exact up
to IDCT rounding), not just visually.

Execution model: decode runs inside the existing mapInPandas Arrow
kernels (multimodal.py) — per-batch Python is the documented fallback
path; swap in a codec lib for throughput, nothing Spark-side changes.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II matrix: forward X = T @ x @ T.T
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _T[_k, _n] = (np.sqrt(1 / 8) if _k == 0 else 0.5) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16)


def _idct2_blocks(blocks: np.ndarray) -> np.ndarray:
    """(N, 8, 8) coefficient blocks -> (N, 8, 8) spatial samples."""
    return np.einsum("ki,nkl,lj->nij", _T, blocks, _T, optimize=True)


def _dct2_blocks(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ik,nkl,jl->nij", _T, blocks, _T, optimize=True)


class _HuffTable:
    """Canonical Huffman per Annex C: counts-per-length + ordered values."""

    def __init__(self, bits: list, values: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code, idx = 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lookup[(ln, code)] = values[idx]
                code += 1
                idx += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any marker (restart handling is the caller's job)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker: baseline decoders see this only on truncation —
                # feed 1-bits like libjpeg's fake-zero-length-code recovery
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> Optional[int]:
        """Discard partial byte, expect an RSTn marker; returns its index."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while d[p] != 0xFF or d[p + 1] == 0x00:
            p += 1
        m = d[p + 1]
        self.pos = p + 2
        if 0xD0 <= m <= 0xD7:
            return m - 0xD0
        self.pos = p  # EOI/other: put the marker back
        return None


def _decode_huff(r: _BitReader, table: _HuffTable) -> int:
    code, ln = 0, 0
    while True:
        code = (code << 1) | r.bit()
        ln += 1
        sym = table.lookup.get((ln, code))
        if sym is not None:
            return sym
        if ln > 16:
            raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    """Table F.12: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline or progressive JPEG bytes -> (H, W, 3) uint8 RGB
    (grayscale replicated)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None
    progressive = False
    coefs = None  # progressive: per-component (nblocks, 64) zigzag-space

    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and coefs is not None:
                return _assemble_progressive(frame, coefs, qt)
            raise ValueError("EOI before SOS")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i:i + 64], dtype=np.uint8
                                        ).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(seg[i:i + 128], dtype=">u2"
                                        ).astype(np.int32)
                    i += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = bytes(seg[i + 17:i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only DCT Huffman JPEG (SOF0/1/2) is supported without a "
                f"codec library (got SOF marker 0x{marker:02x} — "
                "arithmetic/lossless/hierarchical)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if not progressive:
                ns = seg[0]
                scan = []
                for c in range(ns):
                    cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                    comp = next(x for x in frame["comps"] if x["id"] == cs)
                    scan.append((comp, tdta >> 4, tdta & 0x0F))
                return _decode_scan(data, pos, frame, scan, qt, huff_dc,
                                    huff_ac, restart_interval)
            if coefs is None:
                hmax = max(c["h"] for c in frame["comps"])
                vmax = max(c["v"] for c in frame["comps"])
                mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
                mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
                coefs = [np.zeros((mcuy * c["v"] * mcux * c["h"], 64),
                                  dtype=np.int32) for c in frame["comps"]]
            pos = _decode_progressive_sos(data, pos, seg, frame, coefs,
                                          huff_dc, huff_ac,
                                          restart_interval)
        # else: APPn/COM/etc — skipped
    raise ValueError("no scan found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, ri):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component coefficient block grids
    grids = []
    for comp, _, _ in scan:
        bw, bh = mcux * comp["h"], mcuy * comp["v"]
        grids.append(np.zeros((bh * bw, 8, 8), dtype=np.int32))

    r = _BitReader(data, pos)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu_count and mcu_count % ri == 0:
                got = r.align_to_marker()
                if got is not None:
                    pred = [0] * len(scan)
            for ci, (comp, td, ta) in enumerate(scan):
                dct, act = huff_dc[td], huff_ac[ta]
                bw = mcux * comp["h"]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = np.zeros(64, dtype=np.int32)
                        t = _decode_huff(r, dct)
                        diff = _extend(r.bits(t), t)
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(r, act)
                            rr, ss = rs >> 4, rs & 0x0F
                            if ss == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("AC index out of range")
                            blk[k] = _extend(r.bits(ss), ss)
                            k += 1
                        row = my * comp["v"] + by
                        col = mx * comp["h"] + bx
                        deq = np.zeros(64, dtype=np.int32)
                        deq[ZIGZAG] = blk * qt[comp["tq"]]
                        grids[ci][row * bw + col] = deq.reshape(8, 8)
            mcu_count += 1

    # IDCT all blocks per component, assemble planes, upsample to full res
    planes = []
    for ci, (comp, _, _) in enumerate(scan):
        bw, bh = mcux * comp["h"], mcuy * comp["v"]
        spat = _idct2_blocks(grids[ci].astype(np.float64)) + 128.0
        plane = (spat.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8))
        sy, sx = vmax // comp["v"], hmax // comp["h"]
        if sy > 1 or sx > 1:
            plane = np.repeat(np.repeat(plane, sy, axis=0), sx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    return np.clip(np.stack([r_, g_, b_], axis=-1), 0, 255
                   ).round().astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive decode (Annex G, Huffman): coefficients accumulate across
# scans; reconstruction happens once at EOI
# ---------------------------------------------------------------------------


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next real marker (skips stuffed FF00 and fill FFs)."""
    while True:
        while data[pos] != 0xFF:
            pos += 1
        while data[pos + 1] == 0xFF:
            pos += 1
        if data[pos + 1] != 0x00:
            return pos
        pos += 2


def _decode_progressive_sos(data, pos, seg, frame, coefs, huff_dc, huff_ac,
                            ri) -> int:
    """One progressive scan: updates `coefs` in place, returns the stream
    position of the next marker."""
    ns = seg[0]
    scomps = []  # (frame comp index, dc table, ac table)
    for c in range(ns):
        cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
        ci = next(i for i, x in enumerate(frame["comps"]) if x["id"] == cs)
        scomps.append((ci, tdta >> 4, tdta & 0x0F))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ahal = seg[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0x0F
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    r = _BitReader(data, pos)

    def _restart(mcu_count, state):
        if ri and mcu_count and mcu_count % ri == 0:
            got = r.align_to_marker()
            if got is not None:
                state["pred"] = [0] * ns
                state["eobrun"] = 0

    state = {"pred": [0] * ns, "eobrun": 0}
    if ss == 0:  # DC scan (first or refinement), any interleaving
        if ns > 1:  # interleaved over the MCU grid
            n_units = mcuy * mcux
            for u in range(n_units):
                _restart(u, state)
                my, mx = divmod(u, mcux)
                for si, (ci, td, _ta) in enumerate(scomps):
                    comp = frame["comps"][ci]
                    bw = mcux * comp["h"]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            row = my * comp["v"] + by
                            col = mx * comp["h"] + bx
                            _dc_pass(r, coefs[ci], row * bw + col,
                                     huff_dc.get(td), ah, al, state, si)
        else:  # non-interleaved: the component's own block grid
            ci, td, _ta = scomps[0]
            comp = frame["comps"][ci]
            cw = -(-frame["w"] * comp["h"] // hmax)
            ch = -(-frame["h"] * comp["v"] // vmax)
            nbw, nbh = -(-cw // 8), -(-ch // 8)
            bw = mcux * comp["h"]
            for u in range(nbh * nbw):
                _restart(u, state)
                row, col = divmod(u, nbw)
                _dc_pass(r, coefs[ci], row * bw + col,
                         huff_dc.get(td), ah, al, state, 0)
    else:  # AC scan: single component, non-interleaved (B.2.3)
        if ns != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        ci, _td, ta = scomps[0]
        comp = frame["comps"][ci]
        act = huff_ac.get(ta)
        cw = -(-frame["w"] * comp["h"] // hmax)
        ch = -(-frame["h"] * comp["v"] // vmax)
        nbw, nbh = -(-cw // 8), -(-ch // 8)
        bw = mcux * comp["h"]
        for u in range(nbh * nbw):
            _restart(u, state)
            row, col = divmod(u, nbw)
            blk = coefs[ci][row * bw + col]
            if ah == 0:
                _ac_first(r, blk, ss, se, al, act, state)
            else:
                _ac_refine(r, blk, ss, se, al, act, state)
    # consumed entropy bytes contain only STUFFED 0xFFs, so scanning
    # forward from the reader's byte position finds the scan-terminating
    # marker and nothing else
    return _next_marker(data, r.pos)


def _dc_pass(r, grid, bidx, dct, ah, al, state, si) -> None:
    if ah == 0:  # first pass: baseline DC diff, shifted by Al
        t = _decode_huff(r, dct)
        state["pred"][si] += _extend(r.bits(t), t)
        grid[bidx, 0] = state["pred"][si] << al
    else:  # refinement: one bit ORed into position Al (two's complement)
        if r.bit():
            grid[bidx, 0] = int(grid[bidx, 0]) | (1 << al)


def _ac_first(r, blk, ss, se, al, act, state) -> None:
    """G.1.2.2: first AC pass over [Ss, Se] with EOB runs."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huff(r, act)
        rr, s = rs >> 4, rs & 0x0F
        if s == 0:
            if rr != 15:
                state["eobrun"] = (1 << rr) - 1
                if rr:
                    state["eobrun"] += r.bits(rr)
                break
            k += 16  # ZRL
            continue
        k += rr
        if k > se:
            raise ValueError("AC index out of spectral band")
        blk[k] = _extend(r.bits(s), s) << al
        k += 1


def _ac_refine(r, blk, ss, se, al, act, state) -> None:
    """G.1.2.3: AC refinement — correction bits for already-nonzero
    coefficients, ±1<<Al for newly significant ones, EOB runs cover
    whole blocks whose band gains no new coefficient."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _decode_huff(r, act)
            rr, s = rs >> 4, rs & 0x0F
            if s == 0:
                if rr != 15:
                    state["eobrun"] = 1 << rr
                    if rr:
                        state["eobrun"] += r.bits(rr)
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            else:
                val = p1 if r.bit() else m1
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if r.bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c > 0 else m1)
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if val != 0 and k <= se:
                blk[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            c = int(blk[k])
            if c != 0 and r.bit() and (c & p1) == 0:
                blk[k] = c + (p1 if c > 0 else m1)
            k += 1
        state["eobrun"] -= 1


def _assemble_progressive(frame, coefs, qt) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for ci, comp in enumerate(frame["comps"]):
        bw, bh = mcux * comp["h"], mcuy * comp["v"]
        deq = np.zeros((bh * bw, 64), dtype=np.int64)
        deq[:, ZIGZAG] = coefs[ci].astype(np.int64) * qt[comp["tq"]]
        spat = _idct2_blocks(deq.reshape(-1, 8, 8).astype(np.float64)) + 128.0
        plane = (spat.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8))
        sy, sx = vmax // comp["v"], hmax // comp["h"]
        if sy > 1 or sx > 1:
            plane = np.repeat(np.repeat(plane, sy, axis=0), sx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    return np.clip(np.stack([r_, g_, b_], axis=-1), 0, 255
                   ).round().astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (fixture/backup path): 4:4:4 or 4:2:0 baseline, per-image tables
# ---------------------------------------------------------------------------


_Q_LUMA_FLAT = np.full(64, 16, dtype=np.int32)


def _build_huff(freqs: dict[int, int]) -> tuple[list, bytes, dict]:
    """Canonical Huffman from symbol frequencies (package-merge-lite:
    length-limited via simple deepening), returns (BITS, HUFFVAL,
    sym->(code,len))."""
    syms = sorted(freqs, key=lambda s: (-freqs[s], s))
    n = len(syms)
    # assign lengths: balanced tree depth, then canonicalize — valid,
    # not optimal, which is all a fixture encoder needs
    lens = {}
    depth = max(1, (n - 1).bit_length())
    if depth > 16:
        raise ValueError("too many symbols")
    # all codes same length `depth`, except avoid the all-ones code
    # (JPEG forbids it): use depth+1 for the last symbol if saturated
    if n == (1 << depth):
        depth += 1
    for s in syms:
        lens[s] = depth
    bits = [0] * 16
    for s in syms:
        bits[lens[s] - 1] += 1
    huffval = bytes(sorted(syms, key=lambda s: (lens[s], s)))
    code, idx, enc = 0, 0, {}
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            enc[huffval[idx]] = (code, ln)
            code += 1
            idx += 1
        code <<= 1
    return bits, huffval, enc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, ln: int) -> None:
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per the spec


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _quantize(img: np.ndarray, quality_div: int, subsample: bool):
    """Shared encoder front half: color-convert, pad, DCT, quantize.
    Returns (comp_blocks zigzag-order, sf, q, h, w, mcux, mcuy)."""
    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape[:2]
    r_, g_, b_ = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
    cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0
    cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0

    q = np.maximum(_Q_LUMA_FLAT * quality_div, 1)
    if subsample:
        sf = [(2, 2), (1, 1), (1, 1)]
        cb = cb[::2, ::2]
        cr = cr[::2, ::2]
    else:
        sf = [(1, 1), (1, 1), (1, 1)]
    planes = [y, cb, cr]
    hmax = max(s[0] for s in sf)
    vmax = max(s[1] for s in sf)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # quantized zigzag blocks per component, in MCU-interleaved order
    comp_blocks: list[list[np.ndarray]] = [[] for _ in planes]
    for ci, plane in enumerate(planes):
        ch, cw = mcuy * sf[ci][1] * 8, mcux * sf[ci][0] * 8
        padded = np.empty((ch, cw))
        ph, pw = plane.shape
        padded[:ph, :pw] = plane
        padded[ph:, :pw] = plane[-1:, :]
        padded[:, pw:] = padded[:, pw - 1:pw]
        bh, bw = ch // 8, cw // 8
        blocks = (padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
                  .reshape(-1, 8, 8)) - 128.0
        coefs = _dct2_blocks(blocks)
        qz = np.round(coefs.reshape(-1, 64) / q[ZIGZAG.argsort()]
                      ).astype(np.int32)
        # store in zigzag order
        comp_blocks[ci] = [blk.reshape(64)[ZIGZAG] for blk in
                           (qz.reshape(-1, 8, 8))]
    return comp_blocks, sf, q, h, w, mcux, mcuy


def encode_jpeg(img: np.ndarray, quality_div: int = 1,
                subsample: bool = False) -> bytes:
    """(H, W, 3) uint8 RGB -> baseline JFIF bytes (4:4:4, or 4:2:0 with
    subsample=True). Quantizer is a flat table scaled by quality_div."""
    comp_blocks, sf, q, h, w, mcux, mcuy = _quantize(img, quality_div,
                                                     subsample)

    # symbol statistics then entropy-encode
    def mcu_iter():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(3):
                    hs, vs = sf[ci]
                    bw = mcux * hs
                    for by in range(vs):
                        for bx in range(hs):
                            row, col = my * vs + by, mx * hs + bx
                            yield ci, comp_blocks[ci][row * bw + col]

    dc_freq: list[dict] = [{}, {}]
    ac_freq: list[dict] = [{}, {}]
    pred = [0, 0, 0]
    sym_stream = []
    for ci, zz in mcu_iter():
        ti = 0 if ci == 0 else 1
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        t = _category(diff)
        dc_freq[ti][t] = dc_freq[ti].get(t, 0) + 1
        entry = [("dc", ti, t, diff)]
        run = 0
        last_nz = 0
        for k in range(1, 64):
            if zz[k] != 0:
                last_nz = k
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                if run == 16:
                    ac_freq[ti][0xF0] = ac_freq[ti].get(0xF0, 0) + 1
                    entry.append(("ac", ti, 0xF0, 0, 0))
                    run = 0
                continue
            s = _category(v)
            rs = (run << 4) | s
            ac_freq[ti][rs] = ac_freq[ti].get(rs, 0) + 1
            entry.append(("ac", ti, rs, s, v))
            run = 0
        if last_nz < 63:
            ac_freq[ti][0x00] = ac_freq[ti].get(0x00, 0) + 1
            entry.append(("ac", ti, 0x00, 0, 0))
        sym_stream.append(entry)

    dc_tabs = [_build_huff(f or {0: 1}) for f in dc_freq]
    ac_tabs = [_build_huff(f or {0: 1}) for f in ac_freq]

    bw_ = _BitWriter()
    for entry in sym_stream:
        for item in entry:
            if item[0] == "dc":
                _, ti, t, diff = item
                code, ln = dc_tabs[ti][2][t]
                bw_.write(code, ln)
                if t:
                    bw_.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            else:
                _, ti, rs, s, v = item
                code, ln = ac_tabs[ti][2][rs]
                bw_.write(code, ln)
                if s:
                    bw_.write(v if v >= 0 else v + (1 << s) - 1, s)
    bw_.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    # DQT (same flat table for both slots 0 and 1)
    for tq in (0, 1):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(x) for x in q)
    # SOF0
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * 3) + b"\x08" \
        + struct.pack(">HH", h, w) + b"\x03"
    for ci in range(3):
        out += bytes([ci + 1, (sf[ci][0] << 4) | sf[ci][1],
                      0 if ci == 0 else 1])
    # DHT x4
    for tc, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for th in (0, 1):
            bits, vals, _ = tabs[th]
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
                + bytes([(tc << 4) | th]) + bytes(bits) + vals
    # SOS
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * 3) + b"\x03"
    for ci in range(3):
        ti = 0 if ci == 0 else 1
        out += bytes([ci + 1, (ti << 4) | ti])
    out += b"\x00\x3f\x00"
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (fixture path): libjpeg-style scan script with
# spectral selection + successive approximation, per-scan canonical tables,
# EOB-run folding and the two-buffer correction-bit protocol (BE bits owned
# by the pending EOB run flush after the EOBn symbol; BR bits owned by the
# current block flush after each in-block symbol)
# ---------------------------------------------------------------------------


class _SymCounter:
    def __init__(self):
        self.freq: dict[int, int] = {}

    def sym(self, s: int) -> None:
        self.freq[s] = self.freq.get(s, 0) + 1

    def bits(self, v: int, n: int) -> None:
        pass


class _SymWriter:
    def __init__(self, bw: "_BitWriter", enc: dict):
        self.bw = bw
        self.enc = enc

    def sym(self, s: int) -> None:
        code, ln = self.enc[s]
        self.bw.write(code, ln)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.bw.write(v & ((1 << n) - 1), n)


_DEFAULT_PROG_SCANS = (
    ((0, 1, 2), 0, 0, 0, 1),   # DC first, point transform 1
    ((0,), 1, 5, 0, 2),        # luma AC low band, Al=2
    ((2,), 1, 63, 0, 1),       # Cr full band, Al=1
    ((1,), 1, 63, 0, 1),       # Cb full band, Al=1
    ((0,), 6, 63, 0, 2),       # luma AC high band, Al=2
    ((0, 1, 2), 0, 0, 1, 0),   # DC refinement
    ((0,), 1, 63, 2, 1),       # luma AC refine 2 -> 1
    ((0,), 1, 63, 1, 0),       # luma AC refine 1 -> 0
    ((2,), 1, 63, 1, 0),       # Cr refine
    ((1,), 1, 63, 1, 0),       # Cb refine
)


def _enc_dc_pass(blocks, al, ah, emitters) -> None:
    if ah == 0:
        pred = [0] * len(emitters)
        for si, zz in blocks:
            v = int(zz[0]) >> al  # DC point transform = arithmetic shift
            diff = v - pred[si]
            pred[si] = v
            t = _category(diff)
            e = emitters[si]
            e.sym(t)
            if t:
                e.bits(diff if diff >= 0 else diff + (1 << t) - 1, t)
    else:
        for si, zz in blocks:
            emitters[si].bits((int(zz[0]) >> al) & 1, 1)


def _enc_ac_first(blocks, ss, se, al, e) -> None:
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            e.sym(nb << 4)
            e.bits(eobrun - (1 << nb), nb)
            eobrun = 0

    for _si, zz in blocks:
        vals = []
        for k in range(ss, se + 1):
            c = int(zz[k])
            a = abs(c) >> al  # AC point transform divides (trunc to zero)
            vals.append(a if c >= 0 else -a)
        last = -1
        for i, v in enumerate(vals):
            if v:
                last = i
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        r = 0
        for i in range(last + 1):
            v = vals[i]
            if v == 0:
                r += 1
                continue
            while r > 15:
                e.sym(0xF0)
                r -= 16
            s = _category(v)
            e.sym((r << 4) | s)
            e.bits(v if v > 0 else v + (1 << s) - 1, s)
            r = 0
        if last < len(vals) - 1:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _enc_ac_refine(blocks, ss, se, al, e) -> None:
    eobrun = 0
    be: list[int] = []  # correction bits owned by the pending EOB run

    def flush():
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            e.sym(nb << 4)
            e.bits(eobrun - (1 << nb), nb)
            eobrun = 0
            for b in be:
                e.bits(b, 1)
            be.clear()

    for _si, zz in blocks:
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eobpos = -1
        for i, t in enumerate(absv):
            if t == 1:
                eobpos = i
        r = 0
        br: list[int] = []  # this block's bits since the last symbol
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eobpos:
                flush()
                e.sym(0xF0)
                r -= 16
                for b in br:
                    e.bits(b, 1)
                br.clear()
            if t > 1:
                br.append(t & 1)
                continue
            flush()  # t == 1: newly significant
            e.sym((r << 4) | 1)
            e.bits(1 if int(zz[ss + i]) >= 0 else 0, 1)
            for b in br:
                e.bits(b, 1)
            br.clear()
            r = 0
        if r > 0 or br:
            eobrun += 1
            be.extend(br)
            if eobrun == 0x7FFF:
                flush()
    flush()


def encode_jpeg_progressive(img: np.ndarray, quality_div: int = 1,
                            subsample: bool = False,
                            scans=_DEFAULT_PROG_SCANS) -> bytes:
    """(H, W, 3) uint8 RGB -> PROGRESSIVE (SOF2) JFIF bytes carrying the
    exact same quantized coefficients as encode_jpeg — decoding both must
    yield bit-identical pixels, which pins every progressive decode path."""
    comp_blocks, sf, q, h, w, mcux, mcuy = _quantize(img, quality_div,
                                                     subsample)
    hmax = max(s[0] for s in sf)
    vmax = max(s[1] for s in sf)

    def scan_blocks(cis):
        if len(cis) > 1:
            out = []
            for my in range(mcuy):
                for mx in range(mcux):
                    for si, ci in enumerate(cis):
                        hs, vs = sf[ci]
                        bw = mcux * hs
                        for by in range(vs):
                            for bx in range(hs):
                                out.append((si, comp_blocks[ci][
                                    (my * vs + by) * bw + mx * hs + bx]))
            return out
        ci = cis[0]
        hs, vs = sf[ci]
        cw, ch = -(-w * hs // hmax), -(-h * vs // vmax)
        nbw, nbh = -(-cw // 8), -(-ch // 8)
        bw = mcux * hs
        return [(0, comp_blocks[ci][r_ * bw + c_])
                for r_ in range(nbh) for c_ in range(nbw)]

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq in (0, 1):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(x) for x in q)
    out += b"\xff\xc2" + struct.pack(">H", 8 + 3 * 3) + b"\x08" \
        + struct.pack(">HH", h, w) + b"\x03"
    for ci in range(3):
        out += bytes([ci + 1, (sf[ci][0] << 4) | sf[ci][1],
                      0 if ci == 0 else 1])

    for cis, ss, se, ah, al in scans:
        blocks = scan_blocks(cis)
        tslots = [0 if ci == 0 else 1 for ci in cis]
        tc = 0 if ss == 0 else 1
        need_tables = not (ss == 0 and ah > 0)  # DC refine is raw bits
        encs: dict[int, dict] = {}
        if need_tables:
            counters = {sl: _SymCounter() for sl in set(tslots)}
            run = [counters[tslots[si]] for si in range(len(cis))]
            if ss == 0:
                _enc_dc_pass(blocks, al, ah, run)
            elif ah == 0:
                _enc_ac_first(blocks, ss, se, al, run[0])
            else:
                _enc_ac_refine(blocks, ss, se, al, run[0])
            for sl, cnt in counters.items():
                bits_, vals, enc = _build_huff(cnt.freq or {0: 1})
                encs[sl] = enc
                out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
                    + bytes([(tc << 4) | sl]) + bytes(bits_) + vals
        out += b"\xff\xda" + struct.pack(">H", 6 + 2 * len(cis)) \
            + bytes([len(cis)])
        for si, ci in enumerate(cis):
            sl = tslots[si]
            td_ta = (sl << 4) if tc == 0 else sl
            out += bytes([ci + 1, td_ta])
        out += bytes([ss, se, (ah << 4) | al])
        bw_ = _BitWriter()
        if need_tables:
            ws = {sl: _SymWriter(bw_, encs[sl]) for sl in set(tslots)}
            run = [ws[tslots[si]] for si in range(len(cis))]
        else:
            raw = _SymWriter(bw_, {})
            run = [raw for _ in cis]
        if ss == 0:
            _enc_dc_pass(blocks, al, ah, run)
        elif ah == 0:
            _enc_ac_first(blocks, ss, se, al, run[0])
        else:
            _enc_ac_refine(blocks, ss, se, al, run[0])
        bw_.flush()
        out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


def expected_reconstruction(img: np.ndarray, quality_div: int = 1
                            ) -> np.ndarray:
    """Spec math for 4:4:4 encode_jpeg output, computed WITHOUT the
    entropy layer: color-convert -> DCT -> quantize -> dequantize ->
    IDCT -> color-convert. A correct decoder must reproduce this to
    within IDCT/clamp rounding (tests assert max |diff| <= 1), which
    pins the Huffman/bitstream layer exactly — any mis-decoded
    coefficient shifts a whole 8x8 block."""
    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape[:2]
    assert h % 8 == 0 and w % 8 == 0
    r_, g_, b_ = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
    cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0
    cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0
    q = np.maximum(_Q_LUMA_FLAT * quality_div, 1).astype(np.float64)
    qnat = q[ZIGZAG.argsort()].reshape(8, 8)
    outp = []
    for plane in (y, cb, cr):
        blocks = (plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
                  .reshape(-1, 8, 8)) - 128.0
        deq = np.round(_dct2_blocks(blocks) / qnat) * qnat
        spat = _idct2_blocks(deq) + 128.0
        outp.append(spat.reshape(h // 8, w // 8, 8, 8).transpose(0, 2, 1, 3)
                    .reshape(h, w))
    y, cb, cr = outp[0], outp[1] - 128.0, outp[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(rgb, 0, 255).round().astype(np.uint8)
