"""Adversarial bitstream-mutation fuzz across the codec family
(VERDICT r7 directive 3).

Every decoder in this repo is pinned against an in-repo encoder — the only
fixture source available in this sandbox — which leaves two risks open:
a shared spec misreading, and hostile inputs (at crawl scale EVERY decoder
is a hostile-input surface). This sweep attacks the second risk head-on:
for each format, take valid encoder output and apply seeded

  - single-bit flips (body and header regions),
  - truncations (every prefix length class),
  - length-field / dimension-field corruptions (targeted byte stomps),
  - random tail garbage appended after a valid stream,

and assert the decoder either returns a well-formed result (a mutation can
be semantically harmless) or raises a CLEAN, CATCHABLE error — never hangs,
never segfaults the worker, never returns a malformed-shape array — within
a per-call time budget.

All decoders are pure Python/numpy, so "crash" shows up as an uncaught
non-Exception (SystemExit etc.) or a wrong-shape/huge allocation; "hang"
as a blown time budget. numpy MemoryError / OverflowError from corrupt
dimension fields count as clean failures only if they surface as
Exception subclasses — they do.
"""

from __future__ import annotations

import random
import zlib
import time

import numpy as np
import pytest

from cozo_spark.operators import multimodal as MM
from cozo_spark.operators.gif import decode_gif, encode_gif
from cozo_spark.operators.jpeg import (decode_jpeg, encode_jpeg,
                                       encode_jpeg_progressive)
from cozo_spark.operators.flac import decode_flac, encode_flac
from cozo_spark.operators.webp import decode_webp, encode_webp_lossless

N_MUTATIONS = 120          # per format, per VERDICT "≥100 seeded mutations"
TIME_BUDGET_S = 10.0       # generous: full valid decodes take < 0.5 s


def _img(seed: int, w: int = 24, h: int = 16) -> np.ndarray:
    rnd = np.random.RandomState(seed)
    # structured + noise: exercises RLE/prediction paths, not just noise
    base = np.tile(np.linspace(0, 255, w, dtype=np.uint8), (h, 1))
    img = np.stack([base, base[::-1], rnd.randint(0, 256, (h, w))], axis=-1)
    return img.astype(np.uint8)


def _fixtures() -> dict:
    img = _img(7)
    gray_img = _img(8)[:, :, :1]
    # GIF fixture encoder is palette-based (<=256 colors): quantize
    pal_img = (img // 64) * 64
    samples = (np.sin(np.linspace(0, 40, 800)) * 20000).astype(np.int16)
    return {
        "png": MM.encode_png(img),
        "png_adam7": MM.encode_png(img, interlace=True),
        "jpeg": encode_jpeg(img),
        "jpeg_prog": encode_jpeg_progressive(img),
        "gif": encode_gif(pal_img),
        "webp": encode_webp_lossless(img),
        "wav": MM.encode_wav(samples, rate=8000),
        "flac": encode_flac((samples.astype("int64") // 2), rate=8000,
                            stereo_mode="independent"),
        "gray_png": MM.encode_png(gray_img),
    }


_DECODERS = {
    "png": MM.decode_png, "png_adam7": MM.decode_png,
    "jpeg": decode_jpeg, "jpeg_prog": decode_jpeg,
    "gif": decode_gif, "webp": decode_webp,
    "wav": MM.decode_wav, "gray_png": MM.decode_png,
    "flac": decode_flac,
}


def _mutations(data: bytes, rnd: random.Random, n: int):
    """Yield (label, mutated_bytes): bit flips, truncations, field stomps,
    tail garbage — deterministic per seed."""
    ln = len(data)
    for i in range(n):
        kind = i % 4
        buf = bytearray(data)
        if kind == 0:  # single-bit flip; bias 1/3 of them into the header
            pos = rnd.randrange(0, min(64, ln)) if i % 3 == 0 \
                else rnd.randrange(0, ln)
            buf[pos] ^= 1 << rnd.randrange(8)
            yield f"bitflip@{pos}", bytes(buf)
        elif kind == 1:  # truncation across the whole length range
            cut = rnd.randrange(0, ln)
            yield f"trunc@{cut}", bytes(buf[:cut])
        elif kind == 2:  # stomp a multi-byte field with an extreme value
            pos = rnd.randrange(0, max(1, ln - 4))
            stomp = rnd.choice(
                [b"\xff\xff\xff\xff", b"\x00\x00\x00\x00",
                 b"\xff\xff\x00\x00", bytes(rnd.randrange(256)
                                            for _ in range(4))])
            buf[pos:pos + 4] = stomp
            yield f"stomp@{pos}", bytes(buf)
        else:  # valid stream + garbage tail
            tail = bytes(rnd.randrange(256)
                         for _ in range(rnd.randrange(1, 64)))
            yield f"tail+{len(tail)}", bytes(buf) + tail


def _check_result(fmt: str, out) -> None:
    """A survivor decode must still be well-formed (no wrong-shape junk)."""
    if fmt in ("wav", "flac"):
        samples, rate = out
        assert isinstance(rate, int) and 0 < rate < 10_000_000
        assert samples.ndim in (1, 2) and samples.size < 50_000_000
    else:
        assert isinstance(out, np.ndarray)
        assert out.ndim == 3 and 1 <= out.shape[2] <= 4
        assert out.size < 200_000_000, "corrupt dims must not huge-allocate"


@pytest.mark.parametrize("fmt", sorted(_DECODERS))
def test_codec_mutation_sweep(fmt):
    data = _fixtures()[fmt]
    decode = _DECODERS[fmt]
    # sanity: the unmutated fixture decodes
    _check_result(fmt, decode(data))
    rnd = random.Random(0xC0DEC + zlib.crc32(fmt.encode()) % 1000)
    survived = failed = 0
    for label, mut in _mutations(data, rnd, N_MUTATIONS):
        t0 = time.time()
        try:
            out = decode(mut)
        except Exception:
            failed += 1  # clean catchable failure — the contract
        else:
            _check_result(fmt, out)
            survived += 1
        elapsed = time.time() - t0
        assert elapsed < TIME_BUDGET_S, (
            f"{fmt} {label}: decode took {elapsed:.1f}s — hang risk")
    # a sweep where nothing failed means the mutations never hit the
    # decoder (fixture/mutator bug), not that the decoder is perfect
    assert failed > 0, f"{fmt}: no mutation produced a decode error"


def test_empty_and_tiny_inputs_fail_cleanly():
    for fmt, decode in _DECODERS.items():
        for blob in (b"", b"\x00", b"RIFF", b"\x89PNG", b"\xff\xd8"):
            with pytest.raises(Exception):
                decode(blob)


def test_decode_image_dispatch_rejects_garbage():
    """The mapInPandas plumbing path: decode_image on hostile bytes raises
    cleanly for every declared media type."""
    rnd = random.Random(99)
    for mt in ("image/png", "image/jpeg", "image/gif", "image/webp"):
        blob = bytes(rnd.randrange(256) for _ in range(256))
        with pytest.raises(Exception):
            MM.decode_image(blob, mt)


# ---------------------------------------------------------------------------
# FLAC field-aware mutations (r10, VERDICT r9 #7): the byte-stomp sweep above
# mostly dies on CRC; structured corruption of Rice partition headers, LPC
# shift/precision fields and UTF-8 frame numbers — with the CRCs RECOMPUTED
# so the field validation itself (and the STREAMINFO-MD5 backstop) is what's
# under test. Contract: every mutation either raises a clean ValueError or
# decodes to the EXACT original PCM (semantically equivalent encoding) —
# never wrong PCM, never a hang, never a non-ValueError crash.
# ---------------------------------------------------------------------------


def _flac_set_bits(buf: bytearray, bitpos: int, nbits: int, val: int) -> None:
    """MSB-first bit-range replacement (the FLAC bitstream order)."""
    for i in range(nbits):
        bit = (val >> (nbits - 1 - i)) & 1
        p = bitpos + i
        byte, off = p // 8, p % 8
        mask = 1 << (7 - off)
        buf[byte] = (buf[byte] | mask) if bit else (buf[byte] & ~mask)


def _flac_get_bits(buf: bytes, bitpos: int, nbits: int) -> int:
    v = 0
    for i in range(nbits):
        p = bitpos + i
        v = (v << 1) | ((buf[p // 8] >> (7 - p % 8)) & 1)
    return v


def _flac_meta_end(blob: bytes) -> int:
    assert blob[:4] == b"fLaC"
    i = 4
    while True:
        last = blob[i] & 0x80
        ln = int.from_bytes(blob[i + 1:i + 4], "big")
        i += 4 + ln
        if last:
            return i


def _flac_frame0(blob: bytes):
    """Locate frame 0's field offsets (single-frame stream, frame_no=0 →
    1-byte UTF-8). Returns (frame_start, hdr_len, subframe_bit0, info)."""
    from cozo_spark.operators import flac as FL

    fs = _flac_meta_end(blob)
    b = blob[fs:]
    bs_code, sr_code = b[2] >> 4, b[2] & 0xF
    hdr_len = 4 + 1 + (2 if bs_code in (6, 7) else 0) \
        + (2 if sr_code in (12, 13, 14) else 0)
    if bs_code == 6:
        hdr_len -= 1  # 8-bit blocksize-1
    sub_bit0 = (fs + hdr_len + 1) * 8  # +1 for the CRC-8 byte
    return fs, hdr_len, sub_bit0


def _flac_fix_crcs(blob: bytes, fs: int, hdr_len: int) -> bytes:
    from cozo_spark.operators.flac import crc8, crc16

    buf = bytearray(blob)
    buf[fs + hdr_len] = crc8(bytes(buf[fs:fs + hdr_len]))
    c16 = crc16(bytes(buf[fs:-2]))
    buf[-2], buf[-1] = c16 >> 8, c16 & 0xFF
    return bytes(buf)


def _flac_fixture_fixed():
    """Single-frame mono stream whose first subframe is FIXED with a Rice
    residual (a noisy ramp defeats CONSTANT and low rice costs verbatim)."""
    import numpy as np

    from cozo_spark.operators.flac import encode_flac

    rng = np.random.default_rng(11)
    sig = (np.arange(4096) * 3 + rng.integers(-40, 40, 4096)).astype(np.int64)
    blob = encode_flac(sig, rate=16000, bps=16, blocksize=4096)
    fs, hdr_len, sub_bit0 = _flac_frame0(blob)
    stype = _flac_get_bits(blob, sub_bit0 + 1, 6)
    assert 8 <= stype <= 12, f"fixture not FIXED: subframe type {stype}"
    order = stype - 8
    return blob, fs, hdr_len, sub_bit0, order, sig


def _assert_rejected_or_equal(blob, sig):
    import numpy as np

    from cozo_spark.operators.flac import decode_flac

    try:
        out, _rate = decode_flac(blob)
    except ValueError:
        return "rejected"
    assert np.array_equal(np.asarray(out, dtype=np.int64), sig), \
        "mutated FLAC decoded to WRONG PCM without an error"
    return "equal"


def test_flac_rice_partition_header_mutations():
    blob, fs, hdr_len, sub_bit0, order, sig = _flac_fixture_fixed()
    bps = 16
    resid_bit = sub_bit0 + 8 + order * bps  # method(2) porder(4) k(4)
    outcomes = {}
    for name, off, nbits, val in [
        ("method_rice2", resid_bit, 2, 1),
        ("method_reserved2", resid_bit, 2, 2),
        ("method_reserved3", resid_bit, 2, 3),
        ("porder_1", resid_bit + 2, 4, 1),
        ("porder_3", resid_bit + 2, 4, 3),
        # 4096 >> 12 = 1 <= order: the zero-length-first-partition check
        ("porder_12_zero_first_part", resid_bit + 2, 4, 12),
        ("porder_15", resid_bit + 2, 4, 15),
        ("rice_k_escape", resid_bit + 6, 4, 15),
        ("rice_k_flip", resid_bit + 6, 4,
         _flac_get_bits(blob, resid_bit + 6, 4) ^ 1),
    ]:
        buf = bytearray(blob)
        _flac_set_bits(buf, off, nbits, val)
        outcomes[name] = _assert_rejected_or_equal(
            _flac_fix_crcs(bytes(buf), fs, hdr_len), sig)
    # reserved methods and the zero-first-partition shape must be REJECTED
    # by field validation specifically (CRCs were fixed)
    assert outcomes["method_reserved2"] == "rejected"
    assert outcomes["method_reserved3"] == "rejected"
    assert outcomes["porder_12_zero_first_part"] == "rejected"
    assert outcomes["porder_15"] == "rejected"  # 4096 % 32768 != 0
    assert all(v in ("rejected", "equal") for v in outcomes.values())


def test_flac_frame_header_field_mutations():
    blob, fs, hdr_len, sub_bit0, order, sig = _flac_fixture_fixed()
    hdr_bit0 = fs * 8
    outcomes = {}
    for name, off, nbits, val in [
        ("bs_code_reserved0", hdr_bit0 + 16, 4, 0),
        ("sr_code_invalid15", hdr_bit0 + 20, 4, 15),
        ("ch_code_reserved11", hdr_bit0 + 24, 4, 11),
        ("ch_code_stereo_on_mono", hdr_bit0 + 24, 4, 1),
        ("ss_code_reserved3", hdr_bit0 + 28, 3, 3),
        ("reserved_bit_set", hdr_bit0 + 31, 1, 1),
        ("utf8_continuation_lead", hdr_bit0 + 32, 8, 0x80),
        ("utf8_invalid_fe", hdr_bit0 + 32, 8, 0xFE),
        ("utf8_other_number", hdr_bit0 + 32, 8, 0x05),
    ]:
        buf = bytearray(blob)
        _flac_set_bits(buf, off, nbits, val)
        outcomes[name] = _assert_rejected_or_equal(
            _flac_fix_crcs(bytes(buf), fs, hdr_len), sig)
    for k in ("bs_code_reserved0", "sr_code_invalid15", "ch_code_reserved11",
              "ch_code_stereo_on_mono", "ss_code_reserved3",
              "reserved_bit_set", "utf8_continuation_lead",
              "utf8_invalid_fe"):
        assert outcomes[k] == "rejected", f"{k}: {outcomes[k]}"
    # a different (valid) frame number is semantically irrelevant: the
    # decoder reads and discards it — must still decode to the same PCM
    assert outcomes["utf8_other_number"] == "equal"


def test_flac_warmup_and_wasted_bit_mutations():
    import numpy as np

    blob, fs, hdr_len, sub_bit0, order, sig = _flac_fixture_fixed()
    outcomes = {}
    if order > 0:
        # flip a warm-up sample bit: structurally valid, wrong PCM -> the
        # STREAMINFO MD5 backstop must reject
        buf = bytearray(blob)
        _flac_set_bits(buf, sub_bit0 + 8 + 3, 1,
                       _flac_get_bits(blob, sub_bit0 + 8 + 3, 1) ^ 1)
        outcomes["warmup_flip"] = _assert_rejected_or_equal(
            _flac_fix_crcs(bytes(buf), fs, hdr_len), sig)
        assert outcomes["warmup_flip"] == "rejected"
    # set the wasted-bits flag: the following unary+payload reparse shifts
    buf = bytearray(blob)
    _flac_set_bits(buf, sub_bit0 + 7, 1, 1)
    outcomes["wasted_flag"] = _assert_rejected_or_equal(
        _flac_fix_crcs(bytes(buf), fs, hdr_len), sig)
    # truncations through the residual region must be clean ValueErrors
    from cozo_spark.operators.flac import decode_flac
    for cut in (len(blob) - 2, len(blob) - 50, (fs + hdr_len) + 3):
        with pytest.raises(ValueError):
            decode_flac(blob[:cut])


def test_flac_lpc_field_mutations_handbuilt():
    """The in-repo encoder never emits LPC, so LPC shift/precision rigor
    comes from mutating a hand-built LPC subframe (the decoder-unit shape
    from test_flac.py) — invalid precision code and negative shift must
    raise; a perturbed shift decodes to different-but-valid samples at the
    SUBFRAME level (the MD5 backstop only exists at stream level)."""
    from cozo_spark.operators.flac import (_BitReader, _BitWriter,
                                           _decode_subframe)

    def lpc_blob(precision_code=3, shift=1, coef=2):
        w = _BitWriter()
        w.write(0, 1)
        w.write(32, 6)           # LPC order 1
        w.write(0, 1)
        w.write(7, 16)           # warm-up
        w.write(precision_code, 4)
        w.write(shift & 0x1F, 5)
        w.write(coef & 0xF, 4)
        w.write(0, 2)
        w.write(0, 4)
        w.write(0, 4)
        for _ in range(7):
            w.write_unary(0)
        w.align()
        return w.bytes()

    ok = _decode_subframe(_BitReader(lpc_blob()), 8, 16)
    assert ok.tolist() == [7] * 8
    with pytest.raises(ValueError, match="LPC precision"):
        _decode_subframe(_BitReader(lpc_blob(precision_code=15)), 8, 16)
    with pytest.raises(ValueError, match="negative LPC shift"):
        _decode_subframe(_BitReader(lpc_blob(shift=0x1F)), 8, 16)  # -1
    # perturbed-but-valid shift: decodes, different samples, right length
    out = _decode_subframe(_BitReader(lpc_blob(shift=0)), 8, 16)
    assert len(out) == 8 and out.tolist() != [7] * 8
    # truncated LPC header dies in the bit reader, not with an IndexError
    for cut in (3, 4, 5):
        with pytest.raises(ValueError):
            _decode_subframe(_BitReader(lpc_blob()[:cut]), 8, 16)


def test_flac_random_field_bitflips_with_fixed_crcs():
    """100 deterministic single-bit flips across the subframe region with
    CRCs recomputed: the decoder's only acceptable outcomes are a clean
    ValueError or bit-identical PCM."""
    blob, fs, hdr_len, sub_bit0, order, sig = _flac_fixture_fixed()
    rnd = random.Random(7)
    lo, hi = sub_bit0, (len(blob) - 2) * 8
    rejected = equal = 0
    for _ in range(100):
        p = rnd.randrange(lo, hi)
        buf = bytearray(blob)
        _flac_set_bits(buf, p, 1, _flac_get_bits(blob, p, 1) ^ 1)
        r = _assert_rejected_or_equal(
            _flac_fix_crcs(bytes(buf), fs, hdr_len), sig)
        if r == "rejected":
            rejected += 1
        else:
            equal += 1
    assert rejected > 0, "no flip was rejected — mutator missed the stream"
