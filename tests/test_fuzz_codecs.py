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
