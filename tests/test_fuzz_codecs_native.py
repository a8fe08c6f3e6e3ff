"""Mutation fuzz over FOREIGN-encoder fixtures + cross-family confusion
(r9, VERDICT r8 directive #5).

test_fuzz_codecs mutates in-repo encoder output; this sweep mutates the
native libraries' streams instead, reaching decode paths our encoders
cannot emit:

- libpng: adaptive per-row filters (Sub/Up/Average/Paeth mid-stream),
- giflib: dynamically-growing LZW code streams (width bumps, clear codes
  at table-full),
- libwebp: lossy VP8 (boolean-coded partitions) and its VP8L,
- libjpeg: spec example Huffman tables, 10-scan progressive scripts,
  restart-marker streams.

Same contract as the in-repo sweep: every mutation either decodes to a
well-formed result or raises a clean catchable Exception inside the time
budget — no hangs, no wrong-shape junk, no huge allocations.

Cross-family confusion: a VALID stream of one format fed to every other
family's decoder (and to decode_image under a mismatched declared media
type) must fail cleanly — at crawl scale mislabeled content types are the
common case, not the corner case.

Each format skips independently when its system library is absent.
"""

from __future__ import annotations

import random
import zlib
import time

import numpy as np
import pytest

from cozo_spark.operators import multimodal as MM
from cozo_spark.operators import webp_native
from cozo_spark.operators.gif import decode_gif
from cozo_spark.operators.jpeg import decode_jpeg
from cozo_spark.operators.webp import decode_webp
from tests.jpeg_native_util import load_libjpeg
from tests.test_fuzz_codecs import (N_MUTATIONS, TIME_BUDGET_S,
                                    _check_result, _img, _mutations)

# independent availability per family (import the sibling modules lazily so
# their module-level skipif marks don't bite here)
try:
    from tests.test_png_native import _LIB as _PNG_LIB
    from tests.test_png_native import _png_encode_native
except Exception:  # pragma: no cover
    _PNG_LIB = None
try:
    from tests.test_gif_native import _LIB as _GIF_LIB
    from tests.test_gif_native import _gif_encode_native
except Exception:  # pragma: no cover
    _GIF_LIB = None
_JPEG = load_libjpeg()
_WEBP_OK = webp_native.available()


def _native_fixture(fmt: str) -> bytes:
    img = _img(7)
    if fmt == "png_native":
        return _png_encode_native(np.ascontiguousarray(_img(9, w=40, h=32)))
    if fmt == "gif_native":
        return _gif_encode_native((_img(10) // 64) * 64)
    if fmt == "webp_lossy":
        return webp_native.encode_lossy(_img(11, w=32, h=24), quality=80.0)
    if fmt == "webp_lossless_native":
        return webp_native.encode_lossless(_img(12, w=32, h=24))
    if fmt == "jpeg_native":
        return _JPEG.encode(img, quality=90)
    if fmt == "jpeg_native_prog":
        return _JPEG.encode(img, quality=85, progressive=True)
    if fmt == "jpeg_native_restart":
        if _JPEG.restart_offset() is None:
            pytest.skip("restart_interval offset not identifiable")
        return _JPEG.encode(_img(13, w=64, h=64), quality=90,
                            restart_interval=2)
    raise KeyError(fmt)


_NATIVE = {
    "png_native": (lambda: _PNG_LIB is not None, MM.decode_png, "png"),
    "gif_native": (lambda: _GIF_LIB is not None, decode_gif, "gif"),
    "webp_lossy": (lambda: _WEBP_OK, decode_webp, "webp"),
    "webp_lossless_native": (lambda: _WEBP_OK, decode_webp, "webp"),
    "jpeg_native": (lambda: _JPEG is not None, decode_jpeg, "jpeg"),
    "jpeg_native_prog": (lambda: _JPEG is not None, decode_jpeg, "jpeg"),
    "jpeg_native_restart": (lambda: _JPEG is not None, decode_jpeg, "jpeg"),
}


@pytest.mark.parametrize("fmt", sorted(_NATIVE))
def test_native_fixture_mutation_sweep(fmt):
    avail, decode, family = _NATIVE[fmt]
    if not avail():
        pytest.skip(f"system library for {fmt} unavailable")
    data = _native_fixture(fmt)
    _check_result(family, decode(data))  # unmutated stream must decode
    rnd = random.Random(0xFACE + zlib.crc32(fmt.encode()) % 1000)
    survived = failed = 0
    for label, mut in _mutations(data, rnd, N_MUTATIONS):
        t0 = time.time()
        try:
            out = decode(mut)
        except Exception:
            failed += 1
        else:
            _check_result(family, out)
            survived += 1
        elapsed = time.time() - t0
        assert elapsed < TIME_BUDGET_S, (
            f"{fmt} {label}: decode took {elapsed:.1f}s — hang risk")
    assert failed > 0, f"{fmt}: no mutation produced a decode error"


_FAMILY_DECODERS = {
    "png": MM.decode_png,
    "jpeg": decode_jpeg,
    "gif": decode_gif,
    "webp": decode_webp,
}


@pytest.mark.parametrize("fmt", sorted(_NATIVE))
def test_cross_family_confusion(fmt):
    """A valid stream of one family into every OTHER family's decoder:
    clean rejection, never a hang or malformed success."""
    avail, _decode, family = _NATIVE[fmt]
    if not avail():
        pytest.skip(f"system library for {fmt} unavailable")
    data = _native_fixture(fmt)
    for other, decode in _FAMILY_DECODERS.items():
        if other == family:
            continue
        t0 = time.time()
        with pytest.raises(Exception):
            decode(data)
        assert time.time() - t0 < TIME_BUDGET_S, f"{fmt}->{other} hang"


def test_decode_image_mismatched_media_type():
    """decode_image (the mapInPandas plumbing) with a TRUE stream under a
    WRONG declared media type must raise cleanly for every combination."""
    fixtures = {}
    if _PNG_LIB is not None:
        fixtures["image/png"] = _native_fixture("png_native")
    if _GIF_LIB is not None:
        fixtures["image/gif"] = _native_fixture("gif_native")
    if _WEBP_OK:
        fixtures["image/webp"] = _native_fixture("webp_lossy")
    if _JPEG is not None:
        fixtures["image/jpeg"] = _native_fixture("jpeg_native")
    if len(fixtures) < 2:
        pytest.skip("fewer than two native fixtures available")
    for true_mt, blob in fixtures.items():
        for declared in fixtures:
            if declared == true_mt:
                continue
            with pytest.raises(Exception):
                MM.decode_image(blob, declared)
