"""Baseline JPEG codec (operators/jpeg.py).

The decoder is validated three ways: (1) bit-exact agreement with the
spec-math reconstruction (quantize->dequantize->IDCT computed without the
entropy layer) — any Huffman/bitstream slip corrupts whole blocks, so
max|diff|<=1 pins that layer; (2) lossy-round-trip quality bounds vs the
original; (3) interop smoke over JPEGs produced by EXTERNAL encoders
(test images shipped with the Python installation), including a 4:2:0
photo."""

from __future__ import annotations

import os

import numpy as np
import pytest

from cozo_spark.operators.jpeg import (
    _T, decode_jpeg, encode_jpeg, expected_reconstruction,
)


def _test_image(h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        (128 + 80 * np.sin(xx / 9.0) + 30 * np.cos(yy / 7.0)),
        (100 + 60 * np.cos((xx + yy) / 11.0)),
        (xx * 255 / w),
    ], axis=-1).clip(0, 255).astype(np.uint8)


def test_dct_matrix_orthonormal():
    assert np.allclose(_T @ _T.T, np.eye(8), atol=1e-12)


def test_decode_matches_spec_math_exactly():
    img = _test_image()
    dec = decode_jpeg(encode_jpeg(img, quality_div=1))
    exp = expected_reconstruction(img, quality_div=1)
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - exp.astype(int)).max() <= 1


def test_lossy_roundtrip_quality():
    img = _test_image()
    dec = decode_jpeg(encode_jpeg(img, quality_div=1))
    err = np.abs(dec.astype(float) - img.astype(float))
    assert err.mean() < 4.0 and err.max() < 40


def test_420_subsampled_roundtrip():
    img = _test_image()
    dec = decode_jpeg(encode_jpeg(img, quality_div=2, subsample=True))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(float) - img.astype(float)).mean() < 10.0


def test_odd_dimensions_padding():
    img = _test_image(h=37, w=53)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == (37, 53, 3)
    assert np.abs(dec.astype(float) - img.astype(float)).mean() < 5.0


def test_arithmetic_rejected_with_context():
    img = _test_image(h=8, w=8)
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic sequential)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(data))


def test_not_a_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n")


_EXTERNAL = [p for p in (
    "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
    "site-packages/IPython/core/tests/2x2.jpg",
    "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
    "test/imghdrdata/python.jpg",
    "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/doc/"
    "rust/html/embedded-book/assets/verify.jpeg",
) if os.path.exists(p)]


@pytest.mark.skipif(not _EXTERNAL, reason="no external JPEGs on this host")
def test_decodes_externally_encoded_jpegs():
    for p in _EXTERNAL:
        img = decode_jpeg(open(p, "rb").read())
        assert img.ndim == 3 and img.shape[2] == 3 and img.size > 0
        assert img.dtype == np.uint8


def test_multimodal_decode_image_dispatch():
    from cozo_spark.operators.multimodal import decode_image

    img = _test_image(h=16, w=16)
    data = encode_jpeg(img)
    out = decode_image(data, "image/jpeg")
    assert out.shape == (16, 16, 3)
    # lossless WebP decodes for REAL since r7; lossy VP8 stays gated
    from cozo_spark.operators.webp import encode_webp_lossless
    import numpy as np
    np.testing.assert_array_equal(
        decode_image(encode_webp_lossless(img), "image/webp"), img)
    import struct as _struct
    lossy = (b"RIFF" + _struct.pack("<I", 16) + b"WEBP"
             + b"VP8 " + _struct.pack("<I", 4) + b"\x00" * 4)
    # r8: lossy VP8 decodes via the system libwebp when present, so this
    # GARBAGE payload must be rejected cleanly; without the library the
    # NotImplementedError gate stays
    from cozo_spark.operators import webp_native
    exc = ValueError if webp_native.available() else NotImplementedError
    with pytest.raises(exc):
        decode_image(lossy, "image/webp")


# ---------------------------------------------------------------------------
# progressive (SOF2) decode — r6
# ---------------------------------------------------------------------------

def test_progressive_bit_identical_to_baseline():
    """The progressive encoding carries the SAME quantized coefficients as
    the baseline encoding, so both decodes must agree bit for bit — this
    pins DC first/refine, AC first (both bands), EOB runs and the AC
    refinement correction-bit protocol in one assertion."""
    from cozo_spark.operators.jpeg import encode_jpeg_progressive

    img = _test_image(h=48, w=64)
    base = decode_jpeg(encode_jpeg(img, quality_div=1))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality_div=1))
    assert np.array_equal(base, prog)


def test_progressive_subsampled_and_coarse():
    from cozo_spark.operators.jpeg import encode_jpeg_progressive

    img = _test_image(h=40, w=56)  # non-multiple of 16 exercises edge MCUs
    for qd in (1, 4):
        base = decode_jpeg(encode_jpeg(img, quality_div=qd, subsample=True))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality_div=qd, subsample=True))
        assert np.array_equal(base, prog), f"quality_div={qd}"


def test_progressive_spectral_only_scan_script():
    """Spectral selection WITHOUT successive approximation (Ah=Al=0
    everywhere) is its own code path (no refinement scans at all)."""
    from cozo_spark.operators.jpeg import encode_jpeg_progressive

    scans = (
        ((0, 1, 2), 0, 0, 0, 0),
        ((0,), 1, 9, 0, 0),
        ((1,), 1, 63, 0, 0),
        ((2,), 1, 63, 0, 0),
        ((0,), 10, 63, 0, 0),
    )
    img = _test_image()
    base = decode_jpeg(encode_jpeg(img, quality_div=2))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality_div=2, scans=scans))
    assert np.array_equal(base, prog)


def test_progressive_sparse_image_exercises_eob_runs():
    """A mostly-flat image makes nearly every AC block end-of-band, so the
    EOB-run accumulation/flush paths (first AND refine) carry real weight."""
    from cozo_spark.operators.jpeg import encode_jpeg_progressive

    img = np.full((64, 64, 3), 130, dtype=np.uint8)
    img[30:34, 30:34] = (250, 10, 90)  # one busy patch
    base = decode_jpeg(encode_jpeg(img, quality_div=1))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality_div=1))
    assert np.array_equal(base, prog)


def test_progressive_random_images_fuzz():
    from cozo_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    for trial in range(4):
        h = int(rng.integers(2, 7)) * 8
        w = int(rng.integers(2, 7)) * 8
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality_div=2))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality_div=2))
        assert np.array_equal(base, prog), f"trial {trial} ({h}x{w})"
