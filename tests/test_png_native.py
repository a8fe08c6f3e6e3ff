"""External-fixture cross-checks for the PNG codec against the system
libpng (r8 — extends the libwebp pattern of tests/test_webp_native.py to
the PNG family; VERDICT r7 "what's missing" #2).

The key coverage win: libpng's encoder picks ADAPTIVE per-row filters
(Sub/Up/Average/Paeth), which our fixture encoder never emits (always
filter 0) — so these foreign bitstreams exercise decode paths the
in-repo roundtrip could not. The binding uses libpng 1.6's SIMPLIFIED
API (png_image_*), which reports errors through return codes + the
message field instead of setjmp/longjmp, so it is safe to drive from
ctypes. All tests skip when the shared library is absent."""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from cozo_spark.operators import multimodal as MM


class _PngImage(ctypes.Structure):
    # libpng 1.6 simplified-API control struct (png.h png_image) — a
    # stable, documented public layout
    _fields_ = [("opaque", ctypes.c_void_p), ("version", ctypes.c_uint32),
                ("width", ctypes.c_uint32), ("height", ctypes.c_uint32),
                ("format", ctypes.c_uint32), ("flags", ctypes.c_uint32),
                ("colormap_entries", ctypes.c_uint32),
                ("warning_or_error", ctypes.c_uint32),
                ("message", ctypes.c_char * 64)]


_PNG_IMAGE_VERSION = 1
_FMT_RGB = 0x02          # PNG_FORMAT_FLAG_COLOR
_FMT_RGBA = 0x03         # | PNG_FORMAT_FLAG_ALPHA
_FMT_LINEAR_RGB = 0x06   # | PNG_FORMAT_FLAG_LINEAR (16-bit components)


def _load():
    for name in ("libpng16.so.16", "libpng16.so",
                 ctypes.util.find_library("png16") or "",
                 ctypes.util.find_library("png") or ""):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            lib.png_image_begin_read_from_memory.restype = ctypes.c_int
            lib.png_image_begin_read_from_memory.argtypes = [
                ctypes.POINTER(_PngImage), ctypes.c_char_p, ctypes.c_size_t]
            lib.png_image_finish_read.restype = ctypes.c_int
            lib.png_image_finish_read.argtypes = [
                ctypes.POINTER(_PngImage), ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int32, ctypes.c_void_p]
            lib.png_image_write_to_memory.restype = ctypes.c_int
            lib.png_image_write_to_memory.argtypes = [
                ctypes.POINTER(_PngImage), ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p]
            return lib
        except (OSError, AttributeError):
            continue
    return None


_LIB = _load()
pytestmark = pytest.mark.skipif(_LIB is None,
                                reason="system libpng16 not present")


def _png_decode_native(data: bytes, fmt: int = _FMT_RGB) -> np.ndarray:
    pi = _PngImage()
    pi.version = _PNG_IMAGE_VERSION
    if not _LIB.png_image_begin_read_from_memory(
            ctypes.byref(pi), data, len(data)):
        raise ValueError(f"libpng begin_read: {pi.message!r}")
    pi.format = fmt
    ch = 4 if fmt == _FMT_RGBA else 3
    dt = np.uint16 if fmt & 0x04 else np.uint8
    buf = np.empty((pi.height, pi.width, ch), dt)
    if not _LIB.png_image_finish_read(
            ctypes.byref(pi), None, buf.ctypes.data_as(ctypes.c_void_p),
            0, None):
        raise ValueError(f"libpng finish_read: {pi.message!r}")
    return buf


def _png_encode_native(img: np.ndarray) -> bytes:
    a = np.ascontiguousarray(img, dtype=np.uint8)
    pi = _PngImage()
    pi.version = _PNG_IMAGE_VERSION
    pi.width, pi.height = a.shape[1], a.shape[0]
    pi.format = _FMT_RGBA if a.shape[2] == 4 else _FMT_RGB
    size = ctypes.c_size_t(0)
    _LIB.png_image_write_to_memory(
        ctypes.byref(pi), None, ctypes.byref(size), 0,
        a.ctypes.data_as(ctypes.c_void_p), 0, None)
    buf = ctypes.create_string_buffer(size.value)
    if not _LIB.png_image_write_to_memory(
            ctypes.byref(pi), buf, ctypes.byref(size), 0,
            a.ctypes.data_as(ctypes.c_void_p), 0, None):
        raise ValueError(f"libpng write: {pi.message!r}")
    return buf.raw[:size.value]


def _structured(h=32, w=40, seed=7):
    """Gradient + noise mix: makes libpng's adaptive filter chooser emit
    Sub/Up/Average/Paeth rows (verified: a pure-noise image stays on
    filter 0, defeating the point of the foreign fixture)."""
    rnd = np.random.RandomState(seed)
    gy = np.tile(np.linspace(0, 255, w, dtype=np.uint8), (h, 1))
    gx = np.tile(np.linspace(0, 255, h, dtype=np.uint8)[:, None], (1, w))
    return np.stack([gy, gx, rnd.randint(0, 256, (h, w))],
                    axis=-1).astype(np.uint8)


def _filters_used(data: bytes) -> set:
    import struct
    import zlib

    pos, idat, w = 8, [], None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        if tag == b"IHDR":
            w = struct.unpack(">I", data[pos + 8:pos + 12])[0]
        elif tag == b"IDAT":
            idat.append(data[pos + 8:pos + 8 + ln])
        pos += 12 + ln
    raw = zlib.decompress(b"".join(idat))
    stride = w * 3 + 1
    return {raw[i] for i in range(0, len(raw), stride)}


def test_our_decoder_on_foreign_adaptive_filters():
    """libpng-encoded stream (adaptive Sub/Up/Average/Paeth filters — our
    encoder only ever writes filter 0) decodes exactly."""
    img = _structured()
    data = _png_encode_native(img)
    used = _filters_used(data)
    assert used - {0}, f"fixture defeated: libpng used only {used}"
    got = MM.decode_png(data)
    assert np.array_equal(got, img)


def test_our_decoder_on_foreign_rgba():
    rnd = np.random.RandomState(9)
    rgba = rnd.randint(0, 256, (12, 17, 4)).astype(np.uint8)
    rgba[..., 3] = 255  # opaque: decode_png returns RGB
    data = _png_encode_native(rgba)
    got = MM.decode_png(data)
    assert np.array_equal(got, rgba[..., :3])


@pytest.mark.parametrize("variant", ["plain", "adam7", "gray"])
def test_foreign_decoder_on_our_encodes(variant):
    img = _structured(seed=11)
    if variant == "gray":
        enc_in, want = img[:, :, :1], np.repeat(img[:, :, :1], 3, axis=2)
        data = MM.encode_png(enc_in)
    else:
        want = img
        data = MM.encode_png(img, interlace=(variant == "adam7"))
    got = _png_decode_native(data)
    assert np.array_equal(got, want), variant


def test_16bit_high_bytes_agree():
    """16-bit PNG: libpng read LINEAR (raw 16-bit values) >> 8 must equal
    our decoder's high-byte reduction."""
    rnd = np.random.RandomState(13)
    img16 = rnd.randint(0, 65536, (10, 14, 3)).astype(np.uint16)
    data = MM.encode_png(img16)
    ours = MM.decode_png(data)
    raw16 = _png_decode_native(data, _FMT_LINEAR_RGB)
    assert np.array_equal(ours, (raw16 >> 8).astype(np.uint8))


def test_foreign_decoder_rejects_our_fuzz_survivor_contract():
    """Sanity on the mutation-fuzz contract: a truncated stream that OUR
    decoder rejects is also rejected (or error-flagged) by libpng."""
    data = MM.encode_png(_structured(seed=3))
    cut = data[:len(data) // 2]
    with pytest.raises(Exception):
        MM.decode_png(cut)
    with pytest.raises(ValueError):
        _png_decode_native(cut)
