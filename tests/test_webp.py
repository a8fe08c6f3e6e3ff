"""Lossless WebP (VP8L) codec tests (operators/webp.py) — the same
fixture-encoder discipline as test_jpeg.py: a matching in-repo VP8L
encoder pins the decoder pixel-exact without external codec libraries.
Every decoder path is exercised: simple + code-length-coded prefix codes,
color cache, LZ77 (RLE, row-above, and near-neighborhood distance codes),
meta prefix groups, and all four inverse transforms (each predictor
mode, color transform, subtract-green, palettes plain and bundled)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cozo_spark.operators.webp import (
    _BitReader, _BitWriter, decode_webp, encode_webp_lossless,
)


def _rng(seed=0):
    return np.random.default_rng(seed)


def _rand_rgb(h, w, seed=0, levels=None):
    img = _rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if levels:
        img = (img // (256 // levels)) * (256 // levels)
    return img


def _roundtrip(img, **kw):
    out = decode_webp(encode_webp_lossless(img, **kw))
    np.testing.assert_array_equal(out, img[..., :3])
    return out


def test_bit_io_roundtrip():
    bw = _BitWriter()
    vals = [(5, 3), (0, 1), (16383, 14), (1, 1), (255, 8), (2, 3)]
    for v, n in vals:
        bw.write(v, n)
    br = _BitReader(bw.getvalue())
    for v, n in vals:
        assert br.read(n) == v


def test_plain_literal_roundtrip():
    _roundtrip(_rand_rgb(13, 17, seed=1))


def test_odd_sizes_and_single_pixel():
    _roundtrip(_rand_rgb(1, 1, seed=2))
    _roundtrip(_rand_rgb(1, 19, seed=3))
    _roundtrip(_rand_rgb(23, 1, seed=4))


def test_rgba_alpha_channel_dropped_but_decoded():
    img = _rng(5).integers(0, 256, size=(9, 11, 4), dtype=np.uint8)
    out = decode_webp(encode_webp_lossless(img))
    np.testing.assert_array_equal(out, img[..., :3])


def test_subtract_green():
    _roundtrip(_rand_rgb(16, 16, seed=6), subtract_green=True)


@pytest.mark.parametrize("mode", list(range(14)))
def test_every_predictor_mode(mode):
    _roundtrip(_rand_rgb(21, 18, seed=100 + mode), predictor=mode,
               size_bits=3)


def test_color_transform():
    _roundtrip(_rand_rgb(15, 15, seed=7), color_deltas=(0x10, 0xF0, 0x08))


def test_transform_composition():
    _roundtrip(_rand_rgb(12, 12, seed=8), predictor=7, subtract_green=True)


@pytest.mark.parametrize("n_colors,shape", [(2, (9, 31)), (4, (8, 13)),
                                            (14, (10, 10)), (60, (12, 12))])
def test_palette_all_bundlings(n_colors, shape):
    rng = _rng(n_colors)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    img = pal[rng.integers(0, n_colors, size=shape)]
    _roundtrip(img, palette=True)


def test_color_cache():
    # few distinct colors -> many cache hits
    _roundtrip(_rand_rgb(20, 20, seed=9, levels=4), cache_bits=6)


def test_lz77_rle_and_row_above():
    img = _rand_rgb(16, 16, seed=10)
    img[3, :] = img[2, :]          # row-above copy (dist = xsize)
    img[5, 2:14] = img[5, 2]       # horizontal run (dist = 1)
    _roundtrip(img, use_lz77=True)
    _roundtrip(img, use_lz77=True, cache_bits=4)


def test_lz77_uses_neighborhood_distance_codes():
    """dist=1 and dist=xsize are both inside the 120-entry near map; pin
    that the encoder actually emits short codes (and the decoder maps
    them back) rather than always taking the dist+120 escape."""
    from cozo_spark.operators.webp import _dist_to_plane_code, \
        _plane_to_dist

    assert _dist_to_plane_code(1, 16) == 2      # (1, 0)
    assert _dist_to_plane_code(16, 16) == 1     # (0, 1)
    for code in (1, 2, 5, 40, 120):
        d = _plane_to_dist(code, 64)
        assert _dist_to_plane_code(d, 64) <= 120
    assert _plane_to_dist(121, 64) == 1
    assert _dist_to_plane_code(9999, 64) == 9999 + 120


def test_meta_prefix_groups():
    _roundtrip(_rand_rgb(24, 24, seed=11), meta_bits=3)


def test_everything_at_once():
    _roundtrip(_rand_rgb(26, 22, seed=12, levels=8), predictor=11,
               subtract_green=True, cache_bits=5, use_lz77=True,
               meta_bits=4)


def test_png_twin_exact():
    """Done-criterion from the round-6 verdict: a lossless WebP decodes to
    the exact RGB of its PNG twin."""
    from cozo_spark.operators.multimodal import decode_png, encode_png

    img = _rand_rgb(19, 27, seed=13)
    webp_rgb = decode_webp(encode_webp_lossless(img, predictor=7))
    png_rgb = decode_png(encode_png(img))
    np.testing.assert_array_equal(webp_rgb, png_rgb)


def test_decode_image_dispatch():
    from cozo_spark.operators.multimodal import decode_image

    img = _rand_rgb(6, 6, seed=14)
    out = decode_image(encode_webp_lossless(img), "image/webp")
    np.testing.assert_array_equal(out, img)


def test_lossy_vp8_gated_or_rejected():
    """r8: a VP8 chunk decodes through the system libwebp when present
    (this garbage payload must then be REJECTED, not decoded); without the
    library the narrowed NotImplementedError gate stays
    (test_webp_native.py covers the real decode + forced-absent gate)."""
    from cozo_spark.operators import webp_native

    fake = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
            + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00")
    if webp_native.available():
        with pytest.raises(ValueError, match="could not decode"):
            decode_webp(fake)
    else:
        with pytest.raises(NotImplementedError, match="lossy WebP"):
            decode_webp(fake)


def test_vp8x_extended_layout_reaches_vp8l():
    plain = encode_webp_lossless(_rand_rgb(5, 7, seed=15))
    vp8l_payload = plain[12:]  # VP8L chunk (header + payload) of the plain file
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    body = b"WEBP" + vp8x + vp8l_payload
    ext = b"RIFF" + struct.pack("<I", len(body)) + body
    np.testing.assert_array_equal(
        decode_webp(ext), decode_webp(plain))


def test_garbage_rejected():
    with pytest.raises(ValueError):
        decode_webp(b"not a webp at all")
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x04\x00\x00\x00WAVE")


def test_truncated_stream_rejected():
    good = encode_webp_lossless(_rand_rgb(10, 10, seed=16))
    with pytest.raises(ValueError):
        decode_webp(good[:len(good) // 2])


def test_probe_media_sniffs_webp():
    from cozo_spark.operators.multimodal import sniff_media_type

    assert sniff_media_type(
        encode_webp_lossless(_rand_rgb(4, 4))) == "image/webp"


# --- round-7 review regressions -------------------------------------------


def test_meta_groups_tiny_grid():
    """meta_bits yielding a 1x1 (all-zero) entropy image must emit exactly
    the group count the decoder will read (was: fixed 2 groups -> stream
    desync, silently wrong pixels)."""
    for h, w, mb in [(16, 13, 4), (8, 8, 5), (9, 30, 5), (1, 1, 3)]:
        img = _rand_rgb(h, w, seed=1000 + h + w)
        _roundtrip(img, meta_bits=mb)


def test_skewed_frequencies_cl_depth_cap():
    """Fibonacci-skewed symbol frequencies push the code-length Huffman
    past 7 levels; its lengths live in 3-bit fields so the encoder must
    cap depth at 7 (was: written mod 8 -> corrupt stream)."""
    rng = _rng(21)
    # build an image whose green-channel histogram is heavily skewed
    vals, counts, f1, f2 = [], [], 1, 1
    for v in range(24):
        vals.append(v * 11 % 256)
        counts.append(f1)
        f1, f2 = f2, f1 + f2
    col = np.repeat(np.array(vals, dtype=np.uint8), counts)
    col = np.resize(col, 32 * 32)
    img = np.stack([col, col[::-1], np.roll(col, 7)], axis=1).reshape(32, 32, 3)
    _roundtrip(img)
    _roundtrip(img, use_lz77=True, cache_bits=4)


def test_larger_image_roundtrip():
    """O(1)-per-read bit reader: a crawl-thumbnail-sized image decodes
    (the old whole-payload big-int reader was O(bytes^2))."""
    _roundtrip(_rand_rgb(160, 192, seed=22))


def test_probe_media_webp_dims():
    """probe_media reports header-true WebP dimensions (r7): VP8L 14-bit
    dims, VP8X 24-bit canvas, lossy-VP8 keyframe dims — chunk walk only."""
    from cozo_spark.operators.multimodal import _probe_one

    plain = encode_webp_lossless(_rand_rgb(23, 41, seed=30))
    p = _probe_one(plain)
    assert (p["width"], p["height"], p["valid"]) == (41, 23, True)
    # VP8X-extended: canvas size from the extended header
    vp8l_chunk = plain[12:]
    vp8x = (b"VP8X" + struct.pack("<I", 10) + b"\x00" * 4
            + (41 - 1).to_bytes(3, "little") + (23 - 1).to_bytes(3, "little"))
    body = b"WEBP" + vp8x + vp8l_chunk
    ext = b"RIFF" + struct.pack("<I", len(body)) + body
    p = _probe_one(ext)
    assert (p["width"], p["height"], p["valid"]) == (41, 23, True)
    # lossy keyframe: dims at frame offset 6 after the 9D 01 2A start code
    frame = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 640, 480)
    body = b"WEBP" + b"VP8 " + struct.pack("<I", len(frame)) + frame
    lossy = b"RIFF" + struct.pack("<I", len(body)) + body
    p = _probe_one(lossy)
    assert (p["width"], p["height"], p["valid"]) == (640, 480, True)
