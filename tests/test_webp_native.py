"""External-fixture cross-checks against the system libwebp (r8 — closes
the VERDICT r7 "same-hand encoder/decoder" gap for the WebP family) and the
lossy-VP8 decode path (VERDICT r7 directive 6).

The from-scratch VP8L decoder (operators/webp.py) was previously pinned
only against the in-repo fixture encoder; a shared spec misreading would
survive that. libwebp is a FOREIGN implementation: its lossless encoder
picks different transforms/entropy codes than our fixture encoder, so
exact agreement on its bitstreams is strong independent evidence. Both
directions are checked: foreign-encode -> our-decode, our-encode ->
foreign-decode.

All tests skip cleanly when the shared library is absent (the binding is
gated; the pure-Python VP8L path needs no library)."""

from __future__ import annotations

import numpy as np
import pytest

from cozo_spark.operators import webp_native as N
from cozo_spark.operators.webp import decode_webp, encode_webp_lossless

pytestmark = pytest.mark.skipif(
    not N.available(), reason="system libwebp not present")


def _images():
    """Structures that push libwebp's lossless encoder into different
    transform/entropy choices: noise (no transform wins), gradients
    (predict transform), flat palette blocks (color indexing + cache),
    correlated channels (cross-color), tiny and non-multiple-of-4 dims."""
    rnd = np.random.RandomState(11)
    imgs = {}
    imgs["noise"] = rnd.randint(0, 256, (32, 48, 3)).astype(np.uint8)
    gy = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (40, 1))
    gx = np.tile(np.linspace(0, 255, 40, dtype=np.uint8)[:, None], (1, 64))
    imgs["gradient"] = np.stack([gy, gx, 255 - gy], axis=-1)
    pal = np.zeros((30, 30, 3), np.uint8)
    for i, c in enumerate([(255, 0, 0), (0, 255, 0), (0, 0, 255),
                           (255, 255, 0)]):
        pal[:, i * 7:(i + 1) * 7] = c
    imgs["palette"] = pal
    g = rnd.randint(0, 256, (25, 31)).astype(np.int32)
    imgs["correlated"] = np.stack(
        [g, np.clip(g + 10, 0, 255), np.clip(g // 2 + 64, 0, 255)],
        axis=-1).astype(np.uint8)
    imgs["tiny"] = rnd.randint(0, 256, (1, 1, 3)).astype(np.uint8)
    imgs["odd_dims"] = rnd.randint(0, 256, (13, 7, 3)).astype(np.uint8)
    imgs["flat"] = np.full((16, 16, 3), 137, np.uint8)
    return imgs


@pytest.mark.parametrize("name", sorted(_images()))
def test_our_decoder_on_foreign_vp8l(name):
    """libwebp lossless encode -> OUR from-scratch decoder, exact."""
    img = _images()[name]
    foreign = N.encode_lossless(img)
    got = decode_webp(foreign)
    assert np.array_equal(got, img), name


@pytest.mark.parametrize("name", sorted(_images()))
def test_foreign_decoder_on_our_vp8l(name):
    """OUR fixture encoder -> libwebp decode, exact (the reverse check)."""
    img = _images()[name]
    ours = encode_webp_lossless(img)
    got = N.decode_rgb(ours)
    assert np.array_equal(got, img), name


def test_lossy_vp8_decodes_through_decode_webp():
    """The r7 gate is open when libwebp is present: a real lossy-VP8 file
    decodes via decode_webp with plausible reconstruction error."""
    gy = np.tile(np.linspace(40, 210, 64, dtype=np.uint8), (48, 1))
    img = np.stack([gy, gy, gy], axis=-1)
    lossy = N.encode_lossy(img, quality=90.0)
    assert lossy[:4] == b"RIFF" and b"VP8 " in lossy[:32]
    got = decode_webp(lossy)
    assert got.shape == img.shape
    err = np.abs(got.astype(int) - img.astype(int)).mean()
    assert err < 8.0, f"mean abs err {err} too high for q90 on a gradient"


def test_lossy_vp8_dims_match_probe():
    """probe_media's header-parsed dimensions (r7) agree with the real
    decode on lossy files."""
    from cozo_spark.operators.multimodal import _webp_dims

    rnd = np.random.RandomState(4)
    img = rnd.randint(0, 256, (24, 40, 3)).astype(np.uint8)
    lossy = N.encode_lossy(img, quality=70.0)
    dims = _webp_dims(lossy)
    got = decode_webp(lossy)
    assert (dims["height"], dims["width"]) == got.shape[:2] == (24, 40)


def test_lossy_mutation_fuzz_clean_errors():
    """Hostile-input contract holds through the native path: mutated lossy
    streams either decode to a well-formed array or raise cleanly."""
    import random

    rnd0 = np.random.RandomState(6)
    img = rnd0.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    data = N.encode_lossy(img, quality=80.0)
    rnd = random.Random(0xF0F0)
    failures = 0
    for i in range(120):
        buf = bytearray(data)
        if i % 3 == 0:
            buf[rnd.randrange(len(buf))] ^= 1 << rnd.randrange(8)
        elif i % 3 == 1:
            buf = buf[:rnd.randrange(len(buf))]
        else:
            pos = rnd.randrange(max(1, len(buf) - 4))
            buf[pos:pos + 4] = bytes(rnd.randrange(256) for _ in range(4))
        try:
            out = decode_webp(bytes(buf))
        except Exception:
            failures += 1
        else:
            assert out.ndim == 3 and out.shape[2] == 3
            assert out.size < 50_000_000
    assert failures > 0


def test_gate_message_when_library_absent(monkeypatch):
    """Without the shared library the narrowed NotImplementedError stays."""
    from cozo_spark.operators import webp_native as WN

    rnd = np.random.RandomState(4)
    img = rnd.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    lossy = N.encode_lossy(img, quality=80.0)  # encode while lib is live
    monkeypatch.setattr(WN, "_lib", None)
    monkeypatch.setattr(WN, "_load_err", "forced-absent (test)")
    with pytest.raises(NotImplementedError, match="libwebp"):
        decode_webp(lossy)


def test_lossy_webp_through_spark_pipeline(spark):
    """End-to-end Spark plumbing: real lossy-VP8 bytes flow through the
    mapInPandas feature kernel (decode happens on the executor via the
    gated binding) — the r7 gate no longer blocks the crawl path."""
    from cozo_spark.operators.multimodal import (
        MEDIA_SCHEMA, extract_image_features, probe_media)

    rnd = np.random.RandomState(17)
    imgs = [np.tile(rnd.randint(0, 256, (1, 8, 3)).astype(np.uint8),
                    (16, 2, 1)) for _ in range(4)]
    rows = [(i, "image/webp", N.encode_lossy(im, quality=85.0),
             {"width": None, "height": None, "duration_ms": None,
              "sample_rate": None})
            for i, im in enumerate(imgs)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    probed = {r["media_id"]: r for r in probe_media(media).collect()}
    assert all(probed[i]["width"] == 16 and probed[i]["height"] == 16
               for i in range(4))
    feats = extract_image_features(media, fake=False).collect()
    assert len(feats) == 4
    for r in feats:
        assert len(r["features"]) == 8
        assert all(f == f for f in r["features"])  # no NaNs
