"""MJPEG AVI container codec + real video frame sampling.

The fixtures are self-fabricated: frames rendered in numpy, encoded with
the repo's own baseline JPEG encoder, wrapped in a spec-shaped RIFF AVI by
encode_avi_mjpeg — then decoded back through the production path
(decode_avi_frames → decode_jpeg) and through the Spark sample_frames
kernel.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pytest

from cozo_spark.operators.avi import decode_avi_frames, encode_avi_mjpeg, is_avi
from cozo_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _frames(n=5, h=32, w=48):
    out = []
    for i in range(n):
        y, x = np.mgrid[0:h, 0:w]
        img = np.stack([(x * 3 + i * 40) % 256, (y * 5) % 256,
                        ((x + y) * 2 + i * 17) % 256], axis=-1).astype(np.uint8)
        out.append(encode_jpeg(img))
    return out


def test_avi_roundtrip_frames_and_clock():
    jf = _frames(5)
    avi = encode_avi_mjpeg(jf, fps=10, width=48, height=32)
    assert is_avi(avi)
    usec, frames = decode_avi_frames(avi)
    assert usec == 100_000  # 10 fps
    assert frames == jf
    # every frame decodes through the real JPEG path
    for f in frames:
        img = decode_jpeg(f)
        assert img.shape == (32, 48, 3)


def test_avi_truncated_tail_yields_prefix():
    jf = _frames(4)
    avi = encode_avi_mjpeg(jf, fps=25)
    cut = avi[: len(avi) - len(jf[-1]) // 2 - 200]
    usec, frames = decode_avi_frames(cut)
    assert usec == 40_000
    assert 1 <= len(frames) < 4
    assert frames == jf[: len(frames)]


def test_not_avi_rejected():
    with pytest.raises(ValueError):
        decode_avi_frames(b"\x89PNG not an avi")
    assert not is_avi(b"RIFF\x00\x00\x00\x00WAVE")


def test_sample_frames_real_avi(spark):
    from cozo_spark.operators.multimodal import MEDIA_SCHEMA, sample_frames

    jf = _frames(50)  # 50 frames @ 25fps = 2000 ms
    avi = encode_avi_mjpeg(jf, fps=25, width=48, height=32)
    media = spark.createDataFrame(
        [(7, "video/x-msvideo", avi,
          {"width": 48, "height": 32, "duration_ms": 2000,
           "sample_rate": None})], MEDIA_SCHEMA)
    rows = sorted(sample_frames(media, every_ms=500, decode=True).collect(),
                  key=lambda r: r["frame_ts_ms"])
    # 2000ms / 500ms = 4 samples at ts 0/500/1000/1500 → frames 0/12/25/37
    assert [r["frame_ts_ms"] for r in rows] == [0, 500, 1000, 1500]
    assert [r["frame_idx"] for r in rows] == [0, 12, 25, 37]
    for r in rows:
        assert r["frame_hash"] == hashlib.md5(jf[r["frame_idx"]]).hexdigest()
        assert (r["frame_w"], r["frame_h"]) == (48, 32)


def test_sample_frames_fake_path_still_works(spark):
    from cozo_spark.operators.multimodal import MEDIA_SCHEMA, sample_frames

    media = spark.createDataFrame(
        [(3, "video/mp4", b"vid-fake",
          {"width": 640, "height": 480, "duration_ms": 3500,
           "sample_rate": None})], MEDIA_SCHEMA)
    rows = sorted((r["frame_idx"], r["frame_ts_ms"])
                  for r in sample_frames(media, every_ms=1000).collect())
    assert rows == [(0, 0), (1, 1000), (2, 2000)]
    with pytest.raises(Exception):
        sample_frames(media, every_ms=1000, fake=False).collect()


# ---------------------------------------------------------------------------
# media sniffing + probe_media (r5)
# ---------------------------------------------------------------------------

def test_sniff_media_type():
    from cozo_spark.operators.avi import encode_avi_mjpeg
    from cozo_spark.operators.mp3 import encode_mp3_silence
    from cozo_spark.operators.multimodal import (
        encode_png, encode_raw_rgb, encode_wav, sniff_media_type)

    img = np.zeros((4, 4, 3), np.uint8)
    cases = {
        sniff_media_type(encode_png(img)): "image/png",
        sniff_media_type(encode_jpeg(img)): "image/jpeg",
        sniff_media_type(encode_raw_rgb(img)): "image/x-raw-rgb",
        sniff_media_type(encode_wav(np.zeros(64, np.int16), 8000)):
            "audio/wav",
        sniff_media_type(encode_mp3_silence(3)): "audio/mpeg",
        sniff_media_type(encode_avi_mjpeg([encode_jpeg(img)], fps=5)):
            "video/x-msvideo",
        sniff_media_type(b"GIF89a" + b"\x04\x00\x04\x00" + b"\x00" * 10):
            "image/gif",
        sniff_media_type(b"\x00\x00\x00\x18ftypmp42rest"): "video/mp4",
        sniff_media_type(b"random bytes here"): None,
    }
    for got, want in cases.items():
        assert got == want


def test_probe_media_types_and_metadata(spark):
    from cozo_spark.operators.avi import encode_avi_mjpeg
    from cozo_spark.operators.mp3 import encode_mp3_silence
    from cozo_spark.operators.multimodal import (
        MEDIA_SCHEMA, encode_png, probe_media)

    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    mp3 = encode_mp3_silence(n_frames=38)  # 992 ms @44100, 128 kbps
    avi = encode_avi_mjpeg([encode_jpeg(img)] * 10, fps=5)  # 2000 ms
    meta = {"width": None, "height": None, "duration_ms": None,
            "sample_rate": None}
    media = spark.createDataFrame([
        (1, "image/png", encode_png(img), meta),
        (2, "image/png", encode_jpeg(img), meta),      # mislabeled!
        (3, "audio/mpeg", mp3, meta),
        (4, "video/x-msvideo", avi, meta),
        (5, "image/png", b"\x89PNG\r\n\x1a\ntruncated", meta),
    ], MEDIA_SCHEMA)
    rows = {r["media_id"]: r for r in probe_media(media).collect()}
    assert rows[1]["sniffed_type"] == "image/png" and rows[1]["valid"]
    assert (rows[1]["width"], rows[1]["height"]) == (6, 4)
    # mislabeling detected, and JPEG dims come from the SOF header walk
    assert rows[2]["sniffed_type"] == "image/jpeg"
    assert rows[2]["type_mismatch"] is True
    assert (rows[2]["width"], rows[2]["height"]) == (6, 4)
    assert rows[3]["valid"] and rows[3]["duration_ms"] == 992
    assert rows[3]["sample_rate"] == 44100 and rows[3]["bitrate_kbps"] == 128
    assert rows[4]["valid"] and rows[4]["n_frames"] == 10
    assert rows[4]["duration_ms"] == 2000
    # truncated PNG: sniffed but not valid
    assert rows[5]["sniffed_type"] == "image/png" and not rows[5]["valid"]


def test_flac_and_ogg_probes():
    from cozo_spark.operators.mp3 import (
        encode_flac_header, probe_flac, probe_ogg)

    f = probe_flac(encode_flac_header(sample_rate=48000, channels=1,
                                      bps=24, total_samples=96000))
    assert f == {"sample_rate": 48000, "channels": 1,
                 "bits_per_sample": 24, "n_frames": 96000,
                 "duration_ms": 2000}
    with pytest.raises(ValueError):
        probe_flac(b"not flac")

    # hand-built minimal OGG: page 0 = Vorbis id header, page 1 = granule
    def page(body, granule, seq, flags=0):
        import struct as _s

        nseg = (len(body) + 254) // 255 or 1
        segs = []
        rem = len(body)
        for _ in range(nseg):
            segs.append(min(rem, 255))
            rem -= segs[-1]
        return (b"OggS" + bytes([0, flags])
                + _s.pack("<q", granule) + b"\x01\x00\x00\x00"
                + _s.pack("<I", seq) + b"\x00\x00\x00\x00"
                + bytes([len(segs)]) + bytes(segs) + body)

    import struct as _s

    vorbis_id = (b"\x01vorbis" + _s.pack("<I", 0) + b"\x02"
                 + _s.pack("<I", 44100) + b"\x00" * 16)
    ogg = page(vorbis_id, 0, 0, flags=2) + page(b"\x00" * 10, 88200, 1,
                                                flags=4)
    o = probe_ogg(ogg)
    assert o["codec"] == "vorbis" and o["sample_rate"] == 44100
    assert o["duration_ms"] == 2000 and o["n_frames"] == 88200


def test_probe_media_flac(spark):
    from cozo_spark.operators.mp3 import encode_flac_header
    from cozo_spark.operators.multimodal import MEDIA_SCHEMA, probe_media

    meta = {"width": None, "height": None, "duration_ms": None,
            "sample_rate": None}
    media = spark.createDataFrame(
        [(1, "audio/flac", encode_flac_header(total_samples=22050), meta)],
        MEDIA_SCHEMA)
    r = probe_media(media).collect()[0]
    assert r["sniffed_type"] == "audio/flac" and r["valid"]
    assert r["duration_ms"] == 500 and r["sample_rate"] == 44100
