"""From-scratch FLAC codec (operators/flac.py, r9).

Roundtrips cover every encoder strategy (constant / fixed 0-2 / verbatim,
all four stereo decorrelations, 8/16/24-bit, multi-frame streams, partial
tail blocks, explicit + coded sample rates). Decoder-only paths the
encoder can't emit — LPC subframes, Rice escape partitions,
multi-partition residuals, wasted bits — are exercised with hand-built
bitstreams. Integrity: CRC-8 / CRC-16 / STREAMINFO-MD5 corruption is
detected, never silently decoded. Spark plumbing: extract_audio_features
decodes audio/flac rows for real through mapInPandas.
"""

from __future__ import annotations

import numpy as np
import pytest

from cozo_spark.operators.flac import (_BitReader, _BitWriter,
                                       _decode_residual, _decode_subframe,
                                       crc8, crc16, decode_flac,
                                       encode_flac)


def _sig(n=10000, seed=5, amp=12000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (np.sin(t / 20) * amp
            + rng.integers(-200, 200, n)).astype(np.int64)


@pytest.mark.parametrize("mode", ["independent", "left_side",
                                  "right_side", "mid_side"])
def test_stereo_roundtrip_exact(mode):
    st = np.stack([_sig(), _sig(seed=6, amp=9000)], axis=1)
    data = encode_flac(st, rate=44100, bps=16, stereo_mode=mode)
    dec, rate = decode_flac(data)
    assert rate == 44100
    assert np.array_equal(dec.astype(np.int64), st)
    assert len(data) < st.size * 2 * 0.8, "should compress this signal"


@pytest.mark.parametrize("bps,amp", [(8, 100), (16, 12000), (24, 1 << 22)])
def test_bit_depths_roundtrip(bps, amp):
    x = np.clip(_sig(4321, seed=bps, amp=amp),
                -(1 << (bps - 1)), (1 << (bps - 1)) - 1)
    data = encode_flac(x, rate=16000, bps=bps)
    dec, rate = decode_flac(data)
    assert rate == 16000
    assert np.array_equal(dec.astype(np.int64), x)
    assert dec.dtype == (np.int16 if bps <= 16 else np.int32)


def test_constant_partial_block_and_explicit_rate():
    x = np.full(5000, -42, dtype=np.int64)  # 4096 frame + 904 tail
    data = encode_flac(x, rate=12345, bps=16)  # non-coded rate: 16-bit path
    dec, rate = decode_flac(data)
    assert rate == 12345
    assert np.array_equal(dec.astype(np.int64), x)


def test_tiny_and_multiframe():
    for n in (1, 3, 4096, 4097, 12289):
        x = _sig(n, seed=n % 97)
        dec, _ = decode_flac(encode_flac(x, rate=8000))
        assert np.array_equal(dec.astype(np.int64), x), n


def test_crc_and_md5_catch_corruption():
    x = _sig(6000)
    data = bytearray(encode_flac(x, rate=44100))
    # frame body flip → CRC-16
    bad = bytearray(data)
    bad[len(bad) - 40] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    # STREAMINFO md5 flip → decoded PCM no longer matches
    bad2 = bytearray(data)
    bad2[30] ^= 0x01  # inside the md5 field (offset 4+4+18..34)
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad2))
    assert np.array_equal(decode_flac(bytes(data))[0].astype(np.int64), x)


def test_decoder_lpc_subframe_handbuilt():
    """LPC order-1, coef=2, shift=1 → predictor = x[i-1]; residuals 0 ⇒
    constant run seeded by the warmup sample. Our encoder never emits
    LPC; this pins the decode path with a hand-built bitstream."""
    w = _BitWriter()
    w.write(0, 1)            # padding
    w.write(32, 6)           # LPC order 1 (type 32 + order-1)
    w.write(0, 1)            # no wasted bits
    w.write(7, 16)           # warmup sample (bps 16)
    w.write(3, 4)            # precision-1 = 3 → 4 bits
    w.write(1, 5)            # shift 1
    w.write(2, 4)            # coefficient +2 (4-bit signed)
    w.write(0, 2)            # rice method 0
    w.write(0, 4)            # partition order 0
    w.write(0, 4)            # rice param 0
    for _ in range(7):       # 8-sample block, order 1 → 7 residuals
        w.write_unary(0)     # residual 0
    w.align()
    r = _BitReader(w.bytes())
    out = _decode_subframe(r, 8, 16)
    assert out.tolist() == [7] * 8  # (2*prev)>>1 = prev


def test_decoder_rice_escape_and_partitions_handbuilt():
    """Two-partition residual, second partition escaped to 6-bit raw —
    paths the in-repo encoder never writes."""
    w = _BitWriter()
    w.write(0, 2)            # rice method 0
    w.write(1, 4)            # partition order 1 → 2 partitions of 4
    w.write(0, 4)            # partition 1: rice param 0
    for v in (0, 1, -1, 2):  # zigzag 0,2,1,4
        u = (v << 1) if v >= 0 else (-(v << 1) - 1)
        w.write_unary(u)
    w.write(15, 4)           # partition 2: ESCAPE
    w.write(6, 5)            # 6-bit raw residuals
    for v in (-20, 31, -32, 5):
        w.write(v & 0x3F, 6)
    w.align()
    out = _decode_residual(_BitReader(w.bytes()), 8, 0)
    assert out == [0, 1, -1, 2, -20, 31, -32, 5]


def test_decoder_wasted_bits_handbuilt():
    """Constant subframe with 2 wasted bits: value shifts left on output."""
    w = _BitWriter()
    w.write(0, 1)            # padding
    w.write(0, 6)            # CONSTANT
    w.write(1, 1)            # wasted-bits flag
    w.write_unary(1)         # unary 1 → wasted = 2
    w.write(5, 14)           # constant value at bps-2 bits
    w.align()
    out = _decode_subframe(_BitReader(w.bytes()), 4, 16)
    assert out.tolist() == [20] * 4  # 5 << 2


def test_crc_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 standard check values
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8  # CRC-16/BUYPASS (init 0)


def test_audio_features_flac_through_spark(spark):
    from cozo_spark.operators.multimodal import extract_audio_features

    x = _sig(8000)
    data = encode_flac(x, rate=16000, bps=16)
    df = spark.createDataFrame(
        [(1, bytearray(data), "audio/flac")],
        "media_id long, content binary, media_type string")
    row = extract_audio_features(df).collect()[0]
    assert row["sample_rate"] == 16000
    assert row["duration_ms"] == 500
    assert 0.0 < row["rms"] < 1.0 and 0.0 < row["peak"] <= 1.0


def test_decode_audio_pcm_dispatch():
    from cozo_spark.operators.multimodal import decode_audio_pcm, encode_wav

    x = _sig(2000)
    a_flac, r1 = decode_audio_pcm(encode_flac(x, rate=8000), "audio/flac")
    wav = encode_wav(x.astype(np.float64) / 32768.0, rate=8000)
    a_wav, r2 = decode_audio_pcm(wav, "audio/wav")
    assert r1 == r2 == 8000
    assert np.allclose(a_flac, a_wav, atol=1e-4)
    with pytest.raises(NotImplementedError):
        decode_audio_pcm(b"\xff\xfb\x90\x00", "audio/mpeg")


# --- property-based roundtrips (hypothesis) --------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    data=st.lists(st.integers(min_value=-32768, max_value=32767),
                  min_size=1, max_size=900),
    nch=st.integers(min_value=1, max_value=2),
    mode=st.sampled_from(["independent", "left_side", "right_side",
                          "mid_side"]),
    rate=st.sampled_from([8000, 16000, 44100, 12345]),
    blocksize=st.sampled_from([192, 256, 577, 4096]),
)
def test_flac_roundtrip_property(data, nch, mode, rate, blocksize):
    """ANY int16 signal roundtrips bit-exactly through encode+decode,
    across channel counts, stereo modes, rates, and block sizes
    (including non-standard 577 → 16-bit blocksize-at-end header path)."""
    n = len(data) - (len(data) % nch)
    if n == 0:
        n = nch
        data = data * nch
    x = np.array(data[:n], dtype=np.int64).reshape(-1, nch)
    enc = encode_flac(x if nch > 1 else x[:, 0], rate=rate, bps=16,
                      stereo_mode=mode, blocksize=blocksize)
    dec, got_rate = decode_flac(enc)
    assert got_rate == rate
    got = dec.astype(np.int64).reshape(-1, nch)
    assert np.array_equal(got, x)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    data=st.lists(st.integers(min_value=-(1 << 23), max_value=(1 << 23) - 1),
                  min_size=1, max_size=400),
)
def test_flac_24bit_roundtrip_property(data):
    x = np.array(data, dtype=np.int64)
    dec, _ = decode_flac(encode_flac(x, rate=48000, bps=24))
    assert np.array_equal(dec.astype(np.int64), x)
