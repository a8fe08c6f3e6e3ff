"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched Pandas UDFs.

Decode status by format:

- ``image/x-raw-rgb`` (12-byte header: magic ``RAW1`` + width/height uint32
  LE, then H*W*3 uint8 pixels) — REAL decode/resize/feature kernels in pure
  numpy; the lib-free reference format.
- ``image/png`` — REAL decode/encode, stdlib only (zlib inflate + chunk
  walk + scanline defilter); bit depth 8, non-interlaced, color types
  0/2/3/4/6.
- ``audio/wav`` — REAL decode/encode via the stdlib ``wave`` module
  (8/16-bit PCM) + signal statistics (rms/peak/zero-crossings).
- ``image/jpeg`` — REAL baseline decode (+ fixture encoder), stdlib+numpy
  (operators/jpeg.py: marker/DQT/DHT/SOF0/SOS parse, Huffman entropy
  decode with restart intervals, vectorized IDCT, 4:2:0/4:2:2/4:4:4
  chroma upsample, JFIF color convert) AND progressive (SOF2) decode
  (r6: spectral selection + successive approximation, Annex G).
  Pure-Python entropy decode is the documented throughput fallback — swap in a codec lib for production corpora.
- ``image/gif`` — REAL decode (operators/gif.py: block walk, full
  variable-width LZW, interlace reorder, palette mapping; first frame of
  animations) + fixture encoder; verified against an externally-authored
  GIF.
- ``video/x-msvideo`` (MJPEG AVI) — REAL frame extraction: stdlib RIFF
  chunk walk (operators/avi.py) + the JPEG decoder per sampled frame;
  ``sample_frames`` timestamps off the container's own frame clock.
- ``audio/mpeg`` — REAL metadata probe (operators/mp3.py frame-header
  walk: duration/avg-bitrate/sample-rate/channels, ID3v2-aware, resync
  on garbage); PCM decode stays gated.
- every format above + GIF/WebP/MP4 containers — magic-byte sniffing and
  a ``probe_media`` trust kernel (declared vs sniffed type, header-true
  dims/duration, valid flag) for filtering before decode spend.
- ``image/webp`` — REAL lossless (VP8L) decode, pure stdlib+numpy
  (operators/webp.py: prefix codes, color cache, meta groups, LZ77, all
  four inverse transforms); lossy VP8 stays gated.
- remaining compressed decodes (lossy WebP/MP3-PCM/H.264+MP4/...) — GATED:
  raise NotImplementedError with a clear message (no codec libraries in
  this container); the kernel bodies are the only thing that changes when
  one is installed.

Everything Spark-side is real and load-bearing at 100 TB:

- schema: content binary + media_type + typed metadata struct;
- processing via ``mapInPandas`` (Arrow batches; one Python worker per
  partition, batch-at-a-time — the only sane shape for multi-MB blobs);
- partition sizing guidance: blobs make rows heavy — repartition by byte
  budget, not row count (``repartition_for_blobs``).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_RAW_MAGIC = b"RAW1"
RAW_RGB_TYPE = "image/x-raw-rgb"

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType()),      # 'image/png', 'audio/wav', ...
    T.StructField("content", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ])),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("content_hash", T.StringType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def encode_raw_rgb(pixels: "np.ndarray") -> bytes:
    """(H, W, 3) uint8 array → x-raw-rgb bytes (the lib-free test format)."""
    a = np.asarray(pixels, dtype=np.uint8)
    h, w = a.shape[0], a.shape[1]
    return _RAW_MAGIC + struct.pack("<II", w, h) + a.tobytes()


def decode_raw_rgb(content: bytes) -> "np.ndarray":
    """x-raw-rgb bytes → (H, W, 3) uint8 array. REAL decode, pure numpy."""
    if content is None or len(content) < 12 or content[:4] != _RAW_MAGIC:
        raise ValueError("not an image/x-raw-rgb payload")
    w, h = struct.unpack("<II", content[4:12])
    body = np.frombuffer(content, dtype=np.uint8, offset=12)
    if body.size != w * h * 3:
        raise ValueError(f"x-raw-rgb size mismatch: header {w}x{h}, "
                         f"{body.size} pixel bytes")
    return body.reshape(h, w, 3)


# --------------------------------------------------------------------------
# PNG codec — stdlib only (zlib inflate + struct chunk walk + scanline
# defilter per the PNG spec §6/§9). Supports bit depth 8 (color types
# 0/2/3/4/6) and 16 (non-palette, reduced to 8-bit by the high byte),
# interlace none AND Adam7 (both r7). Sub-byte depths (1/2/4) raise with
# context.
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Adam7 pass lattice: (x_start, y_start, x_step, y_step), PNG spec §8.2
_ADAM7_PASSES = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                 (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_defilter(raw: bytes, off: int, w: int, h: int,
                  ch: int) -> tuple["np.ndarray", int]:
    """Defilter one (sub-)image of w*h pixels starting at byte `off`;
    returns ((h, w*ch) array, next offset). `ch` is BYTES per pixel (the
    spec's filter distance bpp — channels x bytes-per-sample).
    Vectorized where the spec's data dependencies allow: None/Up are
    elementwise, Sub is a per-byte-lane prefix sum (recon[i] = raw[i] +
    recon[i-1] ⇒ cumsum mod 256); Average/Paeth genuinely recurse on the
    CURRENT row, so they run one Python step per PIXEL with the byte
    lanes vectorized."""
    stride = w * ch
    if off + (stride + 1) * h > len(raw):
        raise ValueError("PNG scanline size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[off + y * (stride + 1)]
        cur = np.frombuffer(raw, dtype=np.uint8,
                            offset=off + y * (stride + 1) + 1,
                            count=stride).copy()
        if f == 1:    # Sub: cumsum over pixels, per channel lane
            lanes = cur.reshape(-1, ch).astype(np.uint32)
            cur = (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
        elif f == 2:  # Up: elementwise add (uint8 wraps mod 256)
            cur += prev
        elif f == 3:  # Average (plain-int loop: beats per-element numpy
            # by ~10x — tiny-array numpy ops are dominated by dispatch)
            line, pl = cur.tolist(), prev.tolist()
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((a + pl[x]) >> 1)) & 0xFF
            cur = np.array(line, dtype=np.uint8)
        elif f == 4:  # Paeth (same plain-int strategy)
            line, pl = cur.tolist(), prev.tolist()
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = pl[x]
                c = pl[x - ch] if x >= ch else 0
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 0xFF
            cur = np.array(line, dtype=np.uint8)
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur
        prev = cur
    return out, off + (stride + 1) * h


def _png_unpack_subbyte(rows: "np.ndarray", pw: int,
                        depth: int) -> "np.ndarray":
    """(h, row_bytes) defiltered bytes → (h, pw) sample values for bit
    depths 1/2/4 (MSB-first packing, PNG spec §7.2)."""
    bits = np.unpackbits(rows, axis=1)[:, :pw * depth]
    bits = bits.reshape(rows.shape[0], pw, depth).astype(np.uint16)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    return (bits * weights).sum(axis=2).astype(np.uint8)


def decode_png(content: bytes) -> "np.ndarray":
    """PNG bytes → (H, W, 3) uint8, pure stdlib (zlib + struct + numpy)."""
    import zlib

    if content is None or content[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, plte = 8, [], None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(content):
        (ln,) = struct.unpack(">I", content[pos:pos + 4])
        tag = content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # skip CRC
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data)
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth not in (1, 2, 4, 8, 16) or (depth == 16 and ctype == 3) \
            or (depth < 8 and ctype not in (0, 3)):
        raise ValueError(
            f"invalid PNG bit depth {depth} / color type {ctype}")
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if ch is None:
        raise ValueError(f"bad PNG color type {ctype}")
    raw = zlib.decompress(b"".join(idat))
    if depth < 8:
        # sub-byte gray / palette (r7 — the last PNG gate): rows are
        # byte-aligned, the filter distance is one byte, samples unpack
        # MSB-first within each byte
        if interlace == 1:
            vals = np.zeros((h, w), dtype=np.uint8)
            off = 0
            for x0, y0, dx, dy in _ADAM7_PASSES:
                pw = (w - x0 + dx - 1) // dx if w > x0 else 0
                ph = (h - y0 + dy - 1) // dy if h > y0 else 0
                if pw == 0 or ph == 0:
                    continue
                prb = (pw * depth + 7) // 8
                sub, off = _png_defilter(raw, off, prb, ph, 1)
                vals[y0::dy, x0::dx] = _png_unpack_subbyte(sub, pw, depth)
            if off != len(raw):
                raise ValueError("PNG Adam7 datastream size mismatch")
        else:
            row_bytes = (w * depth + 7) // 8
            if len(raw) != (row_bytes + 1) * h:
                raise ValueError("PNG scanline size mismatch")
            out, _ = _png_defilter(raw, 0, row_bytes, h, 1)
            vals = _png_unpack_subbyte(out, w, depth)
        if ctype == 3:
            if plte is None:
                raise ValueError("palette PNG missing PLTE")
            return plte[np.where(vals < len(plte), vals, 0)]
        # grayscale sample scaling v * 255/(2^d - 1) — exact (255/85/17)
        g = (vals * (255 // ((1 << depth) - 1))).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=2)
    bpp = ch * (depth // 8)  # filter distance is in BYTES per pixel
    if interlace == 1:
        # Adam7 (r7): seven independently filtered sub-images,
        # deinterleaved onto the (y0::dy, x0::dx) lattices; empty passes
        # carry no bytes at all
        full = np.zeros((h, w, bpp), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = (w - x0 + dx - 1) // dx if w > x0 else 0
            ph = (h - y0 + dy - 1) // dy if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            sub, off = _png_defilter(raw, off, pw, ph, bpp)
            full[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
        if off != len(raw):
            raise ValueError("PNG Adam7 datastream size mismatch")
        px = full
    else:
        stride = w * bpp
        if len(raw) != (stride + 1) * h:
            raise ValueError("PNG scanline size mismatch")
        out, _ = _png_defilter(raw, 0, w, h, bpp)
        px = out.reshape(h, w, bpp)
    if depth == 16:
        # big-endian 16-bit samples -> 8-bit by the high byte (r7 — the
        # standard 16->8 reduction; sample value v maps to v >> 8)
        px = px.reshape(h, w, ch, 2)[..., 0]
    if ctype == 2:
        return px.copy()
    if ctype == 6:
        return px[..., :3].copy()
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:
        return np.repeat(px[..., :1], 3, axis=2)
    # palette
    if plte is None:
        raise ValueError("palette PNG missing PLTE")
    return plte[px[..., 0]]


def encode_png(pixels: "np.ndarray", interlace: bool = False) -> bytes:
    """(H, W, {1|3|4}) or (H, W) uint8 (or uint16 → depth-16) → PNG bytes
    (color type 0/2/6 to match, filter 0) — stdlib only; used by
    tests/fixtures and ::export of raw images. ``interlace=True`` writes
    Adam7 pass-ordered scanlines (fixture for the decoder path).

    r8 (found by the codec fuzz sweep): the IHDR color type previously
    hard-coded 2 (RGB) whatever the channel count, so a grayscale input
    silently produced a stream the decoder rejects."""
    import zlib

    a = np.asarray(pixels)
    if a.dtype == np.uint16:
        a = a.astype(">u2")
        depth = 16
    else:
        a = a.astype(np.uint8)
        depth = 8
    if a.ndim == 2:
        a = a[..., None]
    ctype = {1: 0, 3: 2, 4: 6}.get(a.shape[2])
    if ctype is None:
        raise ValueError(f"encode_png: unsupported channel count "
                         f"{a.shape[2]} (expected 1, 3 or 4)")
    h, w = a.shape[0], a.shape[1]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0,
                       1 if interlace else 0)
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7_PASSES:
            sub = a[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.extend(b"\x00" + sub[y].tobytes()
                         for y in range(sub.shape[0]))
        raw = b"".join(parts)
    else:
        raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


# --------------------------------------------------------------------------
# WAV codec — stdlib `wave` module (PCM 8/16-bit).
# --------------------------------------------------------------------------

def decode_wav(content: bytes) -> tuple["np.ndarray", int]:
    """WAV bytes → (mono float64 samples in [-1, 1], sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(content), "rb") as wf:
        nch, sw, rate, nframes = (wf.getnchannels(), wf.getsampwidth(),
                                  wf.getframerate(), wf.getnframes())
        frames = wf.readframes(nframes)
    if not 0 < rate < 10_000_000:
        # stdlib wave accepts any u32 here; an absurd rate is header
        # corruption and poisons every downstream duration/resample
        # computation (r9, found by the seeded mutation fuzz)
        raise ValueError(f"implausible WAV sample rate {rate}")
    if sw == 2:
        a = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        a = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 3:
        # 24-bit little-endian PCM (r7): assemble + sign-extend
        b = np.frombuffer(frames, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        a = v.astype(np.float64) / float(1 << 23)
    elif sw == 4:
        a = np.frombuffer(frames, dtype="<i4").astype(np.float64) / float(1 << 31)
    else:
        raise NotImplementedError(f"WAV sample width {sw} (1-4 bytes supported)")
    if nch > 1:
        a = a.reshape(-1, nch).mean(axis=1)
    return a, rate


def decode_audio_pcm(content: bytes, media_type: str = "audio/wav"
                     ) -> tuple["np.ndarray", int]:
    """Unified PCM decode → (mono float64 samples in [-1, 1], rate).

    Lib-free paths: WAV (stdlib) and FLAC (from-scratch codec,
    operators/flac.py — r9; frame CRCs + STREAMINFO MD5 verified).
    Other audio types raise the gated NotImplementedError."""
    if media_type in ("audio/wav", "audio/x-wav"):
        return decode_wav(content)
    if media_type in ("audio/flac", "audio/x-flac"):
        from cozo_spark.operators.flac import decode_flac
        from cozo_spark.operators.mp3 import probe_flac

        samples, rate = decode_flac(content)
        bps = probe_flac(content)["bits_per_sample"]
        a = samples.astype(np.float64) / float(1 << (bps - 1))
        if a.ndim > 1:
            a = a.mean(axis=1)
        return a, rate
    raise NotImplementedError(
        f"decoding {media_type!r} requires an audio codec library not "
        "present in this container; audio/wav and audio/flac are the "
        "lib-free paths")


def encode_wav(samples: "np.ndarray", rate: int = 16000) -> bytes:
    """float samples in [-1, 1] → 16-bit mono PCM WAV bytes — stdlib only."""
    import io
    import wave

    pcm = (np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
           * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_image(content: bytes, media_type: str = RAW_RGB_TYPE) -> "np.ndarray":
    """Decode an image payload to (H, W, 3) uint8.

    x-raw-rgb, PNG, JPEG (baseline AND progressive), GIF and lossless
    WebP (VP8L) decode for REAL (stdlib+numpy only; see operators/jpeg.py
    and operators/webp.py); other codec formats (lossy WebP/AVIF/...) are
    gated on libraries this container doesn't ship — install one and add
    a branch here, nothing Spark-side changes."""
    if media_type == RAW_RGB_TYPE:
        return decode_raw_rgb(content)
    if media_type == "image/png":
        return decode_png(content)
    if media_type in ("image/jpeg", "image/jpg"):
        from cozo_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(content)
    if media_type == "image/gif":
        from cozo_spark.operators.gif import decode_gif

        return decode_gif(content)
    if media_type == "image/webp":
        from cozo_spark.operators.webp import decode_webp

        return decode_webp(content)
    raise NotImplementedError(
        f"decoding {media_type!r} requires an image codec library not "
        "present in this container; image/x-raw-rgb, image/png, "
        "image/jpeg, image/gif and lossless image/webp are the lib-free "
        "paths")


def _resize_nearest(img: "np.ndarray", out_w: int, out_h: int) -> "np.ndarray":
    """Nearest-neighbour resize via index maps — pure numpy, O(out pixels)."""
    h, w = img.shape[0], img.shape[1]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]


def _raw_features(img: "np.ndarray") -> list[float]:
    """Real per-channel statistics + luma + a gradient-energy signal — the
    cheap content descriptors dedup/quality passes run before a model."""
    f = img.astype(np.float64)
    means = f.mean(axis=(0, 1)) / 255.0
    stds = f.std(axis=(0, 1)) / 255.0
    luma = (0.2126 * f[..., 0] + 0.7152 * f[..., 1] + 0.0722 * f[..., 2]) / 255.0
    grad = 0.0
    if img.shape[0] > 1:
        grad += float(np.abs(np.diff(luma, axis=0)).mean())
    if img.shape[1] > 1:
        grad += float(np.abs(np.diff(luma, axis=1)).mean())
    return ([float(x) for x in means] + [float(x) for x in stds]
            + [float(luma.mean()), grad])


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """(media_id, content) → resized x-raw-rgb content via mapInPandas.

    Real nearest-neighbour resize for x-raw-rgb rows; rows of other media
    types pass through unchanged (codec decode is gated)."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                c, mt = r["content"], r["media_type"]
                if mt == RAW_RGB_TYPE and c is not None:
                    img = _resize_nearest(decode_raw_rgb(bytes(c)), width, height)
                    out.append((r["media_id"], mt, encode_raw_rgb(img)))
                else:
                    out.append((r["media_id"], mt, c))
            yield pd.DataFrame(out, columns=["media_id", "media_type", "content"])

    return df.select("media_id", "media_type", "content").mapInPandas(
        kernel, out_schema)


def _fake_decode(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature extractor: hash-derived unit vector.
    Stands in for a real decode→model pipeline; same signature, same batch
    shape, so swapping in a real kernel changes nothing Spark-side."""
    h = hashlib.sha256(content or b"").digest()
    vec = [h[i] / 255.0 for i in range(dim)]
    norm = sum(x * x for x in vec) ** 0.5 or 1.0
    return [x / norm for x in vec]


def extract_image_features(df: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """content → feature vector via mapInPandas (Arrow batch transfer).

    ``fake=False`` runs the REAL numpy kernel: x-raw-rgb rows decode and
    emit 8 content statistics (per-channel mean/std, mean luma, gradient
    energy); codec-format rows raise the gated NotImplementedError. The
    mapInPandas contract (iterator of pandas batches in, iterator out) and
    the output schema are identical in both modes — swapping in a model
    embedding changes only the kernel body."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = pdf["content"].map(lambda b: _fake_decode(b, dim))
            else:
                mts = pdf["media_type"] if "media_type" in pdf else None
                feats = pd.Series([
                    _raw_features(decode_image(
                        bytes(c),
                        mts.iloc[i] if mts is not None else RAW_RGB_TYPE))
                    for i, c in enumerate(pdf["content"])],
                    index=pdf.index)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                "content_hash": pdf["content"].map(
                    lambda b: hashlib.md5(b or b"").hexdigest()),
                "features": feats,
            })

    return df.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
    T.StructField("zero_cross_rate", T.DoubleType()),
])


def extract_audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """audio content → signal statistics via mapInPandas.

    REAL for 'audio/wav' (stdlib `wave` decode): sample rate, duration,
    RMS level, peak, zero-crossing rate — the cheap quality/dedup signals
    an audio pipeline filters on before any model. Compressed formats
    (mp3/ogg/...) raise the gated NotImplementedError. ``fake=True`` emits
    hash-derived values with the same schema (for plumbing tests)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                c = bytes(r["content"]) if r["content"] is not None else b""
                if fake:
                    hsh = hashlib.sha256(c).digest()
                    rows.append((r["media_id"], len(c), 16000,
                                 1000, hsh[0] / 255.0, hsh[1] / 255.0,
                                 hsh[2] / 255.0))
                    continue
                mt = r.get("media_type", "audio/wav")
                if mt not in ("audio/wav", "audio/x-wav", "audio/flac",
                              "audio/x-flac"):
                    raise NotImplementedError(
                        f"decoding {mt!r} requires an audio codec library "
                        "not present in this container; audio/wav and "
                        "audio/flac are the lib-free paths")
                if mt in ("audio/flac", "audio/x-flac"):
                    samples, rate = decode_audio_pcm(c, mt)
                else:
                    samples, rate = decode_wav(c)
                n = samples.size
                dur_ms = int(n * 1000 / rate) if rate else 0
                rms = float(np.sqrt((samples ** 2).mean())) if n else 0.0
                peak = float(np.abs(samples).max()) if n else 0.0
                zcr = (float((np.diff(np.signbit(samples)) != 0).mean())
                       if n > 1 else 0.0)
                rows.append((r["media_id"], len(c), rate, dur_ms, rms, peak,
                             zcr))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_bytes", "sample_rate", "duration_ms", "rms",
                "peak", "zero_cross_rate"])

    return df.mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000, fake: bool = True,
                  decode: bool = False) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (explode on the
    Python side — frame extraction is inherently in-kernel).

    MJPEG AVI payloads (``RIFF..AVI ``) are extracted for REAL: the stdlib
    RIFF walk (operators/avi.py) yields per-frame JPEG bytes, the sample
    grid every_ms apart picks the nearest frame by the container's own
    frame clock, and ``frame_hash`` is the md5 of the actual frame
    payload. With ``decode=True`` each sampled frame additionally runs
    through the baseline JPEG decoder and reports real width/height (the
    expensive path — leave off when a hash is enough for dedup). Non-AVI
    payloads use the deterministic fake grid when ``fake=True`` (plumbing
    tests without codec fixtures) and raise otherwise — real MP4/H.264
    extraction needs codec libraries this container doesn't ship.
    """
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_hash", T.StringType()),
        T.StructField("frame_w", T.IntegerType()),
        T.StructField("frame_h", T.IntegerType()),
    ])
    cols = ["media_id", "frame_idx", "frame_ts_ms", "frame_hash",
            "frame_w", "frame_h"]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cozo_spark.operators.avi import decode_avi_frames, is_avi

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = r["content"] or b""
                if is_avi(bytes(content)):
                    import math

                    usec, frames = decode_avi_frames(bytes(content))
                    ms_per_frame = (usec / 1000.0) or 40.0
                    dur = len(frames) * ms_per_frame
                    # ceil: every grid point strictly inside the video is
                    # sampled — flooring would never sample the trailing
                    # partial interval (up to every_ms of frames unseen)
                    n_samples = max(int(math.ceil(dur / every_ms)),
                                    1 if frames else 0)
                    for i in range(n_samples):
                        ts = i * every_ms
                        fi = min(int(ts / ms_per_frame), len(frames) - 1)
                        w = h = None
                        if decode:
                            from cozo_spark.operators.jpeg import decode_jpeg

                            img = decode_jpeg(frames[fi])
                            h, w = int(img.shape[0]), int(img.shape[1])
                        rows.append({
                            "media_id": r["media_id"], "frame_idx": fi,
                            "frame_ts_ms": ts,
                            "frame_hash": hashlib.md5(frames[fi]).hexdigest(),
                            "frame_w": w, "frame_h": h,
                        })
                    continue
                if not fake:
                    raise NotImplementedError(
                        "real frame extraction for non-MJPEG-AVI containers "
                        "requires a video codec library")
                dur = (r["meta"]["duration_ms"] if r["meta"] is not None else None) or 0
                n = max(int(dur // every_ms), 1)
                for i in range(n):
                    rows.append({
                        "media_id": r["media_id"],
                        "frame_idx": i,
                        "frame_ts_ms": i * every_ms,
                        "frame_hash": hashlib.md5(
                            content + i.to_bytes(4, "little")).hexdigest(),
                        "frame_w": None, "frame_h": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(kernel, out_schema)


def repartition_for_blobs(df: DataFrame, target_bytes_per_partition: int = 256 << 20,
                          size_col: str = "n_bytes") -> DataFrame:
    """Partition by byte budget: heavy binary rows make row-count-based
    partitioning wildly skewed. Computes total size, derives partition count."""
    total = df.agg(F.coalesce(F.sum(size_col), F.lit(0)).alias("t")).collect()[0]["t"]
    n = max(int(total // target_bytes_per_partition) + 1, 1)
    return df.repartition(n)


# --------------------------------------------------------------------------
# Content sniffing + metadata probing — at 100 TB the media_type column is
# routinely wrong or missing; trust the bytes, not the label.
# --------------------------------------------------------------------------

_MAGIC = (
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"), (b"GIF89a", "image/gif"),
    (b"ID3", "audio/mpeg"),
    (b"OggS", "audio/ogg"),
    (b"fLaC", "audio/flac"),
    (_RAW_MAGIC, RAW_RGB_TYPE),
)


def sniff_media_type(content: bytes) -> str | None:
    """Magic-byte container detection (the `file(1)` subset a training
    pipeline meets): PNG/JPEG/GIF/WebP, WAV/MP3/OGG/FLAC, AVI/MP4,
    x-raw-rgb. None when nothing matches."""
    if not content or len(content) < 4:
        return None
    for magic, mt in _MAGIC:
        if content.startswith(magic):
            return mt
    if content[:4] == b"RIFF" and len(content) >= 12:
        sub = content[8:12]
        return {b"AVI ": "video/x-msvideo", b"WAVE": "audio/wav",
                b"WEBP": "image/webp"}.get(sub)
    if len(content) >= 12 and content[4:8] == b"ftyp":
        return "video/mp4"
    # bare MPEG audio frame sync (no ID3 tag)
    if content[0] == 0xFF and (content[1] & 0xE0) == 0xE0:
        return "audio/mpeg"
    return None


def _probe_one(content: bytes) -> dict:
    """Best-effort per-blob metadata from the sniffed container. Returns
    plain dict; unknown fields stay None, errors mark valid=False."""
    out = {"sniffed_type": sniff_media_type(content), "width": None,
           "height": None, "duration_ms": None, "sample_rate": None,
           "bitrate_kbps": None, "n_frames": None, "valid": False}
    t = out["sniffed_type"]
    try:
        if t == "image/png":
            w, h = struct.unpack(">II", content[16:24])  # IHDR leads
            out.update(width=int(w), height=int(h), valid=True)
        elif t == "image/jpeg":
            out.update(_jpeg_dims(content))
        elif t == "image/gif":
            w, h = struct.unpack("<HH", content[6:10])
            out.update(width=int(w), height=int(h), valid=True)
        elif t == RAW_RGB_TYPE:
            w, h = struct.unpack("<II", content[4:12])
            out.update(width=int(w), height=int(h), valid=True)
        elif t == "image/webp":
            out.update(_webp_dims(content))
        elif t == "audio/wav":
            import io
            import wave

            with wave.open(io.BytesIO(content), "rb") as wf:
                rate, n = wf.getframerate(), wf.getnframes()
            out.update(sample_rate=rate,
                       duration_ms=int(n * 1000 / rate) if rate else None,
                       n_frames=n, valid=True)
        elif t == "audio/mpeg":
            from cozo_spark.operators.mp3 import probe_mp3

            m = probe_mp3(content)
            out.update(duration_ms=m["duration_ms"],
                       sample_rate=m["sample_rate"],
                       bitrate_kbps=m["bitrate_kbps"],
                       n_frames=m["n_frames"], valid=True)
        elif t == "audio/flac":
            from cozo_spark.operators.mp3 import probe_flac

            m = probe_flac(content)
            out.update(sample_rate=m["sample_rate"],
                       duration_ms=m["duration_ms"],
                       n_frames=m["n_frames"], valid=True)
        elif t == "audio/ogg":
            from cozo_spark.operators.mp3 import probe_ogg

            m = probe_ogg(content)
            out.update(sample_rate=m["sample_rate"],
                       duration_ms=m["duration_ms"],
                       n_frames=m["n_frames"], valid=True)
        elif t == "video/x-msvideo":
            from cozo_spark.operators.avi import decode_avi_frames

            usec, frames = decode_avi_frames(content)
            out.update(n_frames=len(frames),
                       duration_ms=int(len(frames) * usec / 1000)
                       if usec else None, valid=bool(frames))
    except Exception:
        out["valid"] = False
    return out


def _webp_dims(content: bytes) -> dict:
    """Header-true WebP dimensions (r7) — chunk walk only, no decode:
    VP8X carries a 24-bit canvas size, VP8L packs 14-bit w-1/h-1 after
    the signature byte, lossy VP8 keyframes carry 14-bit dims at frame
    offset 6."""
    off = 12
    while off + 8 <= len(content):
        fourcc = content[off:off + 4]
        (size,) = struct.unpack("<I", content[off + 4:off + 8])
        p = content[off + 8:off + 8 + size]
        if fourcc == b"VP8X" and len(p) >= 10:
            w = 1 + int.from_bytes(p[4:7], "little")
            h = 1 + int.from_bytes(p[7:10], "little")
            return {"width": w, "height": h, "valid": True}
        if fourcc == b"VP8L" and len(p) >= 5 and p[0] == 0x2F:
            bits = int.from_bytes(p[1:5], "little")
            return {"width": (bits & 0x3FFF) + 1,
                    "height": ((bits >> 14) & 0x3FFF) + 1, "valid": True}
        if fourcc == b"VP8 " and len(p) >= 10:
            # keyframe: 3-byte frame tag, then 3-byte start code 9D 01 2A
            if p[3:6] == b"\x9d\x01\x2a":
                w, h = struct.unpack("<HH", p[6:10])
                return {"width": w & 0x3FFF, "height": h & 0x3FFF,
                        "valid": True}
            return {"valid": False}
        off += 8 + size + (size & 1)
    return {"valid": False}


def _jpeg_dims(content: bytes) -> dict:
    """Width/height from the first SOFn marker — a header walk, no entropy
    decode — cheaper than full decode when only dimensions matter."""
    pos = 2
    n = len(content)
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            pos += 1
            continue
        marker = content[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = struct.unpack(">H", content[pos + 2:pos + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", content[pos + 5:pos + 9])
            return {"width": int(w), "height": int(h), "valid": True}
        pos += 2 + seglen
    return {"valid": False}


PROBE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("declared_type", T.StringType()),
    T.StructField("sniffed_type", T.StringType()),
    T.StructField("type_mismatch", T.BooleanType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("bitrate_kbps", T.IntegerType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("valid", T.BooleanType()),
])


def probe_media(df: DataFrame) -> DataFrame:
    """Per-blob trust report: sniffed container vs declared media_type,
    plus the real header-derived metadata (dims / duration / sample rate /
    bitrate / frame count) for every format with a stdlib probe. The
    quality filter a pipeline runs BEFORE spending decode cycles — and the
    source of truth for byte-budget partitioning. mapInPandas, map-only."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"] or b"")
                p = _probe_one(content)
                rows.append({
                    "media_id": r["media_id"],
                    "declared_type": r["media_type"],
                    "sniffed_type": p["sniffed_type"],
                    "type_mismatch": (p["sniffed_type"] is not None
                                      and r["media_type"] is not None
                                      and p["sniffed_type"] != r["media_type"]),
                    "width": p["width"], "height": p["height"],
                    "duration_ms": p["duration_ms"],
                    "sample_rate": p["sample_rate"],
                    "bitrate_kbps": p["bitrate_kbps"],
                    "n_frames": p["n_frames"], "valid": p["valid"],
                })
            yield pd.DataFrame(rows, columns=[f.name for f in PROBE_SCHEMA])

    return df.mapInPandas(kernel, PROBE_SCHEMA)
