"""Minimal AVI (RIFF) container codec for MJPEG video — stdlib only.

Closes the last multimodal decode gate that is closable without codec
libraries: an MJPEG AVI is a RIFF chunk tree whose ``movi`` LIST holds one
baseline JPEG per frame, and the repo already ships a real stdlib+numpy
JPEG codec (operators/jpeg.py). Reference parity note: the reference
treats media as opaque bytes (it has no media decode at all) — this module
is part of the beyond-reference training-data-pipeline surface, where
frame sampling feeds image dedup/quality kernels.

Format notes (public AVI/RIFF spec, msdn AVIMAINHEADER/AVISTREAMHEADER):

- file = ``RIFF <size> AVI `` followed by chunks; a chunk is
  ``<4cc> <u32le size> <payload> [pad to 16-bit]``; ``LIST`` chunks nest
  with a 4cc list-type prefix.
- ``avih`` (inside ``LIST hdrl``) starts with dwMicroSecPerFrame — the
  frame clock used for timestamping.
- frames live in ``LIST movi`` as ``00dc``/``00db`` chunks (stream 0,
  compressed/uncompressed video); for MJPEG each payload IS a JPEG.

The writer exists to fabricate deterministic test fixtures (same role as
``encode_jpeg``); the reader is the production decode path used by
``sample_frames``.
"""

from __future__ import annotations

import struct

_AVIH_FMT = "<IIIIIIIIII4I"  # 14 dwords = 56 bytes


def encode_avi_mjpeg(jpeg_frames: list[bytes], fps: int = 25,
                     width: int = 0, height: int = 0) -> bytes:
    """Build a spec-shaped MJPEG AVI from pre-encoded JPEG frames."""
    if fps <= 0:
        raise ValueError("fps must be positive")
    n = len(jpeg_frames)
    usec = 1_000_000 // fps
    max_bytes = max((len(f) for f in jpeg_frames), default=0)

    avih = struct.pack(
        _AVIH_FMT, usec, max_bytes * fps, 0, 0x10, n, 0, 1, max_bytes,
        width, height, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIii4H", b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n,
        max_bytes, -1, 0, 0, 0, width, height)
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def list_chunk(list_type: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", list_type + payload)

    strl = list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + strl)
    movi_body = b"".join(chunk(b"00dc", f) for f in jpeg_frames)
    movi = list_chunk(b"movi", movi_body)

    # idx1: one AVIINDEXENTRY per frame (4cc, flags, offset from movi
    # list-type, size) — offsets point at each 00dc header
    off, entries = 4, []
    for f in jpeg_frames:
        entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = chunk(b"idx1", b"".join(entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def is_avi(content: bytes) -> bool:
    return (content is not None and len(content) >= 12
            and content[:4] == b"RIFF" and content[8:12] == b"AVI ")


def decode_avi_frames(content: bytes) -> tuple[int, list[bytes]]:
    """AVI bytes → (micro_sec_per_frame, [frame payloads in stream order]).

    A tolerant single-pass chunk walk: nested LISTs are descended, ``avih``
    supplies the frame clock, every ``..dc``/``..db`` chunk payload is a
    frame. Truncated/garbage tails stop the walk instead of raising, so a
    corrupt blob in a 100 TB corpus yields its readable prefix plus
    n_frames for the quality filter to act on, not a dead partition.
    """
    if not is_avi(content):
        raise ValueError("not a RIFF/AVI payload")
    usec = 0
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal usec
        pos = lo
        while pos + 8 <= hi:
            fourcc = content[pos:pos + 4]
            (size,) = struct.unpack_from("<I", content, pos + 4)
            body_lo, body_hi = pos + 8, pos + 8 + size
            if body_hi > hi:
                if fourcc == b"LIST" and body_lo + 4 <= hi:
                    # truncated LIST: its readable prefix still holds whole
                    # sub-chunks (e.g. leading frames of a cut-off movi)
                    walk(body_lo + 4, hi)
                return  # truncated chunk — keep what we have
            if fourcc == b"LIST":
                walk(body_lo + 4, body_hi)  # skip the list-type 4cc
            elif fourcc == b"avih" and size >= 4:
                (usec,) = struct.unpack_from("<I", content, body_lo)
            elif fourcc[2:4] in (b"dc", b"db"):
                frames.append(content[body_lo:body_hi])
            pos = body_hi + (size % 2)

    walk(12, min(len(content), 8 + struct.unpack_from("<I", content, 4)[0]))
    return usec, frames
