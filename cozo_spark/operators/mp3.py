"""MP3 (MPEG audio) frame-header walk — stdlib only, metadata not PCM.

Full Layer-III entropy decode (Huffman + IMDCT + synthesis filterbank)
genuinely needs a codec library; what a 100 TB data pipeline needs from
MP3 blobs FIRST is trustworthy metadata — duration, bitrate profile,
sample rate, channel mode — for quality filters and byte-budget
partitioning. That is a pure header walk over the public MPEG frame
format (ISO/IEC 11172-3 §2.4.1): 4-byte headers with an 11-bit sync,
version/layer/bitrate/samplerate indices, and a derivable frame length,
optionally preceded by an ID3v2 tag (synchsafe length). PCM decode stays
gated in multimodal.decode_audio with a clear error.
"""

from __future__ import annotations

# bitrate table, kbps: [version_key][layer][bitrate_index]; V2 covers 2 and
# 2.5 (they share tables). Index 0 is "free", 15 is invalid.
_BITRATE = {
    ("V1", 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
                384, 416, 448),
    ("V1", 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
                320, 384),
    ("V1", 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                256, 320),
    ("V2", 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
                224, 256),
    ("V2", 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                160),
    ("V2", 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                160),
}
_SAMPLE_RATE = {  # by version bits (00=2.5, 10=2, 11=1); index 3 invalid
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}
# samples per frame: [version][layer]
_SAMPLES = {("V1", 1): 384, ("V1", 2): 1152, ("V1", 3): 1152,
            ("V2", 1): 384, ("V2", 2): 1152, ("V2", 3): 576}


def _id3v2_size(content: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if none) — synchsafe u28."""
    if len(content) < 10 or content[:3] != b"ID3":
        return 0
    b = content[6:10]
    if any(x & 0x80 for x in b):
        return 0  # not synchsafe — treat as absent rather than guess
    return 10 + ((b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3])


def _parse_header(h: int):
    """32-bit header → (version_key, version_bits, layer, bitrate_kbps,
    sample_rate, padding, channels) or None if invalid."""
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    vbits = (h >> 19) & 3
    if vbits == 1:
        return None  # reserved
    vkey = "V1" if vbits == 3 else "V2"
    lbits = (h >> 17) & 3
    if lbits == 0:
        return None  # reserved
    layer = 4 - lbits  # 11→1, 10→2, 01→3
    bidx = (h >> 12) & 0xF
    if bidx in (0, 15):
        return None  # free-format unsupported / invalid
    sidx = (h >> 10) & 3
    if sidx == 3:
        return None
    bitrate = _BITRATE[(vkey, layer)][bidx]
    rate = _SAMPLE_RATE[vbits][sidx]
    padding = (h >> 9) & 1
    channels = 1 if ((h >> 6) & 3) == 3 else 2
    return vkey, vbits, layer, bitrate, rate, padding, channels


def _frame_len(vkey: str, layer: int, bitrate_kbps: int, rate: int,
               padding: int) -> int:
    if layer == 1:
        return (12 * bitrate_kbps * 1000 // rate + padding) * 4
    per = 144 if (vkey == "V1" or layer == 2) else 72
    return per * bitrate_kbps * 1000 // rate + padding


def probe_mp3(content: bytes) -> dict:
    """Walk every frame → {n_frames, duration_ms, sample_rate,
    bitrate_kbps (average — VBR-correct), channels, layer}.

    Resyncs after garbage (scans forward for the next valid header, as
    players do), so truncated or tag-padded blobs report their readable
    prefix. Raises ValueError only when no frame exists at all.
    """
    pos = _id3v2_size(content)
    n = len(content)
    frames = 0
    samples_total = 0
    bytes_total = 0
    rate = channels = layer = None
    RESYNC_WINDOW = 1 << 16  # bytes scanned forward after corruption
    while pos + 4 <= n:
        hdr = int.from_bytes(content[pos:pos + 4], "big")
        parsed = _parse_header(hdr)
        if parsed is None:
            if not frames:
                pos += 1  # resync before the first frame
                continue
            # mid-stream corruption: resync like a player, but demand TWO
            # consecutive valid headers so trailing ID3v1/APE tags never
            # masquerade as frames; give up past the bounded window
            found = None
            limit = min(n - 4, pos + RESYNC_WINDOW)
            probe = pos + 1
            while probe <= limit:
                cand = _parse_header(
                    int.from_bytes(content[probe:probe + 4], "big"))
                if cand is not None:
                    vk, _vb, lay, br, sr, pad, _ch = cand
                    nxt = probe + _frame_len(vk, lay, br, sr, pad)
                    if nxt + 4 <= n and _parse_header(
                            int.from_bytes(content[nxt:nxt + 4],
                                           "big")) is not None:
                        found = probe
                        break
                probe += 1
            if found is None:
                break  # trailing tag/garbage after real frames: done
            pos = found
            continue
        vkey, vbits, lay, br, sr, pad, ch = parsed
        flen = _frame_len(vkey, lay, br, sr, pad)
        if flen <= 4 or pos + flen > n:
            break  # truncated final frame
        if rate is None:
            rate, channels, layer = sr, ch, lay
        frames += 1
        samples_total += _SAMPLES[(vkey, lay)]
        bytes_total += flen
        pos += flen
    if not frames:
        raise ValueError("no MPEG audio frame found")
    duration_ms = samples_total * 1000 // rate
    # round, don't floor: CBR frame lengths are themselves floor'd by the
    # spec formula, so flooring twice under-reports the nominal rate
    avg_kbps = round(bytes_total * 8 * rate / max(samples_total, 1) / 1000)
    return {
        "n_frames": frames, "duration_ms": duration_ms,
        "sample_rate": rate, "bitrate_kbps": avg_kbps,
        "channels": channels, "layer": layer,
    }


def encode_mp3_silence(n_frames: int = 10, bitrate_idx: int = 9,
                       sample_rate_idx: int = 0) -> bytes:
    """Fixture writer: structurally valid MPEG-1 Layer III frames with
    zeroed payloads (silence-shaped; not decodable audio, but every header
    field and frame length is spec-true — same role as encode_jpeg)."""
    out = bytearray()
    for _ in range(n_frames):
        h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (bitrate_idx << 12) \
            | (sample_rate_idx << 10)
        vkey, vbits, lay, br, sr, pad, ch = _parse_header(h)
        flen = _frame_len(vkey, lay, br, sr, pad)
        out += h.to_bytes(4, "big") + b"\x00" * (flen - 4)
    return bytes(out)


def probe_flac(content: bytes) -> dict:
    """FLAC STREAMINFO probe (the mandatory first metadata block per the
    public FLAC spec): sample rate, channels, bits/sample, total samples →
    duration. Header-only, no decode."""
    if len(content) < 42 or content[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    while pos + 4 <= len(content):
        hdr = content[pos]
        btype, last = hdr & 0x7F, hdr & 0x80
        size = int.from_bytes(content[pos + 1:pos + 4], "big")
        body = content[pos + 4:pos + 4 + size]
        if btype == 0:  # STREAMINFO
            if len(body) < 18:
                raise ValueError("truncated FLAC STREAMINFO")
            bits = int.from_bytes(body[10:18], "big")
            rate = (bits >> 44) & 0xFFFFF
            channels = ((bits >> 41) & 0x7) + 1
            bps = ((bits >> 36) & 0x1F) + 1
            total = bits & ((1 << 36) - 1)
            return {
                "sample_rate": rate, "channels": channels,
                "bits_per_sample": bps, "n_frames": total,
                "duration_ms": total * 1000 // rate if rate else 0,
            }
        if last:
            break
        pos += 4 + size
    raise ValueError("FLAC STREAMINFO block not found")


def encode_flac_header(sample_rate: int = 44100, channels: int = 2,
                       bps: int = 16, total_samples: int = 44100) -> bytes:
    """Fixture writer: a structurally valid FLAC signature + STREAMINFO
    block (no audio frames — enough for every header probe)."""
    bits = ((sample_rate & 0xFFFFF) << 44) | ((channels - 1) << 41) \
        | ((bps - 1) << 36) | (total_samples & ((1 << 36) - 1))
    body = (b"\x10\x00\x10\x00"      # min/max blocksize 4096
            + b"\x00\x00\x00" * 2    # min/max framesize unknown
            + bits.to_bytes(8, "big")
            + b"\x00" * 16)          # md5 of raw audio (unset)
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def probe_ogg(content: bytes) -> dict:
    """OGG container probe (public RFC 3533 page layout): duration from
    the LAST page's granule position; sample rate from the Vorbis or Opus
    identification header on the first page. Header walk only."""
    if len(content) < 28 or content[:4] != b"OggS":
        raise ValueError("not an OGG payload")
    rate = None
    codec = None
    pre_skip = 0
    granule = 0
    pos = 0
    n = len(content)
    while pos + 27 <= n:
        if content[pos:pos + 4] != b"OggS":
            nxt = content.find(b"OggS", pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        g = int.from_bytes(content[pos + 6:pos + 14], "little", signed=True)
        nseg = content[pos + 26]
        seg_table = content[pos + 27:pos + 27 + nseg]
        body_len = sum(seg_table)
        body = content[pos + 27 + nseg:pos + 27 + nseg + body_len]
        if rate is None and body[:8] == b"OpusHead" and len(body) >= 16:
            codec = "opus"
            pre_skip = int.from_bytes(body[10:12], "little")
            rate = 48000  # opus granules are ALWAYS 48 kHz (RFC 7845)
        elif rate is None and body[:7] == b"\x01vorbis" and len(body) >= 16:
            codec = "vorbis"
            rate = int.from_bytes(body[12:16], "little")
        if g > 0:
            granule = max(granule, g)
        pos += 27 + nseg + body_len
    if rate is None:
        raise ValueError("no Vorbis/Opus identification header found")
    samples = max(granule - (pre_skip if codec == "opus" else 0), 0)
    return {
        "codec": codec, "sample_rate": rate, "n_frames": samples,
        "duration_ms": samples * 1000 // (48000 if codec == "opus" else rate),
    }
