"""GIF decoder — stdlib only (GIF87a/89a per the public spec).

Closes another real image format for the multimodal pipeline: block walk
(logical screen descriptor, color tables, extension skip), full variable-
code-width LZW decompression, optional interlace pass reorder, palette
mapping to (H, W, 3) uint8. Animated GIFs decode their FIRST frame (the
thumbnail/dedup-relevant one); transparency maps onto the palette color
(binary features don't need alpha).

The fixture encoder emits spec-valid LZW using the classic no-compression
trick (literal codes with a clear code before each width rollover) — the
decoder is also exercised against a well-known externally-authored GIF
byte string (the ubiquitous 1x1 tracking pixel).
"""

from __future__ import annotations

import struct

import numpy as np


def decode_gif(content: bytes) -> "np.ndarray":
    """GIF bytes → (H, W, 3) uint8 (first frame)."""
    if content is None or content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", content[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(content, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    while pos < len(content):
        b = content[pos]
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(content) and content[pos]:
                pos += 1 + content[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _ix, _iy, iw, ih, ip = struct.unpack("<HHHHB",
                                                 content[pos + 1:pos + 10])
            pos += 10
            ct = gct
            if ip & 0x80:
                n = 2 << (ip & 7)
                ct = np.frombuffer(content, np.uint8,
                                   n * 3, pos).reshape(-1, 3)
                pos += n * 3
            interlaced = bool(ip & 0x40)
            if ct is None:
                raise ValueError("GIF image without a color table")
            min_code = content[pos]
            pos += 1
            data = bytearray()
            while pos < len(content) and content[pos]:
                ln = content[pos]
                data += content[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(data), min_code, iw * ih)
            img = np.asarray(idx, np.int32).reshape(ih, iw)
            if interlaced:
                img = _deinterlace(img)
            img = np.clip(img, 0, len(ct) - 1)
            return ct[img]
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{b:02x} at {pos}")
    raise ValueError("GIF contains no image data")


def _lzw_decode(data: bytes, min_code: int, max_pixels: int) -> list:
    clear = 1 << min_code
    end = clear + 1
    width = min_code + 1
    table = [(i,) for i in range(clear)] + [(), ()]
    out: list = []
    prev = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [(i,) for i in range(clear)] + [(), ()]
                width = min_code + 1
                prev = None
                continue
            if code == end:
                return out[:max_pixels]
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + (entry[0],))
            else:  # the KwKwK case
                entry = prev + (prev[0],)
                table.append(entry)
            out.extend(entry)
            if len(out) >= max_pixels:
                return out[:max_pixels]
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out[:max_pixels]


_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(img: "np.ndarray") -> "np.ndarray":
    h = img.shape[0]
    order = [y for start, step in _PASSES for y in range(start, h, step)]
    out = np.empty_like(img)
    out[order] = img
    return out


def encode_gif(pixels: "np.ndarray") -> bytes:
    """Fixture writer: palette-quantized GIF89a with literal-code LZW (the
    spec-valid 'uncompressed' form: clear codes keep the table small)."""
    a = np.asarray(pixels, np.uint8)
    h, w = a.shape[0], a.shape[1]
    flat = a.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("fixture encoder supports <= 256 distinct colors")
    bits = max((len(colors) - 1).bit_length(), 1)
    n = 1 << bits
    pal = np.zeros((n, 3), np.uint8)
    pal[:len(colors)] = colors
    min_code = max(bits, 2)
    clear = 1 << min_code
    end = clear + 1
    # emit: CLEAR, then literals with a CLEAR every (2^(min_code+1) -
    # end - 2) codes so the width never rolls past min_code+1
    codes = [clear]
    span = (1 << (min_code + 1)) - end - 2
    for i, v in enumerate(idx.tolist()):
        if i and i % span == 0:
            codes.append(clear)
        codes.append(int(v))
    codes.append(end)
    width = min_code + 1
    acc = nbits = 0
    payload = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        payload.append(acc & 0xFF)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out += bytes([min_code])
    for i in range(0, len(payload), 255):
        blk = payload[i:i + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3B"
    return bytes(out)
