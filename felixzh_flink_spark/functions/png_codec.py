"""Pure-Python PNG codec (stdlib zlib only) — the real pixel kernel
behind the multimodal decode stub.

The container ships no image libraries, so round 1-4 kept pixel decode
honestly stubbed (`multimodal.require_codec`). This module closes the gap
for PNG without any dependency: the format is public (RFC 2083 / W3C
PNG spec), its compression is stdlib `zlib`, and the five scanline
filters are a page of integer arithmetic. It supports what a
training-data pipeline's fixture/thumbnail path needs — 8-bit
greyscale (colour type 0), RGB (2), greyscale+alpha (4) and RGBA (6),
non-interlaced — and rejects everything else loudly rather than
decoding it wrong.

Cost model: O(bytes) per image in Python. This is the per-row kernel
INSIDE an Arrow-batched `mapInPandas` stage (`multimodal.
png_pixel_stats`), the documented slow path for work Spark expressions
cannot express; big-image corpora swap in a native codec on executors
via `multimodal.require_codec` without touching the Spark plan.
"""

from __future__ import annotations

import struct
import zlib

#: 8-byte PNG file signature (public PNG spec, RFC 2083 §3.1).
SIGNATURE = bytes.fromhex("89504E470D0A1A0A")

#: colour type → samples per pixel (8-bit depth only).
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(width: int, height: int, pixels: bytes, channels: int = 1,
               filter_type: int = 0) -> bytes:
    """Encode raw 8-bit pixels (row-major, `channels` samples/pixel) as a
    valid PNG. `filter_type` (0-4) is applied to EVERY scanline — the
    point of exposing it is test coverage: a decoder must undo
    Sub/Up/Average/Paeth to recover the input, so fixtures encoded with
    each filter exercise every unfilter branch."""
    colour = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"need {stride * height} pixel bytes, got {len(pixels)}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"bad filter type {filter_type}")
    raw = bytearray()
    prior = bytes(stride)
    for y in range(height):
        line = pixels[y * stride:(y + 1) * stride]
        raw.append(filter_type)
        for i in range(stride):
            x = line[i]
            a = line[i - channels] if i >= channels else 0
            b = prior[i]
            c = prior[i - channels] if i >= channels else 0
            if filter_type == 0:
                f = x
            elif filter_type == 1:
                f = x - a
            elif filter_type == 2:
                f = x - b
            elif filter_type == 3:
                f = x - (a + b) // 2
            else:
                f = x - _paeth(a, b, c)
            raw.append(f & 0xFF)
        prior = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, colour, 0, 0, 0)
    return (SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to (width, height, channels, raw 8-bit pixel bytes).

    Walks the chunk stream (IDAT may be split across chunks — they
    concatenate into one zlib stream), inflates, and undoes the per-
    scanline filter. Raises ValueError on anything outside the supported
    envelope (non-8-bit depth, palette/interlaced images, bad signature,
    truncated or checksum-inconsistent streams) — wrong-but-plausible
    pixels are worse than a loud error in a data pipeline."""
    if payload is None or len(payload) < 8 or payload[:8] != SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = channels = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        crc_bytes = payload[pos + 8 + length:pos + 12 + length]
        if len(crc_bytes) != 4 or \
                struct.unpack(">I", crc_bytes)[0] != \
                (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"chunk CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, colour, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if colour not in _CHANNELS:
                raise ValueError(f"unsupported colour type {colour}")
            if comp != 0 or filt != 0:
                raise ValueError("unsupported compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[colour]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("pixel data length mismatch")
    out = bytearray(stride * height)
    prior = bytes(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)]
        rec = out  # write window for this row
        base = y * stride
        for i in range(stride):
            x = line[i]
            a = rec[base + i - channels] if i >= channels else 0
            b = prior[i]
            c = prior[i - channels] if i >= channels else 0
            if f == 0:
                v = x
            elif f == 1:
                v = x + a
            elif f == 2:
                v = x + b
            elif f == 3:
                v = x + (a + b) // 2
            elif f == 4:
                v = x + _paeth(a, b, c)
            else:
                raise ValueError(f"bad scanline filter {f}")
            rec[base + i] = v & 0xFF
        prior = bytes(out[base:base + stride])
    return width, height, channels, bytes(out)
