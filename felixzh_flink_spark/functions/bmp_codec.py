"""Pure-stdlib BMP (Windows bitmap) codec — the simplest real image
format, and the one whose gotchas are all LAYOUT, not entropy coding:
rows are stored BOTTOM-UP, pixels are BGR (not RGB), and every row is
padded to a 4-byte boundary. A decoder that misses any of the three
produces plausible-looking-but-wrong pixels, which is exactly what the
order-sensitive oracle statistics catch.

`encode_bmp` writes a 24-bit uncompressed BITMAPFILEHEADER +
BITMAPINFOHEADER file; `decode_bmp` walks it back to top-down row-major
RGB bytes. Joins PNG/GIF/JPEG in `multimodal.image_feature_stats`'s
magic-byte dispatch and gets its own oracle query
(`queries.bmp_decode_stats`).

Supported envelope: 24-bit BI_RGB (uncompressed), positive height
(bottom-up — the overwhelmingly common form). Anything else (palette
depths, compression, top-down negative height) raises ValueError."""

from __future__ import annotations

import struct


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode top-down row-major RGB bytes as a 24-bit BMP."""
    if len(rgb) != 3 * width * height:
        raise ValueError("rgb length != 3*width*height")
    if width < 1 or height < 1:
        raise ValueError("dimensions must be positive")
    row_bytes = 3 * width
    pad = (-row_bytes) % 4
    img_size = (row_bytes + pad) * height
    out = bytearray()
    out += b"BM" + struct.pack("<IHHI", 14 + 40 + img_size, 0, 0, 14 + 40)
    out += struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24,
                       0, img_size, 2835, 2835, 0, 0)
    for y in range(height - 1, -1, -1):              # bottom-up
        row = rgb[y * row_bytes:(y + 1) * row_bytes]
        bgr = bytearray()
        for x in range(width):
            bgr += bytes((row[3 * x + 2], row[3 * x + 1], row[3 * x]))
        out += bgr + b"\x00" * pad
    return bytes(out)


def decode_bmp(payload: bytes) -> "tuple[int, int, bytes]":
    """Decode a 24-bit uncompressed BMP to (width, height, top-down
    row-major RGB bytes): un-flip the bottom-up rows, swap BGR→RGB,
    drop the per-row padding. Raises ValueError outside the envelope
    or on truncation."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    (data_at,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER unsupported")
    width, height = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if planes != 1:
        raise ValueError("planes != 1")
    if bpp != 24:
        raise ValueError("only 24-bit BMP supported")
    if compression != 0:
        raise ValueError("only uncompressed BI_RGB supported")
    if width < 1 or height < 1:
        raise ValueError("top-down/degenerate BMP unsupported")
    row_bytes = 3 * width
    stride = row_bytes + ((-row_bytes) % 4)
    if data_at + stride * height > len(payload):
        raise ValueError("truncated pixel data")
    out = bytearray(3 * width * height)
    for y in range(height):
        src = data_at + (height - 1 - y) * stride    # un-flip
        row = payload[src:src + row_bytes]
        dst = y * row_bytes
        for x in range(width):
            out[dst + 3 * x] = row[3 * x + 2]        # BGR → RGB
            out[dst + 3 * x + 1] = row[3 * x + 1]
            out[dst + 3 * x + 2] = row[3 * x]
    return width, height, bytes(out)
