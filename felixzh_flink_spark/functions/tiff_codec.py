"""Pure-Python baseline-TIFF codec — the DIRECTORY-walk image format.

TIFF (public Adobe/ISO spec) is unlike the stream formats already in
the lake (PNG chunks, GIF blocks, BMP's fixed header): pixels are
reached through an Image File Directory of (tag, type, count, value)
entries whose VALUES may live inline in the 4-byte field or anywhere
else in the file, in EITHER byte order ("II" little-endian / "MM"
big-endian), with the image split into independently-compressed strips.
That makes it the layout-trap format squared: a reader that assumes one
endianness, reads an inline SHORT from the wrong half of the value
field, or reassembles strips out of order produces plausible garbage.

Envelope (the canonical baseline-RGB profile): 8-bit RGB
(PhotometricInterpretation=2, SamplesPerPixel=3, BitsPerSample=8,8,8),
Compression 1 (none) or 32773 (PackBits RLE — genuinely decompressed
here), any RowsPerStrip. Anything else raises ValueError loudly
(quarantine contract). Cost model: O(bytes) per file inside the
Arrow-batched `mapInPandas` stage (`multimodal.tiff_pixel_stats`).
"""

from __future__ import annotations

import struct

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279

_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_SIZES = {_TYPE_SHORT: 2, _TYPE_LONG: 4}

_COMP_NONE = 1
_COMP_PACKBITS = 32773


def packbits_encode(data: bytes) -> bytes:
    """Apple PackBits RLE: runs of >= 3 equal bytes become a repeat
    record (control 257-n, then the byte); everything else is emitted
    as literal records of <= 128 bytes."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = 0

    def flush_literals(end: int) -> None:
        j = lit_start
        while j < end:
            chunk = data[j:min(j + 128, end)]
            out.append(len(chunk) - 1)
            out.extend(chunk)
            j += 128

    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            flush_literals(i)
            out.append(257 - run)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literals(n)
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Decode PackBits to exactly `expected` bytes; 0x80 is a no-op per
    the spec. Overruns, underruns and truncation raise ValueError."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        c = data[pos]
        pos += 1
        if c == 0x80:
            continue
        if c < 0x80:                       # literal of c+1 bytes
            if pos + c + 1 > len(data):
                raise ValueError("truncated PackBits literal")
            out += data[pos:pos + c + 1]
            pos += c + 1
        else:                              # repeat next byte 257-c times
            if pos >= len(data):
                raise ValueError("truncated PackBits run")
            out += bytes([data[pos]]) * (257 - c)
            pos += 1
        if len(out) > expected:
            raise ValueError("PackBits output overruns the strip")
    if len(out) != expected:
        raise ValueError("PackBits output underruns the strip")
    return bytes(out)


def encode_tiff(width: int, height: int, rgb: bytes,
                big_endian: bool = False, compression: int = _COMP_NONE,
                rows_per_strip: int | None = None) -> bytes:
    """Write a REAL baseline-RGB TIFF: header in the chosen byte order,
    strip data (optionally PackBits-compressed per strip), out-of-line
    StripOffsets/StripByteCounts/BitsPerSample arrays, then the IFD
    with ascending tags. `rgb` is the row-major interleaved byte
    stream (len == 3*width*height)."""
    if width < 1 or height < 1:
        raise ValueError("dimensions must be positive")
    if len(rgb) != 3 * width * height:
        raise ValueError("rgb length != 3*width*height")
    if compression not in (_COMP_NONE, _COMP_PACKBITS):
        raise ValueError(f"unsupported compression {compression}")
    e = ">" if big_endian else "<"
    rps = height if rows_per_strip is None else rows_per_strip
    if rps < 1:
        raise ValueError("rows_per_strip must be positive")
    strips = []
    for top in range(0, height, rps):
        rows = min(rps, height - top)
        raw = rgb[top * width * 3:(top + rows) * width * 3]
        strips.append(packbits_encode(raw)
                      if compression == _COMP_PACKBITS else raw)
    n = len(strips)
    pos = 8
    offsets = []
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    if pos & 1:                       # keep later arrays word-aligned
        pos += 1
    # out-of-line arrays (only when they exceed the 4-byte value field)
    off_array = cnt_array = bits_array = 0
    if n > 1:
        off_array = pos
        pos += 4 * n
        cnt_array = pos
        pos += 4 * n
    bits_array = pos
    pos += 6
    ifd_off = pos

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        # the 4-byte value field holds the values themselves only when
        # they fit (left-justified in file order); otherwise it holds a
        # LONG offset — which must be packed as an I even for SHORT
        # entries (the big-endian trap this codec exists to cover)
        if typ == _TYPE_SHORT and _TYPE_SIZES[typ] * count <= 4:
            return struct.pack(e + "HHIHH", tag, typ, count, value, 0)
        return struct.pack(e + "HHII", tag, typ, count, value)

    entries = [
        entry(_TAG_WIDTH, _TYPE_LONG, 1, width),
        entry(_TAG_HEIGHT, _TYPE_LONG, 1, height),
        entry(_TAG_BITS, _TYPE_SHORT, 3, bits_array),
        entry(_TAG_COMPRESSION, _TYPE_SHORT, 1, compression),
        entry(_TAG_PHOTOMETRIC, _TYPE_SHORT, 1, 2),
        entry(_TAG_STRIP_OFFSETS, _TYPE_LONG, n,
              off_array if n > 1 else offsets[0]),
        entry(_TAG_SPP, _TYPE_SHORT, 1, 3),
        entry(_TAG_ROWS_PER_STRIP, _TYPE_LONG, 1, rps),
        entry(_TAG_STRIP_COUNTS, _TYPE_LONG, n,
              cnt_array if n > 1 else len(strips[0])),
    ]
    # BitsPerSample count=3 -> 6 bytes, always out-of-line (bits_array)
    out = bytearray(struct.pack(e + "2sHI", b"II" if e == "<" else b"MM",
                                42, ifd_off))
    for s in strips:
        out += s
    if len(out) & 1:
        out += b"\x00"
    if n > 1:
        for o in offsets:
            out += struct.pack(e + "I", o)
        for s in strips:
            out += struct.pack(e + "I", len(s))
    out += struct.pack(e + "HHH", 8, 8, 8)
    assert len(out) == ifd_off
    out += struct.pack(e + "H", len(entries))
    for ent in entries:
        out += ent
    out += struct.pack(e + "I", 0)    # no next IFD
    return bytes(out)


def _read_values(payload: bytes, e: str, typ: int, count: int,
                 field: bytes) -> list[int]:
    """Read an IFD entry's values: inline in the 4-byte value field
    when they fit (left-justified in FILE order — the big-endian trap),
    else at the offset the field holds."""
    if typ not in _TYPE_SIZES:
        raise ValueError(f"unsupported IFD value type {typ}")
    size = _TYPE_SIZES[typ] * count
    fmt = "H" if typ == _TYPE_SHORT else "I"
    if size <= 4:
        return list(struct.unpack_from(e + fmt * count, field, 0))
    (off,) = struct.unpack(e + "I", field)
    if off + size > len(payload):
        raise ValueError("IFD value array outside the file")
    return list(struct.unpack_from(e + fmt * count, payload, off))


def decode_tiff(payload: bytes) -> tuple[int, int, bytes]:
    """(width, height, row-major interleaved RGB bytes) from a baseline
    RGB TIFF in EITHER byte order, reassembling strips in order and
    genuinely decompressing PackBits strips. Non-RGB photometric,
    non-8-bit, unknown compression, overlong/short strips, or a
    truncated directory raise ValueError."""
    if payload is None or len(payload) < 8:
        raise ValueError("not a TIFF (too short)")
    order = payload[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    magic, ifd_off = struct.unpack_from(e + "HI", payload, 2)
    if magic != 42:
        raise ValueError("not a TIFF (magic != 42)")
    if ifd_off + 2 > len(payload):
        raise ValueError("IFD outside the file")
    (n_entries,) = struct.unpack_from(e + "H", payload, ifd_off)
    if ifd_off + 2 + 12 * n_entries + 4 > len(payload):
        raise ValueError("truncated IFD")
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(e + "HHI", payload, base)
        field = payload[base + 8:base + 12]
        if tag in (_TAG_WIDTH, _TAG_HEIGHT, _TAG_BITS, _TAG_COMPRESSION,
                   _TAG_PHOTOMETRIC, _TAG_STRIP_OFFSETS, _TAG_SPP,
                   _TAG_ROWS_PER_STRIP, _TAG_STRIP_COUNTS):
            tags[tag] = _read_values(payload, e, typ, count, field)
    for req in (_TAG_WIDTH, _TAG_HEIGHT, _TAG_STRIP_OFFSETS,
                _TAG_STRIP_COUNTS):
        if req not in tags:
            raise ValueError(f"missing required TIFF tag {req}")
    width, height = tags[_TAG_WIDTH][0], tags[_TAG_HEIGHT][0]
    if width < 1 or height < 1:
        raise ValueError("bad dimensions")
    if tags.get(_TAG_PHOTOMETRIC, [2])[0] != 2:
        raise ValueError("only RGB photometric supported")
    if tags.get(_TAG_SPP, [3])[0] != 3:
        raise ValueError("only 3 samples per pixel supported")
    if tags.get(_TAG_BITS, [8, 8, 8]) != [8, 8, 8]:
        raise ValueError("only 8 bits per sample supported")
    compression = tags.get(_TAG_COMPRESSION, [_COMP_NONE])[0]
    if compression not in (_COMP_NONE, _COMP_PACKBITS):
        raise ValueError(f"unsupported compression {compression}")
    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags[_TAG_STRIP_COUNTS]
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    rps = tags.get(_TAG_ROWS_PER_STRIP, [height])[0]
    if rps < 1:
        raise ValueError("bad RowsPerStrip")
    n_expected = (height + rps - 1) // rps
    if len(offsets) != n_expected:
        raise ValueError("strip count inconsistent with RowsPerStrip")
    rgb = bytearray()
    for s, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(payload):
            raise ValueError("strip outside the file")
        rows = min(rps, height - s * rps)
        expected = rows * width * 3
        raw = payload[off:off + cnt]
        if compression == _COMP_PACKBITS:
            rgb += packbits_decode(raw, expected)
        else:
            if cnt != expected:
                raise ValueError("uncompressed strip length mismatch")
            rgb += raw
    return width, height, bytes(rgb)
