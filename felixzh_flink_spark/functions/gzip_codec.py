"""Gzip MEMBER codec — the framing layer web-crawl ingestion lives on.

`zlib` gives us DEFLATE; what it does not give us is the gzip (RFC
1952) member structure a real crawl pipeline must walk: magic + flag
byte, optional FEXTRA/FNAME/FCOMMENT/FHCRC header fields, the raw
deflate stream, then a CRC32 + ISIZE trailer — and, crucially,
CONCATENATED members: a `.warc.gz` is one gzip member per WARC record
glued end-to-end, so "decompress the file" means iterating members and
knowing where each trailer ends. This module implements that framing
with real validation (header CRC16 when present, data CRC32 and ISIZE
always) on top of `zlib.decompressobj(-15)`.

Used by `warc_codec` (record-per-member `.warc.gz`) and the
`gzip_roundtrip_docs` oracle query. Cost model: O(bytes) inside the
Arrow-batched `mapInPandas` stage.
"""

from __future__ import annotations

import struct
import zlib

_FTEXT = 0x01
_FHCRC = 0x02
_FEXTRA = 0x04
_FNAME = 0x08
_FCOMMENT = 0x10


def encode_gzip_member(raw: bytes, name: "str | None" = None,
                       extra: "bytes | None" = None, hcrc: bool = False,
                       mtime: int = 0, level: int = 6) -> bytes:
    """One RFC 1952 member: header (with optional FEXTRA/FNAME/FHCRC
    fields), raw-deflate body, CRC32 + ISIZE trailer. Deterministic for
    fixed inputs (no timestamps unless passed in)."""
    flg = 0
    if extra is not None:
        flg |= _FEXTRA
    if name is not None:
        flg |= _FNAME
    if hcrc:
        flg |= _FHCRC
    head = bytearray(struct.pack("<BBBBIBB", 0x1F, 0x8B, 8, flg,
                                 mtime, 0, 255))
    if extra is not None:
        if len(extra) > 0xFFFF:
            raise ValueError("FEXTRA field too long")
        head += struct.pack("<H", len(extra)) + extra
    if name is not None:
        nb = name.encode("latin-1")
        if b"\x00" in nb:
            raise ValueError("FNAME cannot contain NUL")
        head += nb + b"\x00"
    if hcrc:
        head += struct.pack("<H", zlib.crc32(bytes(head)) & 0xFFFF)
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    body = co.compress(raw) + co.flush()
    trailer = struct.pack("<II", zlib.crc32(raw) & 0xFFFFFFFF,
                          len(raw) & 0xFFFFFFFF)
    return bytes(head) + body + trailer


def encode_gzip_members(parts: "list[bytes]", **kw) -> bytes:
    """Concatenated members, one per part — the `.warc.gz` shape."""
    if not parts:
        raise ValueError("need at least one member")
    return b"".join(encode_gzip_member(p, **kw) for p in parts)


def decode_gzip_members(payload: bytes
                        ) -> "list[tuple[dict, bytes]]":
    """Walk EVERY member of a (possibly concatenated) gzip stream,
    returning [(header_meta, decompressed bytes), ...] in order.
    header_meta carries {'name', 'extra', 'ftext'}. Verifies the
    header CRC16 when FHCRC is set and ALWAYS verifies each member's
    CRC32 + ISIZE trailer — a flipped payload bit cannot decode
    silently. Trailing garbage, truncation, reserved flags, or a
    non-deflate method raise ValueError (quarantine contract)."""
    if payload is None or len(payload) < 18:
        raise ValueError("not a gzip stream (too short)")
    out: list[tuple[dict, bytes]] = []
    pos = 0
    n = len(payload)
    # feed the decompressor through a memoryview: `payload[pos:]` copied
    # the whole remaining stream per member — O(members × bytes) on
    # concatenated-member files (r12 §4.5)
    mv = memoryview(payload)
    while pos < n:
        if pos + 10 > n:
            raise ValueError("truncated gzip header")
        id1, id2, cm, flg, _mtime, _xfl, _os = struct.unpack_from(
            "<BBBBIBB", payload, pos)
        if (id1, id2) != (0x1F, 0x8B):
            raise ValueError("bad gzip magic")
        if cm != 8:
            raise ValueError(f"unsupported compression method {cm}")
        if flg & 0xE0:
            raise ValueError("reserved gzip FLG bits set")
        hstart = pos
        pos += 10
        extra = None
        if flg & _FEXTRA:
            if pos + 2 > n:
                raise ValueError("truncated FEXTRA length")
            (xlen,) = struct.unpack_from("<H", payload, pos)
            pos += 2
            if pos + xlen > n:
                raise ValueError("truncated FEXTRA field")
            extra = payload[pos:pos + xlen]
            pos += xlen
        name = None
        if flg & _FNAME:
            end = payload.find(b"\x00", pos)
            if end < 0:
                raise ValueError("unterminated FNAME")
            name = payload[pos:end].decode("latin-1")
            pos = end + 1
        if flg & _FCOMMENT:
            end = payload.find(b"\x00", pos)
            if end < 0:
                raise ValueError("unterminated FCOMMENT")
            pos = end + 1
        if flg & _FHCRC:
            if pos + 2 > n:
                raise ValueError("truncated FHCRC")
            (stored,) = struct.unpack_from("<H", payload, pos)
            if stored != (zlib.crc32(payload[hstart:pos]) & 0xFFFF):
                raise ValueError("gzip header CRC mismatch")
            pos += 2
        do = zlib.decompressobj(-15)
        try:
            raw = do.decompress(mv[pos:])
        except zlib.error as exc:
            raise ValueError(f"bad deflate stream: {exc}") from exc
        if not do.eof:
            raise ValueError("truncated deflate stream")
        consumed = (n - pos) - len(do.unused_data)
        pos += consumed
        if pos + 8 > n:
            raise ValueError("truncated gzip trailer")
        crc, isize = struct.unpack_from("<II", payload, pos)
        pos += 8
        if crc != (zlib.crc32(raw) & 0xFFFFFFFF):
            raise ValueError("gzip CRC32 mismatch")
        if isize != (len(raw) & 0xFFFFFFFF):
            raise ValueError("gzip ISIZE mismatch")
        out.append(({"name": name, "extra": extra,
                     "ftext": bool(flg & _FTEXT)}, raw))
    if not out:
        raise ValueError("no gzip members found")
    return out
