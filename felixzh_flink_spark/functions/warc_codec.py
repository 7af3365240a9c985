"""WARC (ISO 28500) record codec — the container web crawls arrive in.

A WARC file is a sequence of records, each a version line
(``WARC/1.0``), CRLF-separated named header fields (``WARC-Type``,
``WARC-Record-ID``, ``Content-Length``, ...), a blank line, exactly
``Content-Length`` block bytes, and a ``CRLF CRLF`` record terminator.
The production ``.warc.gz`` variant gzip-compresses EACH RECORD as its
own member so readers can split the file at member boundaries — which
is exactly what `functions/gzip_codec.decode_gzip_members` yields, so
the two codecs compose: member walk → record parse.

Envelope: WARC/1.0 and WARC/1.1, header values on one line (no
RFC-style continuation folding — rare in practice and rejected loudly
here), block read strictly by Content-Length. Used by
`multimodal.warc_record_stats` (oracle `warc_extract_stats`) and the
`felixzh_warc` Python DataSource (`sources/warc_source.py`).
"""

from __future__ import annotations

_CRLF = b"\r\n"


def encode_warc_record(headers: "dict[str, str]", block: bytes,
                       version: str = "1.0") -> bytes:
    """One uncompressed WARC record. `Content-Length` is computed from
    the block; passing a conflicting one raises."""
    if version not in ("1.0", "1.1"):
        raise ValueError(f"unsupported WARC version {version}")
    declared = headers.get("Content-Length")
    if declared is not None and int(declared) != len(block):
        raise ValueError("Content-Length conflicts with block size")
    # one join of pre-encoded parts (r12 §4.5 pass: the bytearray-append
    # form re-allocated per header; byte layout is identical)
    parts = [b"WARC/" + version.encode(), _CRLF]
    for k, v in headers.items():
        if k.lower() == "content-length":
            continue
        if "\r" in v or "\n" in v or ":" in k:
            raise ValueError(f"malformed header {k!r}")
        parts += (f"{k}: {v}".encode(), _CRLF)
    parts += (b"Content-Length: %d" % len(block), _CRLF,
              _CRLF, block, _CRLF, _CRLF)
    return b"".join(parts)


def encode_warc(records: "list[tuple[dict, bytes]]",
                gzip_per_record: bool = False) -> bytes:
    """A whole WARC file: records back-to-back; with `gzip_per_record`
    each record becomes its own gzip member (the `.warc.gz` layout)."""
    if not records:
        raise ValueError("need at least one record")
    encoded = [encode_warc_record(h, b) for h, b in records]
    if not gzip_per_record:
        return b"".join(encoded)
    from felixzh_flink_spark.functions.gzip_codec import \
        encode_gzip_members
    return encode_gzip_members(encoded)


def _parse_records(payload: bytes) -> "list[tuple[dict, bytes]]":
    records: list[tuple[dict, bytes]] = []
    pos = 0
    n = len(payload)
    while pos < n:
        eol = payload.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("truncated WARC version line")
        version = payload[pos:eol]
        if version not in (b"WARC/1.0", b"WARC/1.1"):
            raise ValueError(f"bad WARC version line {version!r}")
        pos = eol + 2
        # header lines cannot be empty (continuation folding is rejected
        # here), so the FIRST CRLF CRLF at/after the version line's CRLF
        # is exactly the blank-line terminator the old line-by-line walk
        # stopped at — one find + one split replaces a find per line
        # (r12 §4.5: the per-line scan was the parse's hottest loop)
        hend = payload.find(_CRLF + _CRLF, eol)
        if hend < 0:
            raise ValueError("truncated WARC header block")
        headers: dict[str, str] = {}
        if hend > pos:
            for line in payload[pos:hend].split(_CRLF):
                sep = line.find(b":")
                if sep <= 0:
                    raise ValueError(f"malformed WARC header line {line!r}")
                headers[line[:sep].decode("utf-8")] = \
                    line[sep + 1:].strip().decode("utf-8")
        pos = hend + 4
        if "Content-Length" not in headers:
            raise ValueError("missing Content-Length")
        try:
            length = int(headers["Content-Length"])
        except ValueError as exc:
            raise ValueError("non-integer Content-Length") from exc
        if length < 0 or pos + length + 4 > n:
            raise ValueError("block outside the record")
        block = payload[pos:pos + length]
        pos += length
        if payload[pos:pos + 4] != _CRLF + _CRLF:
            raise ValueError("missing record terminator")
        pos += 4
        records.append((headers, block))
    if not records:
        raise ValueError("no WARC records found")
    return records


def decode_warc(payload: bytes) -> "list[tuple[dict, bytes]]":
    """[(headers, block bytes), ...] from a WARC file, PLAIN or
    `.warc.gz` (sniffed from the gzip magic; per-member records are
    parsed member-by-member, multi-record members included, so both
    the canonical record-per-member layout and a whole-file gzip
    decode correctly). Bad version lines, header folding, length
    mismatches, or a missing CRLF CRLF terminator raise ValueError."""
    if payload is None or len(payload) < 4:
        raise ValueError("not a WARC payload (too short)")
    if payload[:2] == b"\x1f\x8b":
        from felixzh_flink_spark.functions.gzip_codec import \
            decode_gzip_members
        records: list[tuple[dict, bytes]] = []
        for _meta, raw in decode_gzip_members(payload):
            records.extend(_parse_records(raw))
        return records
    return _parse_records(payload)
