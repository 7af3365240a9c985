"""Pure-Python protobuf WIRE-format codec — the remaining format in the
Flink serialization family (flink-protobuf) after csv / json / avro /
canal-json / debezium-json, built from the public protobuf encoding
spec the same way `avro_codec` implements the Avro wire format.

A message is a sequence of (tag, value) pairs where
``tag = (field_number << 3) | wire_type`` and the wire types are
0 varint, 1 fixed64, 2 length-delimited, 5 fixed32. Schemas here are
plain dicts ``{field_number: (name, kind)}`` with kinds::

    uint    varint (non-negative int; also bool)
    sint    zigzag-encoded varint (signed int, efficient negatives)
    string  length-delimited UTF-8
    bytes   length-delimited raw
    double  fixed64 IEEE 754 little-endian (bit-exact roundtrip)
    float   fixed32 IEEE 754 little-endian
    packed  length-delimited concatenation of varints (repeated uint)
    (spec,) a 1-tuple holding a nested schema dict → embedded message

Decoding follows proto3 rules that matter in the real world: UNKNOWN
fields are skipped by wire type (schema evolution — a new producer
field must not break old consumers), later occurrences of a scalar
field overwrite earlier ones (last-wins), and missing fields come back
as None. Truncated varints/blocks and wire-type mismatches raise
ValueError (quarantine contract).

Reference parity: felixzh-flink's Kafka SQL sources pick a `format`
per topic (S11/K9 family; format/.../avro/Avro2Avro.java:25-45 is the
avro member); protobuf is the same pluggable-format surface via
flink-protobuf. Cost model: Arrow-batched mapInPandas slow path — on a
real cluster the JVM protobuf deserializer takes over without touching
the plan shape (`proto_roundtrip` keeps the stage boundaries).
"""

from __future__ import annotations

import struct
from typing import Iterator

WIRE_VARINT = 0
WIRE_FIXED64 = 1
WIRE_LEN = 2
WIRE_FIXED32 = 5

_WIRE_OF = {"uint": WIRE_VARINT, "sint": WIRE_VARINT, "bool": WIRE_VARINT,
            "string": WIRE_LEN, "bytes": WIRE_LEN, "packed": WIRE_LEN,
            "double": WIRE_FIXED64, "float": WIRE_FIXED32}


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_varint(out: bytearray, n: int) -> None:
    if n < 0:
        n &= (1 << 64) - 1          # proto: negatives as 10-byte two's-c
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            if shift >= 64:
                raise ValueError("varint longer than 64 bits")
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint longer than 10 bytes")


def encode_message(values: dict, spec: dict) -> bytes:
    """Encode {name: value} per `spec`, fields in ascending field
    number (the canonical deterministic order); None values are simply
    absent (proto3 field presence)."""
    out = bytearray()
    for field_no in sorted(spec):
        name, kind = spec[field_no]
        v = values.get(name)
        if v is None:
            continue
        if isinstance(kind, tuple):          # nested message
            body = encode_message(v, kind[0])
            write_varint(out, (field_no << 3) | WIRE_LEN)
            write_varint(out, len(body))
            out += body
            continue
        wire = _WIRE_OF[kind]
        write_varint(out, (field_no << 3) | wire)
        if kind == "uint" or kind == "bool":
            write_varint(out, int(v))
        elif kind == "sint":
            write_varint(out, _zigzag(int(v)))
        elif kind == "string":
            b = str(v).encode("utf-8")
            write_varint(out, len(b))
            out += b
        elif kind == "bytes":
            write_varint(out, len(v))
            out += bytes(v)
        elif kind == "packed":
            body = bytearray()
            for item in v:
                write_varint(body, int(item))
            write_varint(out, len(body))
            out += body
        elif kind == "double":
            out += struct.pack("<d", float(v))
        elif kind == "float":
            out += struct.pack("<f", float(v))
        else:
            raise ValueError(f"unknown kind {kind!r}")
    return bytes(out)


def _skip_unknown(buf: bytes, pos: int, wire: int) -> int:
    """Skip a field the schema doesn't know, BY WIRE TYPE — the
    schema-evolution behavior real consumers depend on."""
    if wire == WIRE_VARINT:
        _, pos = read_varint(buf, pos)
        return pos
    if wire == WIRE_FIXED64:
        if pos + 8 > len(buf):
            raise ValueError("truncated fixed64")
        return pos + 8
    if wire == WIRE_FIXED32:
        if pos + 4 > len(buf):
            raise ValueError("truncated fixed32")
        return pos + 4
    if wire == WIRE_LEN:
        ln, pos = read_varint(buf, pos)
        if pos + ln > len(buf):
            raise ValueError("truncated length-delimited field")
        return pos + ln
    raise ValueError(f"unsupported wire type {wire}")


def decode_message(buf: bytes, spec: dict) -> dict:
    """{name: value} per `spec` (missing → None); unknown fields are
    skipped by wire type; scalar re-occurrence is last-wins (proto3).
    A known field arriving with the WRONG wire type raises — silent
    misinterpretation is worse than a loud error."""
    values: dict = {name: None
                    for name, _k in (v for v in spec.values())}
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = read_varint(buf, pos)
        field_no, wire = tag >> 3, tag & 0x07
        if field_no == 0:
            raise ValueError("field number 0 is illegal")
        if field_no not in spec:
            pos = _skip_unknown(buf, pos, wire)
            continue
        name, kind = spec[field_no]
        expected = WIRE_LEN if isinstance(kind, tuple) else _WIRE_OF[kind]
        if wire != expected:
            raise ValueError(
                f"field {field_no} ({name}): wire type {wire}, "
                f"expected {expected}")
        if isinstance(kind, tuple):
            ln, pos = read_varint(buf, pos)
            if pos + ln > n:
                raise ValueError("truncated nested message")
            values[name] = decode_message(buf[pos:pos + ln], kind[0])
            pos += ln
        elif kind in ("uint", "bool"):
            v, pos = read_varint(buf, pos)
            values[name] = bool(v) if kind == "bool" else v
        elif kind == "sint":
            v, pos = read_varint(buf, pos)
            values[name] = _unzigzag(v)
        elif kind in ("string", "bytes"):
            ln, pos = read_varint(buf, pos)
            if pos + ln > n:
                raise ValueError("truncated length-delimited field")
            raw = buf[pos:pos + ln]
            pos += ln
            values[name] = raw.decode("utf-8") if kind == "string" \
                else raw
        elif kind == "packed":
            ln, pos = read_varint(buf, pos)
            if pos + ln > n:
                raise ValueError("truncated packed field")
            end = pos + ln
            items = []
            while pos < end:
                v, pos = read_varint(buf, pos)
                items.append(v)
            if pos != end:
                raise ValueError("packed field overran its length")
            values[name] = items
        elif kind == "double":
            if pos + 8 > n:
                raise ValueError("truncated fixed64")
            (values[name],) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif kind == "float":
            if pos + 4 > n:
                raise ValueError("truncated fixed32")
            (values[name],) = struct.unpack_from("<f", buf, pos)
            pos += 4
    return values


# ------------------------------------------------------- the Spark stage

#: The orders message: scalar fields + a nested `meta` message, field
#: numbers deliberately non-contiguous (schema evolution leaves holes).
ORDERS_SPEC = {
    1: ("o_orderkey", "uint"),
    2: ("o_custkey", "sint"),
    4: ("o_orderstatus", "string"),
    5: ("o_totalprice", "double"),
    9: ("meta", ({1: ("o_orderpriority", "string")},)),
}


def proto_roundtrip(df, spark_schema_ddl: str =
                    ("o_orderkey bigint, o_custkey bigint, "
                     "o_orderstatus string, o_totalprice double, "
                     "o_orderpriority string")):
    """Protobuf encode→decode roundtrip over the orders columns: each
    row becomes a real wire-format message (varint / zigzag / UTF-8
    length-delimited / IEEE fixed64 / nested message) PLUS two unknown
    fields injected after encoding — a varint (field 90) and a
    length-delimited blob (field 91) — which the decoder must skip by
    wire type, proving the schema-evolution contract. Identity on the
    projected columns is the oracle. One Arrow-batched mapInPandas
    stage, no shuffle."""
    import pandas as pd

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"]

    def kernel(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                values = dict(zip(cols, row))
                msg = dict(values)
                msg["meta"] = {
                    "o_orderpriority": msg.pop("o_orderpriority")}
                buf = bytearray(encode_message(msg, ORDERS_SPEC))
                # unknown fields a v2 producer might add
                write_varint(buf, (90 << 3) | WIRE_VARINT)
                write_varint(buf, int(values["o_orderkey"]) % 7)
                write_varint(buf, (91 << 3) | WIRE_LEN)
                write_varint(buf, 3)
                buf += b"xyz"
                dec = decode_message(bytes(buf), ORDERS_SPEC)
                meta = dec.pop("meta") or {}
                dec["o_orderpriority"] = meta.get("o_orderpriority")
                out.append(tuple(dec[c] for c in cols))
            yield pd.DataFrame(out, columns=cols)

    return df.select(*cols).mapInPandas(kernel, schema=spark_schema_ddl)
