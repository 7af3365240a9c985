"""Protobuf wire-format codec (functions/proto_codec) + the Spark
roundtrip stage (oracle twin: `proto_roundtrip_orders`). Golden wire
bytes pinned from the public protobuf encoding documentation.
"""

import math
import struct

import pytest
from hypothesis import given, settings, strategies as st

from felixzh_flink_spark.functions.proto_codec import (
    WIRE_LEN,
    WIRE_VARINT,
    decode_message,
    encode_message,
    read_varint,
    write_varint,
)


def test_golden_wire_bytes_from_the_spec():
    """The encoding doc's own examples: field 1 varint 150 encodes as
    08 96 01; field 2 string "testing" as 12 07 74...67; zigzag
    0,-1,1,-2,2 → 0,1,2,3,4."""
    assert encode_message({"a": 150}, {1: ("a", "uint")}) == \
        b"\x08\x96\x01"
    assert encode_message({"b": "testing"}, {2: ("b", "string")}) == \
        b"\x12\x07testing"
    zz = {1: ("v", "sint")}
    for plain, coded in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4),
                         (2147483647, 4294967294),
                         (-2147483648, 4294967295)]:
        out = bytearray()
        write_varint(out, (1 << 3) | WIRE_VARINT)
        write_varint(out, coded)
        assert encode_message({"v": plain}, zz) == bytes(out)
        assert decode_message(bytes(out), zz)["v"] == plain


def test_varint_edges():
    out = bytearray()
    write_varint(out, (1 << 64) - 1)
    v, pos = read_varint(bytes(out), 0)
    assert v == (1 << 64) - 1 and pos == 10
    with pytest.raises(ValueError):
        read_varint(b"\xff" * 11, 0)           # > 10 bytes
    with pytest.raises(ValueError):
        read_varint(b"\x80", 0)                 # truncated


def test_nested_packed_double_roundtrip():
    spec = {1: ("d", "double"), 2: ("p", "packed"),
            3: ("m", ({5: ("inner", "string")},)), 7: ("f", "float")}
    msg = {"d": -math.pi, "p": [0, 1, 127, 128, 300], "f": 0.5,
           "m": {"inner": "héllo wörld"}}
    dec = decode_message(encode_message(msg, spec), spec)
    assert struct.pack("<d", dec["d"]) == struct.pack("<d", -math.pi)
    assert dec["p"] == [0, 1, 127, 128, 300]
    assert dec["m"] == {"inner": "héllo wörld"}
    assert dec["f"] == 0.5


def test_unknown_fields_skipped_by_wire_type():
    spec = {1: ("a", "uint")}
    buf = bytearray(encode_message({"a": 9}, spec))
    write_varint(buf, (50 << 3) | WIRE_VARINT)   # unknown varint
    write_varint(buf, 999999)
    write_varint(buf, (51 << 3) | WIRE_LEN)      # unknown blob
    write_varint(buf, 4)
    buf += b"junk"
    write_varint(buf, (52 << 3) | 1)             # unknown fixed64
    buf += struct.pack("<d", 2.5)
    write_varint(buf, (53 << 3) | 5)             # unknown fixed32
    buf += struct.pack("<f", 1.5)
    assert decode_message(bytes(buf), spec) == {"a": 9}


def test_last_wins_and_missing_is_none():
    spec = {1: ("a", "uint"), 2: ("b", "string")}
    buf = encode_message({"a": 1}, spec) + encode_message({"a": 2}, spec)
    dec = decode_message(buf, spec)
    assert dec == {"a": 2, "b": None}


def test_errors_are_loud():
    spec = {1: ("a", "uint"), 2: ("s", "string")}
    with pytest.raises(ValueError):              # wrong wire type
        decode_message(b"\x09" + b"\x00" * 8, spec)
    with pytest.raises(ValueError):              # truncated string
        decode_message(b"\x12\x05ab", spec)
    with pytest.raises(ValueError):              # field number 0
        decode_message(b"\x00\x01", spec)
    with pytest.raises(ValueError):              # truncated unknown
        decode_message(b"\x1a\x08ab", {1: ("a", "uint")})


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**63 - 1), st.integers(-2**62, 2**62),
       st.text(max_size=20), st.floats(allow_nan=False))
def test_roundtrip_property(u, s, txt, d):
    spec = {1: ("u", "uint"), 3: ("s", "sint"), 4: ("t", "string"),
            9: ("d", "double")}
    dec = decode_message(
        encode_message({"u": u, "s": s, "t": txt, "d": d}, spec), spec)
    assert dec["u"] == u and dec["s"] == s and dec["t"] == txt
    assert struct.pack("<d", dec["d"]) == struct.pack("<d", d)


def test_proto_roundtrip_spark_stage(spark):
    from felixzh_flink_spark.functions.proto_codec import proto_roundtrip

    rows = [(1, -10, "O", 123.456, "1-URGENT"),
            (2, 20, "F", -0.25, "5-LOW")]
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
              " o_totalprice double, o_orderpriority string")
    got = sorted(tuple(r) for r in proto_roundtrip(df).collect())
    assert got == sorted(rows)
