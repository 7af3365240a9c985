"""Pure-stdlib PNG codec (functions/png_codec) + the Spark decode stage.

Closes VERDICT-r4 item 9: pixel decode is no longer stubbed for PNG —
encode→decode round-trips real zlib-compressed, filtered scanlines, and
the `multimodal.png_pixel_stats` mapInPandas stage decodes real bytes
end-to-end (its oracle twin is the `png_decode_stats` registry query).
"""

import struct
import zlib

import pytest
from hypothesis import given, settings, strategies as st

from felixzh_flink_spark.functions.png_codec import (
    SIGNATURE, decode_png, encode_png)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_every_channel_filter_combo(channels, filter_type):
    w, h = 5, 4
    px = bytes((i * 37 + 11) % 256 for i in range(w * h * channels))
    out = decode_png(encode_png(w, h, px, channels, filter_type))
    assert out == (w, h, channels, px)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 12), st.integers(1, 9), st.sampled_from([1, 2, 3, 4]),
       st.integers(0, 4), st.integers(0, 2**31 - 1))
def test_roundtrip_property(w, h, ch, ft, seed):
    import random
    rnd = random.Random(seed)
    px = bytes(rnd.randrange(256) for _ in range(w * h * ch))
    assert decode_png(encode_png(w, h, px, ch, ft)) == (w, h, ch, px)


def test_header_agrees_with_expression_parser():
    """The codec's output must satisfy the JVM-side fixed-offset header
    parser (multimodal.png_dims) — one format, two independent readers."""
    enc = encode_png(640, 480, bytes(640 * 480), 1, 0)
    assert enc[:8] == SIGNATURE and enc[12:16] == b"IHDR"
    assert struct.unpack(">II", enc[16:24]) == (640, 480)


def test_idat_split_across_chunks():
    """IDAT may legally be split into multiple chunks; they concatenate
    into one zlib stream."""
    w, h, px = 4, 3, bytes(range(12))
    enc = bytearray(encode_png(w, h, px, 1, 2))
    # locate the single IDAT chunk and split its body in two
    pos = 8
    while bytes(enc[pos + 4:pos + 8]) != b"IDAT":
        (length,) = struct.unpack(">I", enc[pos:pos + 4])
        pos += 12 + length
    (length,) = struct.unpack(">I", enc[pos:pos + 4])
    body = bytes(enc[pos + 8:pos + 8 + length])
    cut = length // 2
    def chunk(tag, b):
        return (struct.pack(">I", len(b)) + tag + b
                + struct.pack(">I", zlib.crc32(tag + b) & 0xFFFFFFFF))
    rebuilt = (bytes(enc[:pos]) + chunk(b"IDAT", body[:cut])
               + chunk(b"IDAT", body[cut:])
               + bytes(enc[pos + 12 + length:]))
    assert decode_png(rebuilt) == (w, h, 1, px)


@pytest.mark.parametrize("mutate", [
    lambda b: b[1:],                               # bad signature
    lambda b: b[:40],                              # truncated
    lambda b: b.replace(b"IHDR", b"XXXX", 1),      # missing IHDR
])
def test_rejects_corrupt_payloads(mutate):
    enc = encode_png(3, 3, bytes(9), 1, 0)
    with pytest.raises(ValueError):
        decode_png(mutate(enc))


def _rechunked_ihdr(enc: bytes, offset: int, byte: bytes) -> bytes:
    """Mutate one IHDR body byte and recompute the chunk CRC, so the
    decoder's semantic validation (not the CRC gate) is what fires."""
    body = bytearray(enc[16:29])          # IHDR body: 13 bytes at 16
    body[offset] = byte[0]
    crc = struct.pack(">I", zlib.crc32(b"IHDR" + bytes(body)) & 0xFFFFFFFF)
    return enc[:16] + bytes(body) + crc + enc[33:]


def test_rejects_unsupported_depth_and_interlace():
    enc = encode_png(3, 3, bytes(9), 1, 0)
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(_rechunked_ihdr(enc, 8, b"\x10"))
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(_rechunked_ihdr(enc, 12, b"\x01"))


def test_rejects_crc_mismatch():
    """A corrupted chunk whose lengths stay consistent must not decode
    to wrong pixels silently (ADVICE r5): every chunk CRC is verified."""
    enc = bytearray(encode_png(3, 3, bytes(range(9)), 1, 1))
    # flip one bit inside the IDAT body without touching length or CRC
    pos = 8
    while bytes(enc[pos + 4:pos + 8]) != b"IDAT":
        (length,) = struct.unpack(">I", enc[pos:pos + 4])
        pos += 12 + length
    enc[pos + 10] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(enc))


def test_png_pixel_stats_decodes_real_bytes(spark):
    """End-to-end through Spark: synthesize real PNGs, decode them in the
    Arrow-batched stage, check sums against the closed-form recipe; a
    corrupt payload yields a null-stats row, not a crashed stage."""
    from pyspark.sql import functions as F

    from felixzh_flink_spark.operators.multimodal import (
        png_pixel_stats, synthesize_png_column)

    ids = spark.range(40).select(F.col("id").alias("doc_id"))
    got = {r["doc_id"]: r for r in
           png_pixel_stats(synthesize_png_column(ids)).collect()}
    for i in range(40):
        w, h, ch = i % 7 + 1, i % 5 + 1, (i % 2) * 2 + 1
        px = [(i * 31 + 7 * j) % 256 for j in range(w * h * ch)]
        r = got[i]
        assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
        assert r["pixel_sum"] == sum(px)
        assert r["pixel_wsum"] == sum((j + 1) * p for j, p in enumerate(px))

    corrupt = spark.createDataFrame(
        [(999, b"not a png")], "doc_id: long, png: binary")
    row = png_pixel_stats(corrupt).collect()[0]
    assert row["doc_id"] == 999 and row["width"] is None \
        and row["pixel_sum"] is None


def test_png_thumbnail_stats_matches_bruteforce(spark):
    """Decode + nearest-neighbor resize against an independent driver-
    side recompute (decode with the same codec, resample with separately
    written index math)."""
    from pyspark.sql import functions as F

    from felixzh_flink_spark.functions.png_codec import decode_png
    from felixzh_flink_spark.operators.multimodal import (
        png_thumbnail_stats, synthesize_png_column)

    ids = spark.range(30).select(F.col("id").alias("doc_id"))
    with_png = synthesize_png_column(ids)
    payloads = {r["doc_id"]: bytes(r["png"]) for r in with_png.collect()}
    got = {r["doc_id"]: r for r in
           png_thumbnail_stats(with_png, 3, 2).collect()}
    for i in range(30):
        w, h, ch, px = decode_png(payloads[i])
        ref = [px[((y * h // 2) * w + (x * w // 3)) * ch + c]
               for y in range(2) for x in range(3) for c in range(ch)]
        r = got[i]
        assert (r["out_w"], r["out_h"], r["channels"]) == (3, 2, ch)
        assert r["thumb_sum"] == sum(ref)
        assert r["thumb_wsum"] == sum((j + 1) * v for j, v in enumerate(ref))
