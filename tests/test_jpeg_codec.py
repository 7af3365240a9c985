"""Baseline-JPEG grayscale codec (functions/jpeg_codec) + Spark stage.

Closes the last honest image-decode stub: real Huffman entropy coding
(magnitude categories, ZRL/EOB, byte stuffing, restart markers) and a
real DCT round-trip. Flat 8×8 tiles under the all-8s quantizer are
bit-lossless (DC-only blocks quantize exactly), which is what lets the
`jpeg_decode_stats` oracle predict decoded pixels in SQL; non-flat
content round-trips within quantization error.
"""

import pytest
from hypothesis import given, settings, strategies as st

from felixzh_flink_spark.functions.jpeg_codec import (decode_jpeg_gray,
                                                      encode_jpeg_gray)


def _flat_tiles(w, h, seed):
    return bytes((seed * 31 + 17 * ((y // 8) * ((w + 7) // 8) + x // 8))
                 % 256 for y in range(h) for x in range(w))


@pytest.mark.parametrize("w,h", [(8, 8), (16, 8), (24, 16), (8, 16)])
def test_flat_tiles_roundtrip_losslessly(w, h):
    px = _flat_tiles(w, h, 7)
    assert decode_jpeg_gray(encode_jpeg_gray(w, h, px)) == (w, h, px)


def test_non_multiple_of_8_dims_crop_back():
    """Edge-replicate MCU padding must be cropped off on decode; a flat
    image stays exact even at odd dims."""
    w, h = 11, 5
    px = bytes(42 for _ in range(w * h))
    assert decode_jpeg_gray(encode_jpeg_gray(w, h, px)) == (w, h, px)


def test_gradient_within_quantization_error():
    """Non-flat content exercises AC coefficients, ZRL runs and
    multi-bit magnitudes; with the all-8s table the reconstruction
    error stays within a few levels."""
    w, h = 24, 16
    px = bytes((x * 7 + y * 11) % 256 for y in range(h) for x in range(w))
    dw, dh, dec = decode_jpeg_gray(encode_jpeg_gray(w, h, px))
    assert (dw, dh) == (w, h)
    assert max(abs(a - b) for a, b in zip(px, dec)) <= 8


def test_restart_markers_reset_predictor():
    w, h = 24, 16
    px = _flat_tiles(w, h, 3)
    plain = decode_jpeg_gray(encode_jpeg_gray(w, h, px))
    with_rst = decode_jpeg_gray(encode_jpeg_gray(w, h, px,
                                                 restart_interval=2))
    assert plain == with_rst == (w, h, px)


def test_byte_stuffing_survives():
    """A payload engineered to emit 0xFF bytes in the entropy stream
    must round-trip through the 0xFF00 stuffing."""
    w, h = 16, 16
    px = bytes((251 * i * i + 13 * i) % 256 for i in range(w * h))
    dw, dh, dec = decode_jpeg_gray(encode_jpeg_gray(w, h, px))
    assert (dw, dh) == (w, h) and len(dec) == w * h


def test_dims_visible_to_independent_header_parser():
    """Two independent readers of the same bytes: the multimodal
    header-walk parser must agree with the encoder."""
    from felixzh_flink_spark.operators.multimodal import parse_jpeg_dims
    enc = encode_jpeg_gray(16, 8, _flat_tiles(16, 8, 1))
    assert parse_jpeg_dims(enc) == (16, 8)


@pytest.mark.parametrize("mutate", [
    lambda b: b[2:],                               # missing SOI
    lambda b: b[:30],                              # truncated segments
    lambda b: b.replace(b"\xff\xc0", b"\xff\xc2", 1),  # progressive SOF2
    lambda b: b[:-8],                              # truncated entropy data
])
def test_rejects_corrupt_or_unsupported(mutate):
    enc = encode_jpeg_gray(8, 8, bytes(64))
    with pytest.raises(ValueError):
        decode_jpeg_gray(mutate(enc))


def test_encoder_validates_inputs():
    with pytest.raises(ValueError):
        encode_jpeg_gray(8, 8, bytes(63))           # wrong length
    with pytest.raises(ValueError):
        encode_jpeg_gray(8, 8, bytes(64), qtable=[0] * 64)  # q out of range


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 4), st.integers(1, 3), st.integers(0, 2 ** 31),
       st.integers(0, 3))
def test_flat_tile_roundtrip_property(tw, th, seed, rst):
    w, h = tw * 8, th * 8
    px = _flat_tiles(w, h, seed)
    assert decode_jpeg_gray(
        encode_jpeg_gray(w, h, px, restart_interval=rst)) == (w, h, px)


def test_jpeg_pixel_stats_decodes_real_bytes(spark):
    """End-to-end through Spark: synthesize real JPEGs, decode in the
    Arrow-batched kernel, check stats against a driver-side recompute;
    corrupt payloads land as null-stats quarantine rows."""
    from pyspark.sql import functions as F

    from felixzh_flink_spark.operators import multimodal as MM

    df = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r for r in
           MM.jpeg_pixel_stats(MM.synthesize_jpeg_column(df)).collect()}
    assert len(got) == 30
    for i in range(30):
        w, h = (i % 3 + 1) * 8, (i % 2 + 1) * 8
        px = _flat_tiles(w, h, i)
        r = got[i]
        assert (r["width"], r["height"]) == (w, h)
        assert r["pixel_sum"] == sum(px)
        assert r["pixel_wsum"] == sum((j + 1) * b for j, b in enumerate(px))

    corrupt = MM.synthesize_jpeg_column(df.limit(3)).withColumn(
        "jpeg", F.expr("CASE WHEN doc_id = 1 THEN CAST('bad' AS BINARY) "
                       "ELSE jpeg END"))
    rows = {r["doc_id"]: r for r in MM.jpeg_pixel_stats(corrupt).collect()}
    assert rows[1]["pixel_sum"] is None and rows[0]["pixel_sum"] is not None
