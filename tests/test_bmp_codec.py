"""24-bit BMP codec (functions/bmp_codec) + Spark stage — the format
whose traps are all layout: bottom-up rows, BGR order, 4-byte padding.
"""

import struct

import pytest
from hypothesis import given, settings, strategies as st

from felixzh_flink_spark.functions.bmp_codec import decode_bmp, encode_bmp


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (4, 5), (5, 3), (7, 2)])
def test_roundtrip_including_row_padding(w, h):
    rgb = bytes((i * 7 + 13) % 256 for i in range(3 * w * h))
    assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)


def test_bottom_up_and_bgr_are_really_in_the_file():
    """Byte-level check that the ENCODED file is bottom-up BGR — so the
    round-trip can't pass with two cancelling no-ops."""
    rgb = bytes([1, 2, 3, 4, 5, 6,      # row 0: (1,2,3) (4,5,6)
                 7, 8, 9, 10, 11, 12])  # row 1: (7,8,9) (10,11,12)
    pay = encode_bmp(2, 2, rgb)
    (data_at,) = struct.unpack("<I", pay[10:14])
    stride = 8                           # 6 bytes + 2 pad
    first_stored = pay[data_at:data_at + 6]
    assert first_stored == bytes([9, 8, 7, 12, 11, 10])   # row 1, BGR
    assert pay[data_at + 6:data_at + 8] == b"\x00\x00"    # padding
    assert pay[data_at + stride:data_at + stride + 6] == \
        bytes([3, 2, 1, 6, 5, 4])


def test_rejects_unsupported_and_truncated():
    pay = encode_bmp(3, 2, bytes(18))
    with pytest.raises(ValueError):
        decode_bmp(pay[2:])                                 # signature
    with pytest.raises(ValueError):
        decode_bmp(pay[:-4])                                # truncated
    with pytest.raises(ValueError):
        decode_bmp(pay.replace(struct.pack("<H", 24),
                               struct.pack("<H", 8), 1))    # 8-bit
    bad = bytearray(pay)
    struct.pack_into("<I", bad, 30, 1)                      # BI_RLE8
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad))
    with pytest.raises(ValueError):
        encode_bmp(2, 2, bytes(11))                         # wrong length


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 8), st.integers(1, 6), st.integers(0, 2 ** 31))
def test_roundtrip_property(w, h, seed):
    rgb = bytes((seed * 31 + 7 * k) % 256 for k in range(3 * w * h))
    assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)


def test_bmp_pixel_stats_and_mixed_dispatch(spark):
    """Spark e2e vs driver recompute; corrupt quarantine; and the
    magic-byte dispatch in image_feature_stats recognizes BMP."""
    import pandas as pd
    from pyspark.sql import functions as F

    from felixzh_flink_spark.operators import multimodal as MM
    from felixzh_flink_spark.operators.multimodal import _bmp_payload

    df = spark.range(0, 25).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r for r in
           MM.bmp_pixel_stats(MM.synthesize_bmp_column(df)).collect()}
    for i in range(25):
        w, h, rgb = decode_bmp(_bmp_payload(i))
        r = got[i]
        assert (r["width"], r["height"]) == (w, h)
        assert (r["r_sum"], r["g_sum"], r["b_sum"]) == \
            (sum(rgb[0::3]), sum(rgb[1::3]), sum(rgb[2::3]))
        assert r["pixel_wsum"] == sum((k + 1) * b
                                      for k, b in enumerate(rgb))

    corrupt = MM.synthesize_bmp_column(df.limit(3)).withColumn(
        "bmp", F.expr("CASE WHEN doc_id = 1 THEN CAST('x' AS BINARY) "
                      "ELSE bmp END"))
    rows = {r["doc_id"]: r for r in MM.bmp_pixel_stats(corrupt).collect()}
    assert rows[1]["r_sum"] is None and rows[0]["r_sum"] is not None

    media = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [0], "media": [_bmp_payload(5)]}))
    feat = MM.image_feature_stats(media).collect()[0]
    w, h, rgb = decode_bmp(_bmp_payload(5))
    n = w * h
    lum = [rgb[3 * j] + rgb[3 * j + 1] + rgb[3 * j + 2] for j in range(n)]
    ls, lq = sum(lum), sum(v * v for v in lum)
    assert feat["fmt"] == "bmp" and feat["channels"] == 3
    assert feat["mean_rgb"] == ls / (3.0 * n)
    assert feat["var_lum"] == (float(lq) - float(ls) * ls / n) / n
