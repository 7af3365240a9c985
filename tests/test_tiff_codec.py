"""Baseline-RGB TIFF codec (functions/tiff_codec) + Spark stage — the
directory-walk format: IFD entries in either byte order, inline-vs-
offset tag values, multi-strip reassembly, genuine PackBits RLE
(oracle twin: the `tiff_decode_stats` registry query).
"""

import struct

import pytest
from hypothesis import given, settings, strategies as st

from felixzh_flink_spark.functions.tiff_codec import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
)


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("compression", [1, 32773])
@pytest.mark.parametrize("rps", [None, 1, 2, 3])
def test_roundtrip_matrix(big_endian, compression, rps):
    w, h = 4, 5
    rgb = bytes((i * 7 + 13) % 256 for i in range(3 * w * h))
    pay = encode_tiff(w, h, rgb, big_endian=big_endian,
                      compression=compression, rows_per_strip=rps)
    assert decode_tiff(pay) == (w, h, rgb)


def test_byte_order_is_really_in_the_file():
    """The same image in II and MM differs in the file, and each mark
    matches its header; a decoder hard-wired to one endianness would
    mis-read every count and offset of the other."""
    rgb = bytes(range(36))
    le = encode_tiff(3, 4, rgb, big_endian=False)
    be = encode_tiff(3, 4, rgb, big_endian=True)
    assert le[:4] == b"II*\x00" and be[:4] == b"MM\x00*"
    assert le != be
    assert decode_tiff(le) == decode_tiff(be) == (3, 4, rgb)
    # width is stored as a LONG in the IFD; find it only in the right
    # byte order (3 as >I appears in the BE file where the LE file has
    # 3 as <I)
    assert struct.pack(">I", 3) in be


def test_inline_short_is_left_justified():
    """The BE trap: a count-1 SHORT lives in the FIRST two bytes of
    the 4-byte value field. Craft the compression entry by hand and
    check the decoder reads the correct half."""
    pay = bytearray(encode_tiff(2, 2, bytes(12), big_endian=True))
    # corrupt: move the photometric SHORT to the wrong half -> the
    # decoder must now see photometric==0 and reject RGB decoding
    (ifd_off,) = struct.unpack(">I", pay[4:8])
    (n,) = struct.unpack_from(">H", pay, ifd_off)
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(">HHI", pay, base)
        if tag == 262:                      # PhotometricInterpretation
            assert pay[base + 8:base + 12] == struct.pack(">HH", 2, 0)
            pay[base + 8:base + 12] = struct.pack(">HH", 0, 2)
    with pytest.raises(ValueError):
        decode_tiff(bytes(pay))


def test_strip_order_matters():
    """Swapping two strip offsets must change the decoded stream —
    i.e. the decoder honors StripOffsets order rather than file
    order."""
    w, h = 2, 4
    rgb = bytes(range(24))
    pay = bytearray(encode_tiff(w, h, rgb, rows_per_strip=2))
    (ifd_off,) = struct.unpack("<I", pay[4:8])
    (n,) = struct.unpack_from("<H", pay, ifd_off)
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from("<HHI", pay, base)
        if tag == 273:                      # StripOffsets array
            assert cnt == 2
            (arr,) = struct.unpack_from("<I", pay, base + 8)
            a, b = struct.unpack_from("<II", pay, arr)
            struct.pack_into("<II", pay, arr, b, a)
    _, _, swapped = decode_tiff(bytes(pay))
    assert swapped == rgb[12:] + rgb[:12]


def test_packbits_runs_literals_and_noop():
    data = b"\x05" * 10 + b"\x01\x02\x03" + b"\x07" * 300 + bytes(range(200))
    enc = packbits_encode(data)
    assert len(enc) < len(data)             # the runs genuinely compress
    assert packbits_decode(enc, len(data)) == data
    assert packbits_decode(b"\x80" + enc, len(data)) == data  # 0x80 noop
    with pytest.raises(ValueError):
        packbits_decode(enc, len(data) - 1)  # overrun
    with pytest.raises(ValueError):
        packbits_decode(enc, len(data) + 1)  # underrun
    with pytest.raises(ValueError):
        packbits_decode(enc[:-1], len(data))  # truncated


def test_rejects_unsupported_and_truncated():
    rgb = bytes(range(12))
    pay = encode_tiff(2, 2, rgb)
    with pytest.raises(ValueError):
        decode_tiff(pay[:6])
    with pytest.raises(ValueError):
        decode_tiff(b"XX" + pay[2:])
    bad = bytearray(pay)
    struct.pack_into("<H", bad, 2, 43)       # magic != 42
    with pytest.raises(ValueError):
        decode_tiff(bytes(bad))
    bad = bytearray(pay)
    (ifd_off,) = struct.unpack("<I", bad[4:8])
    (n,) = struct.unpack_from("<H", bad, ifd_off)
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag = struct.unpack_from("<H", bad, base)[0]
        if tag == 259:                       # Compression -> LZW (5)
            struct.pack_into("<H", bad, base + 8, 5)
    with pytest.raises(ValueError):
        decode_tiff(bytes(bad))
    with pytest.raises(ValueError):          # encoder envelope
        encode_tiff(2, 2, rgb, compression=5)
    with pytest.raises(ValueError):
        encode_tiff(2, 2, bytes(11))


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 6), st.integers(1, 6), st.integers(0, 10_000),
       st.booleans(), st.sampled_from([1, 32773]), st.integers(1, 4))
def test_roundtrip_property(w, h, seed, big_endian, compression, rps):
    rgb = bytes((seed * 31 + 7 * (k // 3)) % 256 for k in range(3 * w * h))
    pay = encode_tiff(w, h, rgb, big_endian=big_endian,
                      compression=compression, rows_per_strip=rps)
    assert decode_tiff(pay) == (w, h, rgb)


def test_tiff_pixel_stats_and_mixed_dispatch(spark):
    """Spark e2e: the fixture recipe decodes back to the oracle's
    closed form, and TIFF payloads route through the mixed-media
    feature kernel's magic-byte dispatch (both endiannesses)."""
    from felixzh_flink_spark.operators import multimodal as MM

    ids = list(range(12))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: (r.width, r.height, r.r_sum, r.pixel_wsum)
           for r in MM.tiff_pixel_stats(
               MM.synthesize_tiff_column(df)).collect()}
    for i in ids:
        w, h = i % 5 + 1, i % 4 + 2
        if i % 3 == 0:
            rgb = bytes((i * 31 + 7 * (k // 5)) % 256
                        for k in range(3 * w * h))
        else:
            rgb = bytes((i * 31 + 7 * k) % 256 for k in range(3 * w * h))
        assert got[i] == (w, h, sum(rgb[0::3]),
                          sum((k + 1) * b for k, b in enumerate(rgb)))
    media = spark.createDataFrame(
        [(1, bytearray(encode_tiff(2, 2, bytes(range(12))))),
         (2, bytearray(encode_tiff(2, 2, bytes(range(12)),
                                   big_endian=True)))],
        "doc_id long, media binary")
    rows = {r.doc_id: r for r in MM.image_feature_stats(media).collect()}
    assert rows[1].fmt == "tiff" and rows[2].fmt == "tiff"
    assert rows[1].mean_rgb == rows[2].mean_rgb
    assert rows[1].channels == 3
