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


# ---------------------------------------------------------------- color path

from felixzh_flink_spark.functions.jpeg_codec import (  # noqa: E402
    decode_jpeg,
    decode_jpeg_color,
    encode_jpeg_color,
    rgb_to_ycbcr_planes,
)


def _color_fixture(i):
    """The synthesize_jpeg_color_column recipe, driver-side."""
    s = 8 if i % 2 == 0 else 16
    nt = i % 3 + 1
    w, h = s * nt, s
    yv = [(i * 31 + 17 * t) % 256 for t in range(nt)]
    cbv = [(i * 47 + 29 * t) % 256 for t in range(nt)]
    crv = [(i * 59 + 43 * t) % 256 for t in range(nt)]
    y = bytes(yv[x // s] for _ in range(h) for x in range(w))
    if s == 8:
        cb = bytes(cbv[x // s] for _ in range(h) for x in range(w))
        cr = bytes(crv[x // s] for _ in range(h) for x in range(w))
        sub = "4:4:4"
    else:
        cw, chh = w // 2, h // 2
        cb = bytes(cbv[x // 8] for _ in range(chh) for x in range(cw))
        cr = bytes(crv[x // 8] for _ in range(chh) for x in range(cw))
        sub = "4:2:0"
    return w, h, y, cb, cr, sub, (yv, cbv, crv), s


def _expected_rgb(w, h, s, tiles):
    import numpy as np
    yv, cbv, crv = tiles
    out = bytearray()
    for _ in range(h):
        for x in range(w):
            t = x // s
            Y, Cb, Cr = float(yv[t]), float(cbv[t]), float(crv[t])
            r = np.floor((Y + 1.402 * (Cr - 128.0)) + 0.5)
            g = np.floor(((Y - 0.344136 * (Cb - 128.0))
                          - 0.714136 * (Cr - 128.0)) + 0.5)
            b = np.floor((Y + 1.772 * (Cb - 128.0)) + 0.5)
            out += bytes(int(min(255.0, max(0.0, v))) for v in (r, g, b))
    return bytes(out)


@pytest.mark.parametrize("i", [0, 1, 2, 3, 4, 5, 10, 15])
def test_color_flat_tiles_decode_to_exact_rgb(i):
    """Flat YCbCr tiles survive DCT+quantization bit-exactly in BOTH
    samplings, and the RGB conversion matches the closed form the SQL
    oracle replays."""
    w, h, y, cb, cr, sub, tiles, s = _color_fixture(i)
    pay = encode_jpeg_color(w, h, y, cb, cr, sub,
                            restart_interval=2 if i % 5 == 0 else 0)
    dw, dh, rgb = decode_jpeg_color(pay)
    assert (dw, dh) == (w, h)
    assert rgb == _expected_rgb(w, h, s, tiles)


def test_color_restart_markers_reset_all_predictors():
    w, h, y, cb, cr, sub, tiles, s = _color_fixture(15)  # 4:2:0 case
    plain = decode_jpeg_color(encode_jpeg_color(w, h, y, cb, cr, sub))
    rst = decode_jpeg_color(
        encode_jpeg_color(w, h, y, cb, cr, sub, restart_interval=1))
    assert plain == rst


def test_color_odd_dims_crop_back_exactly():
    """Dims that are no multiple of the MCU size pad with edge
    replication and crop back; a single flat color stays exact through
    subsampling and upsampling."""
    w, h = 19, 13
    y = bytes([77]) * (w * h)
    cw, chh = (w + 1) // 2, (h + 1) // 2
    cb = bytes([90]) * (cw * chh)
    cr = bytes([160]) * (cw * chh)
    dw, dh, rgb = decode_jpeg_color(
        encode_jpeg_color(w, h, y, cb, cr, "4:2:0"))
    assert (dw, dh) == (w, h)
    assert rgb == _expected_rgb(w, h, w, ([77], [90], [160]))


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
def test_color_smooth_content_within_tolerance(sub):
    """The real lossy path on non-flat content: encode from RGB via
    rgb_to_ycbcr_planes, decode, and bound the error. 4:2:0 adds
    chroma-subsampling loss on chroma gradients, hence the wider
    bound."""
    import numpy as np
    w, h = 37, 23
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack([(xx * 5) % 256, (yy * 7) % 256, ((xx + yy) * 3) % 256],
                   -1).astype(np.uint8).tobytes()
    yb, cbb, crb = rgb_to_ycbcr_planes(w, h, rgb, sub)
    dw, dh, out = decode_jpeg_color(encode_jpeg_color(w, h, yb, cbb, crb,
                                                      sub))
    assert (dw, dh) == (w, h)
    a = np.frombuffer(rgb, np.uint8).astype(int)
    b = np.frombuffer(out, np.uint8).astype(int)
    assert np.abs(a - b).mean() < 4.0


def test_color_envelope_and_dispatch():
    w, h, y, cb, cr, sub, _, _ = _color_fixture(1)
    color = encode_jpeg_color(w, h, y, cb, cr, sub)
    gray = encode_jpeg_gray(8, 8, bytes(64))
    with pytest.raises(ValueError):
        decode_jpeg_gray(color)                     # 3 comps → gray decoder
    with pytest.raises(ValueError):
        decode_jpeg_color(gray)                     # 1 comp → color decoder
    assert decode_jpeg(gray)[:3] == (8, 8, 1)
    gw, gh, ch, px = decode_jpeg(color)
    assert (gw, gh, ch) == (w, h, 3) and len(px) == 3 * w * h
    with pytest.raises(ValueError):
        decode_jpeg_color(color[:-6])               # truncated entropy data
    with pytest.raises(ValueError):
        encode_jpeg_color(8, 8, bytes(64), bytes(64), bytes(63), "4:4:4")


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2 ** 31), st.integers(0, 3))
def test_color_flat_tile_roundtrip_property(seed, rst):
    w, h, y, cb, cr, sub, tiles, s = _color_fixture(seed)
    pay = encode_jpeg_color(w, h, y, cb, cr, sub, restart_interval=rst)
    assert decode_jpeg_color(pay)[2] == _expected_rgb(w, h, s, tiles)


def test_jpeg_color_stats_decodes_real_bytes(spark):
    """End-to-end through Spark: synthesize real color JPEGs, decode in
    the Arrow-batched kernel, check stats against a driver-side
    recompute; corrupt payloads land as null-stats quarantine rows."""
    from pyspark.sql import functions as F

    from felixzh_flink_spark.operators import multimodal as MM

    df = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r for r in
           MM.jpeg_color_stats(
               MM.synthesize_jpeg_color_column(df)).collect()}
    assert len(got) == 30
    for i in range(30):
        w, h, y, cb, cr, sub, tiles, s = _color_fixture(i)
        rgb = _expected_rgb(w, h, s, tiles)
        px = list(rgb)
        r = got[i]
        assert (r["width"], r["height"]) == (w, h)
        assert r["r_sum"] == sum(px[0::3])
        assert r["g_sum"] == sum(px[1::3])
        assert r["b_sum"] == sum(px[2::3])
        assert r["rgb_wsum"] == sum(
            (j + 1) * (px[3 * j] + px[3 * j + 1] + px[3 * j + 2])
            for j in range(w * h))

    corrupt = MM.synthesize_jpeg_color_column(df.limit(3)).withColumn(
        "jpeg", F.expr("CASE WHEN doc_id = 1 THEN CAST('bad' AS BINARY) "
                       "ELSE jpeg END"))
    rows = {r["doc_id"]: r for r in MM.jpeg_color_stats(corrupt).collect()}
    assert rows[1]["r_sum"] is None and rows[0]["r_sum"] is not None


def test_dispatch_rejects_truncated_sof0_with_value_error():
    """decode_jpeg's SOF0 peek must keep the module's ValueError
    contract on payloads cut inside the segment (not IndexError)."""
    enc = encode_jpeg_gray(8, 8, bytes(64))
    at = enc.index(b"\xff\xc0")
    with pytest.raises(ValueError):
        decode_jpeg(enc[:at + 6])


def test_truncated_dqt_and_dht_raise_value_error():
    """Segment bodies shorter than their declared tables must raise the
    documented ValueError, not IndexError later."""
    import struct as _s
    enc = encode_jpeg_gray(8, 8, bytes(64))
    # shrink the DQT segment: keep marker, declare a 10-byte body
    at = enc.index(b"\xff\xdb")
    (ln,) = _s.unpack(">H", enc[at + 2:at + 4])
    cut = enc[:at + 2] + _s.pack(">H", 12) + enc[at + 4:at + 14] \
        + enc[at + 2 + ln:]
    with pytest.raises(ValueError):
        decode_jpeg_gray(cut)
    # shrink a DHT segment below its declared value count
    at = enc.index(b"\xff\xc4")
    (ln,) = _s.unpack(">H", enc[at + 2:at + 4])
    cut = enc[:at + 2] + _s.pack(">H", 10) + enc[at + 4:at + 12] \
        + enc[at + 2 + ln:]
    with pytest.raises(ValueError):
        decode_jpeg_gray(cut)
