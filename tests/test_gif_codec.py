"""Pure-stdlib GIF/LZW codec (functions/gif_codec) + the Spark stage.

Closes VERDICT-r5 item 6 ("one more real image codec"): GIF joins PNG
and WAV as a genuinely decoded format — real variable-width LZW with
dictionary growth, reset at 4096 entries, the KwKwK case, sub-block
framing, and 4-pass interlacing, all round-tripped and then verified
end-to-end through `multimodal.gif_pixel_stats` (oracle twin:
`gif_decode_stats`).
"""

import struct

import pytest
from hypothesis import given, settings, strategies as st

from felixzh_flink_spark.functions.gif_codec import (
    _interlace_rows, _lzw_decode, _lzw_encode, decode_gif, encode_gif)


def _palette(n):
    return bytes(v for e in range(n)
                 for v in ((3 * e) % 256, (5 * e + 1) % 256,
                           (7 * e + 2) % 256))


@pytest.mark.parametrize("n_colors", [2, 4, 16, 256])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_palette_sizes(n_colors, interlace):
    w, h = 7, 5
    idx = bytes((i * 13 + 5) % n_colors for i in range(w * h))
    out = decode_gif(encode_gif(w, h, idx, _palette(n_colors),
                                interlace=interlace))
    assert out == (w, h, _palette(n_colors), idx)


def test_lzw_dictionary_reset_at_4096():
    """A noisy 256-color stream long enough to fill the 12-bit code
    space forces the encoder to emit CLEAR and rebuild — the decoder
    must follow."""
    n = 128 * 96
    idx = bytes((i * 197 + (i * i) % 251) % 256 for i in range(n))
    data = _lzw_encode(idx, 8)
    assert _lzw_decode(data, 8, n) == idx
    # and through the full container
    out = decode_gif(encode_gif(128, 96, idx, _palette(256)))
    assert out[3] == idx


def test_lzw_kwkwk_case():
    """aaaa... emits the just-defined code immediately (code ==
    len(table)) — the classic KwKwK special case."""
    idx = b"\x00" * 50
    assert _lzw_decode(_lzw_encode(idx, 2), 2, 50) == idx


def test_interlace_row_order():
    assert _interlace_rows(8) == [0, 4, 2, 6, 1, 3, 5, 7]
    assert _interlace_rows(1) == [0]
    # every row exactly once, any height
    for h in range(1, 30):
        assert sorted(_interlace_rows(h)) == list(range(h))


def test_extension_blocks_are_skipped():
    """GIF89a graphic-control / comment extensions before the image
    descriptor must be walked over."""
    w, h = 3, 2
    idx = bytes(range(6))
    enc = bytearray(encode_gif(w, h, idx, _palette(16)))
    # splice a graphic control extension + comment after the GCT
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    comment = bytes([0x21, 0xFE, 3]) + b"hey" + bytes([0])
    insert_at = 13 + 3 * 16
    spliced = bytes(enc[:insert_at]) + gce + comment + bytes(enc[insert_at:])
    assert decode_gif(spliced) == (w, h, _palette(16), idx)


def test_local_color_table_overrides_global():
    w, h = 2, 2
    idx = bytes([0, 1, 2, 3])
    enc = bytearray(encode_gif(w, h, idx, _palette(4)))
    # flip on the local-color-table flag and insert a different table
    desc_at = 13 + 3 * 4
    assert enc[desc_at] == 0x2C
    packed_at = desc_at + 9
    local = bytes(range(12))
    enc[packed_at] |= 0x81  # LCT present, 4 entries (2^(1+1))
    spliced = bytes(enc[:packed_at + 1]) + local + bytes(enc[packed_at + 1:])
    got = decode_gif(spliced)
    assert got[2] == local and got[3] == idx


@pytest.mark.parametrize("mutate", [
    lambda b: b"JPEG" + b[4:],                     # bad signature
    lambda b: b[:20],                              # truncated
    lambda b: b[:-2],                              # missing trailer+data
    lambda b: b.replace(b"GIF89a", b"GIF99a", 1),  # unknown version
])
def test_rejects_corrupt_payloads(mutate):
    enc = encode_gif(4, 3, bytes(12), _palette(16))
    with pytest.raises(ValueError):
        decode_gif(mutate(enc))


def test_rejects_wrong_pixel_count():
    """An LZW stream that inflates to fewer pixels than the descriptor
    promises must raise, not return a short image."""
    enc = bytearray(encode_gif(4, 3, bytes(12), _palette(16)))
    enc[7] = 9  # claim height 9·4=36 pixels; stream still carries 12
    with pytest.raises(ValueError):
        decode_gif(bytes(enc))


def test_encoder_validates_inputs():
    with pytest.raises(ValueError):
        encode_gif(2, 2, bytes(4), _palette(3))       # non-power-of-two
    with pytest.raises(ValueError):
        encode_gif(2, 2, bytes(3), _palette(4))       # wrong length
    with pytest.raises(ValueError):
        encode_gif(2, 2, bytes([0, 1, 2, 9]), _palette(4))  # idx range


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 20), st.integers(1, 20), st.integers(1, 8),
       st.booleans(), st.integers(0, 2 ** 31))
def test_roundtrip_property(w, h, bits, interlace, seed):
    n = 1 << bits
    idx = bytes((seed * 31 + 7 * j) % n for j in range(w * h))
    out = decode_gif(encode_gif(w, h, idx, _palette(n),
                                interlace=interlace))
    assert out == (w, h, _palette(n), idx)


def test_gif_pixel_stats_decodes_real_bytes(spark):
    """End-to-end through Spark: synthesize real GIFs, decode them in
    the Arrow-batched kernel, and check the stats against a driver-side
    recompute from the closed-form recipe. A corrupt payload lands as a
    null-stats quarantine row, not a crash."""
    from pyspark.sql import functions as F

    from felixzh_flink_spark.operators import multimodal as MM

    df = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    stats = MM.gif_pixel_stats(MM.synthesize_gif_column(df))
    got = {r["doc_id"]: r for r in stats.collect()}
    assert len(got) == 40
    for i in range(40):
        w, h = i % 7 + 1, i % 5 + 1
        ps = 1 << ((i % 3) * 3 + 2)
        idx = [(i * 31 + 7 * j) % ps for j in range(w * h)]
        r = got[i]
        assert (r["width"], r["height"], r["palette_size"]) == (w, h, ps)
        assert r["idx_sum"] == sum(idx)
        assert r["idx_wsum"] == sum((j + 1) * v for j, v in enumerate(idx))
        assert r["rgb_sum"] == sum((3 * e) % 256 + (5 * e + 1) % 256
                                   + (7 * e + 2) % 256 for e in idx)

    corrupt = MM.synthesize_gif_column(df.limit(3)).withColumn(
        "gif", F.expr("CASE WHEN doc_id = 1 THEN CAST('nope' AS BINARY) "
                      "ELSE gif END"))
    rows = {r["doc_id"]: r for r in MM.gif_pixel_stats(corrupt).collect()}
    assert rows[1]["idx_sum"] is None and rows[0]["idx_sum"] is not None


# ------------------------------------------------------------- animation

from felixzh_flink_spark.functions.gif_codec import (  # noqa: E402
    decode_gif_frames,
    encode_gif_animation,
)


def _anim_frames(i, w, h, n, delay):
    return [(delay, bytes((i * 31 + 13 * f + 7 * j) % 4
                          for j in range(w * h))) for f in range(n)]


@pytest.mark.parametrize("interlace", [False, True])
def test_animation_roundtrip_frames_and_delays(interlace):
    pal = _palette(4)
    frames = _anim_frames(9, 6, 4, 3, 80)
    w, h, p, dec = decode_gif_frames(
        encode_gif_animation(6, 4, pal, frames, interlace=interlace))
    assert (w, h, p) == (6, 4, pal)
    assert [(d, bytes(x)) for d, x in dec] == frames


def test_animation_mixed_delays_and_netscape_skip():
    """Per-frame delays come from each frame's own GCE; the NETSCAPE2.0
    loop extension must be walked over, not choked on."""
    pal = _palette(4)
    frames = [(0, bytes(24)), (120, bytes([1]) * 24), (40, bytes([2]) * 24)]
    pay = encode_gif_animation(6, 4, pal, frames)
    assert b"NETSCAPE2.0" in pay
    _, _, _, dec = decode_gif_frames(pay)
    assert [d for d, _ in dec] == [0, 120, 40]


def test_single_frame_decoders_agree():
    """decode_gif (single-image walker) reads an animation's first
    frame; decode_gif_frames reads a single-image GIF as one frame."""
    pal = _palette(4)
    frames = _anim_frames(3, 5, 3, 2, 40)
    anim = encode_gif_animation(5, 3, pal, frames)
    assert decode_gif(anim)[3] == frames[0][1]
    single = encode_gif(5, 3, frames[0][1], pal)
    _, _, _, dec = decode_gif_frames(single)
    assert dec == [(0, frames[0][1])]


def test_animation_envelope_errors():
    pal = _palette(4)
    with pytest.raises(ValueError):
        encode_gif_animation(4, 4, pal, [])                 # no frames
    with pytest.raises(ValueError):
        encode_gif_animation(4, 4, pal, [(45, bytes(16))])  # delay % 10
    with pytest.raises(ValueError):
        encode_gif_animation(4, 4, pal, [(40, bytes(15))])  # wrong length
    pay = encode_gif_animation(4, 4, pal, [(40, bytes(16))])
    with pytest.raises(ValueError):
        decode_gif_frames(pay[:20])                         # truncated
    with pytest.raises(ValueError):
        decode_gif_frames(b"GIF89a" + pay[6:10] + bytes([0]) + pay[11:])
        # no global color table


def test_gif_frame_sample_stats_samples_real_frames(spark):
    """End-to-end through Spark: synthesize real animations, decode all
    frames in the Arrow-batched kernel, sample the timeline at 100 ms,
    and check every emitted row against a driver-side recompute;
    corrupt payloads land as null-stats quarantine rows."""
    from pyspark.sql import functions as F

    from felixzh_flink_spark.operators import multimodal as MM

    df = spark.range(0, 25).withColumnRenamed("id", "doc_id")
    rows = MM.gif_frame_sample_stats(
        MM.synthesize_gif_animation_column(df)).collect()
    got = {(r["doc_id"], r["sample_ms"]): r for r in rows}
    expected = 0
    for i in range(25):
        w, h = i % 5 + 2, i % 4 + 2
        n = i % 4 + 2
        delay = (i % 3 + 1) * 40
        k = 0
        while k * 100 < n * delay:
            fi = (k * 100) // delay
            idx = [(i * 31 + 13 * fi + 7 * j) % 4 for j in range(w * h)]
            r = got[(i, k * 100)]
            assert r["frame_idx"] == fi
            assert r["idx_sum"] == sum(idx)
            assert r["idx_wsum"] == sum((j + 1) * v
                                        for j, v in enumerate(idx))
            expected += 1
            k += 1
    assert len(rows) == expected

    corrupt = MM.synthesize_gif_animation_column(df.limit(3)).withColumn(
        "gif", F.expr("CASE WHEN doc_id = 1 THEN CAST('nope' AS BINARY) "
                      "ELSE gif END"))
    out = MM.gif_frame_sample_stats(corrupt).collect()
    bad = [r for r in out if r["doc_id"] == 1]
    assert len(bad) == 1 and bad[0]["idx_sum"] is None
    assert any(r["doc_id"] == 0 and r["idx_sum"] is not None for r in out)


def test_zero_duration_animation_still_emits_a_row(spark):
    """All-zero GCE delays (or a plain single-image GIF) have no
    timeline, but the doc must not vanish: the kernel emits the t=0
    sample showing the final frame."""
    import pandas as pd
    from felixzh_flink_spark.operators import multimodal as MM

    pal = _palette(4)
    anim = encode_gif_animation(4, 3, pal,
                                [(0, bytes(12)), (0, bytes([2]) * 12)])
    single = encode_gif(4, 3, bytes([1]) * 12, pal)
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [0, 1], "gif": [anim, single]}))
    rows = {r["doc_id"]: r for r in
            MM.gif_frame_sample_stats(df).collect()}
    assert rows[0]["sample_ms"] == 0 and rows[0]["frame_idx"] == 1
    assert rows[0]["idx_sum"] == 24                  # the FINAL frame
    assert rows[1]["frame_idx"] == 0 and rows[1]["idx_sum"] == 12


def test_truncation_inside_later_subblocks_raises_cleanly():
    """A GIF cut inside its second or later 255-byte sub-block must
    raise the dedicated truncated-sub-block error, in both walkers."""
    pal = _palette(2)
    # >255 compressed bytes → multiple sub-blocks
    idx = bytes((j * 7 + j * j) % 2 for j in range(40 * 40))
    pay = encode_gif(40, 40, idx, pal)
    cut = pay[:len(pay) - 30]
    with pytest.raises(ValueError):
        decode_gif(cut)
    frames = [(40, idx)]
    anim = encode_gif_animation(40, 40, pal, frames)
    with pytest.raises(ValueError):
        decode_gif_frames(anim[:len(anim) - 30])


# -------------------------------------------------- inter-frame compositing

from felixzh_flink_spark.functions.gif_codec import (  # noqa: E402
    composite_gif_frames,
    encode_gif_composited,
)


def _composite_ref(w, h, bg, frames):
    """Independent pure-Python re-statement of GIF89a compositing used
    to cross-check the codec (kept deliberately naive)."""
    canvas = [bg] * (w * h)
    out = []
    for _d, left, top, fw, fh, idx, disposal, tr in frames:
        prev = canvas[:]
        for y in range(fh):
            for x in range(fw):
                v = idx[y * fw + x]
                if tr is None or v != tr:
                    canvas[(top + y) * w + left + x] = v
        out.append(bytes(canvas))
        if disposal == 2:
            for y in range(fh):
                for x in range(fw):
                    canvas[(top + y) * w + left + x] = bg
        elif disposal == 3:
            canvas = prev[:]
    return out


def test_composite_all_disposals_and_transparency():
    pal = _palette(4)
    frames = [
        (40, 0, 0, 4, 3, bytes((7 * j) % 4 for j in range(12)), 1, None),
        (40, 1, 1, 2, 2, bytes([0, 2, 1, 3]), 2, 2),   # hole at value 2
        (40, 2, 0, 2, 2, bytes([3, 3, 3, 3]), 3, None),
        (40, 0, 1, 2, 2, bytes([1, 0, 2, 1]), 1, 0),   # hole at value 0
    ]
    pay = encode_gif_composited(4, 3, pal, 2, frames)
    sw, sh, p, bg, dec = composite_gif_frames(pay)
    assert (sw, sh, p, bg) == (4, 3, pal, 2)
    assert [c for _d, c in dec] == _composite_ref(4, 3, 2, frames)
    assert [d for d, _c in dec] == [40] * 4


def test_composite_initial_canvas_is_background():
    """A first frame that covers only a sub-rect leaves the rest of
    the canvas at the screen descriptor's background color."""
    pal = _palette(4)
    pay = encode_gif_composited(
        5, 4, pal, 3, [(0, 2, 1, 2, 2, bytes([1, 1, 1, 1]), 1, None)])
    _, _, _, bg, dec = composite_gif_frames(pay)
    canvas = dec[0][1]
    assert bg == 3
    assert canvas[1 * 5 + 2] == 1 and canvas[2 * 5 + 3] == 1
    assert canvas[0] == 3 and canvas[-1] == 3
    assert sum(canvas) == 3 * (20 - 4) + 4


def test_composite_full_rect_agrees_with_frame_decoder():
    """Full-rect opaque disposal-LEAVE frames are plain playback: the
    compositor and decode_gif_frames must agree canvas-for-canvas."""
    pal = _palette(4)
    plain = _anim_frames(11, 5, 4, 3, 40)
    pay_c = encode_gif_composited(
        5, 4, pal, 0,
        [(40, 0, 0, 5, 4, idx, 1, None) for _d, idx in plain])
    _, _, _, _, dec_c = composite_gif_frames(pay_c)
    pay_a = encode_gif_animation(5, 4, pal, plain)
    _, _, _, dec_a = decode_gif_frames(pay_a)
    assert [c for _d, c in dec_c] == [f for _d, f in dec_a]


def test_composite_envelope_errors():
    pal = _palette(4)
    ok = [(40, 0, 0, 3, 3, bytes(9), 1, None)]
    with pytest.raises(ValueError):  # rect outside the screen
        encode_gif_composited(3, 3, pal, 0,
                              [(40, 2, 2, 2, 2, bytes(4), 1, None)])
    with pytest.raises(ValueError):  # reserved disposal
        encode_gif_composited(3, 3, pal, 0,
                              [(40, 0, 0, 2, 2, bytes(4), 4, None)])
    with pytest.raises(ValueError):  # background outside palette
        encode_gif_composited(3, 3, pal, 4, ok)
    with pytest.raises(ValueError):  # transparent index outside palette
        encode_gif_composited(3, 3, pal, 0,
                              [(40, 0, 0, 2, 2, bytes(4), 1, 9)])
    pay = bytearray(encode_gif_composited(3, 3, pal, 0, ok))
    # flip the GCE disposal bits to the reserved value 4 -> decoder raises
    gce = pay.index(bytes([0x21, 0xF9, 4]))
    pay[gce + 3] = (4 << 2)
    with pytest.raises(ValueError):
        composite_gif_frames(bytes(pay))
    with pytest.raises(ValueError):  # truncated mid-frame
        composite_gif_frames(bytes(
            encode_gif_composited(3, 3, pal, 0, ok)[:-8]))
    with pytest.raises(ValueError):
        composite_gif_frames(b"GIF89a\x00")


def test_composite_rect_validated_against_screen_on_decode():
    """A descriptor rect outside the logical screen must raise, not
    write out of bounds: patch the encoded descriptor's left edge."""
    pal = _palette(4)
    pay = bytearray(encode_gif_composited(
        4, 4, pal, 0, [(0, 1, 1, 2, 2, bytes([1, 2, 3, 1]), 1, None)]))
    sep = pay.index(bytes([0x2C]), 13)
    struct.pack_into("<H", pay, sep + 1, 3)  # left 1 -> 3; 3+2 > 4
    with pytest.raises(ValueError):
        composite_gif_frames(bytes(pay))


def test_gif_composite_stats_spark_kernel(spark):
    """End-to-end through the Spark stage: synthesize the delta-frame
    fixture for a handful of ids and check the composited stats row
    set against the naive reference compositor."""
    from felixzh_flink_spark.operators import multimodal as MM

    ids = list(range(17))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {(r.doc_id, r.frame_idx): (r.comp_sum, r.comp_wsum)
           for r in MM.gif_composite_stats(
               MM.synthesize_gif_composited_column(df)).collect()}
    for i in ids:
        w, h = i % 4 + 4, i % 3 + 4
        n = i % 4 + 2
        frames = [(0, 0, 0, w, h,
                   bytes((i * 31 + 7 * j) % 4 for j in range(w * h)),
                   1, None)]
        for f in range(1, n):
            frames.append((0, (i + 3 * f) % (w - 1), (i + 5 * f) % (h - 1),
                           2, 2, bytes((i * 31 + 13 * f + 7 * u) % 4
                                       for u in range(4)),
                           1 + (i + f) % 3, (i + f) % 4))
        for fi, canvas in enumerate(_composite_ref(w, h, i % 4, frames)):
            assert got[(i, fi)] == (
                sum(canvas), sum((j + 1) * b for j, b in enumerate(canvas)))
    assert len(got) == sum(i % 4 + 2 for i in ids)
