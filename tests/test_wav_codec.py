"""Pure-stdlib WAV PCM codec (functions/wav_codec) + the Spark decode
stage — audio sibling of test_png_codec (oracle twin: the
`wav_decode_stats` registry query)."""

import struct

import pytest
from hypothesis import given, settings, strategies as st

from felixzh_flink_spark.functions.wav_codec import decode_wav, encode_wav


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip_depths_and_channels(bits, channels):
    lo, hi = ((0, 255) if bits == 8
              else (-(1 << (bits - 1)), (1 << (bits - 1)) - 1))
    n = 6 * channels
    samples = [(lo + (i * 7919) % (hi - lo + 1)) for i in range(n)]
    assert decode_wav(encode_wav(samples, 22_050, channels, bits)) == \
        (22_050, channels, bits, samples)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 3), st.sampled_from([8, 16, 24, 32]),
       st.integers(1, 30), st.integers(0, 2**31 - 1))
def test_roundtrip_property(channels, bits, frames, seed):
    import random
    rnd = random.Random(seed)
    lo, hi = ((0, 255) if bits == 8
              else (-(1 << (bits - 1)), (1 << (bits - 1)) - 1))
    samples = [rnd.randint(lo, hi) for _ in range(frames * channels)]
    rate = rnd.choice([8000, 16000, 44100])
    assert decode_wav(encode_wav(samples, rate, channels, bits)) == \
        (rate, channels, bits, samples)


def test_extra_chunks_are_skipped():
    """Real WAVs carry LIST/fact/cue chunks; the walker must skip them
    (word-aligned, including odd-length padding) and still find data."""
    samples = [1, -2, 3, -4]
    enc = encode_wav(samples, 8000, 1, 16)
    # splice an odd-length junk chunk between fmt and data
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
    spliced = enc[:fmt_end] + junk + enc[fmt_end:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav(spliced) == (8000, 1, 16, samples)


@pytest.mark.parametrize("mutate", [
    lambda b: b"JUNK" + b[4:],                       # not RIFF
    lambda b: b[:20],                                # truncated
    lambda b: b.replace(b"fmt ", b"xxxx", 1),        # missing fmt
    lambda b: b.replace(struct.pack("<HH", 1, 1),
                        struct.pack("<HH", 3, 1), 1),  # float PCM
])
def test_rejects_unsupported(mutate):
    enc = encode_wav([0, 1], 8000, 1, 16)
    with pytest.raises(ValueError):
        decode_wav(mutate(enc))


def test_encode_validates_input():
    with pytest.raises(ValueError):
        encode_wav([1, 2, 3], 8000, 2, 16)        # not a multiple of channels
    with pytest.raises(ValueError):
        encode_wav([70000], 8000, 1, 16)          # out of 16-bit range
    with pytest.raises(ValueError):
        encode_wav([0], 8000, 1, 12)              # unsupported depth


def test_wav_pcm_stats_decodes_real_bytes(spark):
    from pyspark.sql import functions as F

    from felixzh_flink_spark.operators.multimodal import (
        synthesize_wav_column, wav_pcm_stats)

    ids = spark.range(30).select(F.col("id").alias("doc_id"))
    got = {r["doc_id"]: r for r in
           wav_pcm_stats(synthesize_wav_column(ids)).collect()}
    for i in range(30):
        ch = i % 2 + 1
        n = (i % 25 + 4) * ch
        s = [((i * 37 + 11 * j) % 65536) - 32768 for j in range(n)]
        r = got[i]
        assert (r["sample_rate"], r["channels"], r["n_samples"]) == \
            (8000 + (i % 3) * 4000, ch, n)
        assert r["sample_sum"] == sum(s)
        assert r["sample_wsum"] == sum((j + 1) * v for j, v in enumerate(s))

    corrupt = spark.createDataFrame(
        [(7, b"not audio")], "doc_id: long, wav: binary")
    row = wav_pcm_stats(corrupt).collect()[0]
    assert row["doc_id"] == 7 and row["sample_rate"] is None \
        and row["sample_sum"] is None


def test_attach_media_meta_fills_real_durations(spark):
    """attach_media_meta now parses REAL durations: WAV via the
    pure-expression canonical-layout path, MP4 via the box-walk UDF;
    garbage payloads stay null."""
    from pyspark.sql import functions as F

    from felixzh_flink_spark.operators import multimodal as MM

    wav = encode_wav([0] * 16_000, 16_000, 1, 16)      # exactly 1 s
    wav2 = encode_wav([0, 0, 0, 0], 8_000, 2, 16)      # 4 samples stereo
    mp4 = MM.synthesize_mp4_header(2500, 1000, 0)
    rows = [(1, wav), (2, wav2), (3, b"junk")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r["media_meta"]["duration_ms"] for r in
           MM.attach_media_meta(df, "payload", "audio", "wav").collect()}
    assert out[1] == 1000
    assert out[2] == (4 * 2) * 1000 // (8_000 * 2 * 2)  # 8 bytes / 32k Bps
    assert out[3] is None

    vdf = spark.createDataFrame([(1, mp4), (2, b"nah")],
                                "doc_id long, payload binary")
    got = {r["doc_id"]: r["media_meta"]["duration_ms"] for r in
           MM.attach_media_meta(vdf, "payload", "video", "mp4").collect()}
    assert got[1] == 2500 and got[2] is None


# ------------------------------------------------------------- resampling

from felixzh_flink_spark.functions.wav_codec import resample_linear  # noqa: E402


def test_resample_identity_at_equal_rates():
    s = [((7 * 37 + 11 * j) % 65536) - 32768 for j in range(20)]
    assert resample_linear(s, 1, 16000, 16000) == s


def test_resample_2x_interpolates_midpoints_and_replicates_tail():
    assert resample_linear([0, 10, 20, 30], 1, 8000, 16000) == \
        [0, 5, 10, 15, 20, 25, 30, 30]


def test_resample_keeps_channels_separate():
    st = [0, 100, 10, 110, 20, 120]
    assert resample_linear(st, 2, 8000, 16000) == \
        [0, 100, 5, 105, 10, 110, 15, 115, 20, 120, 20, 120]


def test_resample_negative_samples_floor_like_python():
    """The interpolation floor must be a mathematical floor even for
    negative samples — the non-negative-domain shift guarantees the SQL
    oracle's truncating // agrees."""
    assert resample_linear([-7, -3], 1, 8000, 12000) == [-7, -5, -3]


def test_resample_downsample_and_validation():
    import pytest
    s = list(range(0, 120, 10))                   # 12 samples
    down = resample_linear(s, 1, 16000, 8000)     # n_out = 6
    assert down == s[::2]                          # integer positions
    with pytest.raises(ValueError):
        resample_linear([1, 2, 3], 2, 8000, 16000)   # not multiple of ch
    with pytest.raises(ValueError):
        resample_linear([1, 2], 1, 0, 16000)
    assert resample_linear([], 1, 8000, 16000) == []


def test_resample_rational_ratio_matches_float_reference():
    """12→16 kHz (ratio 4:3): the integer kernel equals the floored
    float linear interpolation at every position."""
    import math
    s = [((5 * 37 + 11 * j) % 65536) - 32768 for j in range(29)]
    out = resample_linear(s, 1, 12000, 16000)
    assert len(out) == 29 * 16000 // 12000
    for t, y in enumerate(out):
        pos = t * 12000 / 16000
        i = min(int(pos), 28)
        i1 = min(i + 1, 28)
        ref = s[i] + (s[i1] - s[i]) * (pos - i)
        assert y == math.floor(ref + 1e-9) or y == math.floor(ref - 1e-9)


def test_wav_resample_stats_spark_end_to_end(spark):
    """Decode → de-interleave → resample → stats in the Arrow-batched
    kernel vs a driver-side recompute; corrupt payloads quarantine."""
    from pyspark.sql import functions as F

    from felixzh_flink_spark.operators import multimodal as MM

    df = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r for r in MM.wav_resample_stats(
        MM.synthesize_wav_column(df)).collect()}
    for i in range(30):
        ch = i % 2 + 1
        n = (i % 25 + 4) * ch
        samples = [((i * 37 + 11 * j) % 65536) - 32768 for j in range(n)]
        rate = 8000 + (i % 3) * 4000
        out = resample_linear(samples, ch, rate, 16000)
        r = got[i]
        assert (r["src_rate"], r["channels"], r["n_out"]) == \
            (rate, ch, len(out))
        assert r["out_sum"] == sum(out)
        assert r["out_wsum"] == sum((j + 1) * s for j, s in enumerate(out))

    corrupt = MM.synthesize_wav_column(df.limit(3)).withColumn(
        "wav", F.expr("CASE WHEN doc_id = 1 THEN CAST('x' AS BINARY) "
                      "ELSE wav END"))
    rows = {r["doc_id"]: r for r in
            MM.wav_resample_stats(corrupt).collect()}
    assert rows[1]["out_sum"] is None and rows[0]["out_sum"] is not None


def test_wav_segment_stats_spark_end_to_end(spark):
    """Segmentation on decoded PCM: frame-aligned cuts, partial tail,
    exact energy — vs a driver-side recompute; corrupt quarantine."""
    from pyspark.sql import functions as F

    from felixzh_flink_spark.functions.wav_codec import decode_wav, encode_wav
    from felixzh_flink_spark.operators import multimodal as MM

    df = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    rows = MM.wav_segment_stats(MM.synthesize_wav_column(df)).collect()
    got = {(r["doc_id"], r["seg_idx"]): r for r in rows}
    count = 0
    for i in range(30):
        ch = i % 2 + 1
        n = (i % 25 + 4) * ch
        samples = [((i * 37 + 11 * j) % 65536) - 32768 for j in range(n)]
        step = 8 * ch
        for s in range(0, (n + step - 1) // step):
            seg = samples[s * step:(s + 1) * step]
            r = got[(i, s)]
            assert r["n_values"] == len(seg)
            assert r["seg_sum"] == sum(seg)
            assert r["seg_energy"] == sum(v * v for v in seg)
            count += 1
    assert len(rows) == count

    corrupt = MM.synthesize_wav_column(df.limit(3)).withColumn(
        "wav", F.expr("CASE WHEN doc_id = 1 THEN CAST('x' AS BINARY) "
                      "ELSE wav END"))
    out = MM.wav_segment_stats(corrupt).collect()
    bad = [r for r in out if r["doc_id"] == 1]
    assert len(bad) == 1 and bad[0]["seg_sum"] is None


def test_empty_data_chunk_emits_zero_segment_row(spark):
    """A valid WAV whose data chunk is empty must stay visible as one
    zero-segment row, not vanish from the output."""
    import pandas as pd

    from felixzh_flink_spark.functions.wav_codec import encode_wav
    from felixzh_flink_spark.operators import multimodal as MM

    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [0], "wav": [encode_wav([], 8000, 1, 16)]}))
    rows = MM.wav_segment_stats(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["seg_idx"], r["n_values"], r["seg_sum"],
            r["seg_energy"]) == (0, 0, 0, 0)


# ------------------------------------------- compressed-audio codecs

from felixzh_flink_spark.functions.wav_codec import (  # noqa: E402
    IMA_STEP_TABLE,
    decode_wav_adpcm,
    decode_wav_mulaw,
    encode_wav_ima_adpcm,
    encode_wav_mulaw,
    ima_adpcm_step,
    mulaw_to_linear,
)


def test_ima_step_table_shape():
    assert len(IMA_STEP_TABLE) == 89
    assert IMA_STEP_TABLE[0] == 7 and IMA_STEP_TABLE[88] == 32767
    assert IMA_STEP_TABLE == sorted(IMA_STEP_TABLE)


def test_adpcm_roundtrip_matches_state_machine():
    i = 42
    nib = bytes((i * 7 + 3 * k) % 16 for k in range(20))
    pred0, idx0 = (i * 37) % 2048 - 1024, i % 89
    rate, samples = decode_wav_adpcm(
        encode_wav_ima_adpcm(pred0, idx0, nib, sample_rate=8_000))
    assert rate == 8_000
    exp, p, x = [pred0], pred0, idx0
    for n in nib:
        p, x = ima_adpcm_step(p, x, n)
        exp.append(p)
    assert samples == exp


def test_adpcm_predictor_and_index_clamp():
    """Large positive codes from a high predictor must saturate at
    32767 (not wrap) and pin the step index at 88; all-zero codes from
    index 0 must pin the index at 0."""
    p, x = 32000, 88
    for _ in range(8):
        p, x = ima_adpcm_step(p, x, 7)
    assert p == 32767 and x == 88
    p, x = -32000, 88
    for _ in range(8):
        p, x = ima_adpcm_step(p, x, 15)
    assert p == -32768
    p, x = 0, 0
    for _ in range(4):
        p, x = ima_adpcm_step(p, x, 0)
    assert x == 0


def test_adpcm_multi_block_decode():
    """Blocks are independent: each restarts from its own header."""
    one = encode_wav_ima_adpcm(100, 5, bytes([1, 9, 3, 12]))
    # splice a second identical block into the data chunk
    pay = bytearray(one)
    dpos = pay.index(b"data")
    (dlen,) = struct.unpack("<I", pay[dpos + 4:dpos + 8])
    block = bytes(pay[dpos + 8:dpos + 8 + dlen])
    struct.pack_into("<I", pay, dpos + 4, dlen * 2)
    pay[dpos + 8 + dlen:dpos + 8 + dlen] = block
    struct.pack_into("<I", pay, 4, len(pay) - 8)
    _, samples = decode_wav_adpcm(bytes(pay))
    _, single = decode_wav_adpcm(one)
    assert samples == single * 2


def test_adpcm_envelope_errors():
    with pytest.raises(ValueError):
        encode_wav_ima_adpcm(40000, 0, bytes(2))      # predictor range
    with pytest.raises(ValueError):
        encode_wav_ima_adpcm(0, 89, bytes(2))          # index range
    with pytest.raises(ValueError):
        encode_wav_ima_adpcm(0, 0, bytes(3))           # odd nibbles
    with pytest.raises(ValueError):
        encode_wav_ima_adpcm(0, 0, bytes([16, 0]))     # nibble range
    pay = bytearray(encode_wav_ima_adpcm(0, 0, bytes(4)))
    fpos = pay.index(b"fmt ")
    struct.pack_into("<H", pay, fpos + 10, 2)          # channels -> 2
    with pytest.raises(ValueError):
        decode_wav_adpcm(bytes(pay))
    pay = bytearray(encode_wav_ima_adpcm(0, 0, bytes(4)))
    struct.pack_into("<H", pay, pay.index(b"fmt ") + 8 + 18, 99)  # spb
    with pytest.raises(ValueError):
        decode_wav_adpcm(bytes(pay))
    pay = bytearray(encode_wav_ima_adpcm(0, 0, bytes(4)))
    dpos = pay.index(b"data")
    pay[dpos + 8 + 2] = 90                             # block index > 88
    with pytest.raises(ValueError):
        decode_wav_adpcm(bytes(pay))
    with pytest.raises(ValueError):                    # plain PCM payload
        decode_wav_adpcm(encode_wav([1, 2, 3, 4]))
    with pytest.raises(ValueError):
        decode_wav_adpcm(b"RIFF\x00\x00\x00\x00WAVE")


def test_mulaw_known_values_and_symmetry():
    assert mulaw_to_linear(0xFF) == 0          # positive zero
    assert mulaw_to_linear(0x7F) == 0          # negative zero
    assert mulaw_to_linear(0x00) == -32124     # max negative
    assert mulaw_to_linear(0x80) == 32124      # max positive
    for b in range(128):
        assert mulaw_to_linear(b) == -mulaw_to_linear(b | 0x80)
    # monotone decreasing magnitude as the code increases within sign
    mags = [mulaw_to_linear(b | 0x80) for b in range(128)]
    assert mags == sorted(mags, reverse=True)


def test_mulaw_wav_roundtrip_and_envelope():
    data = bytes(range(256))
    rate, ch, samples = decode_wav_mulaw(encode_wav_mulaw(data, 8_000))
    assert (rate, ch) == (8_000, 1)
    assert samples == [mulaw_to_linear(b) for b in data]
    with pytest.raises(ValueError):            # PCM tag, not mu-law
        decode_wav_mulaw(encode_wav([0, 1, 2, 3]))
    pay = bytearray(encode_wav_mulaw(data))
    struct.pack_into("<H", pay, pay.index(b"fmt ") + 8 + 14, 16)  # bits
    with pytest.raises(ValueError):
        decode_wav_mulaw(bytes(pay))


def test_adpcm_and_mulaw_spark_kernels(spark):
    """End-to-end through the Spark stages, plus the quarantine row."""
    from felixzh_flink_spark.operators import multimodal as MM

    ids = list(range(13))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: (r.n_samples, r.pcm_sum, r.pcm_wsum)
           for r in MM.wav_adpcm_stats(
               MM.synthesize_adpcm_wav_column(df)).collect()}
    for i in ids:
        nib = bytes((i * 7 + 3 * k) % 16 for k in range(2 * (i % 8 + 8)))
        _, samples = decode_wav_adpcm(encode_wav_ima_adpcm(
            (i * 37) % 2048 - 1024, i % 89, nib))
        assert got[i] == (len(samples), sum(samples),
                          sum((k + 1) * s for k, s in enumerate(samples)))
    bad = spark.createDataFrame([(99, bytearray(b"JUNK"))],
                                "doc_id long, wav binary")
    rows = MM.wav_adpcm_stats(bad).collect()
    assert len(rows) == 1 and rows[0].n_samples is None
    gotm = {r.doc_id: (r.n_samples, r.pcm_sum)
            for r in MM.wav_mulaw_stats(
                MM.synthesize_mulaw_wav_column(df)).collect()}
    for i in ids:
        s = [mulaw_to_linear((i * 11 + 5 * k) % 256)
             for k in range(i % 32 + 16)]
        assert gotm[i] == (len(s), sum(s))
