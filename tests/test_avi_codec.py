"""MJPEG-in-AVI container codec (functions/avi_codec) + the real
video-frame-sampling Spark stage.

Motion JPEG is the one real video format a pure-stdlib pipeline can
decode end-to-end (one baseline JPEG per frame, no inter-frame
prediction) — these tests prove the RIFF container walk, the timing
headers, and the sample-then-decode kernel against the real color-JPEG
decoder.
"""

import struct

import pytest
from hypothesis import given, settings, strategies as st

from felixzh_flink_spark.functions.avi_codec import (
    encode_mjpeg_avi,
    parse_mjpeg_avi,
)
from felixzh_flink_spark.functions.jpeg_codec import (
    decode_jpeg_color,
    encode_jpeg_color,
)


def _jpeg(yv, cbv, crv, s=16):
    return encode_jpeg_color(s, s, bytes([yv]) * (s * s),
                             bytes([cbv]) * (s // 2 * s // 2),
                             bytes([crv]) * (s // 2 * s // 2), "4:2:0")


def test_container_roundtrip_preserves_frames_and_timing():
    frames = [_jpeg(10 * f, 100, 200) for f in range(3)]
    w, h, usec, dec = parse_mjpeg_avi(encode_mjpeg_avi(16, 16, 40_000,
                                                       frames))
    assert (w, h, usec) == (16, 16, 40_000)
    assert dec == frames
    # the payloads are genuinely decodable JPEGs
    dw, dh, rgb = decode_jpeg_color(dec[1])
    assert (dw, dh) == (16, 16) and len(rgb) == 16 * 16 * 3


def test_odd_sized_frames_survive_riff_even_padding():
    """RIFF pads odd chunk bodies with a byte not counted in the size;
    JPEG entropy data is odd-length about half the time."""
    frames = [_jpeg(f * 37 % 256, f * 91 % 256, f * 53 % 256)
              for f in range(6)]
    assert any(len(f) % 2 for f in frames), "fixture should have odd sizes"
    assert parse_mjpeg_avi(encode_mjpeg_avi(16, 16, 20_000, frames))[3] \
        == frames


def test_envelope_and_corruption_errors():
    frames = [_jpeg(1, 2, 3)]
    avi = encode_mjpeg_avi(16, 16, 40_000, frames)
    with pytest.raises(ValueError):
        parse_mjpeg_avi(avi[8:])                    # missing RIFF header
    with pytest.raises(ValueError):
        parse_mjpeg_avi(avi[:40])                   # truncated chunk
    with pytest.raises(ValueError):
        parse_mjpeg_avi(avi.replace(b"MJPG", b"H264"))  # wrong codec
    # header/movi frame-count mismatch must be loud
    bad = avi.replace(struct.pack("<I", 1) + struct.pack("<I", 0)
                      + struct.pack("<I", 1),
                      struct.pack("<I", 2) + struct.pack("<I", 0)
                      + struct.pack("<I", 1), 1)
    with pytest.raises(ValueError):
        parse_mjpeg_avi(bad)
    with pytest.raises(ValueError):
        encode_mjpeg_avi(16, 16, 40_000, [])        # no frames
    with pytest.raises(ValueError):
        encode_mjpeg_avi(16, 16, 0, frames)         # zero duration


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 5), st.integers(1, 4), st.integers(0, 2 ** 20))
def test_container_roundtrip_property(n_frames, dur_cs, seed):
    frames = [_jpeg((seed + 17 * f) % 256, (seed * 3 + 29 * f) % 256,
                    (seed * 7 + 43 * f) % 256) for f in range(n_frames)]
    w, h, usec, dec = parse_mjpeg_avi(
        encode_mjpeg_avi(16, 16, dur_cs * 10_000, frames))
    assert (w, h, usec) == (16, 16, dur_cs * 10_000) and dec == frames


def test_avi_frame_sample_stats_decodes_sampled_frames(spark):
    """End-to-end through Spark: synthesize real MJPEG AVIs, sample the
    timeline in the Arrow-batched kernel, pixel-decode sampled frames,
    and check every row against a driver-side recompute; corrupt
    payloads land as null-stats quarantine rows."""
    import numpy as np
    from pyspark.sql import functions as F

    from felixzh_flink_spark.operators import multimodal as MM

    df = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    rows = MM.avi_frame_sample_stats(
        MM.synthesize_mjpeg_avi_column(df)).collect()
    got = {(r["doc_id"], r["sample_ms"]): r for r in rows}
    count = 0
    for i in range(20):
        n = i % 3 + 2
        fms = (i % 2 + 1) * 20
        k = 0
        while k * 30 < n * fms:
            fi = (k * 30) // fms
            yv = (i * 31 + 17 * fi) % 256
            cbv = (i * 47 + 29 * fi) % 256
            crv = (i * 59 + 43 * fi) % 256
            _, _, rgb = decode_jpeg_color(_jpeg(yv, cbv, crv))
            a = np.frombuffer(rgb, np.uint8).astype(np.int64).reshape(-1, 3)
            r = got[(i, k * 30)]
            assert r["frame_idx"] == fi
            assert (r["width"], r["height"]) == (16, 16)
            assert (r["r_sum"], r["g_sum"], r["b_sum"]) == \
                (int(a[:, 0].sum()), int(a[:, 1].sum()),
                 int(a[:, 2].sum()))
            count += 1
            k += 1
    assert len(rows) == count

    corrupt = MM.synthesize_mjpeg_avi_column(df.limit(3)).withColumn(
        "video", F.expr("CASE WHEN doc_id = 1 THEN CAST('x' AS BINARY) "
                        "ELSE video END"))
    out = MM.avi_frame_sample_stats(corrupt).collect()
    bad = [r for r in out if r["doc_id"] == 1]
    assert len(bad) == 1 and bad[0]["r_sum"] is None
    assert any(r["doc_id"] == 0 and r["r_sum"] is not None for r in out)


def test_kernel_timeline_math_stays_in_microseconds(spark):
    """Real MJPEG runs at e.g. 30 fps = 33333 us/frame — whole-ms
    truncation would assign sample t=990 ms to frame 30 instead of 29.
    The kernel must divide in microseconds."""
    import pandas as pd
    from felixzh_flink_spark.operators import multimodal as MM

    frames = [_jpeg(f * 20 % 256, 100, 200) for f in range(31)]
    avi = encode_mjpeg_avi(16, 16, 33_333, frames)
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [0], "video": [avi]}))
    rows = {r["sample_ms"]: r["frame_idx"]
            for r in MM.avi_frame_sample_stats(df).collect()}
    assert rows[990] == 990_000 // 33_333 == 29
    # sub-millisecond frame durations must still emit samples, not
    # silently vanish
    tiny = encode_mjpeg_avi(16, 16, 999, frames[:2])
    df2 = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1], "video": [tiny]}))
    out = MM.avi_frame_sample_stats(df2).collect()
    assert len(out) == 1 and out[0]["sample_ms"] == 0
    assert out[0]["r_sum"] is not None
