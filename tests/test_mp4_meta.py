"""ISO-BMFF (MP4) header parsing — video's header-metadata slice of the
multimodal family (oracle twin: `mp4_duration_meta`). Frame decode
stays honestly stubbed; these pin the box walker."""

import struct

import pytest

from felixzh_flink_spark.operators.multimodal import (
    parse_mp4_duration, synthesize_mp4_header)


@pytest.mark.parametrize("version", [0, 1])
@pytest.mark.parametrize("duration_ms,timescale", [
    (1000, 1000), (90_500, 600), (3_600_000, 90_000), (1, 1000)])
def test_roundtrip_versions_and_timescales(version, duration_ms, timescale):
    enc = synthesize_mp4_header(duration_ms, timescale, version)
    expected = (duration_ms * timescale // 1000) * 1000 // timescale
    assert parse_mp4_duration(enc) == expected


def test_moov_after_mdat_and_largesize():
    """Real files often put moov AFTER media data, and large files use
    the 64-bit largesize form — the walker must handle both."""
    base = synthesize_mp4_header(5000, 1000, 0)
    ftyp, moov = base[:16], base[16:]
    mdat = struct.pack(">I", 8 + 5) + b"mdat" + b"xxxxx"
    assert parse_mp4_duration(ftyp + mdat + moov) == 5000
    # rewrap moov with size=1 + 64-bit largesize
    large = struct.pack(">I", 1) + b"moov" \
        + struct.pack(">Q", 16 + len(moov) - 8) + moov[8:]
    assert parse_mp4_duration(ftyp + large) == 5000


@pytest.mark.parametrize("payload", [
    None,
    b"",
    b"garbage!" * 4,
    struct.pack(">I", 16) + b"ftyp" + b"isomAAAA",          # no moov
    synthesize_mp4_header(5000, 1000, 0)[:30],               # truncated
])
def test_rejects_non_mp4(payload):
    assert parse_mp4_duration(payload) is None


def test_zero_timescale_is_rejected():
    enc = bytearray(synthesize_mp4_header(5000, 1000, 0))
    # zero out the version-0 timescale field (moov@16: hdr 8 + mvhd hdr 8
    # + version/flags 4 + times 8 -> offset 16+8+8+12)
    off = 16 + 8 + 8 + 12
    enc[off:off + 4] = b"\x00\x00\x00\x00"
    assert parse_mp4_duration(bytes(enc)) is None


def test_mp4_duration_column_in_spark(spark):
    from pyspark.sql import functions as F

    from felixzh_flink_spark.operators.multimodal import (
        mp4_duration_ms, synthesize_mp4_column)

    ids = spark.range(20).select(F.col("id").alias("doc_id"))
    got = {r["doc_id"]: r["dur"] for r in
           synthesize_mp4_column(ids)
           .select("doc_id", mp4_duration_ms("mp4").alias("dur")).collect()}
    for i in range(20):
        assert got[i] == i % 120000 + 1000
    bad = spark.createDataFrame([(9, b"nope")], "doc_id: long, mp4: binary")
    assert bad.select(mp4_duration_ms("mp4").alias("d")) \
        .collect()[0]["d"] is None
