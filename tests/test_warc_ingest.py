"""Crawl-ingestion layer: gzip member framing (functions/gzip_codec),
WARC record parsing (functions/warc_codec), the Spark kernels, and the
`felixzh_warc` Python DataSource (oracle twins: `gzip_roundtrip_docs`,
`warc_extract_stats`).
"""

import gzip as stdlib_gzip
import struct

import pytest

from felixzh_flink_spark.functions.gzip_codec import (
    decode_gzip_members,
    encode_gzip_member,
    encode_gzip_members,
)
from felixzh_flink_spark.functions.warc_codec import (
    decode_warc,
    encode_warc,
    encode_warc_record,
)


# ---------------------------------------------------------------- gzip

def test_gzip_member_fields_roundtrip():
    raw = b"hello crawl world" * 20
    pay = encode_gzip_member(raw, name="seg-00001.warc",
                             extra=b"SL\x04\x00abcd", hcrc=True)
    [(meta, out)] = decode_gzip_members(pay)
    assert out == raw
    assert meta["name"] == "seg-00001.warc"
    assert meta["extra"] == b"SL\x04\x00abcd"


def test_gzip_concatenated_members_walk_in_order():
    parts = [b"alpha", b"", b"gamma" * 100]
    ms = decode_gzip_members(encode_gzip_members(parts))
    assert [r for _m, r in ms] == parts


def test_gzip_stdlib_interop_both_ways():
    raw = bytes(range(256)) * 10
    assert stdlib_gzip.decompress(encode_gzip_member(raw)) == raw
    ms = decode_gzip_members(stdlib_gzip.compress(raw, mtime=0))
    assert ms[0][1] == raw


def test_gzip_trailer_and_header_validation():
    raw = b"payload bytes" * 30
    pay = bytearray(encode_gzip_member(raw))
    pay[-6] ^= 0xFF                              # ISIZE corrupt
    with pytest.raises(ValueError):
        decode_gzip_members(bytes(pay))
    pay = bytearray(encode_gzip_member(raw))
    pay[-10] ^= 0x01                             # CRC32 corrupt
    with pytest.raises(ValueError):
        decode_gzip_members(bytes(pay))
    pay = bytearray(encode_gzip_member(raw, hcrc=True))
    pay[4] ^= 0x01                               # mtime inside FHCRC span
    with pytest.raises(ValueError):
        decode_gzip_members(bytes(pay))
    pay = bytearray(encode_gzip_member(raw))
    pay[3] |= 0xE0                               # reserved FLG bits
    with pytest.raises(ValueError):
        decode_gzip_members(bytes(pay))
    with pytest.raises(ValueError):
        decode_gzip_members(encode_gzip_member(raw)[:-1])
    with pytest.raises(ValueError):              # trailing garbage
        decode_gzip_members(encode_gzip_member(raw) + b"JUNK")


# ---------------------------------------------------------------- warc

def _sample_records(text=b"the response body"):
    return [
        ({"WARC-Type": "warcinfo", "WARC-Record-ID": "urn:x:0"},
         b"software: test\r\n"),
        ({"WARC-Type": "response", "WARC-Record-ID": "urn:x:1",
          "WARC-Target-URI": "http://example.com/a"}, text),
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    recs = _sample_records("caf\xe9 — body".encode())
    out = decode_warc(encode_warc(recs, gzip_per_record=gz))
    assert len(out) == 2
    assert out[0][0]["WARC-Type"] == "warcinfo"
    assert out[1][0]["WARC-Target-URI"] == "http://example.com/a"
    assert out[1][1] == recs[1][1]
    assert out[1][0]["Content-Length"] == str(len(recs[1][1]))


def test_warc_whole_file_gzip_multi_record_member():
    """A single gzip member holding BOTH records (whole-file gzip, not
    record-per-member) must still parse — the member walk and the
    record walk are independent layers."""
    plain = encode_warc(_sample_records())
    pay = encode_gzip_member(plain)
    assert len(decode_warc(pay)) == 2


def test_warc_content_length_is_the_boundary():
    """The block may CONTAIN things that look like record starts; only
    Content-Length delimits it."""
    tricky = b"WARC/1.0\r\nnot: a real record\r\n\r\n"
    recs = [({"WARC-Type": "resource", "WARC-Record-ID": "urn:x:2"},
             tricky)]
    out = decode_warc(encode_warc(recs))
    assert len(out) == 1 and out[0][1] == tricky


def test_warc_envelope_errors():
    recs = _sample_records()
    pay = bytearray(encode_warc(recs))
    pay[-1] ^= 1                                  # terminator
    with pytest.raises(ValueError):
        decode_warc(bytes(pay))
    with pytest.raises(ValueError):
        decode_warc(b"WARC/2.0\r\n\r\n\r\n\r\n")  # version
    with pytest.raises(ValueError):               # length conflict
        encode_warc_record({"Content-Length": "3"}, b"four")
    bad = encode_warc_record({"WARC-Type": "resource"}, b"x")
    bad = bad.replace(b"Content-Length: 1", b"Content-Length: 99")
    with pytest.raises(ValueError):
        decode_warc(bad)
    nolen = (b"WARC/1.0\r\nWARC-Type: resource\r\n\r\nx\r\n\r\n")
    with pytest.raises(ValueError):
        decode_warc(nolen)


# -------------------------------------------------------- spark kernels

def test_gzip_and_warc_spark_kernels(spark):
    from felixzh_flink_spark.operators import multimodal as MM

    rows = [(0, "even doc, two members"), (1, "odd doc éé"),
            (2, ""), (3, None), (4, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_members, r.text)
           for r in MM.gzip_roundtrip_stats(
               MM.synthesize_gzip_column(df)).collect()}
    assert got[0] == (2, "even doc, two members")
    assert got[1] == (1, "odd doc éé")
    assert got[2] == (1, "")      # empty text: one (empty) member
    assert got[3] == (1, "")      # NULL coalesces to ''
    assert got[4] == (1, "x")     # 1 byte: too short to split
    gow = {r.doc_id: (r.n_records, r.target_uri, r.response_len, r.text)
           for r in MM.warc_record_stats(
               MM.synthesize_warc_column(df)).collect()}
    assert gow[1] == (2, "http://example.com/doc/1",
                      len("odd doc éé".encode()), "odd doc éé")
    assert gow[3] == (2, "http://example.com/doc/3", 0, "")
    bad = spark.createDataFrame([(9, bytearray(b"\x1f\x8bJUNK"))],
                                "doc_id long, gz binary")
    assert MM.gzip_roundtrip_stats(bad).collect()[0].n_members is None


def test_gzip_member_split_can_cut_utf8(spark):
    """The even-id split point is byte-level: craft a text whose UTF-8
    midpoint falls inside a multi-byte character and check the kernel
    still recovers it (members joined BEFORE decoding)."""
    from felixzh_flink_spark.operators import multimodal as MM

    text = "ééé"                   # 6 bytes, cut at 3
    df = spark.createDataFrame([(2, text)], "doc_id long, text string")
    row = MM.gzip_roundtrip_stats(
        MM.synthesize_gzip_column(df)).collect()[0]
    assert (row.n_members, row.text) == (2, text)


def test_gzip_roundtrip_len_check():
    """The two-member split boundary is mid-UTF-8 in the payload too."""
    from felixzh_flink_spark.functions.gzip_codec import \
        decode_gzip_members
    raw = "ééé".encode()
    ms = decode_gzip_members(encode_gzip_members([raw[:3], raw[3:]]))
    with pytest.raises(UnicodeDecodeError):
        ms[0][1].decode("utf-8")                  # members alone broken
    assert b"".join(r for _m, r in ms).decode("utf-8") == "ééé"


# ------------------------------------------------------ the data source

def test_warc_datasource_reads_files_in_parallel(spark, tmp_path):
    from felixzh_flink_spark.sources.warc_source import register

    for f in range(3):
        recs = [({"WARC-Type": "warcinfo",
                  "WARC-Record-ID": f"urn:info:{f}"}, b"v\r\n")]
        for r in range(4):
            recs.append((
                {"WARC-Type": "response",
                 "WARC-Record-ID": f"urn:resp:{f}:{r}",
                 "WARC-Target-URI": f"http://ex.com/{f}/{r}"},
                f"body {f}:{r} —".encode()))
        suffix = ".warc.gz" if f % 2 == 0 else ".warc"
        (tmp_path / f"seg-{f}{suffix}").write_bytes(
            encode_warc(recs, gzip_per_record=(f % 2 == 0)))
    (tmp_path / "ignore.txt").write_text("not a warc")
    register(spark)
    df = (spark.read.format("felixzh_warc")
          .option("path", str(tmp_path)).load())
    assert df.count() == 15
    assert df.rdd.getNumPartitions() == 3        # one per file
    resp = (spark.read.format("felixzh_warc")
            .option("path", str(tmp_path))
            .option("types", "response").load())
    rows = resp.collect()
    assert len(rows) == 12
    assert all(r.warc_type == "response" for r in rows)
    one = [r for r in rows if r.target_uri == "http://ex.com/1/2"]
    assert len(one) == 1
    assert bytes(one[0].block).decode("utf-8") == "body 1:2 —"
    assert one[0].content_length == len("body 1:2 —".encode())
    capped = (spark.read.format("felixzh_warc")
              .option("path", str(tmp_path))
              .option("types", "response")
              .option("max_block_bytes", "4").load()).collect()
    assert all(len(bytes(r.block)) == 4 for r in capped)


def test_warc_writer_roundtrip(spark, tmp_path):
    """df.write.format('felixzh_warc') → one segment per partition →
    read back through the same source: the full ingestion loop."""
    from felixzh_flink_spark.sources.warc_source import register

    register(spark)
    rows = [("response", f"urn:w:{i}", f"http://ex.com/w/{i}",
             bytearray(f"body-{i} é".encode())) for i in range(10)]
    df = (spark.createDataFrame(
        rows, "warc_type string, record_id string, target_uri string,"
              " block binary")
        .repartition(3))
    out = str(tmp_path / "segments")
    df.write.format("felixzh_warc").option("path", out).mode(
        "append").save()
    import os
    segs = sorted(f for f in os.listdir(out) if f.endswith(".warc.gz"))
    assert len(segs) == 3                      # one file per partition
    back = (spark.read.format("felixzh_warc")
            .option("path", out).load()).collect()
    assert len(back) == 10
    got = {r.record_id: bytes(r.block).decode() for r in back}
    assert got == {f"urn:w:{i}": f"body-{i} é" for i in range(10)}


def test_warc_writer_overwrite_truncates(spark, tmp_path):
    """mode('overwrite') must clear prior segments: unique timestamped
    segment names never collide, so without the driver-side truncate an
    overwrite silently appended and a re-read duplicated records
    (ADVICE r7)."""
    from felixzh_flink_spark.sources.warc_source import register

    register(spark)

    def _df(tag, n):
        rows = [("resource", f"urn:{tag}:{i}", None,
                 bytearray(f"{tag}-{i}".encode())) for i in range(n)]
        return spark.createDataFrame(
            rows, "warc_type string, record_id string, target_uri string,"
                  " block binary").repartition(2)

    out = str(tmp_path / "ow")
    _df("first", 6).write.format("felixzh_warc") \
        .option("path", out).mode("append").save()
    _df("second", 4).write.format("felixzh_warc") \
        .option("path", out).mode("overwrite").save()
    back = (spark.read.format("felixzh_warc")
            .option("path", out).load()).collect()
    assert len(back) == 4
    assert {r.record_id for r in back} == {f"urn:second:{i}" for i in range(4)}


def test_warc_source_feeds_the_corpus_pipeline(spark, tmp_path):
    """Integration: bytes-on-disk → felixzh_warc source → text ops.
    Write the documents table's own text as a crawl dump, read it back
    through the source, and check a downstream text aggregate equals
    the same aggregate computed from the table directly."""
    import pyspark.sql.functions as F

    from felixzh_flink_spark.sources.warc_source import register

    register(spark)
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(200)
            .select(
                F.lit("response").alias("warc_type"),
                F.concat(F.lit("urn:doc:"), "doc_id").alias("record_id"),
                F.concat(F.lit("http://example.com/doc/"),
                         "doc_id").alias("target_uri"),
                F.encode(F.coalesce("text", F.lit("")),
                         "utf-8").alias("block")))
    out = str(tmp_path / "crawl")
    docs.repartition(4).write.format("felixzh_warc").option(
        "path", out).mode("append").save()
    crawled = (spark.read.format("felixzh_warc")
               .option("path", out).option("types", "response").load()
               .select(F.decode("block", "utf-8").alias("text")))
    agg_crawl = crawled.select(
        F.count("*").alias("n"),
        F.sum(F.length("text")).alias("chars")).collect()[0]
    agg_direct = (spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(200)
        .select(F.coalesce("text", F.lit("")).alias("text"))
        .select(F.count("*").alias("n"),
                F.sum(F.length("text")).alias("chars")).collect()[0])
    assert (agg_crawl.n, agg_crawl.chars) == \
        (agg_direct.n, agg_direct.chars)


# ------------------------------------------------- webdataset source

def _write_shard(path, samples, gz=False):
    """samples: list of (key, {ext: bytes}) — members adjacent per the
    WebDataset convention."""
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        for key, parts in samples:
            for ext, data in parts.items():
                info = tarfile.TarInfo(f"{key}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    if gz:
        from felixzh_flink_spark.functions.gzip_codec import \
            encode_gzip_member
        raw = encode_gzip_member(raw)
    path.write_bytes(raw)


def test_webdataset_source_partitions_and_samples(spark, tmp_path):
    from felixzh_flink_spark.sources.webdataset_source import register

    for f in range(2):
        samples = [(f"{f:02d}{s:04d}",
                    {"txt": f"text {f}:{s} é".encode(),
                     "png": b"\x89PNGfake" + bytes([f, s]),
                     "json": b"{}"})
                   for s in range(3)]
        _write_shard(tmp_path / f"shard-{f}.tar" if f == 0
                     else tmp_path / f"shard-{f}.tar.gz",
                     samples, gz=(f == 1))
    (tmp_path / "notes.txt").write_text("ignored")
    register(spark)
    df = (spark.read.format("felixzh_webdataset")
          .option("path", str(tmp_path)).load())
    rows = df.collect()
    assert len(rows) == 6                       # 2 shards x 3 samples
    assert df.rdd.getNumPartitions() == 2       # one per shard
    one = [r for r in rows if r.sample_key == "010002"][0]
    assert set(one.parts.keys()) == {"txt", "png", "json"}
    assert bytes(one.parts["txt"]).decode() == "text 1:2 é"
    filtered = (spark.read.format("felixzh_webdataset")
                .option("path", str(tmp_path))
                .option("exts", "txt").load()).collect()
    assert all(set(r.parts.keys()) == {"txt"} for r in filtered)
    assert len(filtered) == 6
    capped = (spark.read.format("felixzh_webdataset")
              .option("path", str(tmp_path))
              .option("max_part_bytes", "2").load()).collect()
    assert all(len(bytes(v)) <= 2 for r in capped
               for v in r.parts.values())


def test_warc_streaming_source_picks_up_new_segments(spark, tmp_path):
    """readStream over a crawl directory: existing segments arrive in
    the first batches, a segment added AFTER the stream started
    arrives in a later one, nothing is duplicated, and the lexicographic
    offset contract holds."""
    import os

    from felixzh_flink_spark.sources.warc_source import register

    register(spark)
    d = tmp_path / "crawl"
    os.makedirs(d)

    def seg(n, k):
        recs = [({"WARC-Type": "response",
                  "WARC-Record-ID": f"urn:s:{n}:{r}",
                  "WARC-Target-URI": f"http://ex.com/{n}/{r}"},
                 f"b{n}:{r}".encode()) for r in range(k)]
        (d / f"seg-{n:05d}.warc.gz").write_bytes(
            encode_warc(recs, gzip_per_record=True))

    seg(1, 2)
    seg(2, 3)
    stream = (spark.readStream.format("felixzh_warc")
              .option("path", str(d))
              .option("max_files_per_batch", "1").load())
    q = (stream.writeStream.format("memory").queryName("warc_s")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        q.processAllAvailable()
        n1 = spark.sql("SELECT count(*) c FROM warc_s").collect()[0].c
        assert n1 == 5
        seg(3, 1)                      # arrives AFTER the stream began
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM warc_s").collect()
    finally:
        q.stop()
    assert len(rows) == 6
    ids = sorted(r.record_id for r in rows)
    assert ids == sorted([f"urn:s:1:{r}" for r in range(2)]
                         + [f"urn:s:2:{r}" for r in range(3)]
                         + ["urn:s:3:0"])
    assert len(set(ids)) == 6          # exactly-once per record
