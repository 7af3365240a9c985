import pytest

from pyspark.sql import functions as F, types as T

from felixzh_flink_spark.functions import formats as FMT
from felixzh_flink_spark.functions.generators import datagen_batch
from felixzh_flink_spark.functions.registry import load_callable, register_udf
from felixzh_flink_spark.operators import multimodal as MM
from felixzh_flink_spark.operators import text as TX


SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
])


def test_csv_roundtrip_with_pipe_delimiter(spark):
    df = spark.createDataFrame([(1, "a|b"), (2, "plain")], SCHEMA)
    out = FMT.csv_roundtrip(df, ["id", "name"], SCHEMA, field_delimiter="|")
    got = {r["id"]: r["name"] for r in out.collect()}
    assert got == {1: "a|b", 2: "plain"}  # quoting survives the delimiter


def test_csv_decode_ignore_parse_errors(spark):
    df = spark.createDataFrame([("1|x",), ("not-a-long|y",)], "line string")
    parsed = df.select(FMT.decode_csv("line", SCHEMA, field_delimiter="|").alias("r"))
    rows = parsed.select("r.id", "r.name").collect()
    by_name = {r["name"]: r["id"] for r in rows}
    assert by_name["x"] == 1 and by_name["y"] is None  # malformed field → null


def test_json_decode_missing_field_null(spark):
    df = spark.createDataFrame([('{"id": 5}',)], "line string")
    parsed = df.select(FMT.decode_json("line", SCHEMA).alias("r")).select("r.id", "r.name")
    row = parsed.head()
    assert row["id"] == 5 and row["name"] is None


def test_avro_stubbed_without_package(spark):
    if not FMT.HAS_AVRO:
        with pytest.raises(NotImplementedError):
            FMT.decode_avro("c", "{}")


def test_registry_dotted_path_and_sql_use(spark):
    register_udf(spark, "py_capwords", "string.capwords", "string")
    spark.createDataFrame([("abc def",)], "s string").createOrReplaceTempView("t_reg")
    assert spark.sql("SELECT py_capwords(s) AS u FROM t_reg").head()["u"] == "Abc Def"
    import string as string_mod
    assert load_callable("string:capwords") is string_mod.capwords


def test_datagen_deterministic_payload(spark):
    a = datagen_batch(spark, 5, payload_bytes=16).collect()
    b = datagen_batch(spark, 5, payload_bytes=16).collect()
    assert [r["payload"] for r in a] == [r["payload"] for r in b]
    assert all(len(r["payload"]) == 16 for r in a)
    assert all(33 <= ord(ch) <= 126 for r in a for ch in r["payload"])


def test_lang_id_und_for_no_markers(spark):
    df = spark.createDataFrame([(1, "xyzzy qwerty", "en")],
                               "doc_id long, text string, lang string")
    assert TX.lang_id(df).head()["lang_pred"] == "und"


def test_token_count_empty_and_whitespace(spark):
    df = spark.createDataFrame([(1, ""), (2, "   "), (3, "a b")],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["n_tokens"]
           for r in df.select("doc_id", TX.token_count("text")).collect()}
    assert got == {1: 0, 2: 0, 3: 2}


def test_rolling_fingerprint_is_order_sensitive(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "c b a")], "doc_id long, text string")
    fps = {r["doc_id"]: r["rolling_fp"] for r in TX.fingerprint_rolling(df).collect()}
    assert fps[1] != fps[2]
    assert all(0 <= v < 2 ** 31 for v in fps.values())


def test_multimodal_fake_features_and_meta(spark):
    df = spark.createDataFrame([(1, "hello")], "doc_id long, text string") \
        .select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    df = MM.attach_media_meta(df, "payload", "image", "png")
    row = MM.extract_features(df).head()
    assert row["media_type"] == "image"
    assert row["n_bytes"] == 5
    assert len(row["feature"]) == 8


def test_multimodal_real_codec_stubbed(spark):
    df = spark.createDataFrame([(1, b"x")], "doc_id long, payload binary")
    with pytest.raises(Exception) as exc_info:
        MM.extract_features(df, use_real_codec=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError)


def _tiny_png(w: int, h: int) -> bytes:
    return (MM.PNG_SIGNATURE + bytes.fromhex("0000000D") + b"IHDR"
            + w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes.fromhex("0806000000"))


def _tiny_jpeg(w: int, h: int, extra_segments: bytes = b"") -> bytes:
    sof0 = (bytes.fromhex("FFC0001108") + h.to_bytes(2, "big")
            + w.to_bytes(2, "big") + bytes.fromhex("03012200021101031101"))
    app0 = bytes.fromhex("FFE000104A46494600010100004800480000")
    return b"\xff\xd8" + app0 + extra_segments + sof0 + b"\xff\xd9"


def test_parse_jpeg_dims_walks_segments():
    """The marker walk must skip variable-length segments (EXIF APP1,
    comments, quant tables) to find SOF0, tolerate fill bytes, and
    return nulls — never crash — on garbage or truncation."""
    assert MM.parse_jpeg_dims(_tiny_jpeg(640, 480)) == (640, 480)
    # EXIF APP1 + a comment segment before SOF0, plus a 0xFF fill byte
    app1 = b"\xff\xe1" + (30).to_bytes(2, "big") + b"Exif\x00\x00" + b"\x00" * 22
    com = b"\xff\xfe" + (9).to_bytes(2, "big") + b"hello!\x00"
    assert MM.parse_jpeg_dims(
        _tiny_jpeg(1, 65535, app1 + com + b"\xff")) == (1, 65535)
    # progressive JPEG (SOF2) carries dims the same way
    prog = _tiny_jpeg(12, 34).replace(b"\xff\xc0", b"\xff\xc2")
    assert MM.parse_jpeg_dims(prog) == (12, 34)
    assert MM.parse_jpeg_dims(None) == (None, None)
    assert MM.parse_jpeg_dims(b"") == (None, None)
    assert MM.parse_jpeg_dims(b"not a jpeg at all") == (None, None)
    assert MM.parse_jpeg_dims(_tiny_png(3, 4)) == (None, None)
    assert MM.parse_jpeg_dims(_tiny_jpeg(640, 480)[:9]) == (None, None)


def test_attach_media_meta_parses_real_headers(spark):
    """attach_media_meta fills width/height from the actual payload bytes:
    PNG via the fixed-offset expression path, JPEG via the pandas UDF;
    non-image bytes under either format yield null dims."""
    rows = [(1, _tiny_png(320, 200)), (2, b"garbage")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r["media_meta"] for r in
           MM.attach_media_meta(df, "payload", "image", "png").collect()}
    assert (out[1]["width"], out[1]["height"]) == (320, 200)
    assert (out[2]["width"], out[2]["height"]) == (None, None)
    assert out[1]["size_bytes"] == len(_tiny_png(320, 200))
    rows = [(1, _tiny_jpeg(800, 600)), (2, b"nope")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r["media_meta"] for r in
           MM.attach_media_meta(df, "payload", "image", "jpeg").collect()}
    assert (out[1]["width"], out[1]["height"]) == (800, 600)
    assert (out[2]["width"], out[2]["height"]) == (None, None)


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, b"v")], "doc_id long, payload binary")
    df = MM.attach_media_meta(df, "payload", "video", "mp4")
    df = df.withColumn("media_meta", F.col("media_meta").withField("duration_ms", F.lit(3500).cast("long")))
    frames = MM.frame_sample_plan(df, every_ms=1000)
    assert [r["frame_ts_ms"] for r in frames.collect()] == [0, 1000, 2000, 3000]


# ---------------------------------------------------------------- avro (F7)

def test_avro_golden_bytes():
    """Hand-computed Avro binary encoding: nullable-union record
    {id: 3 (long), name: "ab"} → branch(1) zigzag(3) branch(1) len(2) 'ab'."""
    from felixzh_flink_spark.functions.avro_codec import (
        decode_record, encode_record)

    payload = encode_record([3, "ab"], ["long", "string"])
    assert payload == bytes([0x02, 0x06, 0x02, 0x04, 0x61, 0x62])
    assert decode_record(payload, ["long", "string"]) == [3, "ab"]


def test_avro_null_and_negative_roundtrip():
    from felixzh_flink_spark.functions.avro_codec import (
        decode_record, encode_record)

    kinds = ["long", "string", "double", "boolean"]
    for row in ([None, None, None, None],
                [-1, "", -0.5, True],
                [2**62, "héllo", 1e300, False],
                [-(2**62), "x", float("inf"), True]):
        assert decode_record(encode_record(row, kinds), kinds) == row


def test_avro_bytes_match_jvm_avro_reader(spark):
    """Wire-format compliance: bytes from the Python encoder must decode
    with the reference implementation (org.apache.avro, on Spark's own
    classpath) against the generated schema."""
    import json

    from pyspark.sql import types as T

    from felixzh_flink_spark.functions.avro_codec import (
        avro_schema_of, encode_record)

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("price", T.DoubleType()),
    ])
    jvm = spark.sparkContext._jvm
    asch = jvm.org.apache.avro.Schema.Parser().parse(
        json.dumps(avro_schema_of(schema)))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(asch)
    payload = encode_record([42, "scooter", 5.18], ["long", "string", "double"])
    bais = jvm.java.io.ByteArrayInputStream(bytes(payload))
    dec = jvm.org.apache.avro.io.DecoderFactory.get().binaryDecoder(bais, None)
    rec = reader.read(None, dec)
    assert rec.get("id") == 42
    assert str(rec.get("name")) == "scooter"
    assert rec.get("price") == 5.18


def test_avro_roundtrip_dataframe_identity(spark):
    """avro_roundtrip is the identity on a DataFrame with nulls, timestamps
    and doubles — the Avro2Avro pipeline contract."""
    import datetime as dt

    from pyspark.sql import types as T

    from felixzh_flink_spark.functions.avro_codec import avro_roundtrip

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("ts", T.TimestampNTZType()),
    ])
    rows = [
        (1, "a", 1.5, dt.datetime(2024, 1, 1, 12, 0, 0, 123456)),
        (2, None, None, None),
        (None, "", -0.0, dt.datetime(1969, 12, 31, 23, 59, 59)),
    ]
    df = spark.createDataFrame(rows, schema)
    out = avro_roundtrip(df, ["id", "name", "price", "ts"], schema)
    assert out.schema == df.schema
    assert sorted(out.collect(), key=str) == sorted(df.collect(), key=str)


def test_avro_record_roundtrip_property():
    """Property: decode(encode(row)) == row for every nullable field kind
    the codec supports, across the full int64 range, unicode strings
    (incl. astral plane / embedded NULs), raw bytes, and double bit
    patterns (±inf, subnormals; NaN compared by bit identity)."""
    import math
    import struct

    from hypothesis import given, settings, strategies as st

    from felixzh_flink_spark.functions.avro_codec import (
        decode_record, encode_record)

    kinds = ["long", "int", "string", "bytes", "double", "boolean", "float"]
    row_st = st.tuples(
        st.none() | st.integers(min_value=-2**63, max_value=2**63 - 1),
        st.none() | st.integers(min_value=-2**31, max_value=2**31 - 1),
        st.none() | st.text(max_size=40),
        st.none() | st.binary(max_size=40),
        st.none() | st.floats(allow_nan=True, allow_infinity=True),
        st.none() | st.booleans(),
        st.none() | st.floats(allow_nan=False, allow_infinity=True,
                              width=32),
    )

    def bits(v):
        if isinstance(v, float):
            return struct.pack("<d", v)
        return v

    @settings(max_examples=200, deadline=None)
    @given(row_st)
    def check(row):
        row = list(row)
        out = decode_record(encode_record(row, kinds), kinds)
        assert len(out) == len(row)
        for got, want in zip(out, row):
            if isinstance(want, float) and math.isnan(want):
                assert isinstance(got, float) and math.isnan(got)
            else:
                assert bits(got) == bits(want), (got, want)

    check()


def test_avro_roundtrip_big_longs_with_nulls(spark):
    """A nullable long column with nulls IN THE SAME Arrow batch must not
    round values above 2^53 (Arrow's NaN-for-null float64 coercion).
    Values straddle 2^53 and ±2^62; coalesce(1) forces one batch."""
    from pyspark.sql import types as T

    from felixzh_flink_spark.functions.avro_codec import avro_roundtrip

    schema = T.StructType([T.StructField("id", T.LongType())])
    vals = [2**53 + 1, -(2**53) - 1, 2**62 + 3, -(2**62) - 3, None, 0]
    df = spark.createDataFrame([(v,) for v in vals], schema).coalesce(1)
    out = avro_roundtrip(df, ["id"], schema)
    assert sorted((r["id"] for r in out.collect()), key=str) == \
        sorted(vals, key=str)


def test_length_histogram_bucket_edges(spark):
    """Bit-width bucketing: 0→bucket 0; 1→1; 2,3→2; 4..7→3; bucket_min is
    the inclusive power-of-two lower bound."""
    from felixzh_flink_spark.operators.text import length_histogram

    docs = [("s", ""), ("s", "a"), ("s", "a b"), ("s", "a b c"),
            ("s", "a b c d"), ("s", "a b c d e f g")]
    df = spark.createDataFrame(docs, "source string, text string")
    got = {r["len_bucket"]: (r["n_docs"], r["total_tokens"], r["bucket_min"])
           for r in length_histogram(df).collect()}
    assert got == {0: (1, 0, 0), 1: (1, 1, 1), 2: (2, 5, 2), 3: (2, 11, 4)}


def test_audio_segment_plan_byte_ranges(spark):
    """Segments tile the duration exactly: contiguous byte ranges, final
    partial segment clipped, zero-duration rows get one empty segment."""
    from pyspark.sql import functions as F, types as T

    from felixzh_flink_spark.operators.multimodal import audio_segment_plan

    meta = T.StructType([T.StructField("duration_ms", T.LongType())])
    df = spark.createDataFrame(
        [(1, {"duration_ms": 25_000}), (2, {"duration_ms": 0})],
        T.StructType([T.StructField("doc_id", T.LongType()),
                      T.StructField("media_meta", meta)]))
    rows = sorted(
        audio_segment_plan(df, segment_ms=10_000, sample_rate=16_000,
                           bytes_per_sample=2, channels=1).collect(),
        key=lambda r: (r["doc_id"], r["segment_idx"]))
    d1 = [(r["start_ms"], r["end_ms"], r["byte_offset"], r["byte_length"])
          for r in rows if r["doc_id"] == 1]
    # 25s at 32 kB/s: 10s, 10s, 5s — offsets contiguous, last one clipped
    assert d1 == [(0, 10_000, 0, 320_000_000 // 1000),
                  (10_000, 20_000, 320_000_000 // 1000 * 1, 320_000),
                  (20_000, 25_000, 640_000_000 // 1000, 160_000)]
    d2 = [(r["segment_idx"], r["byte_length"]) for r in rows if r["doc_id"] == 2]
    assert d2 == [(0, 0)]


def test_resize_plan_geometry(spark):
    """Wide and tall sources scale on their constraining axis; padding
    centers the other; degenerate dims yield null geometry."""
    from pyspark.sql import types as T

    from felixzh_flink_spark.operators.multimodal import resize_plan

    meta = T.StructType([T.StructField("width", T.IntegerType()),
                         T.StructField("height", T.IntegerType())])
    df = spark.createDataFrame(
        [(1, {"width": 1024, "height": 512}),
         (2, {"width": 100, "height": 400}),
         (3, {"width": 0, "height": 7})],
        T.StructType([T.StructField("doc_id", T.LongType()),
                      T.StructField("media_meta", meta)]))
    got = {r["doc_id"]: (r["out_w"], r["out_h"], r["pad_x"], r["pad_y"])
           for r in resize_plan(df, 512, 512).collect()}
    assert got[1] == (512, 256, 0, 128)     # width-constrained
    assert got[2] == (128, 512, 192, 0)     # height-constrained
    assert got[3] == (None, None, None, None)


def test_csv_roundtrip_preserves_empty_vs_null(spark):
    """Empty string and NULL are distinct values and must survive the
    roundtrip distinctly (default csv nullValue='' conflated them)."""
    from pyspark.sql import types as T

    from felixzh_flink_spark.functions.formats import csv_roundtrip

    df = spark.createDataFrame([("", 1), ("x", 2), (None, 3)],
                               "s string, i long")
    schema = T.StructType([T.StructField("s", T.StringType()),
                           T.StructField("i", T.LongType())])
    got = {r["i"]: r["s"] for r in csv_roundtrip(df, ["s", "i"], schema).collect()}
    assert got == {1: "", 2: "x", 3: None}


def test_avro_roundtrip_preserves_nan_vs_null(spark):
    """A genuine NaN measurement must roundtrip as NaN, not be rewritten
    to the Avro null branch (pandas represents null as NaN in float64
    columns — the codec transports doubles as strings to distinguish)."""
    import math

    from pyspark.sql import types as T

    from felixzh_flink_spark.functions.avro_codec import avro_roundtrip

    df = spark.createDataFrame(
        [(1, float("nan")), (2, 1.5), (3, None), (4, float("inf"))],
        "id long, v double")
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.DoubleType())])
    got = {r["id"]: r["v"]
           for r in avro_roundtrip(df, ["id", "v"], schema).collect()}
    assert math.isnan(got[1])
    assert got[2] == 1.5 and got[3] is None
    assert math.isinf(got[4])


# ----------------------------------------------------------- strip_html

def test_strip_html_drops_script_style_and_tags(spark):
    html = ('<html><head><style>p {color: red}</style></head><body>'
            '<h1>Title</h1><p>Hello <b>world</b> &amp; friends</p>'
            '<script>var x = "<p>not text</p>";</script>'
            '<p>Bye&nbsp;now</p></body></html>')
    df = spark.createDataFrame([(1, html)], "id long, html string")
    out = df.select(TX.strip_html("html")).collect()[0]["clean_text"]
    assert out == 'Title Hello world & friends Bye now'


def test_strip_html_entities_and_plain_text(spark):
    df = spark.createDataFrame(
        [(1, "no tags &lt;here&gt; &quot;ok&quot; &#39;y&#39;"), (2, "")],
        "id long, html string")
    vals = [r["clean_text"] for r in
            df.orderBy("id").select(TX.strip_html("html")).collect()]
    assert vals[0] == 'no tags <here> "ok" \'y\''
    assert vals[1] == ""


def test_strip_html_double_escaped_entities_decode_once(spark):
    # &amp; must decode LAST: literal "&amp;lt;" is an escaped "&lt;" and
    # must surface as "&lt;", never double-decode to "<"
    df = spark.createDataFrame(
        [(1, "x &amp;lt;tag&amp;gt; y &amp;amp; z")],
        "id long, html string")
    out = df.select(TX.strip_html("html")).collect()[0]["clean_text"]
    assert out == "x &lt;tag&gt; y &amp; z"


def test_strip_html_multiline_script(spark):
    html = "a<script type='x'>\nline1\nline2\n</script>b"
    df = spark.createDataFrame([(1, html)], "id long, html string")
    assert df.select(TX.strip_html("html")).collect()[0]["clean_text"] == "a b"


def test_url_host_and_registrable_domain(spark):
    """Site-key extraction edges: userinfo and ports stripped, case
    folded, multi-label public suffixes promote last-3 labels, custom
    suffixes extend the embedded PSL subset."""
    from felixzh_flink_spark.operators.text import (
        registrable_domain, url_host)

    rows = [
        ("https://WWW.Example.COM/path?q=1", "example.com"),
        ("http://user:pw@news.bbc.co.uk:8080/x", "bbc.co.uk"),
        ("https://a.b.site5.com.au/", "site5.com.au"),
        ("http://example.io/", "example.io"),
        ("https://deep.sub.tree.example.org/y", "example.org"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url: string")
    got = [r["d"] for r in df.select(
        registrable_domain(url_host("url")).alias("d")).collect()]
    assert got == [d for _, d in rows]

    custom = spark.createDataFrame(
        [("https://shop.x.example.custom/",)], "url: string")
    assert custom.select(
        registrable_domain(url_host("url"),
                           extra_suffixes=("example.custom",))
        .alias("d")).collect()[0]["d"] == "x.example.custom"


def test_url_host_malformed_inputs_yield_null_not_error(spark):
    """ADVICE r5: under Spark-4 ANSI mode, element_at on a too-short
    split array aborts the job. Real crawl inputs contain single-label
    hosts and non-URL garbage — those must map to null/host, never
    throw."""
    from felixzh_flink_spark.operators.text import (
        registrable_domain, url_host)

    df = spark.createDataFrame(
        [("http://localhost/x",), ("not a url at all",), ("",),
         (None,), ("ftp://host.example.com",)], "url: string")
    got = [(r["h"], r["d"]) for r in df.select(
        url_host("url").alias("h"),
        registrable_domain(url_host("url")).alias("d")).collect()]
    assert got[0] == ("localhost", "localhost")   # single label → itself
    assert got[1][0] is None                      # no '//' → null host
    assert got[2][0] is None and got[3][0] is None
    assert got[4] == ("host.example.com", "example.com")


def test_canonical_url_edges(spark):
    """Canonicalization edges: fragment strip, tracking-prefix vs
    exact-key drops ('refresh' must survive 'ref'), param sorting,
    all-params-dropped leaves a bare base, custom drop lists."""
    from felixzh_flink_spark.operators.text import canonical_url

    rows = [
        ("https://x.com/a?utm_source=tw&b=2&a=1", "https://x.com/a?a=1&b=2"),
        ("https://x.com/a?a=1&b=2#section", "https://x.com/a?a=1&b=2"),
        ("https://x.com/a?b=2&a=1&fbclid=zz", "https://x.com/a?a=1&b=2"),
        ("https://x.com/a", "https://x.com/a"),
        ("https://x.com/a?utm_campaign=q", "https://x.com/a"),
        ("https://x.com/a?ref=hn&refresh=1", "https://x.com/a?refresh=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url: string")
    got = [r["c"] for r in
           df.select(canonical_url("url").alias("c")).collect()]
    assert got == [c for _, c in rows]

    custom = spark.createDataFrame(
        [("https://x.com/a?sid=1&keep=2",)], "url: string")
    assert custom.select(
        canonical_url("url", drop_prefixes=(), drop_keys=("sid",))
        .alias("c")).collect()[0]["c"] == "https://x.com/a?keep=2"


def test_robots_verdict_longest_match_and_ties(spark):
    """RFC 9309 semantics: longest prefix wins, Allow wins exact-length
    ties, no match allows; quotes/backslashes in rules are escaped, not
    misinterpreted."""
    from felixzh_flink_spark.operators.text import robots_verdict

    rules = [("/a", False), ("/a/b", True), ("/x1", True), ("/x2", False),
             ("/t", False), ("/t", True)]  # exact tie on /t -> Allow
    df = spark.createDataFrame(
        [("/a/z",), ("/a/b/z",), ("/x1/q",), ("/x2/q",), ("/t/q",),
         ("/none",)], "path: string")
    got = [r["ok"] for r in
           df.select(robots_verdict("path", rules).alias("ok")).collect()]
    assert got == [False, True, True, False, True, True]

    # a quote or backslash in the rule is a literal path byte (ADVICE
    # r5: '\t' must stay backslash-t, not become a tab)
    odd = spark.createDataFrame(
        [("/a'b/x",), ("/a'c",), ("/\\t/x",), ("/\t/x",)], "path: string")
    got = [r["ok"] for r in odd.select(robots_verdict(
        "path", [("/a'b", False), ("/\\t", False)]).alias("ok")).collect()]
    assert got == [False, True, False, True]


def test_robots_verdict_wildcards(spark):
    """RFC 9309 §2.2.3 wildcards: `*` matches any run, trailing `$`
    anchors the end, mid-pattern `$` is literal; precedence is rule-text
    length so a long wildcard rule beats a shorter prefix rule."""
    from felixzh_flink_spark.operators.text import (_robots_regex,
                                                    robots_verdict)

    assert _robots_regex("/plain") is None
    assert _robots_regex("/*.pdf$") == r"^/.*\.pdf$"
    assert _robots_regex("/exact$") == "^/exact$"

    rules = [("/*.pdf$", False),          # any .pdf anywhere → deny
             ("/docs/", True),            # but /docs/ prefix allows…
             ("/docs/*.pdf$", False),     # …except its pdfs (longest)
             ("/tmp$", False),            # exactly /tmp
             ("/cgi*bin", False),         # * mid-pattern
             ("/li$t", False)]            # mid $ is literal
    df = spark.createDataFrame(
        [("/x/report.pdf",), ("/x/report.pdfx",), ("/docs/a.html",),
         ("/docs/a.pdf",), ("/tmp",), ("/tmp/f",), ("/cgi-bin/q",),
         ("/li$t/x",), ("/lit/x",)], "path: string")
    got = [r["ok"] for r in
           df.select(robots_verdict("path", rules).alias("ok")).collect()]
    assert got == [False,  # *.pdf$ matches
                   True,   # .pdfx not end-anchored match
                   True,   # /docs/ allow
                   False,  # /docs/*.pdf$ (len 12) beats /docs/ (len 6)
                   False,  # /tmp$ exact
                   True,   # /tmp/f not exactly /tmp, no other match
                   False,  # /cgi*bin
                   False,  # literal $ matched
                   True]   # /lit/x ≠ /li$t

    # empty ruleset → everything allowed
    assert df.select(robots_verdict("path", []).alias("ok")) \
             .filter("NOT ok").count() == 0


def test_robots_gate_rules_as_data(spark):
    """Multi-domain gate with the rules table as data: per-site rules
    resolve via the registrable-domain join key (subdomains land on
    their site), wildcard/anchor patterns compile to regexes IN Spark,
    sites without rules allow everything, and odd pattern bytes
    (quotes, backslashes, regex metachars) stay literal."""
    from felixzh_flink_spark.operators.text import (robots_gate,
                                                    robots_rules_compiled)

    rules = spark.createDataFrame(
        [("example.com", "/private", False),
         ("example.com", "/private/ok", True),
         ("files.net", "/*.pdf$", False),
         ("files.net", "/", True),
         ("odd.org", "/a(b)+c", False),     # regex metachars literal
         ("odd.org", "/q'x", False)],
        "domain string, pattern string, is_allow boolean")
    urls = [
        ("https://www.example.com/private/x", False),
        ("https://shop.example.com/private/ok/y", True),
        ("http://files.net/d/r.pdf", False),
        ("http://files.net/d/r.pdf#frag", False),  # fragment stripped
        ("https://files.net/d/r.txt", True),
        ("https://no-rules.io/whatever", True),
        ("https://odd.org/a(b)+c/d", False),
        ("https://odd.org/abbc/d", True),          # + stayed literal
        ("https://odd.org/q'x", False),
        (None, True),                              # null URL → allowed
    ]
    df = spark.createDataFrame([(u,) for u, _ in urls], "url: string")
    got = [r["allowed"] for r in robots_gate(df, "url", rules).collect()]
    assert got == [e for _, e in urls]

    # the compiled regex column matches _robots_regex's translation
    compiled = {r["pattern"]: r["_rx"]
                for r in robots_rules_compiled(rules).collect()}
    assert compiled["/*.pdf$"] == r"^/\*\.pdf$".replace(r"\*", ".*")
    assert compiled["/a(b)+c"] == r"^/a\(b\)\+c"
