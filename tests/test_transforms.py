from pyspark.sql import functions as F

from felixzh_flink_spark.operators import transforms as TR


def test_tokenize_lowercases_splits_and_drops_empties(spark):
    df = spark.createDataFrame([("Hello  World foo",), ("  ",), ("A-b_c",)], "text string")
    words = [r["word"] for r in TR.tokenize(df, "text").collect()]
    # [^a-z0-9]+ splits on '-' and '_' alike
    assert sorted(words) == ["a", "b", "c", "foo", "hello", "world"]


def test_word_count_reference_hello_world(spark):
    # ExecutionMode.java:21 fromElements("1 2 3 4 1 2 3") → keyed counts
    df = spark.createDataFrame([("1 2 3 4 1 2 3",)], "value string")
    out = dict(
        (r["word"], r["cnt"])
        for r in TR.tokenize(df, "value").groupBy("word").agg(F.count("*").alias("cnt")).collect()
    )
    assert out == {"1": 2, "2": 2, "3": 2, "4": 1}


def test_split_words_udtf_matches_reference_semantics(spark):
    # MyTableFunction.java:8-16: split on space → Row(word, length)
    df = spark.createDataFrame([("hello felixzh",), ("FelixZh ok",)], "myField string")
    rows = TR.split_words_udtf(df, "myField").collect()
    got = {(r["pos"], r["word"], r["length"]) for r in rows}
    assert (0, "hello", 5) in got and (1, "felixzh", 7) in got
    assert (0, "FelixZh", 7) in got and (1, "ok", 2) in got


def test_map_append(spark):
    df = spark.createDataFrame([("x",)], "value string")
    assert TR.map_append(df, "value", "_suffix").head()["value"] == "x_suffix"


def test_map_with_rowkey_schema(spark):
    df = spark.createDataFrame([("payload",)], "value string")
    row = TR.map_with_rowkey(df, "value").head()
    assert set(row.asDict()) == {"row_key", "column_family", "qualifier", "data"}
    assert bytes(row["data"]) == b"payload"


def test_identity_process_is_noop(spark):
    df = spark.createDataFrame([(1,)], "a int")
    assert TR.identity_process(df) is df


def test_salted_rowkey_spreads_and_stays_point_readable(spark):
    """Sequential keys spread across salt buckets (no single region takes
    the monotone write load), the original key is recoverable after the
    separator, and the same key always salts identically."""
    from pyspark.sql import functions as F

    from felixzh_flink_spark.operators.transforms import salted_rowkey

    df = spark.range(1000).select(F.col("id").alias("k"))
    keyed = df.select(salted_rowkey("k", n_salts=16), "k")
    n_salts = keyed.select(F.substring("row_key", 1, 2)).distinct().count()
    assert n_salts == 16
    # recoverable + deterministic
    back = keyed.withColumn("k2", F.split("row_key", r"\|")[1].cast("long"))
    assert back.filter("k2 <> k").count() == 0
    a = {r["k"]: r["row_key"] for r in keyed.collect()}
    b = {r["k"]: r["row_key"]
         for r in df.repartition(7).select(salted_rowkey("k", 16), "k").collect()}
    assert a == b


def test_salted_rowkey_wide_salt_space_no_truncation(spark):
    """n_salts > 100 needs a 3-char pad: every salt prefix must parse back
    to its own bucket (lpad truncation would collide e.g. 123 into 12)."""
    from pyspark.sql import functions as F

    from felixzh_flink_spark.operators.transforms import salted_rowkey

    keyed = spark.range(5000).select(salted_rowkey(F.col("id"), n_salts=256), "id")
    parts = keyed.select(F.split("row_key", r"\|")[0].alias("salt")).distinct()
    salts = sorted(int(r["salt"]) for r in parts.collect())
    assert len(salts) == 256 and salts[-1] == 255
    assert all(len(r["row_key"].split("|")[0]) == 3
               for r in keyed.limit(50).collect())


def test_assign_global_ids_contiguous_and_partition_invariant(spark):
    from felixzh_flink_spark.operators.transforms import assign_global_ids
    rows = [(i, f"s{i % 3}") for i in range(97)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = assign_global_ids(df, ["source", "doc_id"]).collect()
    ids = sorted(r["global_id"] for r in out)
    assert ids == list(range(1, 98))
    by_key = {(r["source"], r["doc_id"]): r["global_id"] for r in out}
    want = {k: i + 1 for i, k in enumerate(sorted(by_key))}
    assert by_key == want
    # repartitioning the input does not change the numbering
    out2 = {(r["source"], r["doc_id"]): r["global_id"]
            for r in assign_global_ids(df.repartition(13), ["source", "doc_id"]).collect()}
    assert out2 == by_key


def test_event_runs_udtf_partitioned_table_arg(spark):
    """TABLE(t) PARTITION BY ... ORDER BY: per-key ordered stateful
    iteration — runs never straddle users, order decides run breaks."""
    from felixzh_flink_spark.functions.python_udtf import (
        register_python_udtfs)
    register_python_udtfs(spark)
    rows = [
        (1, 1, "a", 100), (1, 2, "a", 200), (1, 3, "b", 300),
        (1, 4, "a", 400),
        (2, 5, "a", 100),
    ]
    spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts_ms long"
    ).createOrReplaceTempView("_rt")
    got = sorted(
        (r["user_id"], r["event_type"], r["run_start_ms"], r["run_len"])
        for r in spark.sql("""
            SELECT * FROM event_runs_py(
              TABLE(_rt) PARTITION BY user_id ORDER BY (ts_ms, event_id))
        """).collect())
    assert got == [(1, "a", 100, 2), (1, "a", 400, 1), (1, "b", 300, 1),
                   (2, "a", 100, 1)]
