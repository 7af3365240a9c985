import datetime as dt

from pyspark.sql import functions as F

from felixzh_flink_spark.operators.relational import (
    anti_join,
    asof_join,
    pivot_agg,
    range_join_bucketed,
    semi_join,
    top_k,
    top_k_per_group,
)

BASE = dt.datetime(2024, 1, 1)


def _ts(s):
    return BASE + dt.timedelta(seconds=s)


def test_asof_join_matches_latest_preceding(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(30), "p2"), (2, _ts(5), "p3")],
        "k long, lts timestamp, lbl string")
    right = spark.createDataFrame(
        [(1, _ts(8), 100.0), (1, _ts(25), 200.0), (1, _ts(31), 300.0)],
        "k long, rts timestamp, rv double")
    out = {r["lbl"]: (r["rv_r"], r["rts_r"])
           for r in asof_join(left, right, "k", "lts", "rts", ["rv", "rts"]).collect()}
    assert out["p1"] == (100.0, _ts(8))    # latest ≤ 10 is 8
    assert out["p2"] == (200.0, _ts(25))   # 31 is in the future
    assert out["p3"] == (None, None)       # no right rows for key 2


def test_asof_join_equal_ts_is_inclusive(spark):
    left = spark.createDataFrame([(1, _ts(10), "p")], "k long, lts timestamp, lbl string")
    right = spark.createDataFrame([(1, _ts(10), 7.0)], "k long, rts timestamp, rv double")
    row = asof_join(left, right, "k", "lts", "rts", ["rv"]).head()
    assert row["rv_r"] == 7.0  # ts >= ts ⇒ match


def test_range_join_window_bounds(spark):
    left = spark.createDataFrame([(1, _ts(100), "p")], "k long, lts timestamp, lbl string")
    right = spark.createDataFrame(
        [(1, _ts(s)) for s in (69, 70, 99, 100, 101)], "k long, rts timestamp")
    out = range_join_bucketed(left, right, "k", "lts", "rts",
                              lower_us=-30 * 10**6, upper_us=0)
    secs = sorted(r["rts"].second for r in out.collect())
    assert secs == [10, 39, 40]  # 70,99,100 (inclusive both ends); 69 and 101 out


def test_semi_anti_join(spark):
    a = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    b = spark.createDataFrame([(2,), (3,), (4,)], "k long")
    assert sorted(r["k"] for r in semi_join(a, b, "k").collect()) == [2, 3]
    assert sorted(r["k"] for r in anti_join(a, b, "k").collect()) == [1]


def test_top_k_global_and_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 5), ("a", 3), ("b", 9)], "g string, v long")
    assert [r["v"] for r in top_k(df, 2, F.desc("v")).collect()] == [9, 5]
    per = top_k_per_group(df, ["g"], [F.desc("v")], 1)
    assert {(r["g"], r["v"]) for r in per.collect()} == {("a", 5), ("b", 9)}


def test_pivot_agg_explicit_values(spark):
    df = spark.createDataFrame(
        [("p1", "O"), ("p1", "O"), ("p1", "F"), ("p2", "P")], "g string, s string")
    out = {r["g"]: (r["n_O"], r["n_F"], r["n_P"])
           for r in pivot_agg(df, "g", "s", ["O", "F", "P"],
                              F.count(F.lit(1)), prefix="n_").collect()}
    assert out["p1"] == (2, 1, None) and out["p2"] == (None, None, 1)


def test_asof_join_deterministic_on_duplicate_right_ts(spark):
    """Multiple right rows sharing (key, ts): the carried row must be chosen
    deterministically (greatest-by-value struct) and atomically (whole row,
    never a column mix of two duplicates)."""
    from felixzh_flink_spark.operators.relational import asof_join

    left = spark.createDataFrame([(1, 100)], "k long, lts long")
    right = spark.createDataFrame(
        [(1, 50, "x", 10.0), (1, 50, "a", 99.0)],  # same (k, ts), two rows
        "k long, rts long, tag string, px double")
    outs = set()
    for n in (1, 7):  # different partitionings must not change the answer
        r = asof_join(left, right.repartition(n), "k", "lts", "rts",
                      ["tag", "px"])
        row = r.head()
        outs.add((row["tag_r"], row["px_r"]))
    # greatest struct (tag, px): ("x", 10.0) > ("a", 99.0) lexicographically
    assert outs == {("x", 10.0)}


def test_asof_join_ignores_null_right_timestamps(spark):
    """A right row with a NULL timestamp can never be an as-of match —
    ascending sort placed nulls first, so it used to be carried as the
    match for every earlier left row."""
    from felixzh_flink_spark.operators.relational import asof_join

    left = spark.createDataFrame([(1, 5)], "k long, lts long")
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, 3, 7.0)], "k long, rts long, rv double")
    out = asof_join(left, right, key="k", left_ts="lts", right_ts="rts",
                    right_cols=["rv"]).head()
    assert out["rv_r"] == 7.0       # the real ts=3 row, not the null-ts 99
    only_null = spark.createDataFrame([(1, None, 99.0)],
                                      "k long, rts long, rv double")
    out2 = asof_join(left, only_null, key="k", left_ts="lts",
                     right_ts="rts", right_cols=["rv"]).head()
    assert out2["rv_r"] is None     # no valid right row -> no match


def test_recursive_hierarchy_forest_and_depth_bound(spark):
    from felixzh_flink_spark.operators.relational import recursive_hierarchy
    # forest: two roots (1, 10); 2->1, 3->2; 11->10
    nodes = spark.createDataFrame(
        [(1, None, "a"), (2, 1, "b"), (3, 2, "c"),
         (10, None, "x"), (11, 10, "y")],
        "id int, parent int, label string")
    out = {r["id"]: (r["depth"], r["path"])
           for r in recursive_hierarchy(spark, nodes, "id", "parent",
                                        "label").collect()}
    assert out == {1: (0, "a"), 2: (1, "a/b"), 3: (2, "a/b/c"),
                   10: (0, "x"), 11: (1, "x/y")}
    # max_depth truncates (also the cycle guard): depth-2 nodes dropped
    shallow = recursive_hierarchy(spark, nodes, "id", "parent", "label",
                                  max_depth=1)
    assert {r["id"] for r in shallow.collect()} == {1, 2, 10, 11}


def test_zorder_value_interleaves_bits(spark):
    from felixzh_flink_spark.operators.layout import zorder_value
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(0b101, 0b011)], "x long, y long")
    z = df.select(zorder_value([F.col("x"), F.col("y")], bits=3)
                  .alias("z")).collect()[0]["z"]
    # x bits (1,0,1) at even positions, y bits (1,1,0) at odd:
    # z = x0<<0 | y0<<1 | x1<<2 | y1<<3 | x2<<4 | y2<<5
    assert z == (1 << 0) | (1 << 1) | (0 << 2) | (1 << 3) | (1 << 4)


def test_zorder_layout_tightens_file_stats(spark, tmp_path):
    """The point of z-ordering: per-FILE min-max ranges shrink on BOTH
    clustered columns, so parquet stats prune filters on either one.
    Compare footer stats of a z-ordered write vs an unclustered write of
    the same rows."""
    import glob

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from felixzh_flink_spark.operators.layout import (
        range_bucket, write_zordered)

    n, files = 4096, 8
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % 4096).alias("a"),
        (F.col("id") * 40503 % 4096).alias("b"))

    def spans(path):
        out = []
        for f in glob.glob(path + "/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            if md.num_rows == 0:
                continue
            cols = {md.schema.column(i).name: i
                    for i in range(md.num_columns)}
            sa = md.row_group(0).column(cols["a"]).statistics
            sb = md.row_group(0).column(cols["b"]).statistics
            lo_a, hi_a = sa.min, sa.max
            lo_b, hi_b = sb.min, sb.max
            for g in range(1, md.num_row_groups):
                sa = md.row_group(g).column(cols["a"]).statistics
                sb = md.row_group(g).column(cols["b"]).statistics
                lo_a, hi_a = min(lo_a, sa.min), max(hi_a, sa.max)
                lo_b, hi_b = min(lo_b, sb.min), max(hi_b, sb.max)
            out.append(((hi_a - lo_a), (hi_b - lo_b)))
        return out

    plain = str(tmp_path / "plain")
    df.repartition(files).write.parquet(plain)
    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath,
                   [range_bucket("a", 0, 4095, 6),
                    range_bucket("b", 0, 4095, 6)],
                   bits=6, n_files=files)

    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    plain_a = mean([s[0] for s in spans(plain)])
    plain_b = mean([s[1] for s in spans(plain)])
    z_a = mean([s[0] for s in spans(zpath)])
    z_b = mean([s[1] for s in spans(zpath)])
    # random layout: every file spans ~the full domain on both columns.
    # z-ordered: BOTH mean spans shrink materially (each file covers a
    # hyper-rectangle ~1/sqrt(files) of each axis plus bucket rounding).
    assert z_a < plain_a * 0.75 and z_b < plain_b * 0.75, (
        plain_a, plain_b, z_a, z_b)
    # same rows survive the rewrite
    assert spark.read.parquet(zpath).count() == n


def test_compact_parquet_merges_files_atomically(spark, tmp_path):
    from felixzh_flink_spark.operators.layout import compact_parquet
    path = str(tmp_path / "many")
    # 32 tiny files
    spark.range(10_000).repartition(32).write.parquet(path)
    before = spark.read.parquet(path).count()
    stats = compact_parquet(spark, path, target_mb=128)
    assert stats["files_before"] == 32
    assert stats["files_after"] == 1          # well under one target file
    assert stats["rows"] == before == 10_000
    after = spark.read.parquet(path)
    assert after.count() == 10_000
    assert sorted(r["id"] for r in after.collect()) == list(range(10_000))
    # no tmp/old residue
    import os
    assert not os.path.exists(path + "_compact_tmp")
    assert not os.path.exists(path + "_compact_old")


def test_compact_parquet_on_scheme_qualified_path(spark, tmp_path):
    """The compaction's directory swap rides StateFS — a file: URI path
    must work end to end (same contract as the state sinks)."""
    from felixzh_flink_spark.operators.layout import compact_parquet
    path = "file:" + str(tmp_path / "uri_many")
    spark.range(500).repartition(8).write.parquet(path)
    stats = compact_parquet(spark, path, target_mb=64)
    assert stats == {"files_before": 8, "files_after": 1, "rows": 500}
    assert spark.read.parquet(path).count() == 500
