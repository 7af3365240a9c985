"""Tests: deterministic sampling/splitting, salted skew join, compaction,
table profiling."""

import glob

from pyspark.sql import functions as F

from felixzh_flink_spark.operators.aggregations import salted_skew_join
from felixzh_flink_spark.operators.profiling import profile_numeric
from felixzh_flink_spark.operators.sampling import (
    deterministic_sample,
    train_test_split,
)
from felixzh_flink_spark.sinks.compaction import compact_parquet


def test_split_is_disjoint_exhaustive_and_stable(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    train, test = train_test_split(o, "o_custkey", test_pct=10)
    n, nt, ns = o.count(), train.count(), test.count()
    assert nt + ns == n and 0 < ns < n
    # key-level split: no customer appears on both sides
    both = train.select("o_custkey").intersect(test.select("o_custkey"))
    assert both.count() == 0
    # stability: same assignment on re-computation
    train2, _ = train_test_split(o, "o_custkey", test_pct=10)
    assert train2.count() == nt


def test_deterministic_sample_fraction(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    frac = deterministic_sample(o, "o_orderkey", 20).count() / o.count()
    assert 0.1 < frac < 0.3  # md5 is uniform-ish at this n


def test_salted_skew_join_equals_plain_join(spark):
    left = spark.createDataFrame(
        [(k, i) for i in range(200) for k in ("hot",)] + [("cold", 0)],
        "k string, v long")
    right = spark.createDataFrame([("hot", 10.0), ("cold", 20.0)], "k string, w double")
    plain = left.join(right, "k")
    salted = salted_skew_join(left, right, "k", salt_buckets=8)
    assert salted.count() == plain.count() == 201
    assert (sorted(r["w"] for r in salted.filter(F.col("k") == "cold").collect())
            == [20.0])


def test_compaction_reduces_file_count(spark, tmp_path):
    path = str(tmp_path / "many")
    # simulate a streaming sink: 12 tiny appends = many small files
    for i in range(12):
        spark.range(i * 10, i * 10 + 10).write.mode("append").parquet(path)
    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 12
    n = compact_parquet(spark, path, target_file_bytes=128 << 20)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert n == 1 and after == 1
    assert spark.read.parquet(path).count() == 120  # no rows lost


def test_profile_numeric_stats(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (None,), (2.0,)], "x double")
    row = profile_numeric(df, ["x"]).head()
    assert row["n_rows"] == 4 and row["x_nulls"] == 1
    assert row["x_min"] == 1.0 and row["x_max"] == 2.0 and row["x_distinct"] == 2


def test_metadata_stats_pushes_aggregate_to_footer(spark, sf_dir):
    """DSv2 aggregate pushdown: the MIN/MAX/COUNT job reads parquet footers
    (PushedAggregation in every plan), matches a plain aggregate, and the
    scoped confs are restored afterwards."""
    from felixzh_flink_spark.operators.profiling import metadata_stats
    before = spark.conf.get("spark.sql.sources.useV1SourceList")
    out, plans = metadata_stats(spark, f"{sf_dir}/lineitem.parquet",
                                ["l_orderkey", "l_suppkey"])
    assert all("PushedAggregation: [MIN" in p or "PushedAggregation: [Min" in p
               for p in plans), plans[0][:500]
    got = {r["col_name"]: r for r in out.collect()}
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exp = l.agg({"l_orderkey": "min"}).head()[0]
    assert got["l_orderkey"]["min_value"] == str(exp)
    assert got["l_orderkey"]["n_rows"] == l.count()
    assert spark.conf.get("spark.sql.sources.useV1SourceList") == before
