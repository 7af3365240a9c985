"""Skew-join hardening: the salted recipe and AQE's runtime skew split.

VERDICT-r4 item 7: the reference's DataSkew module
(DataSkew/src/main/java/SocketAppV2.java:23-67) was verified only at toy
scale; these tests pin BOTH 100×-survival mechanisms on a deliberately
skewed join (one key carrying ~20% of all rows):

- the explicit salted path (`aggregations.salted_skew_join`) produces
  results identical to the plain join AND its plan actually spreads the
  hot key (salt replication visible in the physical plan, join keys
  include the salt);
- Spark's AQE skew-join splitting engages at runtime (`skew=true` on the
  sort-merge join) when broadcast is unavailable — the path a 100 TB
  shuffle join would take without any code change.
"""

import pytest
from pyspark.sql import functions as F

from felixzh_flink_spark.operators.aggregations import salted_skew_join


@pytest.fixture(scope="module")
def skewed(spark):
    """Fact side: 50k rows, key 1 holds ~20%; dim side: 1k unique keys."""
    fact = spark.range(50_000).select(
        F.when(F.col("id") % 5 == 0, F.lit(1))
        .otherwise(F.col("id") % 1000).cast("bigint").alias("k"),
        (F.col("id") % 97).alias("v"))
    dim = spark.range(1000).select(
        F.col("id").cast("bigint").alias("k"),
        (F.col("id") % 7).alias("g"))
    return fact, dim


def test_salted_join_matches_plain_join(spark, skewed):
    fact, dim = skewed
    plain = (fact.join(dim, "k").groupBy("g")
             .agg(F.count("*").alias("n"), F.sum("v").alias("s")))
    salted = (salted_skew_join(fact, dim, "k", salt_buckets=16)
              .groupBy("g")
              .agg(F.count("*").alias("n"), F.sum("v").alias("s")))
    assert sorted(map(tuple, salted.collect())) == \
        sorted(map(tuple, plain.collect()))


def test_salted_join_plan_spreads_hot_key(spark, skewed):
    fact, dim = skewed
    joined = salted_skew_join(fact, dim, "k", salt_buckets=16)
    plan = joined._jdf.queryExecution().optimizedPlan().toString()
    # the salt column must reach the join keys and the dim side must be
    # replicated via explode — otherwise the hot key still lands on one
    # reducer and the helper is a no-op with extra steps
    assert "_salt" in plan
    assert "explode" in plan.lower()
    # and the hot key's rows genuinely spread over >1 salt bucket
    spread = (fact.withColumn(
        "_salt", (F.rand(seed=42) * 16).cast("int"))
        .filter(F.col("k") == 1)
        .select("_salt").distinct().count())
    assert spread > 8


def test_aqe_splits_skewed_sort_merge_join(spark, skewed):
    fact, dim = skewed
    confs = {
        # force a shuffle join (the 100 TB shape): no broadcast escape
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # lower the skew thresholds so the toy hot partition qualifies,
        # and pin the shuffle geometry so earlier tests in a shared
        # session can't change the median-partition baseline the skew
        # factor compares against
        "spark.sql.shuffle.partitions": "16",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # the join is the TERMINAL operator: AQE's OptimizeSkewedJoin is
        # deliberately conservative and skips the split when a downstream
        # stage could reuse the join's hash partitioning (an agg after
        # the join suppresses it unless forceOptimizeSkewedJoin) — the
        # 100 TB shape this models is the big enrichment join feeding a
        # sink
        joined = fact.join(dim, "k")
        # execute THIS DataFrame's own QueryExecution (a write would spawn
        # a separate one and leave joined's plan un-finalized)
        assert len(joined.collect()) == 50_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
