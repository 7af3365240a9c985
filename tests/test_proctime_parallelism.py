"""W1 processing-time windows + U7 per-operator parallelism as code.

Proc-time output is wall-clock-dependent, so the streaming tests assert
the invariants that define the semantics (exactly-once row coverage,
duration-aligned window bounds, one shared stamp per micro-batch)
rather than specific timestamps.
"""

import time

import pytest
from pyspark.sql import functions as F

from felixzh_flink_spark.operators.parallelism import (
    sink_parallelism,
    with_parallelism,
)
from felixzh_flink_spark.streaming.windows import (
    proc_time_tumbling_agg,
    with_proc_time,
)


def _two_batch_source(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.range(0, 6).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)                 # distinct mtimes → two micro-batches
    spark.range(6, 10).coalesce(1).write.mode("append").parquet(src)
    return spark.readStream.schema("id long").option(
        "maxFilesPerTrigger", 1).parquet(src)


def test_proc_time_stamp_is_constant_per_microbatch(spark, tmp_path):
    """current_timestamp() is the trigger's instant: every row of one
    micro-batch carries the SAME proc stamp — the proc-time assignment
    granularity of a micro-batch engine."""
    stream = with_proc_time(_two_batch_source(spark, tmp_path))
    per_batch = []

    def handle(bdf, _bid):
        per_batch.append(
            (bdf.count(), bdf.select("proc_ts").distinct().count()))

    q = stream.writeStream.foreachBatch(handle).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    assert sorted(per_batch) == [(4, 1), (6, 1)]


def test_proc_time_tumbling_agg_streaming_invariants(spark, tmp_path):
    """Global (windowAll-shaped) proc-time tumbling window over a real
    stream: every row lands in exactly one window, and window bounds
    align to the duration grid."""
    out = proc_time_tumbling_agg(
        _two_batch_source(spark, tmp_path), "1 second", [],
        [F.count("*").alias("n"), F.sum("id").alias("total")])
    q = (out.writeStream.outputMode("complete")
         .format("memory").queryName("proc_win").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    rows = spark.sql("SELECT * FROM proc_win").collect()
    assert 1 <= len(rows) <= 2                       # 2 batches, ≥1 window
    assert sum(r["n"] for r in rows) == 10           # exactly once
    assert sum(r["total"] for r in rows) == sum(range(10))
    for r in rows:
        assert r["window_start"].microsecond == 0    # 1s grid
        assert (r["window_end"] - r["window_start"]).total_seconds() == 1.0


def test_proc_time_batch_mode_degrades_to_single_window(spark):
    """U4 unified-mode contract: on a batch frame the proc stamp is the
    job's execution time, so the whole input lands in one window —
    Flink's batch proc-time behavior."""
    df = spark.range(0, 100).withColumn("k", F.col("id") % 2)
    rows = proc_time_tumbling_agg(
        df, "5 seconds", ["k"], [F.count("*").alias("n")]).collect()
    assert sorted((r["k"], r["n"]) for r in rows) == [(0, 50), (1, 50)]
    assert len({(r["window_start"], r["window_end"]) for r in rows}) == 1


def test_with_parallelism_repartition_is_full_shuffle(spark):
    df = with_parallelism(spark.range(0, 1000), 8)
    assert df.rdd.getNumPartitions() == 8
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange RoundRobinPartitioning(8)" in plan


def test_with_parallelism_coalesce_narrows_without_shuffle(spark):
    df = with_parallelism(spark.range(0, 1000, numPartitions=16), 2,
                          mode="coalesce")
    assert df.rdd.getNumPartitions() == 2
    assert "Exchange" not in \
        df._jdf.queryExecution().executedPlan().toString()


def test_with_parallelism_rebalance_uses_aqe_hint(spark):
    df = with_parallelism(spark.range(0, 1000), mode="rebalance")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "RebalancePartitions" in plan
    assert df.count() == 1000


def test_with_parallelism_validates(spark):
    with pytest.raises(ValueError):
        with_parallelism(spark.range(1), mode="magic")
    with pytest.raises(ValueError):
        with_parallelism(spark.range(1), None, mode="repartition")
    with pytest.raises(ValueError):
        with_parallelism(spark.range(1), 0, mode="coalesce")


def test_sink_parallelism_modes(spark):
    df = spark.range(0, 100, numPartitions=8)
    narrow = sink_parallelism(df)                    # default: coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    assert "Exchange" not in \
        narrow._jdf.queryExecution().executedPlan().toString()
    wide = sink_parallelism(df, 2, allow_narrow=False)
    assert wide.rdd.getNumPartitions() == 2
    assert "Exchange RoundRobinPartitioning(2)" in \
        wide._jdf.queryExecution().executedPlan().toString()
