"""Bucketed-table writes — shuffle-free co-located joins at ingest cost.

At 100 TB the dominant join cost is the shuffle of both fact tables onto
the join key. Writing the tables BUCKETED by that key moves the shuffle to
ingest time, once: both scans then arrive pre-partitioned-and-sorted, and
Catalyst plans the join with ZERO Exchange (plan-regression-tested in
tests/test_plans.py::test_bucketed_join_has_no_exchange).

Spark constraint: bucketing metadata lives in the session catalog, so
bucketed data is written with ``saveAsTable`` (path-addressed
``parquet(path)`` writes cannot record bucket specs). Bucket counts should
match between join sides (or divide evenly — Spark 3+ coalesces compatible
bucket counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int,
                   path: str | None = None, sort: bool = True) -> None:
    """Write `df` as a bucketed (and optionally sorted) parquet table.

    Sorting within buckets additionally enables shuffle-AND-sort-free
    sort-merge joins."""
    writer = df.write.mode("overwrite").format("parquet") \
        .bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key — no Exchange in
    the physical plan when bucket specs are compatible."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def write_time_partitioned(df: DataFrame, path: str, ts_col: str,
                           granularity: str = "day") -> None:
    """Directory-partition a table by a derived time bucket so time-range
    scans PRUNE partitions instead of filtering a full scan — the
    complement to bucketing: bucketing kills the join shuffle, directory
    partitioning kills the scan itself (`PartitionFilters` in the plan,
    untouched directories never opened). Low-cardinality key on purpose —
    one directory per day/hour, never per high-cardinality value."""
    out = df.withColumn(
        "part_bucket", F.date_format(F.col(ts_col).cast("timestamp"),
                                     {"day": "yyyy-MM-dd",
                                      "hour": "yyyy-MM-dd-HH"}[granularity]))
    out.write.mode("overwrite").partitionBy("part_bucket").parquet(path)
