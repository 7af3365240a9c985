"""Small-file compaction for streaming parquet sinks.

Every micro-batch of a streaming parquet sink writes ≥1 file; at a 10 s
trigger that is ~8,640 files/day/partition — metadata pressure and tiny-read
overhead dominate scans long before data volume does. Compaction rewrites a
directory to ~target-sized files; run it periodically (foreachBatch epoch %
N == 0, or a scheduled batch job) on closed partitions.

Rewrite-and-swap is the plain-parquet analog of a lakehouse OPTIMIZE/
compaction operation; on Delta/Iceberg use the table service instead.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def plan_compaction(spark: SparkSession, path: str,
                    target_file_bytes: int = 128 << 20) -> tuple[DataFrame, int]:
    """Read a parquet directory and compute the output file count from the
    actual on-disk byte size (not row count — row width varies)."""
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    n_files = max(1, (total + target_file_bytes - 1) // target_file_bytes)
    return spark.read.parquet(path), int(n_files)


def compact_parquet(spark: SparkSession, path: str,
                    target_file_bytes: int = 128 << 20) -> int:
    """Rewrite `path` into ~target-sized files; returns the new file count.

    coalesce (not repartition) — compaction must not shuffle, only merge
    read-splits; the rewrite is staged and swapped so readers never see a
    half-written directory.
    """
    df, n_files = plan_compaction(spark, path, target_file_bytes)
    staging = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    df.coalesce(n_files).write.mode("overwrite").parquet(staging)
    backup = f"{path}__pre_compact"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    return n_files
