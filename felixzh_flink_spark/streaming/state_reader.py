"""Streaming state introspection — the State Data Source (Spark 4.0
`spark.read.format("statestore")` / `"state-metadata"`).

Beyond-reference operability: Flink exposes checkpointed operator state
only through the State Processor API (a separate batch library); Spark 4
makes every stateful operator's store directly queryable as a DataFrame.
That turns "why is my streaming dedup/aggregation state growing" from a
log-spelunking exercise into a SQL question over the checkpoint — the
debugging surface a production CDC/upsert pipeline (functions/changelog)
or watermark dedup (streaming/ingest) needs.

Scale shape: the reader scans the checkpoint's state files partition by
partition (same partitioning as the operator that wrote them) — no
replay of the stream, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator inventory of a checkpoint: (operatorId, operatorName,
    stateStoreName, numPartitions, min/max batch id) — the map you need
    before pointing `read_state` at a multi-operator query."""
    return spark.read.format("state-metadata").load(checkpoint)


def read_state(spark: SparkSession, checkpoint: str,
               operator_id: int = 0, batch_id: int | None = None,
               store_name: str | None = None) -> DataFrame:
    """The state rows of one operator as (key struct, value struct,
    partition_id). `batch_id` time-travels to an earlier retained
    micro-batch's state (default: latest committed)."""
    r = (spark.read.format("statestore")
         .option("operatorId", operator_id))
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    if store_name is not None:
        r = r.option("storeName", store_name)
    return r.load(checkpoint)


def state_size_by_partition(spark: SparkSession, checkpoint: str,
                            operator_id: int = 0) -> DataFrame:
    """Per-partition state-row counts — the skew monitor: one hot key
    group shows up as one fat partition here long before it shows up as
    an executor OOM."""
    return (read_state(spark, checkpoint, operator_id)
            .groupBy("partition_id")
            .agg(F.count("*").alias("n_rows"))
            .orderBy(F.desc("n_rows")))
