"""Source builders — SURVEY.md §2.1 S1-S11 re-expressed as Spark readers.

Each builder returns a DataFrame (batch) or streaming DataFrame; the
batch/stream choice is a parameter, matching the reference's
runtime-mode-unified pipelines (U4, ExecutionModes/src/main/java/
ExecutionMode.java:16-18).

Kafka/socket builders produce valid plans but need live services — unit tests
cover option plumbing; integration happens in deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, types as T


def kafka_source(spark: SparkSession, bootstrap_servers: str, topics: str, *,
                 group_id: str | None = None, starting_offsets: str = "latest",
                 streaming: bool = True, value_as_string: bool = True,
                 extra_options: dict[str, str] | None = None) -> DataFrame:
    """S1/S2/S11: Kafka topic → DataFrame of (key, value, topic, partition,
    offset, timestamp), optionally value cast to string (the reference's
    SimpleStringSchema / ValueOnlyDeserializer — Kafka2ES.java:39-46).

    Kerberos/SASL options (KafkaFlinkIdea.java:39-44) pass through
    extra_options as kafka.security.protocol / kafka.sasl.* keys.
    """
    reader = (spark.readStream if streaming else spark.read).format("kafka") \
        .option("kafka.bootstrap.servers", bootstrap_servers) \
        .option("subscribe", topics) \
        .option("startingOffsets", starting_offsets)
    if group_id:
        reader = reader.option("kafka.group.id", group_id)
    for k, v in (extra_options or {}).items():
        reader = reader.option(k, v)
    df = reader.load()
    if value_as_string:
        df = df.withColumn("value", F.col("value").cast("string"))
    return df


def socket_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    """S3: line-delimited TCP text (env.socketTextStream analog,
    SocketAppV1.java:13). Streaming-only in Spark; single `value` column."""
    return (
        spark.readStream.format("socket")
        .option("host", host).option("port", port).load()
    )


def from_elements(spark: SparkSession, elements: list, column: str = "value") -> DataFrame:
    """S4: bounded in-memory source (env.fromElements, ExecutionMode.java:21)."""
    return spark.createDataFrame([(e,) for e in elements], T.StructType([
        T.StructField(column, T.StringType() if isinstance(elements[0], str) else T.LongType())
    ]))


def from_values(spark: SparkSession, rows: list[tuple], schema: T.StructType | str) -> DataFrame:
    """S5: typed inline rows (tEnv.fromValues / SQL VALUES,
    NCFlinkTableAPIAggregateFunction.java:30-35)."""
    return spark.createDataFrame(rows, schema)


def rate_source(spark: SparkSession, rows_per_second: int = 1,
                num_partitions: int | None = None) -> DataFrame:
    """S6: rate-limited generator stream (DataGeneratorSource +
    RateLimiterStrategy.perSecond analog, DataGen2Doris.java:34-41). Yields
    (timestamp, value: long); feed value through a payload expression for the
    generator-lambda part."""
    reader = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second)
    if num_partitions:
        reader = reader.option("numPartitions", num_partitions)
    return reader.load()


def file_stream_source(spark: SparkSession, path: str, schema: T.StructType,
                       fmt: str = "parquet", max_files_per_trigger: int | None = None) -> DataFrame:
    """Directory-watching stream — the deterministic test harness for
    streaming operators (drop parquet files, processAllAvailable)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)
