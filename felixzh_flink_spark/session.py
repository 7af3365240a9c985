"""SparkSession bootstrap.

The reference builds a ``StreamExecutionEnvironment`` +
``StreamTableEnvironment`` per job (e.g. format/.../debezium_json/
MySqlCDC2Print.java:19-22). Our analog is one SparkSession configured for
analytics at scale: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), UTC timezone (oracle comparability), Arrow enabled for the
Pandas-UDF slow path.

Scale notes (100 TB / 1000-executor design intent):
- ``spark.sql.shuffle.partitions`` is a local-mode default here; on a real
  cluster AQE coalescing makes the static number mostly irrelevant as long as
  it is high enough — set it ~2-3x total cores there.
- AQE skew-join handles the hot keys that the reference mitigates by hand
  (DataSkew/src/main/java/SocketAppV2.java:23-67 two-stage salting).
- ``spark.sql.files.maxPartitionBytes`` kept at the 128 MB default: parquet
  scan tasks stay memory-bounded regardless of total input size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "felixzh_flink_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    Parameters mirror the reference's env.* properties family
    (Kafka2ES.properties `env.*`, SURVEY.md U8) but map onto Spark conf.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # TIMESTAMP(NANOS) parquet (the events table) reads as raw long;
        # catalog.load_table also sets this at runtime for foreign sessions.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Wide generated methods (an unrolled 64-term dot product, a
        # 16-term PQ-ADC join condition) exceed HotSpot's 8 KB
        # DontCompileHugeMethods bytecode cutoff; by default the JVM
        # then runs them as INTERPRETED BYTECODE — measured 55 µs/pair
        # vs 25 ns/pair JIT-compiled (round 8: the PQ semantic-dedup
        # join was ~94× slower without this). Join conditions cannot be
        # split into sub-methods the way Project expressions are, so
        # the flag is the supported fix; on a real cluster set it in
        # spark.executor.extraJavaOptions too (local mode: driver JVM
        # IS the executor).
        .config("spark.driver.extraJavaOptions",
                "-XX:-DontCompileHugeMethods")
        .config("spark.executor.extraJavaOptions",
                "-XX:-DontCompileHugeMethods")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
