"""Table catalog over the driver's parquet test data.

The reference registers tables via SQL DDL (``tableEnv.executeSql(CREATE
TABLE ...)``, format/.../csv/Csv2Csv.java:24-39) or temp views
(``tEnv.createTemporaryView``, FlinkIdeaDemo/src/main/java/
NCFlinkTableAPITableFunction.java:37). Our analog: parquet-backed DataFrames
registered as temp views so every SURVEY §2 SQL path works unchanged.

Parquet scans get predicate pushdown + column pruning from Catalyst for free —
at 100 TB this is the difference between scanning a column subset of a few TB
and the full dataset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimension tables small enough to broadcast at ANY scale factor (region has 5
#: rows, nation 25 at every TPC-H SF; supplier/part grow with SF but stay far
#: below fact tables).
BROADCAST_DIMS = ("region", "nation")


#: (applicationId, sf_dir, table) → loaded DataFrame. A DataFrame is an
#: immutable lazy plan, so handing the same object to every caller is
#: safe; rebuilding it per query costs ~0.1-0.3 s of driver-side analysis
#: (file listing, schema resolve, py4j) that a real engine's catalog
#: would never re-pay. Keyed by applicationId so a new session never
#: sees plans bound to a stopped one.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table (cached per session). ``sf_dir`` like
    /root/testdata/sf0.01.

    `events` has shipped its `ts` column as either TIMESTAMP(NANOS) —
    which Spark's parquet reader rejects by default — or a plain µs
    timestamp, depending on the generator version. Handle both: set the
    legacy nanos-as-long conf (runtime-settable), then convert ONLY if the
    column actually arrived as raw nanos (LongType). Nanos are truncated
    to µs with integer div (double division would round at µs scale),
    matching DuckDB's ns→µs truncation; a µs column passes through with
    just the NTZ cast.
    """
    app = spark.sparkContext.applicationId
    key = (app, sf_dir, name)
    if key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    # evict entries from stopped sessions: they pin DataFrames bound to a
    # dead JVM context and would grow without bound in a process that
    # cycles SparkSessions (test runs, notebooks, library use)
    for stale in [k for k in _TABLE_CACHE if k[0] != app]:
        del _TABLE_CACHE[stale]
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"))
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _TABLE_CACHE[key] = df
    return df


def spread_if_narrow(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Repartition a batch DataFrame ONLY when it is under-partitioned.

    Local test parquet ships one row group per file, so scans arrive as a
    single partition and any CPU-heavy expression chain (shingling, MinHash,
    per-row cosine) runs on one core. On a real cluster a 100 TB table scans
    into thousands of splits and this is a no-op — the condition, not the
    repartition, is the scale behavior (same contract as the changelog
    decoders' `parallelism` knob, functions/changelog.py).

    The partition count comes from a driver-side FILE-SIZE estimate when
    the scan reads local files: the exact probe (`df.rdd.getNumPartitions`)
    forces full physical planning and costs ~0.2-0.3 s of driver time per
    call — pure plan-construction overhead on every query build. The
    estimate mirrors Spark's split math closely enough for an
    under-partitioned? yes/no decision; non-local schemes fall back to the
    exact probe.
    """
    if df.isStreaming:
        return df
    target = parallelism or df.sparkSession.sparkContext.defaultParallelism
    n = _scan_partition_estimate(df)
    if n is None:
        n = df.rdd.getNumPartitions()
    if n < target:
        return df.repartition(target)
    return df


def _scan_partition_estimate(df: DataFrame) -> int | None:
    """Approximate scan partition count from leaf-file sizes (local files
    only — returns None otherwise, including post-shuffle/non-scan plans
    where inputFiles is empty). Mirrors FilePartition packing INCLUDING
    the bytesPerCore clamp: Spark's maxSplitBytes is
    min(maxPartitionBytes, max(openCost, totalBytes/defaultParallelism)),
    so tables smaller than maxPartitionBytes × cores already split near
    core count — without the clamp the estimate undercounts and
    spread_if_narrow would ADD a repartition shuffle the exact probe
    avoided. Config values come from the session, not hardcoded."""
    import os
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
    except Exception:  # pragma: no cover - defensive
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        p = urlparse(uri)
        if p.scheme not in ("file", ""):
            return None
        try:
            total += os.path.getsize(unquote(p.path))
        except OSError:
            return None

    def _bytes_conf(key: str, default: int) -> int:
        try:
            v = df.sparkSession.conf.get(key)
        except Exception:
            return default
        v = v.lower().rstrip("b")
        for suf, mul in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
            if v.endswith(suf):
                return int(float(v[:-1]) * mul)
        return int(v)

    open_cost = _bytes_conf("spark.sql.files.openCostInBytes", 4 << 20)
    max_part = _bytes_conf("spark.sql.files.maxPartitionBytes", 128 << 20)
    cores = df.sparkSession.sparkContext.defaultParallelism
    padded = total + len(files) * open_cost
    bytes_per_core = padded // max(1, cores)
    max_split = min(max_part, max(open_cost, bytes_per_core))
    return max(1, -(-padded // max(1, max_split)))


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> dict[str, DataFrame]:
    """Register each table as a temp view; returns name → DataFrame."""
    out = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
