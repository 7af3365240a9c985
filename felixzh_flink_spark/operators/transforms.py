"""Row-level transforms — the reference's map/flatMap/process family.

Reference parity (SURVEY.md §2.2):
- T1 ``map``      — Kafka2HBase/src/main/java/Kafka2HBase.java:54-62 (String →
  HBaseData with UUID rowkey), UserDefinedFunctions/.../MyMapFunction.java:5-11
  (string append).
- T2 ``flatMap``  — ExecutionModes/src/main/java/ExecutionMode.java:44-59
  (tokenize line → (word,1)), DataSkew/src/main/java/SocketAppV1.java:15-22.
- T3 ``process``  — Kafka2ES/src/main/java/Kafka2ES.java:75-80 (identity
  pass-through ProcessFunction).
- T4 SQL projection — format/.../csv/Csv2Csv.java:48.
- F2 UDTF split  — UserDefinedFunctions/.../MyTableFunction.java:8-16.

All are expressed as built-in Column expressions (JVM-side, whole-stage
codegen) — no Python UDFs in these hot paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tokenizer pattern: split on anything that is not a letter/digit.
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def map_append(df: DataFrame, col: str, suffix: str, out: str | None = None) -> DataFrame:
    """T1/F1: 1→1 string-append map (MyMapFunction.java:5-11 appends a
    constant to each record). JVM `concat`, no UDF."""
    return df.withColumn(out or col, F.concat(F.col(col), F.lit(suffix)))


def map_with_rowkey(df: DataFrame, payload_col: str) -> DataFrame:
    """T1: String → keyed record analog of Kafka2HBase.java:54-62 (UUID rowKey,
    fixed column family). `uuid()` is non-deterministic — fine for sink keys,
    excluded from oracle-checked queries."""
    return df.select(
        F.expr("uuid()").alias("row_key"),
        F.lit("cf").alias("column_family"),
        F.lit("q").alias("qualifier"),
        F.col(payload_col).cast("binary").alias("data"),
    )


def salted_rowkey(key: Column | str, n_salts: int = 16,
                  alias: str = "row_key") -> Column:
    """Hot-spot-resistant rowkey for range-partitioned KV stores (the
    HBase-sink concern behind Kafka2HBase's UUID rowkey and DataGen2ES's
    no-id note, DataGen2ES.java:106): a monotonically-increasing natural
    key would write every row to one region, so the key is PREFIXED with
    a stable 2-hex-digit salt bucket — writes spread across `n_salts`
    regions while a point read stays O(1) (recompute the salt from the
    key). Deterministic (md5-derived), unlike the UUID variant — so it is
    oracle-checkable and idempotent under replay, which also upgrades an
    at-least-once sink to effectively-once on keyed stores."""
    k = (F.col(key) if isinstance(key, str) else key).cast("string")
    # pad width must fit the largest salt: lpad TRUNCATES strings longer
    # than the target width, which would silently collide buckets for
    # n_salts > 10^width and break point-read recomputation
    width = len(str(n_salts - 1))
    salt = F.lpad(
        (F.conv(F.substring(F.md5(k), 1, 8), 16, 10).cast("bigint")
         % n_salts).cast("string"), width, "0")
    return F.concat(salt, F.lit("|"), k).alias(alias)


def tokenize(df: DataFrame, text_col: str, out: str = "word") -> DataFrame:
    """T2 flatMap: line → one row per lower-cased token
    (ExecutionMode.java:44-59 semantics: lowercase, split, drop empties)."""
    return (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)).alias(out))
        .filter(F.length(out) > 0)
    )


def split_words_udtf(df: DataFrame, text_col: str, keep_cols: list[str] | None = None) -> DataFrame:
    """F2 UDTF: `LATERAL TABLE(SplitFunction(f))` → rows of (word, length)
    (MyTableFunction.java:8-16: split on single space, emit Row(word, len)).

    Expressed as posexplode(split(...)) — stays in codegen, unlike the
    reference's reflective TableFunction. Returns keep_cols + (pos, word,
    length).
    """
    keep = [F.col(c) for c in (keep_cols or [])]
    exploded = df.select(*keep, F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"))
    return exploded.withColumn("length", F.length("word").cast("int"))


def identity_process(df: DataFrame) -> DataFrame:
    """T3: the reference's pass-through ProcessFunction (Kafka2ES.java:75-80)
    is a no-op in a declarative plan — returned unchanged so pipeline specs
    can still reference a `process` stage."""
    return df


def project(df: DataFrame, *cols: str | Column) -> DataFrame:
    """T4: SQL projection (`SELECT user_id, product FROM src`,
    Csv2Csv.java:48). Catalyst prunes the parquet scan to these columns."""
    return df.select(*cols)


def where(df: DataFrame, predicate: Column | str) -> DataFrame:
    """Filter/WHERE. Absent from the reference (SURVEY §2.2 note) but required
    by any analytics surface; Catalyst pushes it into the scan."""
    return df.filter(predicate)


def assign_global_ids(df: DataFrame, order_cols: list[str],
                      alias: str = "global_id") -> DataFrame:
    """Contiguous global row ids 1..N in `order_cols` order — the
    training-record-numbering / zipWithIndex shape, WITHOUT the classic
    scale-killers: no `Window.orderBy` with empty partitioning (all rows
    to one task), no `monotonically_increasing_id` (sparse, partition-
    dependent), no RDD zipWithIndex (extra job + RDD hop). Uses the
    two-phase range-partitioned prefix sum (`packing._exclusive_cumsum`):
    per-partition row counts roll into broadcast offsets; the only global
    window runs over numPartitions rows.

    `order_cols` must form a total order (e.g. include a unique key as
    the last column) — the ids are then a pure function of the data,
    identical across runs, partitionings, and engines."""
    from felixzh_flink_spark.operators.packing import _exclusive_cumsum

    cum = _exclusive_cumsum(
        df.withColumn("_one", F.lit(1).cast("bigint")), "_one", order_cols)
    return (cum.withColumn(alias, (F.col("cum") + 1).cast("bigint"))
            .drop("cum", "_one"))
