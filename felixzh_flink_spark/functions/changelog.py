"""Changelog / CDC library: canal-json + debezium-json decoding, changelog
normalization, and upsert materialization.

Reference parity (the single most non-trivial element per SURVEY.md §1.2):
- F3 canal-json decode — format/src/main/java/com/felixzh/flink/format/
  canal_json/Kafka2Print.java:25-39; envelope sample at :63-103 (`data[]`,
  `old[]`, `type` INSERT/UPDATE/DELETE, `pkNames`).
- F4 debezium-json decode — format/.../debezium_json/Kafka2Print.java:25-39
  (`before`/`after`/`op` c|u|d|r).
- Changelog ops `+I/-U/+U/-D` — observable in the reference's captured
  outputs, canal_json/Kafka2Print.java:126-127 and
  debezium_json/MySqlCDC2Print.java:94-101.

Spark has no retraction-aware DataFrames, so the changelog becomes an explicit
`op: string` column with the flattened row fields. An UPDATE expands to a
(-U old, +U new) pair exactly like Flink's changelog stream. Materialization
to current-state tables is `upsert_latest` (batch/window dedup by primary key,
newest wins, deletes drop) — the foreachBatch MERGE analog that works on plain
parquet.

All decoding is `from_json` + explode + JVM expressions — no Python UDFs, so
CDC decode at 100 TB is a scan-shaped, shuffle-free job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F, types as T

#: changelog op tags, matching Flink RowKind short strings
OP_INSERT = "+I"
OP_UPDATE_BEFORE = "-U"
OP_UPDATE_AFTER = "+U"
OP_DELETE = "-D"


def canal_envelope_schema(row_schema: T.StructType) -> T.StructType:
    """Schema of a Canal JSON envelope carrying rows of `row_schema`
    (field inventory from the reference's captured sample payload,
    canal_json/Kafka2Print.java:65-102)."""
    return T.StructType([
        T.StructField("data", T.ArrayType(row_schema), True),
        T.StructField("old", T.ArrayType(row_schema), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("database", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("pkNames", T.ArrayType(T.StringType()), True),
        T.StructField("es", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("isDdl", T.BooleanType(), True),
    ])


def decode_canal_json(df: DataFrame, value_col: str, row_schema: T.StructType,
                      ignore_parse_errors: bool = True,
                      parallelism: int | None = None) -> DataFrame:
    """F3: Canal envelope JSON strings → changelog rows (op + row fields).

    Semantics (matching flink-json's CanalJsonDeserializationSchema, which the
    reference configures via 'format'='canal-json'):
    - type=INSERT  → one +I per element of data[]
    - type=DELETE  → one -D per element of data[]
    - type=UPDATE  → per index i: -U from old[i] merged over data[i] (Canal's
      old[] holds only the *changed* fields; unchanged fields come from
      data[i]), then +U from data[i]
    - isDdl=true or unparseable → dropped when ignore_parse_errors
      ('canal-json.ignore-parse-errors', Kafka2Print.java:36).

    Validity is folded into the exploded expressions instead of a Filter node:
    a pre-explode `.filter` on parsed fields gets pushed below the parse
    projection with the `from_json` alias substituted into every condition —
    the JSON would be parsed 4-5× per row. `when(valid, ...)` + explode's
    drop-null/empty behavior keeps exactly ONE from_json per row in the
    physical plan (verified via executedPlan().count("from_json")).
    """
    if parallelism:
        # JSON parse is CPU-bound; when the source has fewer partitions than
        # cores (single files, low-partition Kafka topics) spread the raw
        # strings first. Leave None when the source is already well-split —
        # the shuffle would only move bytes that the scan parallelizes anyway.
        df = df.repartition(parallelism)
    env = df.select(F.from_json(F.col(value_col), canal_envelope_schema(row_schema)).alias("_env"))

    fields = [f.name for f in row_schema.fields]
    valid = F.col("_env").isNotNull() & (~F.coalesce(F.col("_env.isDdl"), F.lit(False)))
    # pair data[i] with old[i] positionally for UPDATE old-field merging
    paired = env.select(
        F.when(valid, F.col("_env.type")).alias("type"),
        F.col("_env.es").alias("es"),
        F.posexplode(F.when(valid, F.col("_env.data"))).alias("_i", "_new"),
        F.col("_env.old").alias("_olds"),
    ).withColumn("_old", F.col("_olds")[F.col("_i")])

    new_row = F.struct(*[F.col(f"_new.{f}").alias(f) for f in fields])
    # old[] has only changed fields (others null) → coalesce over new
    merged_old = F.struct(*[
        F.coalesce(F.col(f"_old.{f}"), F.col(f"_new.{f}")).alias(f) for f in fields
    ])

    def tagged(op: str, row: Column) -> Column:
        return F.struct(F.lit(op).alias("op"), row.alias("row"))

    # Single-pass: one (op,row) array per record, exploded once — the
    # branch-and-union formulation would rescan/re-parse the source 4× .
    ops = (
        F.when(F.col("type") == "INSERT", F.array(tagged(OP_INSERT, new_row)))
        .when(F.col("type") == "DELETE", F.array(tagged(OP_DELETE, new_row)))
        .when(F.col("type") == "UPDATE",
              F.array(tagged(OP_UPDATE_BEFORE, merged_old),
                      tagged(OP_UPDATE_AFTER, new_row)))
    )
    return (
        paired.select(F.col("es").alias("ts_ms"), F.explode(ops).alias("_t"))
        .select(F.col("_t.op").alias("op"), "ts_ms",
                *[F.col(f"_t.row.{f}").alias(f) for f in fields])
    )


def debezium_envelope_schema(row_schema: T.StructType) -> T.StructType:
    """Debezium JSON envelope (flat, schema-exclude mode — the reference's
    debezium_json DDL assumes `'debezium-json.schema-include'=false` default;
    Kafka2Print.java:25-39)."""
    return T.StructType([
        T.StructField("before", row_schema, True),
        T.StructField("after", row_schema, True),
        T.StructField("op", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
    ])


def decode_debezium_json(df: DataFrame, value_col: str, row_schema: T.StructType,
                         ignore_parse_errors: bool = True,
                         parallelism: int | None = None) -> DataFrame:
    """F4: Debezium envelope JSON → changelog rows.

    op mapping (flink-json DebeziumJsonDeserializationSchema semantics):
    c (create) / r (snapshot read) → +I from after;
    u (update) → -U from before, +U from after;
    d (delete) → -D from before.

    Unparseable / op-less records fall through the when-chain to a null ops
    array, which explode drops — no Filter node, so the plan parses each
    record exactly once (see decode_canal_json for why a filter would
    multiply the from_json).
    """
    if parallelism:
        df = df.repartition(parallelism)  # see decode_canal_json
    env = df.select(F.from_json(F.col(value_col),
                                debezium_envelope_schema(row_schema)).alias("_env"))
    fields = [f.name for f in row_schema.fields]

    before = F.struct(*[F.col(f"_env.before.{f}").alias(f) for f in fields])
    after = F.struct(*[F.col(f"_env.after.{f}").alias(f) for f in fields])

    def tagged(op: str, row: Column) -> Column:
        return F.struct(F.lit(op).alias("op"), row.alias("row"))

    # Single-pass (see decode_canal_json): one exploded (op,row) array.
    ops = (
        F.when(F.col("_env.op").isin("c", "r"), F.array(tagged(OP_INSERT, after)))
        .when(F.col("_env.op") == "u",
              F.array(tagged(OP_UPDATE_BEFORE, before), tagged(OP_UPDATE_AFTER, after)))
        .when(F.col("_env.op") == "d", F.array(tagged(OP_DELETE, before)))
    )
    return (
        env.select(F.col("_env.ts_ms").alias("ts_ms"), F.explode(ops).alias("_t"))
        .select(F.col("_t.op").alias("op"), "ts_ms",
                *[F.col(f"_t.row.{f}").alias(f) for f in fields])
    )


def upsert_latest(changelog: DataFrame, pk: list[str], order_col: str = "ts_ms",
                  seq_col: Column | None = None,
                  keep_order_col: bool = False) -> DataFrame:
    """Materialize a changelog into current state: newest row per PK wins;
    rows whose newest op is -D (or -U with no matching +U) drop out.

    This is the foreachBatch-MERGE analog for plain storage: a windowed
    dedup (one shuffle on pk) instead of a point-update table. At scale,
    partition the state table by pk hash so each micro-batch merge touches
    only matching partitions. `keep_order_col=True` retains the winning
    row's order value — required when the output is itself merged against
    later batches (changelog_upsert_sink).
    """
    order = seq_col if seq_col is not None else F.col(order_col)
    # -U is ordered before its paired +U at equal ts so the update survives
    op_rank = (
        F.when(F.col("op") == OP_UPDATE_BEFORE, 0)
        .when(F.col("op") == OP_INSERT, 1)
        .when(F.col("op") == OP_UPDATE_AFTER, 2)
        .when(F.col("op") == OP_DELETE, 3)
    )
    w = Window.partitionBy(*pk).orderBy(order.desc(), op_rank.desc())
    latest = changelog.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    alive = latest.filter(F.col("op").isin(OP_INSERT, OP_UPDATE_AFTER)).drop("_rn", "op")
    return alive if keep_order_col else alive.drop(order_col)


def changelog_upsert_sink(state_dir: str, pk: list[str], order_col: str = "ts_ms"):
    """foreachBatch writer materializing a streaming changelog into a
    continuously-updated parquet state table — the S9/S10 CDC→table pipeline
    end-to-end (MySqlCDC2Print.java:24-46 renders the same stream; we
    additionally maintain queryable current state).

    Per micro-batch: reduce the batch to newest-per-PK, merge with the
    previous state (state rows carry their own `order_col`, so a late batch
    with older timestamps cannot clobber newer state), write the new state,
    atomically swap. Tombstones are compacted away once applied — a
    later-arriving change older than the applied delete is dropped with the
    rest of the pre-delete history (document retention if replays can be
    that late).

    Local parquet + directory swap stands in for the transactional MERGE a
    lakehouse table provides; at scale this function body is one Delta/
    Iceberg MERGE INTO keyed on `pk` and the swap goes away.
    """
    import os
    import shutil

    current = os.path.join(state_dir, "current")
    staging = os.path.join(state_dir, "staging")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        merged = batch_df
        if os.path.exists(current):
            old = spark.read.parquet(current).withColumn("op", F.lit(OP_INSERT))
            merged = old.unionByName(batch_df.select(*old.columns))
        new_state = upsert_latest(merged, pk, order_col, keep_order_col=True)
        shutil.rmtree(staging, ignore_errors=True)
        new_state.write.mode("overwrite").parquet(staging)
        old_dir = os.path.join(state_dir, f"_old_{epoch_id}")
        if os.path.exists(current):
            os.rename(current, old_dir)
        os.rename(staging, current)
        shutil.rmtree(old_dir, ignore_errors=True)

    return sink


def changelog_sum(changelog: DataFrame, keys: list[str], value_col: str,
                  alias: str = "total") -> DataFrame:
    """Retract-aware aggregation over a changelog — the Flink
    `AggregateFunction.retract()` semantic (UserDefinedFunctions/.../
    MyAggregateFunctionsForWeightedAvg.java:26-29) as pure expressions:
    +I/+U rows add, -U/-D rows subtract, so the grouped sum equals the sum
    over the materialized current state WITHOUT building that state.

    One pass, one shuffle, partial aggregation applies — on a CDC stream
    this is dramatically cheaper than upsert-then-aggregate when only the
    aggregate (not the row-level state) is needed. Decimal-cast per element
    for order-independent determinism (see operators.aggregations.exact_sum).
    """
    sign = F.when(F.col("op").isin(OP_INSERT, OP_UPDATE_AFTER), F.lit(1.0)) \
        .otherwise(F.lit(-1.0))
    signed = (F.col(value_col) * sign).cast("decimal(30,6)")
    return changelog.groupBy(*keys).agg(
        F.sum(signed).cast("double").alias(alias))


def encode_debezium_json(df: DataFrame, fields: list[str], op: str = "c") -> DataFrame:
    """Emit debezium-style envelopes from plain rows (the reference *rejects*
    canal/debezium as sink formats — captured UnsupportedOperationException,
    canal_json/MySqlCDC2Kafka.java:115-118; we support emission as a
    documented improvement). Returns a single `value` JSON string column."""
    after = F.struct(*[F.col(f) for f in fields])
    return df.select(
        F.to_json(F.struct(
            after.alias("after"),
            F.lit(op).alias("op"),
        )).alias("value")
    )
