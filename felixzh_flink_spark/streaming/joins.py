"""Streaming joins — stream⋈static enrichment and stream⋈stream interval
joins (beyond-reference extensions; the reference has no joins at all,
SURVEY.md §2.7, but any streaming engine surface needs them).

- `enrich_with_dim`: per-micro-batch join against a static/slowly-changing
  dimension. The dim side is broadcast when small; with a lakehouse table
  the dim is re-read each batch, giving slowly-changing enrichment for free.
  This is the idiomatic replacement for the reference's per-record HBase
  lookups (Kafka2HBase's sink-side point writes inverted into a join).
- `interval_join_streams`: stream-stream inner join on a key with an
  event-time bound — both sides watermarked so Spark can evict join state;
  state size is bounded by (watermark delay + interval span) × arrival rate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(stream: DataFrame, dim: DataFrame, on: Column | list[str],
                    how: str = "left", broadcast_dim: bool = True) -> DataFrame:
    """Stream-static join; broadcast the dim side when it fits (no shuffle of
    the stream, no state store)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def interval_join_streams(left: DataFrame, right: DataFrame, key: str,
                          left_ts: str, right_ts: str,
                          lower_s: int, upper_s: int,
                          watermark: str = "30 seconds",
                          how: str = "inner") -> DataFrame:
    """Stream-stream join: rows match when keys are equal and
    right_ts ∈ [left_ts + lower_s, left_ts + upper_s] (seconds).

    Both inputs get watermarks; the time-bound predicate lets the engine
    drop join state once the watermark passes the bound — without it,
    stream-stream state grows forever.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower_s} SECONDS"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper_s} SECONDS"))
    )
    return l.join(r, cond, how)


def interval_left_join_streams(left: DataFrame, right: DataFrame, key: str,
                               left_ts: str, right_ts: str,
                               lower_s: int, upper_s: int,
                               watermark: str = "30 seconds") -> DataFrame:
    """LEFT OUTER stream-stream interval join: like
    `interval_join_streams`, but a left row with no match inside its time
    bound is still emitted (right side null-padded) — once the watermark
    proves no match can arrive. The null-padded row therefore appears one
    watermark advance AFTER the bound closes, not immediately; that
    deferral IS the correctness (emitting earlier could contradict a
    late-arriving match). Same bounded state as the inner form."""
    return interval_join_streams(left, right, key, left_ts, right_ts,
                                 lower_s, upper_s, watermark,
                                 how="left_outer")


def dynamic_rules_filter(rules_path: str, on: list[str],
                         out_path: str):
    """Flink's broadcast-state pattern (dynamic rules pushed to every task
    without restarting the job), Spark-first: a foreachBatch sink that
    RE-READS the rules table at every micro-batch and broadcast-joins the
    batch against it — rule changes take effect on the next trigger, no
    restart, no keyed state. Matching rows append to `out_path` with the
    rule payload attached.

    The per-batch re-read costs one small-table scan per trigger (rules
    tables are broadcast-sized by definition); with a lakehouse table the
    read is snapshot-consistent. This inverts Flink's push model
    (broadcast stream → operator state) into a pull: simpler, and the
    rules' system of record stays queryable."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        import os

        spark = batch_df.sparkSession
        # ONLY the rules-not-created-yet case is deny-by-default; any
        # other read failure (transient IO, permissions, a non-atomic
        # rules rewrite mid-swap) must propagate so the trigger retries —
        # swallowing it would silently lose this batch's matches forever
        # (the checkpoint advances on sink return).
        if not os.path.exists(rules_path):
            return
        rules = spark.read.parquet(rules_path)
        (batch_df.join(F.broadcast(rules), on, "inner")
         .write.mode("append").parquet(out_path))

    return sink


def enrich_with_upsert_state(state_dir: str, keys: list[str], out_path: str,
                             how: str = "left", broadcast_dim: bool = True):
    """STREAMING temporal join — Flink's processing-time temporal join
    against a versioned table (`FOR SYSTEM_TIME AS OF proctime`): each
    micro-batch left-joins the CURRENT version of the CDC-maintained
    upsert state (`changelog.changelog_upsert_sink`'s output), i.e.
    every fact is enriched with the dimension as of its processing
    moment. The event-time variant — a fact picking a HISTORICAL
    version — is the batch `changelog.temporal_join` over `scd2_history`
    intervals; this is the low-latency enrichment shape (currency rates,
    feature lookups) where Flink also reads "latest version at
    processing time".

    The state re-read per batch is the manifest's committed bucket set —
    a metadata read + pruned parquet scan, not a stream replay; a
    dimension update committed between two batches is visible to the
    second, which is exactly the Flink semantics (no watermark
    coordination with the dimension stream).

    `broadcast_dim=True` (default) hints a broadcast join — right for
    lookup-table-sized state. A CDC state that has grown past the
    broadcast cap (10s of GB of upsert history) would OOM the driver
    under a forced broadcast; pass `broadcast_dim=False` to fall back
    to a shuffle join on `keys` (mirrors `enrich_with_dim`)."""
    from felixzh_flink_spark.functions.changelog import read_upsert_state

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            dim = read_upsert_state(spark, state_dir)
        except FileNotFoundError:
            dim = None
        if dim is not None and broadcast_dim:
            dim = F.broadcast(dim)
        out = batch_df if dim is None else batch_df.join(dim, keys, how)
        out.write.mode("append").parquet(out_path)

    return sink
