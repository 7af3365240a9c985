"""Windows + watermarks (SURVEY.md §2.4 W1-W3, W7-W8).

Reference parity:
- W1 tumbling processing-time window — MyWindowTrigger/src/main/java/
  TimeWindowDemo.java:18-26. Structured Streaming is event-time-centric; the
  documented mapping is micro-batch triggers (each micro-batch ≈ one
  processing-time window) or event-time windows on ingest time.
- W2/W3 tumbling event-time windows, keyed + global — TimeWindowDemo.java:19,
  DataSkew/src/main/java/SocketAppV2.java:41.
- W7 watermark DDL (`ts - INTERVAL '5' SECOND`) — format/.../csv/
  Csv2Csv.java:28 → withWatermark.
- Sliding + session windows don't appear in the reference (SURVEY §2.4 note)
  but are native Spark — included as beyond-reference extensions.

These wrappers work identically on batch and streaming DataFrames (batch ⇒
the windowed groupBy is an ordinary agg) — the U4 unified-mode contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str = "5 seconds") -> DataFrame:
    """W7: bounded out-of-orderness watermark. Late rows beyond the watermark
    are dropped by downstream stateful ops — same semantics as the DDL clause."""
    return df.withWatermark(ts_col, delay)


def tumbling_window_agg(df: DataFrame, ts_col: str, duration: str,
                        keys: list[str], aggs: list[Column],
                        watermark: str | None = None) -> DataFrame:
    """W2/W3: tumbling event-time window, keyed (keys non-empty) or global
    (W1's windowAll analog: keys empty). Emits window_start/window_end."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    grouped = df.groupBy(F.window(F.col(ts_col), duration), *keys)
    return grouped.agg(*aggs).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *[F.col(c) for c in _agg_names(aggs)],
    )


def sliding_window_agg(df: DataFrame, ts_col: str, duration: str, slide: str,
                       keys: list[str], aggs: list[Column],
                       watermark: str | None = None) -> DataFrame:
    """Sliding window (beyond-reference; native Spark)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    grouped = df.groupBy(F.window(F.col(ts_col), duration, slide), *keys)
    return grouped.agg(*aggs).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *[F.col(c) for c in _agg_names(aggs)],
    )


def session_window_agg(df: DataFrame, ts_col: str, gap: str,
                       keys: list[str], aggs: list[Column],
                       watermark: str | None = None) -> DataFrame:
    """Session window with inactivity gap (beyond-reference; native Spark)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    grouped = df.groupBy(F.session_window(F.col(ts_col), gap), *keys)
    return grouped.agg(*aggs).select(
        F.col("session_window.start").alias("window_start"),
        F.col("session_window.end").alias("window_end"),
        *keys,
        *[F.col(c) for c in _agg_names(aggs)],
    )


def _agg_names(aggs: list[Column]) -> list[str]:
    """Extract the output names of aliased agg columns."""
    names = []
    for c in aggs:
        jc = c._jc.toString()
        names.append(jc.split(" AS ")[-1].strip("`") if " AS " in jc else jc)
    return names


def with_proc_time(df: DataFrame, proc_col: str = "proc_ts") -> DataFrame:
    """W1 building block: stamp arrival (processing) time. In a
    streaming query `current_timestamp()` is fixed per micro-batch (the
    trigger's wall-clock instant), so all rows of one micro-batch share
    one stamp — exactly the processing-time assignment granularity a
    micro-batch engine can offer (SURVEY §2.4: each micro-batch ≈ one
    proc-time tick). On a batch DataFrame the stamp is the job's
    execution time, making proc-time windows degrade to a single global
    window — Flink's batch-mode behavior for proc-time too."""
    return df.withColumn(proc_col, F.current_timestamp())


def proc_time_tumbling_agg(df: DataFrame, duration: str,
                           keys: list[str], aggs: list[Column],
                           proc_col: str = "proc_ts") -> DataFrame:
    """W1 AS CODE (reference TimeWindowDemo.java:18-26
    `windowAll(TumblingProcessingTimeWindows.of(...))`): a tumbling
    PROCESSING-time window is an event-time tumbling window over the
    ingest stamp. The zero watermark is sound here and only here:
    processing time is monotone non-decreasing across micro-batches by
    construction, so no row is ever late; a window finalizes as soon as
    the wall clock passes its end. Keyed (keys non-empty) or global
    (keys empty — the reference's windowAll shape)."""
    stamped = df if proc_col in df.columns else with_proc_time(df, proc_col)
    return tumbling_window_agg(stamped, proc_col, duration, keys, aggs,
                               watermark="0 seconds")
