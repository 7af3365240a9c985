"""Late-data side output — Flink's `allowedLateness` +
`sideOutputLateData` analog (SURVEY §2.4 W7's missing half).

Structured Streaming's watermark DROPS late rows silently; Flink routes
them to a side output so the pipeline can count, alert on, or backfill
them. This module reproduces that contract in the foreachBatch layer:

- the stream's high-water mark (max event time seen, minus the allowed
  delay) is tracked per micro-batch and persisted through the Hadoop-FS
  state layer (`functions/stateio`) — crash-safe and replay-idempotent
  exactly like the changelog sinks (epoch guard included: a replayed
  batch re-reads the PRE-batch watermark, so rows route the same way on
  replay);
- each batch splits into on-time rows (ts >= watermark) and late rows
  (ts < watermark), each handed to its own sink callback — the batch
  analog of Flink's main output + side output tag.

The on-time side feeds whatever windowed aggregation follows (whose own
`withWatermark` then never sees rows it would drop); the late side is
the operational signal: a growing late stream means the delay budget or
an upstream clock is wrong.

Semantics note (documented delta): Spark's internal watermark is the
min across executors updated per batch; this tracker reproduces the
same "previous batch's max minus delay" contract from the driver, so
the split matches what a watermark operator would have dropped — batch
N's rows are judged against the watermark AFTER batch N-1, as in Spark.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _read_wm(fs, path: str) -> dict:
    if not fs.exists(path):
        return {"wm_ms": None, "last_epoch": -(2 ** 62)}
    return json.loads(fs.read_text(path))


def late_data_split_sink(state_dir: str, ts_col: str, delay_ms: int,
                         on_time, late):
    """foreachBatch hook: route each micro-batch's rows to `on_time(df,
    epoch_id)` or `late(df, epoch_id)` around the tracked watermark
    (max event time over all PRIOR batches − delay_ms). Watermark state
    lives at `state_dir/late_watermark.json` on the state dir's own
    filesystem (file:/hdfs:/s3a: alike)."""
    from felixzh_flink_spark.functions.stateio import state_fs

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        fs = state_fs(batch_df.sparkSession, state_dir)
        fs.mkdirs(state_dir)
        path = fs.join(state_dir, "late_watermark.json")
        st = _read_wm(fs, path)
        if epoch_id <= st["last_epoch"]:
            # post-commit replay: judge against the same pre-batch
            # watermark the original run used (stored separately), and
            # do NOT re-advance
            wm = st.get("replay_wm_ms")
        else:
            wm = st["wm_ms"]
        ts_ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
        batch = batch_df.withColumn("_ts_ms", ts_ms)
        # one pass over the batch: persist() would be overkill for the
        # two complementary filters of a (small) micro-batch
        if wm is None:
            on_time_df = batch.drop("_ts_ms")
            late_df = batch.filter(F.lit(False)).drop("_ts_ms")
        else:
            on_time_df = batch.filter(F.col("_ts_ms") >= wm).drop("_ts_ms")
            late_df = batch.filter(F.col("_ts_ms") < wm).drop("_ts_ms")
        on_time(on_time_df, epoch_id)
        late(late_df, epoch_id)
        if epoch_id > st["last_epoch"]:
            mx = batch.agg(F.max("_ts_ms")).first()[0]
            new_wm = st["wm_ms"]
            if mx is not None:
                cand = int(mx) - delay_ms
                new_wm = cand if new_wm is None else max(new_wm, cand)
            fs.replace_text(path, json.dumps({
                "wm_ms": new_wm, "replay_wm_ms": wm,
                "last_epoch": epoch_id}))

    return sink
