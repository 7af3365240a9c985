"""Streaming observability (streaming/monitor) — the Flink-dashboard
metrics surface over StreamingQueryListener: per-batch progress ring,
telemetry-as-DataFrame, per-query summary, failure capture.
"""

import datetime as dt
import time

import pyspark.sql.functions as F
import pyspark.sql.types as T

from felixzh_flink_spark.sources.builders import file_stream_source
from felixzh_flink_spark.streaming.monitor import attach
from felixzh_flink_spark.streaming.windows import tumbling_window_agg

SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("key", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def _await(cond, timeout_s=30.0):
    """Listener events are delivered asynchronously on the bus thread —
    poll until the assertion's precondition holds."""
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if cond():
            return True
        time.sleep(0.2)
    return False


def test_progress_monitor_captures_batches_and_watermark(spark, tmp_path):
    mon = attach(spark, capacity=64)
    try:
        base = dt.datetime(2024, 1, 1)
        spark.createDataFrame(
            [(base + dt.timedelta(seconds=i), "k", float(i))
             for i in range(8)], SCHEMA).coalesce(1) \
            .write.mode("append").parquet(str(tmp_path / "in"))
        stream = file_stream_source(spark, str(tmp_path / "in"), SCHEMA)
        win = tumbling_window_agg(stream, "ts", "5 seconds", ["key"],
                                  [F.sum("value").alias("total")],
                                  watermark="10 seconds")
        q = (win.writeStream.format("memory").queryName("mon_q")
             .outputMode("update").start())
        q.processAllAvailable()
        # second batch: the watermark computed at batch-1 END is only
        # REPORTED in a later batch's progress
        spark.createDataFrame(
            [(base + dt.timedelta(seconds=90), "k", 1.0)], SCHEMA) \
            .coalesce(1).write.mode("append").parquet(str(tmp_path / "in"))
        q.processAllAvailable()
        qid = q.id
        q.stop()
        assert _await(lambda: any(r[0] == str(qid) and r[5] > 0
                                  for r in mon.rows()))
        time.sleep(1.0)   # let straggler bus events land before snapshot
        rows = [r for r in mon.rows() if r[0] == str(qid)]
        fed = [r for r in rows if r[5] > 0]          # num_input_rows
        assert fed and fed[0][5] == 8
        assert all(r[2] == "mon_q" for r in rows)    # name flows through
        assert any(r[10] > 0 for r in rows)          # windowed state rows
        # watermark advanced off the epoch default on some batch
        assert any(r[9] and not r[9].startswith("1970-") for r in rows)
        assert str(qid) in mon.queries_seen()
        # telemetry is queryable by the engine itself
        df = mon.to_df(spark)
        got = df.filter(F.col("query_id") == str(qid)) \
                .agg(F.sum("num_input_rows")).collect()[0][0]
        assert got == 9
        summ = {r.query_id: r for r in mon.summary(spark).collect()}
        s = summ[str(qid)]
        assert s.total_rows == 9 and s.n_batches >= len(rows)
        assert s.max_state_rows > 0
    finally:
        spark.streams.removeListener(mon)


def test_progress_ring_is_bounded(spark):
    from felixzh_flink_spark.streaming.monitor import ProgressMonitor

    mon = ProgressMonitor(capacity=5)

    class _Ev:
        class progress:
            json = '{"id":"x","runId":"r","name":"n","batchId":1,' \
                   '"timestamp":"t","numInputRows":1,"durationMs":{}}'

    for _ in range(50):
        mon.onQueryProgress(_Ev())
    assert len(mon.rows()) == 5


def test_failure_capture(spark):
    from felixzh_flink_spark.streaming.monitor import ProgressMonitor

    mon = ProgressMonitor()

    class _Term:
        id = "qid-1"
        exception = "boom: stage failure"

    class _TermOk:
        id = "qid-2"
        exception = None

    mon.onQueryTerminated(_Term())
    mon.onQueryTerminated(_TermOk())
    assert mon.failures() == {"qid-1": "boom: stage failure"}
    # malformed progress JSON must never raise on the listener bus

    class _Bad:
        class progress:
            json = "{not json"

    mon.onQueryProgress(_Bad())
    assert mon.rows() == []
