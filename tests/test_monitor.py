"""Streaming observability (streaming/monitor) — the Flink-dashboard
metrics surface over StreamingQueryListener: per-batch progress ring,
telemetry-as-DataFrame, per-query summary, failure capture — plus the
streaming EWMA twin's batch-parity contract (streaming/ewma vs
aggregations.ewma_by_key, bit-identical doubles).
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


# --------------------------------------------------- streaming ewma twin

def test_streaming_ewma_matches_batch_fold(spark, tmp_path):
    """Batch parity: the stream folds events in (ts, event_id) order as
    the watermark closes them — the final per-key EWMA must be
    BIT-IDENTICAL to aggregations.ewma_by_key over the same events,
    out-of-order arrival included."""
    from felixzh_flink_spark.operators.aggregations import ewma_by_key
    from felixzh_flink_spark.streaming.ewma import ewma_stream

    base = dt.datetime(2024, 1, 1)
    # batch 1 arrives OUT of event-time order within the file
    b1 = [(base + dt.timedelta(seconds=s), f"k{s % 2}", float(v))
          for s, v in [(5, 50.0), (1, 10.0), (3, 30.0), (2, 20.0)]]
    b2 = [(base + dt.timedelta(seconds=s), f"k{s % 2}", float(v))
          for s, v in [(7, 70.0), (6, 60.0)]]
    flush = [(base + dt.timedelta(hours=1), "k_flush", 0.0)]
    rows1 = [(r[0], r[1], r[2], i) for i, r in enumerate(b1)]
    rows2 = [(r[0], r[1], r[2], 100 + i) for i, r in enumerate(b2)]
    rowsf = [(flush[0][0], flush[0][1], flush[0][2], 999)]
    ddl = "ts timestamp, key string, value double, event_id long"
    spark.createDataFrame(rows1, ddl).coalesce(1) \
        .write.mode("append").parquet(str(tmp_path / "in"))
    time.sleep(1.1)
    spark.createDataFrame(rows2 + rowsf, ddl).coalesce(1) \
        .write.mode("append").parquet(str(tmp_path / "in"))
    stream = (spark.readStream.schema(
        T.StructType([T.StructField("ts", T.TimestampType()),
                      T.StructField("key", T.StringType()),
                      T.StructField("value", T.DoubleType()),
                      T.StructField("event_id", T.LongType())]))
        .option("maxFilesPerTrigger", 1).parquet(str(tmp_path / "in")))
    out = ewma_stream(stream, "key", "ts", "event_id", "value")
    q = (out.writeStream.format("memory").queryName("ewma_s")
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM ewma_s").collect()
    # every closed event emitted exactly once, in fold order per key
    last = {}
    for r in sorted(got, key=lambda r: (r.key, r.n)):
        last[r.key] = r.ewma
    batch = spark.createDataFrame(rows1 + rows2, ddl)
    exp = {r.key: r.ewma
           for r in ewma_by_key(batch, "key", ["ts", "event_id"],
                                "value").collect()}
    assert set(exp) <= set(last)
    for k, v in exp.items():
        assert last[k] == v, (k, last[k], v)   # bit-identical doubles
    # per-event trail for one key matches a local replay
    k0 = sorted((r.n, r.ewma) for r in got if r.key == "k1")
    series = sorted((r[0], r[3], r[2]) for r in rows1 + rows2
                    if r[1] == "k1")
    acc = None
    for i, (_ts, _eid, v) in enumerate(series):
        acc = v if i == 0 else acc * 0.5 + v * 0.5
        assert k0[i] == (i + 1, acc)
