"""Streaming-layer tests: event-time windows + watermarks, count triggers
(W1-W7), driven deterministically via file sources + processAllAvailable."""

import pytest

from pyspark.sql import functions as F, types as T

from felixzh_flink_spark.sources.builders import file_stream_source
from felixzh_flink_spark.streaming.triggers import count_window, count_window_batch
from felixzh_flink_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
    with_watermark,
)

SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("key", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).write.parquet(str(path))


def _drain(df, name, mode="append"):
    q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()


def test_tumbling_window_streaming_with_watermark(spark, tmp_path):
    # Two files → two micro-batches (maxFilesPerTrigger=1): the second batch
    # advances the watermark past the first windows so append mode emits them.
    import datetime as dt
    import time
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    batch1 = [
        (base + dt.timedelta(seconds=1), "a", 1.0),
        (base + dt.timedelta(seconds=2), "a", 2.0),
        (base + dt.timedelta(seconds=7), "a", 10.0),
        (base + dt.timedelta(seconds=8), "b", 20.0),
    ]
    batch2 = [(base + dt.timedelta(seconds=60), "a", 0.0)]
    spark.createDataFrame(batch1, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(str(tmp_path / "in"))
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    spark.createDataFrame(batch2, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(str(tmp_path / "in"))
    stream = file_stream_source(spark, str(tmp_path / "in"), SCHEMA,
                                max_files_per_trigger=1)
    win = tumbling_window_agg(
        stream, "ts", "5 seconds", ["key"],
        [F.count("*").alias("n"), F.sum("value").alias("total")],
        watermark="5 seconds",
    )
    _drain(win, "tumble_out", mode="append")
    got = {(r["window_start"].second, r["key"]): (r["n"], r["total"])
           for r in spark.sql("SELECT * FROM tumble_out").collect()}
    assert got[(0, "a")] == (2, 3.0)
    assert got[(5, "a")] == (1, 10.0)
    assert got[(5, "b")] == (1, 20.0)


def test_sliding_and_session_windows_batch_mode(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(base + dt.timedelta(minutes=m), "k", 1.0) for m in (0, 1, 10)], SCHEMA)
    slid = sliding_window_agg(df, "ts", "10 minutes", "5 minutes", ["key"],
                              [F.count("*").alias("n")])
    assert slid.count() >= 3  # each row lands in 2 sliding windows
    sess = session_window_agg(df, "ts", "5 minutes", ["key"],
                              [F.count("*").alias("n")])
    ns = sorted(r["n"] for r in sess.collect())
    assert ns == [1, 2]  # minutes 0-1 merge; minute 10 is its own session


def test_count_window_streaming_fire_and_purge(spark, tmp_path):
    # W4 countWindowAll(5) semantics (CountWindowDemo.java:15-22): emit one
    # aggregate per 5 elements per key, leftover buffered (no timeout set).
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    # constant values: arrival order across partitions is nondeterministic,
    # so assert the count/fire contract, not which elements landed where
    rows = [(base + dt.timedelta(seconds=i), "k", 1.0) for i in range(12)]
    _write_events(spark, tmp_path / "in", rows)
    stream = file_stream_source(spark, str(tmp_path / "in"), SCHEMA)
    fired = count_window(stream, "key", "value", max_count=5)
    _drain(fired, "cw_out")
    got = sorted(spark.sql("SELECT * FROM cw_out").collect(),
                 key=lambda r: r["window_seq"])
    assert [r["cnt"] for r in got] == [5, 5]          # 12 → two full windows
    assert [r["fired_by"] for r in got] == ["count", "count"]
    assert [r["sum_value"] for r in got] == [5.0, 5.0]
    assert [r["window_seq"] for r in got] == [0, 1]


def test_count_window_batch_analog(spark):
    df = spark.createDataFrame(
        [(i, "k", float(i)) for i in range(7)], "ord long, key string, value double")
    out = sorted(count_window_batch(df, "key", "value", 3, "ord").collect(),
                 key=lambda r: r["window_seq"])
    assert [r["cnt"] for r in out] == [3, 3, 1]


def test_watermark_set(spark, tmp_path):
    _write_events(spark, tmp_path / "in", [])
    stream = file_stream_source(spark, str(tmp_path / "in"), SCHEMA)
    wm = with_watermark(stream, "ts", "5 seconds")
    assert wm.isStreaming


def test_count_window_tws_matches_classic(spark, tmp_path):
    # the transformWithStateInPandas form (Spark 4 StatefulProcessor) must
    # produce exactly the classic applyInPandasWithState windows.
    # The TWS state protocol needs protobuf (provided here by the
    # tools/pbcompat shim, activated in conftest for driver AND workers)
    # and the RocksDB state store (TWS uses column families, which the
    # default HDFS-backed provider does not support).
    import datetime as dt

    import pytest
    pytest.importorskip("google.protobuf")

    from felixzh_flink_spark.streaming.triggers import count_window_tws
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        base = dt.datetime(2024, 1, 1)
        rows = [(base + dt.timedelta(seconds=i), "k", 1.0) for i in range(12)]
        _write_events(spark, tmp_path / "in", rows)
        stream = file_stream_source(spark, str(tmp_path / "in"), SCHEMA)
        fired = count_window_tws(stream, "key", "value", max_count=5)
        _drain(fired, "cw_tws_out")
        got = sorted(spark.sql("SELECT * FROM cw_tws_out").collect(),
                     key=lambda r: r["window_seq"])
        assert [(r["window_seq"], r["cnt"], r["sum_value"], r["fired_by"])
                for r in got] == [(0, 5, 5.0, "count"), (1, 5, 5.0, "count")]
    finally:
        if old_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old_provider)


def test_count_window_tws_processor_logic_with_fake_handle():
    # drive the StatefulProcessor directly: count fires, timer re-arm
    # (old timer deleted), timeout partial fire with monotonic seq
    import pandas as pd

    from felixzh_flink_spark.streaming.triggers import CountWindowProcessor

    class FakeValueState:
        def __init__(self): self.v = None
        def get(self): return self.v
        def update(self, v): self.v = v
        def clear(self): self.v = None
        def exists(self): return self.v is not None

    class FakeHandle:
        def __init__(self):
            self.states = {}
            self.timers = []
        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.states.setdefault(name, FakeValueState())
        def registerTimer(self, ts): self.timers.append(ts)
        def deleteTimer(self, ts): self.timers.remove(ts)

    class FakeTimerValues:
        def __init__(self, wm): self.wm = wm
        def getCurrentWatermarkInMs(self): return self.wm
        def getCurrentProcessingTimeInMs(self): return 0

    proc = CountWindowProcessor(3, timeout_ms=1000)
    h = FakeHandle()
    proc.init(h)
    pdf = pd.DataFrame({"value": [1.0] * 7,
                        "_ts": pd.to_datetime([1_000_000_000] * 7, unit="ms")})
    out = list(proc.handleInputRows(("k",), iter([pdf]),
                                    FakeTimerValues(999_999_000)))
    rows = pd.concat(out).to_dict("records")
    assert [(r["window_seq"], r["cnt"], r["fired_by"]) for r in rows] == \
        [(0, 3, "count"), (1, 3, "count")]
    assert h.states["buf"].v == (1, 1.0, 2)          # leftover buffered
    assert h.timers == [1_000_000_000 + 1000]        # armed off last event
    # second batch re-arms: the stale timer must be deleted first
    pdf2 = pd.DataFrame({"value": [1.0],
                         "_ts": pd.to_datetime([1_000_005_000], unit="ms")})
    list(proc.handleInputRows(("k",), iter([pdf2]),
                              FakeTimerValues(1_000_001_000)))
    assert h.timers == [1_000_005_000 + 1000]        # exactly one live timer
    # timeout: partial (2 rows) fires with the NEXT seq, state purged
    fired = list(proc.handleExpiredTimer(("k",), FakeTimerValues(0), None))
    r = pd.concat(fired).to_dict("records")[0]
    assert (r["window_seq"], r["cnt"], r["sum_value"], r["fired_by"]) == \
        (2, 2, 2.0, "timeout")
    assert h.states["buf"].v == (0, 0.0, 3)


def test_python_datasource_datagen_batch_and_stream(spark):
    """S7/S8 as a first-class Spark 4 Python data source: bounded batch
    generation (parallel input splits, deterministic payloads) and
    rate-limited streaming with a replay-safe record offset."""
    from felixzh_flink_spark.sources import pydatasource
    pydatasource.register(spark)
    reader = (spark.read.format("felixzh_datagen")
              .option("record_sum", 100).option("record_size_byte", 32)
              .option("partitions", 8))
    df = reader.load()
    rows = {r["record_id"]: r["payload"] for r in df.collect()}
    assert len(rows) == 100 and all(len(p) == 32 for p in rows.values())
    assert df.rdd.getNumPartitions() == 8        # parallel generation
    # printable-ASCII contract (RandomPrintableDataGenerator range)
    assert all(33 <= ord(c) <= 126 for c in rows[0])
    # deterministic: a second read reproduces identical payloads
    again = {r["record_id"]: r["payload"] for r in reader.load().collect()}
    assert again == rows

    q = (spark.readStream.format("felixzh_datagen")
         .option("records_per_batch", 7).option("record_sum", 20)
         .option("record_size_byte", 32)
         .load()
         .writeStream.format("memory").queryName("pyds_out").start())
    import time
    for _ in range(40):
        time.sleep(0.5)
        if spark.sql("SELECT COUNT(*) c FROM pyds_out").collect()[0]["c"] >= 20:
            break
    q.stop()
    got = {r["record_id"]: r["payload"]
           for r in spark.sql("SELECT * FROM pyds_out").collect()}
    # record budget honored exactly; stream rows == batch rows id-for-id
    assert set(got) == set(range(20))
    assert all(got[i] == rows[i] for i in range(20))


def test_count_window_sliding_batch_overlap_and_partial_head(spark):
    """countWindow(4, 2): fires every 2 elements over the last <=4 — the
    head windows are partial (evictor hasn't filled), later ones overlap."""
    from felixzh_flink_spark.streaming.triggers import (
        count_window_sliding_batch)
    rows = [("k", i, float(i)) for i in range(1, 9)]  # values 1..8
    df = spark.createDataFrame(rows, "key string, ord long, v double")
    got = sorted(
        (r["window_seq"], r["cnt"], r["sum_value"])
        for r in count_window_sliding_batch(df, "key", "v", 4, 2,
                                            "ord").collect())
    # fires at elements 2,4,6,8: windows [1,2], [1..4], [3..6], [5..8]
    assert got == [(0, 2, 3.0), (1, 4, 10.0), (2, 4, 18.0), (3, 4, 26.0)]
