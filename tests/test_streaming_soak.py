"""Streaming soak at bench scale (VERDICT-r5 item 8): the stateful
operators proven on MemoryStream-sized batches are driven with ~100k
events across multiple micro-batches, asserting exact batch-parity —
the TWS count-window against its batch analog, and the anomaly stream
against the batch z-score detector.
"""

import pytest

from pyspark.sql import functions as F, types as T

SOAK_KEYS = 20
BATCH_SIZES = [900, 900, 900, 900, 1400]   # per key; 5,000/key, 100k total
WINDOW = 250                               # spans micro-batch boundaries


def test_count_window_tws_soak_100k_batch_parity(spark, tmp_path):
    """100,000 events (20 keys × 5,000), five micro-batches whose sizes
    are NOT window-aligned so windows span batch boundaries, through the
    transformWithStateInPandas count-window — every key must fire
    exactly 20 full windows whose (cnt, sum) match the batch analog.
    Values are constant per (key, micro-batch) so sums are insensitive
    to intra-batch arrival order but sensitive to cross-batch window
    splits — the thing a soak across boundaries is meant to catch."""
    import datetime as dt

    pytest.importorskip("google.protobuf")

    from felixzh_flink_spark.sources.builders import file_stream_source
    from felixzh_flink_spark.streaming.triggers import (count_window_batch,
                                                        count_window_tws)

    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("key", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        base = dt.datetime(2024, 1, 1)
        src = str(tmp_path / "src")
        all_rows = []
        for b, size in enumerate(BATCH_SIZES):
            rows = [(base + dt.timedelta(seconds=b), f"k{k:02d}",
                     float(b + 1))
                    for k in range(SOAK_KEYS) for _ in range(size)]
            all_rows += rows
            spark.createDataFrame(rows, schema).coalesce(1) \
                .write.mode("append").parquet(src)
        stream = file_stream_source(spark, src, schema,
                                    max_files_per_trigger=1)
        fired = count_window_tws(stream, "key", "value", max_count=WINDOW)
        q = (fired.writeStream.format("memory").queryName("soak_cw")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .outputMode("append").start())
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

        got = {(r["key"], r["window_seq"]): (r["cnt"], r["sum_value"],
                                             r["fired_by"])
               for r in spark.sql("SELECT * FROM soak_cw").collect()}
        n_win = sum(BATCH_SIZES) // WINDOW
        assert len(got) == SOAK_KEYS * n_win          # 20 keys × 20 windows

        # expected sums from the batch-boundary overlap arithmetic
        bounds = [0]
        for s in BATCH_SIZES:
            bounds.append(bounds[-1] + s)
        for k in range(SOAK_KEYS):
            for w in range(n_win):
                lo, hi = w * WINDOW, (w + 1) * WINDOW
                exp_sum = sum(
                    max(0, min(hi, bounds[b + 1]) - max(lo, bounds[b]))
                    * (b + 1.0)
                    for b in range(len(BATCH_SIZES)))
                assert got[(f"k{k:02d}", w)] == (WINDOW, exp_sum, "count")

        # and the batch analog agrees row for row (ord = per-key arrival
        # position, values constant per batch → same windows)
        ordered = [(base, f"k{k:02d}", float(b + 1), k * 10_000_000 + p)
                   for k in range(SOAK_KEYS)
                   for p, b in enumerate(
                       b for b, s in enumerate(BATCH_SIZES)
                       for _ in range(s))]
        bdf = spark.createDataFrame(
            ordered, "ts timestamp, key string, value double, ord long")
        exp = {(r["key"], r["window_seq"]): (r["cnt"], r["sum_value"])
               for r in count_window_batch(
                   bdf, "key", "value", WINDOW, "ord").collect()}
        assert {k: v[:2] for k, v in got.items()} == exp
    finally:
        if old_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old_provider)


def test_anomaly_stream_soak_100k_batch_parity(spark, tmp_path):
    """~100k events over 3,600 one-second buckets with three injected
    spikes, split across four micro-batches plus a far-future flush:
    every closed bucket's streaming verdict must equal the batch
    integer z-score detector's, and the spike set must match."""
    from felixzh_flink_spark.operators.aggregations import (
        integer_zscore_anomalies)
    from felixzh_flink_spark.sources.builders import file_stream_source
    from felixzh_flink_spark.streaming.anomaly import anomaly_stream

    spikes = {600, 1800, 3000}

    def events(lo, hi):
        rows = []
        for s in range(lo, hi):
            n = 200 if s in spikes else (25 + s % 6)
            ts = f"2024-01-01 00:{(s // 60):02d}:{(s % 60):02d}.500" \
                if s < 3600 else None
            rows.extend(("k", ts) for _ in range(n))
        return rows

    schema = T.StructType([T.StructField("key", T.StringType()),
                           T.StructField("ts_s", T.StringType())])
    src = str(tmp_path / "src")
    chunks = [events(0, 900), events(900, 1800), events(1800, 2700),
              events(2700, 3600)]
    assert 98_000 < sum(len(c) for c in chunks) < 102_000
    spark.createDataFrame(chunks[0], schema).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = file_stream_source(spark, src, schema,
                                max_files_per_trigger=1) \
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = anomaly_stream(stream, "key", "ts", bucket="1 second",
                         lookback=60, z=3, min_points=30)
    q = (out.writeStream.format("memory").queryName("soak_anom")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").start())
    q.processAllAvailable()
    flush = [("k", "2024-01-02 00:00:00.000")]
    for extra in chunks[1:] + [flush]:
        spark.createDataFrame(extra, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
    q.stop()
    q.awaitTermination()

    got = {r["bucket_ms"]: (r["cnt"], r["is_anomaly"])
           for r in spark.sql("SELECT * FROM soak_anom").collect()}
    batch_df = spark.createDataFrame(sum(chunks, []), schema) \
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
    exp = {int(r["bucket_ts"].timestamp() * 1000): (r["cnt"], r["is_anomaly"])
           for r in integer_zscore_anomalies(
               batch_df, "key", "ts", lookback=60, z=3, min_points=30,
               bucket="second").collect()}
    assert got == exp
    flagged = {ms for ms, v in got.items() if v[1]}
    base_ms = 1704067200000  # 2024-01-01 00:00:00 UTC
    assert flagged == {base_ms + s * 1000 for s in spikes}
