"""Kafka effective-exactly-once key contract (VERDICT-r4 item 4).

No broker exists in this sandbox, so the producer is a file-backed fake
whose send() appends JSON lines from EXECUTOR processes (foreachPartition
runs in Python workers — in-memory fakes would silently record nothing).
The tests drive the `keyed_eos_batch_writer` foreachBatch hook directly
through the failure modes Structured Streaming's replay contract
produces: clean replay of a committed batch, crash mid-batch then
retry, and multiplicity of duplicate logical rows.
"""

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F

from felixzh_flink_spark.sinks.writers import keyed_eos_batch_writer


def _read_sends(root):
    recs = []
    for f in os.listdir(root):
        if f.startswith("sends-"):
            with open(os.path.join(root, f)) as fh:
                recs += [json.loads(l) for l in fh if l.strip()]
    return recs


def _factory(root, fail_after=None):
    """File-backed fake producer: send() buffers JSON lines, flush()
    writes them to a unique file under `root` — works across the
    executor Python-worker processes foreachPartition runs in (the
    producer class is defined INSIDE the factory so cloudpickle ships
    it by value; a test-module-level class would hit
    ModuleNotFoundError on workers). Records EVERY send, duplicates
    included, so tests assert on the raw at-least-once stream."""
    def make():
        import json as _json
        import os as _os
        import uuid as _uuid

        class FileProducer:
            def __init__(self):
                self.lines = []

            def send(self, topic, key, value):
                if fail_after is not None and len(self.lines) >= fail_after:
                    raise RuntimeError("injected producer crash")
                self.lines.append(_json.dumps(
                    {"topic": topic, "key": key, "value": value}))

            def flush(self):
                path = _os.path.join(
                    root, f"sends-{_uuid.uuid4().hex}.jsonl")
                with open(path, "w") as fh:
                    fh.write("\n".join(self.lines) + "\n")
                self.lines = []

        return FileProducer()
    return make


@pytest.fixture()
def batch(spark):
    return spark.range(20).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("value"))


def test_replay_emits_identical_keys_and_values(spark, tmp_path, batch):
    """A replayed batch (same batchId, same rows — the Structured
    Streaming replay contract) must produce byte-identical (key, value)
    pairs, so consumer-side key dedup yields exactly-once."""
    root = str(tmp_path)
    write = keyed_eos_batch_writer(
        "orders", key_cols=["k"], producer_factory=_factory(root))
    write(batch, 7)
    write(batch, 7)   # replay after a commit-then-crash
    sends = _read_sends(root)
    assert len(sends) == 40                      # at-least-once: dupes exist
    by_key = {}
    for r in sends:
        by_key.setdefault(r["key"], set()).add(r["value"])
    assert len(by_key) == 20                     # dedup-by-key → exactly-once
    assert all(len(v) == 1 for v in by_key.values())  # replicas identical
    assert all(k.startswith("orders/7/") for k in by_key)


def test_crash_mid_batch_then_retry_converges(spark, tmp_path, batch):
    """Producer dies partway through the batch; the retry (same batchId)
    re-produces everything — the union still dedups to the logical rows."""
    root = str(tmp_path)
    # one partition so the crash is deterministic: the producer dies
    # after 3 sends, leaving a genuinely partial at-least-once stream
    crashing = keyed_eos_batch_writer(
        "orders", key_cols=["k"], producer_factory=_factory(root, 3))
    with pytest.raises(Exception):
        crashing(batch.coalesce(1), 3)
    ok = keyed_eos_batch_writer(
        "orders", key_cols=["k"], producer_factory=_factory(root))
    ok(batch, 3)
    by_key = {}
    for r in _read_sends(root):
        by_key.setdefault(r["key"], set()).add(r["value"])
    assert len(by_key) == 20
    assert all(len(v) == 1 for v in by_key.values())


def test_keyless_mode_preserves_duplicate_multiplicity(spark, tmp_path):
    """Without a natural key, identity = md5(value) + occurrence index:
    two copies of the same logical value survive consumer dedup as TWO
    records, and a replay still converges to exactly those."""
    root = str(tmp_path)
    dup = spark.createDataFrame(
        [("a",), ("a",), ("b",)], "value: string")
    write = keyed_eos_batch_writer("t", producer_factory=_factory(root))
    write(dup, 0)
    write(dup, 0)    # replay
    by_key = {}
    for r in _read_sends(root):
        by_key.setdefault(r["key"], set()).add(r["value"])
    assert len(by_key) == 3                       # a×2 + b — multiplicity kept
    assert sorted(v for vs in by_key.values() for v in vs) == ["a", "a", "b"]
    assert all(len(v) == 1 for v in by_key.values())


def test_distinct_batch_ids_never_collide(spark, tmp_path, batch):
    root = str(tmp_path)
    write = keyed_eos_batch_writer(
        "t", key_cols=["k"], producer_factory=_factory(root))
    write(batch, 1)
    write(batch, 2)   # a DIFFERENT batch re-emitting the same rows is new data
    keys = {r["key"] for r in _read_sends(root)}
    assert len(keys) == 40


def test_streaming_replay_after_commit_loss_converges(spark, tmp_path):
    """REAL engine replay, not a simulated one: run the sink as an
    actual writeStream with a checkpoint, then delete the checkpoint's
    commit marker for the processed batch — on restart Structured
    Streaming re-executes that batchId with the same offsets (the crash
    window between sink completion and checkpoint commit). The
    re-delivery must carry byte-identical keys/values so consumer-side
    key dedup still sees exactly-once."""
    import os

    from felixzh_flink_spark.sinks.writers import keyed_eos_kafka_sink

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "sent")
    os.makedirs(root)
    spark.range(10).selectExpr(
        "id AS k", "concat('v', id) AS value").coalesce(1) \
        .write.mode("append").parquet(src)

    def start():
        stream = spark.readStream.schema("k long, value string").parquet(src)
        return keyed_eos_kafka_sink(
            stream, "orders", checkpoint_location=ckpt, key_cols=["k"],
            producer_factory=_factory(root))

    q = start()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()     # release the checkpoint before the restart
    first = _read_sends(root)
    assert len(first) == 10                      # clean run: one send each

    # crash window: sink completed, checkpoint commit lost (the local
    # ChecksumFileSystem keeps a .crc sibling — drop it with the file,
    # or the re-commit trips the metadata log's concurrent-writer check)
    os.remove(os.path.join(ckpt, "commits", "0"))
    crc = os.path.join(ckpt, "commits", ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    q = start()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    sends = _read_sends(root)
    assert len(sends) == 20                      # batch 0 re-delivered
    by_key = {}
    for r in sends:
        by_key.setdefault(r["key"], set()).add(r["value"])
    assert len(by_key) == 10                     # dedup-by-key: exactly-once
    assert all(len(v) == 1 for v in by_key.values())
    assert all(k.startswith("orders/0/") for k in by_key)


def test_consumer_dedup_closes_the_eos_loop(spark, tmp_path):
    """VERDICT-r5 item 4: the CONSUMING half of the contract as code.
    Re-runs the commit-loss replay (producer side), then feeds the raw
    at-least-once send log through `sources.eos.eos_dedup` — the result
    must be exactly the once-only row set the transactional reference
    sink (Kafka2Kafka.java:45-46) would deliver."""
    import os

    from felixzh_flink_spark.sinks.writers import keyed_eos_kafka_sink
    from felixzh_flink_spark.sources.eos import eos_dedup

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "sent")
    os.makedirs(root)
    spark.range(10).selectExpr(
        "id AS k", "concat('v', id) AS value").coalesce(1) \
        .write.mode("append").parquet(src)

    def start():
        stream = spark.readStream.schema("k long, value string").parquet(src)
        return keyed_eos_kafka_sink(
            stream, "orders", checkpoint_location=ckpt, key_cols=["k"],
            producer_factory=_factory(root))

    q = start()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    os.remove(os.path.join(ckpt, "commits", "0"))
    crc = os.path.join(ckpt, "commits", ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    q = start()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    sends = _read_sends(root)
    assert len(sends) == 20                      # duplicated on the wire

    consumed = spark.createDataFrame(
        [(r["key"], r["value"]) for r in sends], "key string, value string")
    once = eos_dedup(consumed, "key")
    rows = {(r["key"], r["value"]) for r in once.collect()}
    assert once.count() == 10                    # exactly-once after dedup
    assert {r[1] for r in rows} == {f"v{i}" for i in range(10)}


def test_consumer_dedup_streaming_within_watermark(spark, tmp_path):
    """Streaming consumer: duplicates replayed in a LATER micro-batch
    (the real crash-window shape) are dropped by
    dropDuplicatesWithinWatermark with bounded state; fresh keys pass."""
    import os

    src = str(tmp_path / "in")
    os.makedirs(src)
    from pyspark.sql import functions as F

    from felixzh_flink_spark.sources.eos import eos_dedup

    base = spark.range(10).selectExpr(
        "concat('orders/0/', id) AS key", "concat('v', id) AS value",
        "timestamp'2026-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts")
    base.coalesce(1).write.parquet(os.path.join(src, "f1"))
    # replay of the same batch + 5 genuinely new records, seconds later
    replay = base.withColumn("ts", F.col("ts") + F.expr("INTERVAL 5 SECONDS"))
    fresh = spark.range(10, 15).selectExpr(
        "concat('orders/1/', id) AS key", "concat('v', id) AS value",
        "timestamp'2026-01-01 00:01:00' AS ts")
    replay.unionByName(fresh).coalesce(1).write.parquet(
        os.path.join(src, "f2"))

    stream = (spark.readStream.schema("key string, value string, ts timestamp")
              .option("maxFilesPerTrigger", "1")
              .parquet(src + "/*"))
    deduped = eos_dedup(stream, "key", "ts", "1 hour")
    q = (deduped.writeStream.format("memory").queryName("eos_once")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {(r["key"], r["value"])
               for r in spark.sql("SELECT * FROM eos_once").collect()}
    finally:
        q.stop()
        q.awaitTermination()
    assert len(got) == 15                        # 10 originals + 5 fresh
    assert {v for _, v in got} == {f"v{i}" for i in range(15)}
