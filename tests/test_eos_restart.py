"""Composed U5+U6+K1 end-to-end: restart-strategy supervision over the
keyed-EOS sink, with consumer-side dedup closing the loop.

The scenario is the real production failure: the producer crashes
MID-BATCH (some partitions already flushed — the at-least-once window),
the supervisor restarts the query against the same checkpointLocation,
Structured Streaming replays the batch with identical batchId-derived
keys, and `eos_dedup` on the consumer side collapses the stream back to
exactly-once logical rows.
"""

import json
import os

from felixzh_flink_spark.sinks.writers import keyed_eos_kafka_sink
from felixzh_flink_spark.sources.eos import eos_dedup
from felixzh_flink_spark.streaming.restart import (
    FixedDelay,
    run_streaming_with_restart,
)


def _read_sends(root):
    recs = []
    for f in os.listdir(root):
        if f.startswith("sends-"):
            with open(os.path.join(root, f)) as fh:
                recs += [json.loads(line) for line in fh if line.strip()]
    return recs


def _once_crashing_factory(root, flag):
    """File-backed fake producer whose FIRST-ever send crashes (flag
    file makes the failure once-only across executor processes); every
    later producer records sends normally. Defined inside the factory
    so cloudpickle ships it by value to Python workers."""
    def make():
        import json as _json
        import os as _os
        import uuid as _uuid

        class FileProducer:
            def __init__(self):
                self.lines = []

            def send(self, topic, key, value):
                if not _os.path.exists(flag):
                    open(flag, "w").close()
                    raise RuntimeError("injected mid-batch producer crash")
                self.lines.append(_json.dumps(
                    {"topic": topic, "key": key, "value": value}))

            def flush(self):
                if self.lines:
                    path = _os.path.join(
                        root, f"sends-{_uuid.uuid4().hex}.jsonl")
                    with open(path, "w") as fh:
                        fh.write("\n".join(self.lines) + "\n")
                    self.lines = []

        return FileProducer()
    return make


def test_restart_supervision_replays_eos_batch_to_exactly_once(
        spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "sent")
    flag = str(tmp_path / "crashed.flag")
    os.makedirs(root)
    spark.range(12).selectExpr(
        "id AS k", "concat('v', id) AS value").coalesce(2) \
        .write.mode("append").parquet(src)

    def start():
        stream = spark.readStream.schema("k long, value string").parquet(src)
        q = keyed_eos_kafka_sink(
            stream, "orders", checkpoint_location=ckpt, key_cols=["k"],
            producer_factory=_once_crashing_factory(root, flag))
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
        if q.exception() is not None:
            raise q.exception()

    restarts = []
    run_streaming_with_restart(
        start, FixedDelay(attempts=3, delay_s=0.0),
        sleep=lambda _s: None,
        on_restart=lambda n, exc: restarts.append(n))
    assert restarts == [1]                       # exactly one crash

    sends = _read_sends(root)
    assert len(sends) >= 12                      # at-least-once raw stream
    # replayed duplicates carry BYTE-IDENTICAL keys (batchId-derived) —
    # that is the contract consumer dedup relies on
    at_least_once = spark.createDataFrame(
        [(s["key"], s["value"]) for s in sends], "key string, value string")
    exactly_once = eos_dedup(at_least_once, key_col="key")
    rows = {r["value"] for r in exactly_once.collect()}
    assert rows == {f"v{i}" for i in range(12)}
    assert exactly_once.count() == 12
