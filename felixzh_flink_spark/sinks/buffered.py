"""Generic buffered bulk sink — the K2-K7 contract as a foreachBatch writer.

Reference parity (SURVEY.md §2.5):
- ES bulk: flush by actions / interval / MB + constant-backoff retry —
  Kafka2ES/src/main/java/Kafka2ES.java:58-70 (5000 actions / 1000 ms / 5 MB,
  3 retries × 500 ms).
- HBase BufferedMutator: size + periodic flush, error latch rethrown
  per-record, flush-on-checkpoint — Kafka2HBase/src/main/java/
  HBaseSinkFunction.java:26-210, V2:25-152, V3 async:19-134.
- Doris stream-load buffers — DataGen2Doris.java:48-80.

Spark mapping: a micro-batch IS the checkpoint-consistent flush boundary
(foreachBatch returns → offsets commit), so "flush on checkpoint" is the
built-in semantics. Inside a batch we chunk rows by count/bytes and hand each
chunk to a pluggable `BulkWriter` with retry/backoff and a fail-fast error
latch — same knobs, same guarantees (at-least-once; effectively-once with
idempotent keys, which is what the reference's ES id-per-record gives too).

The per-partition chunking runs on executors via foreachPartition — the
driver never sees the data.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class FlushPolicy:
    """The reference's flush triple (actions/bytes/interval) + retry policy."""
    max_actions: int = 5000          # sink.flush.actions
    max_bytes: int = 5 * 1024 * 1024  # sink.flush.size (5 MB)
    max_interval_ms: int = 1000      # sink.flush.interval
    max_retries: int = 3             # bulk retry count
    backoff_ms: int = 500            # CONSTANT backoff delay


@dataclass
class BufferedBulkWriter:
    """Buffers records and flushes chunks through `write_chunk`.

    `write_chunk: (list[dict]) -> None` raises to signal failure; retries with
    constant backoff; after exhausting retries the error latch trips and the
    next call re-raises (the HBaseSinkFunction failureThrowable contract,
    HBaseSinkFunction.java:118-135).
    """
    write_chunk: Callable[[list], None]
    policy: FlushPolicy = field(default_factory=FlushPolicy)
    sizer: Callable[[object], int] = field(default=lambda rec: len(str(rec)))

    def __post_init__(self):
        self._buf: list = []
        self._buf_bytes = 0
        self._last_flush = time.monotonic()
        self._error: Exception | None = None
        self.flush_count = 0
        self.written = 0

    def _check_error(self):
        if self._error is not None:
            raise RuntimeError("buffered sink previously failed") from self._error

    def add(self, record) -> None:
        self._check_error()
        self._buf.append(record)
        self._buf_bytes += self.sizer(record)
        now = time.monotonic()
        if (
            len(self._buf) >= self.policy.max_actions
            or self._buf_bytes >= self.policy.max_bytes
            or (now - self._last_flush) * 1000 >= self.policy.max_interval_ms
        ):
            self.flush()

    def flush(self) -> None:
        self._check_error()
        if not self._buf:
            self._last_flush = time.monotonic()
            return
        chunk, self._buf, self._buf_bytes = self._buf, [], 0
        attempt = 0
        while True:
            try:
                self.write_chunk(chunk)
                break
            except Exception as exc:  # noqa: BLE001 - retry any writer error
                attempt += 1
                if attempt > self.policy.max_retries:
                    self._error = exc
                    raise
                time.sleep(self.policy.backoff_ms / 1000.0)
        self.flush_count += 1
        self.written += len(chunk)
        self._last_flush = time.monotonic()

    def close(self) -> None:
        self.flush()


def foreach_batch_bulk_sink(writer_factory: Callable[[], BufferedBulkWriter]):
    """Build a foreachBatch function writing every micro-batch through a
    BufferedBulkWriter per partition (executor-side).

    Usage::

        q = df.writeStream.foreachBatch(
                foreach_batch_bulk_sink(lambda: BufferedBulkWriter(my_bulk_fn))
            ).option("checkpointLocation", ckpt).start()
    """
    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        def per_partition(rows: Iterator):
            writer = writer_factory()
            for row in rows:
                writer.add(row.asDict())
            writer.close()
        batch_df.foreachPartition(per_partition)
    return sink


@dataclass
class DeadLetterBulkWriter(BufferedBulkWriter):
    """DLQ variant of the buffered sink — the poison-record policy the
    fail-fast latch can't offer: after a chunk exhausts its retries, the
    failure is ISOLATED per record (each record retried alone through
    `write_chunk`) and only the records that still fail are handed to
    `dead_letter(record, error_str)` instead of tripping the latch; the
    healthy majority of the chunk proceeds. The stream keeps running —
    Flink users build this with a side output on the sink's failure
    handler; ES users know it as the per-item bulk-response split.

    One poison record therefore costs `max_retries` chunk attempts plus
    one solo attempt per record of its chunk — bounded, and only on the
    failure path. A `dead_letter` callback that itself raises trips the
    ORIGINAL latch (losing failed records silently is never on the
    menu). `dead_count` tallies routed records for the caller's
    monitoring."""
    dead_letter: Callable[[dict, str], None] = field(
        default=lambda rec, err: None)

    def __post_init__(self):
        super().__post_init__()
        self.dead_count = 0

    def flush(self) -> None:
        self._check_error()
        if not self._buf:
            self._last_flush = time.monotonic()
            return
        chunk, self._buf, self._buf_bytes = self._buf, [], 0
        attempt = 0
        while True:
            try:
                self.write_chunk(chunk)
                written = len(chunk)
                break
            except Exception:  # noqa: BLE001 - retry, then isolate
                attempt += 1
                if attempt > self.policy.max_retries:
                    written = self._isolate(chunk)
                    break
                time.sleep(self.policy.backoff_ms / 1000.0)
        self.flush_count += 1
        self.written += written
        self._last_flush = time.monotonic()

    def _isolate(self, chunk: list) -> int:
        ok = 0
        for rec in chunk:
            try:
                self.write_chunk([rec])
                ok += 1
            except Exception as exc:  # noqa: BLE001 - route to DLQ
                try:
                    self.dead_letter(rec, repr(exc))
                    self.dead_count += 1
                except Exception as dlq_exc:  # noqa: BLE001
                    self._error = dlq_exc
                    raise
        return ok
