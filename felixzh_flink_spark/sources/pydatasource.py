"""The reference's custom source as a FIRST-CLASS Spark data source —
Spark 4.0's Python DataSource API (S7/S8 upgraded from builder helpers to
`spark.read.format("felixzh_datagen")`).

Reference parity:
- bounded record budget `source.record.sum` + payload size
  `source.record.size.byte` — DataGen2Doris.properties:1-2,
  DataGen2ES.java:60.
- rate-limited streaming `source.record.per.sec` —
  DataGen2ES.properties:2 (deterministic analog: a fixed per-batch
  record budget; wall-clock pacing is the trigger interval's job).
- parallel generation — CustomSourceV2.java's parallel source contract:
  the batch reader splits the record budget into `partitions` input
  splits, each generated independently (no driver loop, no single task).

Payloads are deterministic printable-ASCII chains seeded by record id —
same generator family as `functions/generators.py` (the reference's
RandomPrintableDataGenerator), so re-reads reproduce identical rows and
the source is replay-safe by construction. The streaming reader tracks a
monotonically increasing record offset: `initialOffset` → 0,
`latestOffset` advances by `records_per_batch`, replayed ranges
regenerate the SAME rows — the at-least-once replay contract a
checkpointed pipeline needs (and exactly why payloads must be a pure
function of record id).

Python data sources execute rows through Arrow batches — fine for a
datagen/test source; the parquet/Kafka scan paths remain the JVM hot
path for real data.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

PRINTABLE_LOW = 33
PRINTABLE_SPAN = 94

SCHEMA_DDL = "record_id bigint, payload string"


def _payload(record_id: int, size_bytes: int, seed: int) -> str:
    """Deterministic printable payload — md5-chain over (seed, id, block):
    pure function of the record id, so replays and parallel re-splits
    regenerate identical rows."""
    out = []
    block = 0
    while len(out) < size_bytes:
        h = hashlib.md5(f"{seed}-{record_id}-{block}".encode()).digest()
        out.extend(chr(PRINTABLE_LOW + b % PRINTABLE_SPAN) for b in h)
        block += 1
    return "".join(out[:size_bytes])


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _DatagenReader(DataSourceReader):
    def __init__(self, options):
        self.total = int(options.get("record_sum", 1000))
        self.size = int(options.get("record_size_byte", 64))
        self.seed = int(options.get("seed", 42))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        step = -(-self.total // self.n_parts)
        return [_RangePartition(i, min(i + step, self.total))
                for i in range(0, self.total, step)]

    def read(self, partition: _RangePartition):
        for rid in range(partition.start, partition.end):
            yield (rid, _payload(rid, self.size, self.seed))


class _DatagenStreamReader(DataSourceStreamReader):
    """Offset = next record id to generate. Deterministic rate limiting:
    each micro-batch advances by `records_per_batch` until `record_sum`
    (if set) is exhausted; a replayed (start, end) range regenerates
    identical rows."""

    def __init__(self, options):
        self.size = int(options.get("record_size_byte", 64))
        self.seed = int(options.get("seed", 42))
        self.per_batch = int(options.get("records_per_batch", 10))
        self.total = int(options.get("record_sum", -1))
        self.n_parts = int(options.get("partitions", 4))
        self._current = 0

    def initialOffset(self):
        return {"next": 0}

    def latestOffset(self):
        self._current += self.per_batch
        if self.total >= 0:
            self._current = min(self._current, self.total)
        return {"next": self._current}

    def partitions(self, start: dict, end: dict):
        # Restart resync: after a checkpoint restore this reader is a
        # FRESH instance (_current = 0) while `start` carries the
        # committed offset — without a fast-forward, latestOffset()
        # would regress below the committed start (offset-monotonicity
        # violation in stricter engine versions) and the source would
        # emit empty batches until _current caught up. Ratchet the
        # cursor to every offset the engine shows us.
        self._current = max(self._current, start["next"], end["next"])
        lo, hi = start["next"], end["next"]
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        step = max(1, -(-(hi - lo) // self.n_parts))
        return [_RangePartition(i, min(i + step, hi))
                for i in range(lo, hi, step)]

    def read(self, partition: _RangePartition):
        for rid in range(partition.start, partition.end):
            yield (rid, _payload(rid, self.size, self.seed))

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class DatagenDataSource(DataSource):
    """`spark.dataSource.register(DatagenDataSource)` then
    `spark.read.format("felixzh_datagen")` (bounded batch) or
    `spark.readStream.format("felixzh_datagen")` (rate-limited stream)."""

    @classmethod
    def name(cls) -> str:
        return "felixzh_datagen"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> _DatagenReader:
        return _DatagenReader(self.options)

    def streamReader(self, schema) -> _DatagenStreamReader:
        return _DatagenStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(DatagenDataSource)
