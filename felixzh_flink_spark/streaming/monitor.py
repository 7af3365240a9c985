"""Streaming job observability — the Flink-dashboard metrics surface
(numRecordsIn/Out rates, event-time watermark lag, state size,
per-batch latency) rebuilt on Spark's `StreamingQueryListener`.

The reference's jobs are operated through Flink's metric system; a
team running this engine instead needs the same signals from
Structured Streaming. `ProgressMonitor` subscribes to the session's
listener bus and keeps a BOUNDED ring of per-batch progress rows
(driver-side, O(capacity) memory — monitoring must never become the
memory leak it is watching for). `to_df` turns the ring into a
DataFrame so the same engine can query its own telemetry (lag
percentiles, throughput regressions) with ordinary SQL; `summary`
gives the at-a-glance per-query aggregates an alert would key on.

Listener callbacks are delivered on Spark's listener thread —
everything here is lock-guarded and non-blocking (never call query
actions from inside a callback; that deadlocks the bus).
"""

from __future__ import annotations

import json
import threading
from collections import deque

from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_DDL = ("query_id string, run_id string, name string, "
                "batch_id bigint, ts string, num_input_rows bigint, "
                "input_rows_per_sec double, processed_rows_per_sec double, "
                "batch_duration_ms bigint, watermark string, "
                "state_rows bigint, state_bytes bigint")


class ProgressMonitor(StreamingQueryListener):
    """Bounded per-batch progress collector. Attach with
    `spark.streams.addListener(mon)` (or `attach(spark)`), then read
    `mon.rows()` / `mon.to_df(spark)` / `mon.summary()`."""

    def __init__(self, capacity: int = 1024):
        self._rows: deque = deque(maxlen=capacity)
        self._lock = threading.Lock()
        self._started: dict[str, str] = {}
        self._terminated: dict[str, "str | None"] = {}

    # ---- listener callbacks (Spark listener thread: keep them cheap)

    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._started[str(event.id)] = event.name or ""

    def onQueryProgress(self, event) -> None:
        try:
            p = json.loads(event.progress.json)
        except Exception:   # malformed progress must never kill the bus
            return
        dur = p.get("durationMs") or {}
        states = p.get("stateOperators") or []
        row = (
            str(p.get("id")), str(p.get("runId")), p.get("name"),
            int(p.get("batchId", -1)), p.get("timestamp"),
            int(p.get("numInputRows", 0)),
            float(p.get("inputRowsPerSecond") or 0.0),
            float(p.get("processedRowsPerSecond") or 0.0),
            int(dur.get("triggerExecution", 0)),
            (p.get("eventTime") or {}).get("watermark"),
            sum(int(s.get("numRowsTotal", 0)) for s in states),
            sum(int(s.get("memoryUsedBytes", 0)) for s in states),
        )
        with self._lock:
            self._rows.append(row)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            self._terminated[str(event.id)] = event.exception

    # ---- reading side

    def rows(self) -> list:
        with self._lock:
            return list(self._rows)

    def queries_seen(self) -> dict:
        with self._lock:
            return dict(self._started)

    def failures(self) -> dict:
        """{query_id: exception string} for terminations with errors."""
        with self._lock:
            return {k: v for k, v in self._terminated.items() if v}

    def to_df(self, spark):
        """The telemetry ring as a DataFrame — query the engine's own
        metrics with the engine."""
        return spark.createDataFrame(self.rows() or [], PROGRESS_DDL)

    def summary(self, spark):
        """Per-query at-a-glance aggregates: batches, rows, mean/max
        batch latency, last watermark — the alerting surface."""
        df = self.to_df(spark)
        return (df.groupBy("query_id", "name")
                .agg(F.count("*").alias("n_batches"),
                     F.sum("num_input_rows").alias("total_rows"),
                     F.avg("batch_duration_ms").alias("mean_batch_ms"),
                     F.max("batch_duration_ms").alias("max_batch_ms"),
                     F.max("watermark").alias("last_watermark"),
                     F.max("state_rows").alias("max_state_rows")))


def attach(spark, capacity: int = 1024) -> ProgressMonitor:
    """Create and register a ProgressMonitor on the session's listener
    bus; returns the monitor (detach with
    `spark.streams.removeListener(mon)`)."""
    mon = ProgressMonitor(capacity)
    spark.streams.addListener(mon)
    return mon
