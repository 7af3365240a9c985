"""Streaming trailing-window anomaly detection — the continuous face of
`operators.aggregations.integer_zscore_anomalies`.

A keyed stateful operator (`applyInPandasWithState`, event-time timers like
`streaming/triggers.py`) maintains, per key:

- OPEN buckets: event counts for time buckets the watermark has not passed
  yet (arrivals may still come);
- a TRAILING ring of the last `lookback` CLOSED bucket counts.

When the watermark passes a bucket's end (+ the watermark delay), the bucket
closes: its count is judged against the trailing ring with the same
division-free integer inequality as the batch operator —

    (n·x − s1)² · (n−1)  >  z² · n · (n·s2 − s1²)

— one row (key, bucket_ts, cnt, is_anomaly) is emitted, and the count
joins the ring (evicting beyond `lookback`). Buckets with zero events emit
nothing and never enter the ring, exactly like the batch form (whose counts
table has no zero rows), so STREAMING FLAGS == BATCH FLAGS for every closed
bucket — the parity the unit test asserts.

State per key is O(lookback + open buckets): a few dozen longs, bounded at
any scale. Timers are event-time (watermark-driven, replay-deterministic);
the processing-time variant is deliberately not offered — see the
determinism note in streaming/triggers.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ANOMALY_OUTPUT = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("bucket_ms", T.LongType()),   # bucket start, epoch ms
    T.StructField("cnt", T.LongType()),
    T.StructField("is_anomaly", T.BooleanType()),
])

#: closed-ring (bucket starts + counts) and open buckets, as parallel arrays
ANOMALY_STATE = T.StructType([
    T.StructField("ring_ms", T.ArrayType(T.LongType())),
    T.StructField("ring_cnt", T.ArrayType(T.LongType())),
    T.StructField("open_ms", T.ArrayType(T.LongType())),
    T.StructField("open_cnt", T.ArrayType(T.LongType())),
])


def _flag(trail: list[int], x: int, z: int, min_points: int) -> bool:
    n = len(trail)
    if n < min_points:
        return False
    s1 = sum(trail)
    s2 = sum(c * c for c in trail)
    lhs = (n * x - s1) ** 2 * (n - 1)
    rhs = z * z * n * (n * s2 - s1 * s1)
    return lhs > rhs


def make_anomaly_fn(bucket_ms: int, lookback: int, z: int, min_points: int):
    """Build the stateful function. Closing order is bucket-start order, so
    the ring evolves exactly as the batch window frame does."""

    def close_ready(ring_ms, ring_cnt, open_ms, open_cnt, upto_ms):
        """Close every open bucket whose END ≤ upto_ms; emit in time order."""
        out = []
        keep_ms, keep_cnt = [], []
        for bms, cnt in sorted(zip(open_ms, open_cnt)):
            if bms + bucket_ms <= upto_ms:
                out.append({"key": None, "bucket_ms": int(bms),
                            "cnt": int(cnt),
                            "is_anomaly": _flag(ring_cnt, int(cnt), z,
                                                min_points)})
                ring_ms.append(int(bms))
                ring_cnt.append(int(cnt))
                if len(ring_cnt) > lookback:
                    ring_ms.pop(0)
                    ring_cnt.pop(0)
            else:
                keep_ms.append(int(bms))
                keep_cnt.append(int(cnt))
        return out, ring_ms, ring_cnt, keep_ms, keep_cnt

    def fn(key: tuple, pdf_iter: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        ring_ms, ring_cnt, open_ms, open_cnt = (
            [list(v) for v in state.get] if state.exists else ([], [], [], []))
        wm = state.getCurrentWatermarkMs()

        if not state.hasTimedOut:
            opens = dict(zip(open_ms, open_cnt))
            for pdf in pdf_iter:
                for ts in pdf["_ts"]:
                    ems = int(ts.timestamp() * 1000)
                    bms = (ems // bucket_ms) * bucket_ms
                    opens[bms] = opens.get(bms, 0) + 1
            open_ms, open_cnt = list(opens), list(opens.values())

        out, ring_ms, ring_cnt, open_ms, open_cnt = close_ready(
            ring_ms, ring_cnt, open_ms, open_cnt, wm)
        state.update((ring_ms, ring_cnt, open_ms, open_cnt))
        if open_ms:
            # arm the timer at the earliest still-open bucket's end; fires
            # once the watermark passes it even if no more rows arrive
            state.setTimeoutTimestamp(max(min(open_ms) + bucket_ms, wm + 1))
        if out:
            for r in out:
                r["key"] = key[0]
            yield pd.DataFrame(out)

    return fn


def anomaly_stream(df: DataFrame, key_col: str, ts_col: str,
                   bucket: str = "1 hour", lookback: int = 24, z: int = 3,
                   min_points: int = 12,
                   watermark_delay: str = "1 second") -> DataFrame:
    """Continuous anomaly flags over a raw event stream. Input needs
    `key_col` (string-castable) and `ts_col` (timestamp). Output: one row
    per closed bucket with data (ANOMALY_OUTPUT)."""
    unit_ms = {"1 hour": 3_600_000, "1 minute": 60_000,
               "1 second": 1_000}.get(bucket)
    if unit_ms is None:
        raise ValueError(f"unsupported bucket {bucket!r}")
    prepared = (
        df.select(F.col(key_col).cast("string").alias("key"),
                  F.col(ts_col).cast("timestamp").alias("_ts"))
        .withWatermark("_ts", watermark_delay)
    )
    return prepared.groupBy("key").applyInPandasWithState(
        make_anomaly_fn(unit_ms, lookback, z, min_points),
        outputStructType=ANOMALY_OUTPUT,
        stateStructType=ANOMALY_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
