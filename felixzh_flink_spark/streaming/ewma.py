"""Streaming EWMA — the unbounded twin of the batch
`aggregations.ewma_by_key` fold (keyed decaying-accumulator reduce,
Flink's stateful keyed `reduce` analog).

The batch form sorts each key's whole series and folds once; a stream
cannot do that, so ORDER is recovered the way every event-time
operator here recovers it: buffer open events in keyed state, and when
the WATERMARK passes an event's timestamp, fold it — in (ts,
event_id) order — into the running accumulator and emit the updated
value. The fold arithmetic is identical to the batch kernel
(acc·(1−α) + x·α seeded with the first value; Python float and JVM
double are both IEEE 754 binary64), so a stream that has seen the
same events up to the watermark reports bit-identical EWMAs — the
batch-parity contract the test asserts.

State per key: the accumulator, the fold count, and the open-event
buffer (bounded by arrival skew × rate — the watermark bounds it, the
same guarantee every windowed operator relies on). An event-time
timer re-fires the key when the watermark passes its oldest buffered
event so quiet keys still drain without new arrivals.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_OUTPUT = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("ewma", T.DoubleType()),
])

EWMA_STATE = T.StructType([
    T.StructField("acc", T.DoubleType()),
    T.StructField("n", T.LongType()),
    T.StructField("buf_ms", T.ArrayType(T.LongType())),
    T.StructField("buf_id", T.ArrayType(T.LongType())),
    T.StructField("buf_v", T.ArrayType(T.DoubleType())),
])


def make_ewma_fn(alpha: float):
    def fn(key: tuple, pdf_iter: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            acc, n, buf_ms, buf_id, buf_v = state.get
            buf = list(zip(buf_ms, buf_id, buf_v))
        else:
            acc, n, buf = None, 0, []
        wm = state.getCurrentWatermarkMs()
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                for ts, eid, v in zip(pdf["_ts"], pdf["event_id"],
                                      pdf["value"]):
                    if v is None or pd.isna(v):
                        continue      # batch kernel drops nulls pre-fold
                    buf.append((int(ts.timestamp() * 1000), int(eid),
                                float(v)))
        ready = sorted(e for e in buf if e[0] <= wm)
        rest = [e for e in buf if e[0] > wm]
        out = []
        for _ms, eid, v in ready:
            acc = v if n == 0 else acc * (1.0 - alpha) + v * alpha
            n += 1
            out.append((key[0], eid, n, acc))
        state.update((acc, n, [e[0] for e in rest],
                      [e[1] for e in rest], [e[2] for e in rest]))
        if rest:
            # re-fire once the watermark passes the oldest open event
            state.setTimeoutTimestamp(max(min(e[0] for e in rest) + 1,
                                          wm + 1))
        if out:
            yield pd.DataFrame(out, columns=["key", "event_id", "n",
                                             "ewma"])

    return fn


def ewma_stream(df: DataFrame, key_col: str, ts_col: str,
                id_col: str, value_col: str, alpha: float = 0.5,
                watermark_delay: str = "1 second") -> DataFrame:
    """Continuous per-key EWMA over an event stream: one output row per
    event, emitted when the watermark closes it, carrying the
    accumulator AFTER folding that event — bit-identical to the batch
    `ewma_by_key` over the same closed prefix."""
    prepared = (
        df.select(F.col(key_col).cast("string").alias("key"),
                  F.col(ts_col).cast("timestamp").alias("_ts"),
                  F.col(id_col).cast("long").alias("event_id"),
                  F.col(value_col).cast("double").alias("value"))
        .withWatermark("_ts", watermark_delay)
    )
    return prepared.groupBy("key").applyInPandasWithState(
        make_ewma_fn(alpha),
        outputStructType=EWMA_OUTPUT,
        stateStructType=EWMA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
