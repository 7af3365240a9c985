"""Streaming MinHash-LSH near-duplicate detection.

Beyond-reference capability (the reference's streaming jobs have no dedup;
batch near-dup lives in operators/dedup.py). Design:

- Signatures are PER-ROW expressions (operators.dedup.minhash_signatures'
  row-wise form): shingle array → 64 × array_min(transform(xxhash64)) —
  no aggregation, so the whole signature stage is stream-safe and
  stateless.
- Each doc explodes into `bands` (band, bucket) keys; the stateful stage
  is keyed by (band, bucket) and remembers only the FIRST doc id seen in
  the bucket (O(1) state per bucket — never a doc buffer). A later doc
  hashing into the same bucket is a near-dup candidate and is emitted as
  (doc_id, dup_of=first_id, band).
- Buckets expire via event-time timers: when the watermark passes the
  bucket's last activity + `horizon_ms`, state is dropped — total state is
  bounded by the distinct buckets inside the dedup horizon, matching
  `dropDuplicatesWithinWatermark`'s contract for the exact-dedup case.
  (EventTimeTimeout on purpose; see streaming/triggers.py for why
  processing-time timers are not used.)

A pair may surface in several bands — consumers de-duplicate on
(doc_id, dup_of), exactly like the batch candidate join's `.distinct()`.
Emission is deterministic for a given batch split: within a micro-batch,
rows are visited in doc-id order, so the smallest id becomes the bucket
representative.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from felixzh_flink_spark.streaming.pdutil import chunk_max_ms

from felixzh_flink_spark.operators.dedup import (
    _sig_array_sql,
    band_explode_sql,
    shingle_array,
)

NEARDUP_OUTPUT = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("dup_of", T.LongType()),
    T.StructField("band", T.IntegerType()),
])

NEARDUP_STATE = T.StructType([
    T.StructField("first_id", T.LongType()),
])


def make_near_dup_fn(horizon_ms: int):
    def fn(key: tuple, pdf_iter: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        first_id = state.get[0] if state.exists else None
        # Accumulate EVERY Arrow chunk before sorting: a group that spans
        # multiple chunks within a micro-batch would otherwise pick its
        # representative per-chunk, making first_id depend on chunk order
        # and breaking replay determinism. Groups are bucket-sized, so the
        # buffer is small by construction.
        ids = []
        last_ms = 0
        for pdf in pdf_iter:
            ids.extend(int(x) for x in pdf["id"])
            last_ms = chunk_max_ms(pdf, "_ts", last_ms)
        out = []
        for doc_id in sorted(ids):
            if first_id is None:
                first_id = doc_id
            elif doc_id != first_id:
                out.append({"doc_id": doc_id, "dup_of": first_id,
                            "band": int(key[0])})
        state.update((first_id,))
        # anchor the eviction timer on the bucket's LAST ACTIVITY (max event
        # time in this batch), not the current watermark: in the first
        # micro-batch the watermark is still 0, and a watermark-relative
        # timer would land in 1970 and purge every bucket at the next batch,
        # silently missing any cross-batch duplicate within the horizon
        state.setTimeoutTimestamp(
            max(last_ms, state.getCurrentWatermarkMs()) + horizon_ms)
        if out:
            yield pd.DataFrame(out)

    return fn


def near_dup_stream(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", ts_col: str = "ts",
                    n: int = 3, num_perm: int = 64, bands: int = 16,
                    watermark_delay: str = "10 seconds",
                    horizon_ms: int = 60_000) -> DataFrame:
    """Streaming near-dup candidates: (doc_id, dup_of, band).

    `horizon_ms` is the dedup horizon past the watermark — how long a
    bucket representative stays in state after its last collision."""
    banded = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(ts_col).alias("_ts"),
            F.explode(F.array(shingle_array(text_col, n))).alias("sh"),
        )
        .select("id", "_ts", F.expr(_sig_array_sql(num_perm)).alias("sig"))
        .select("id", "_ts",
                F.expr(band_explode_sql(num_perm, bands)).alias("bk"))
        .select("id", "_ts", "bk.band", "bk.bucket")
        .withWatermark("_ts", watermark_delay)
    )
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        make_near_dup_fn(horizon_ms),
        outputStructType=NEARDUP_OUTPUT,
        stateStructType=NEARDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
