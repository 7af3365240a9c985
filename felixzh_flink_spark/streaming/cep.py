"""Streaming CEP-lite: keyed ordered-pattern progression over a stream.

The streaming half of `operators/cep.py` (U4 unified-mode discipline: one
pattern spec, batch fold or streaming state). Per key, advance through an
ordered list of stage conditions; emit a row whenever a key's stage
advances.

Design:

- Stage conditions are evaluated JVM-SIDE before the stateful stage: each
  condition becomes a boolean `_m{i}` column via `F.expr`, so the Python
  state function never parses SQL or touches payloads — it only advances
  an integer through precomputed booleans. Arrow transfers K booleans +
  key + timestamp per event, not the payload.
- State per key is O(1): the current stage index. Event-time timeout
  drops keys idle past `horizon_ms` beyond the watermark (funnel
  sessions, abandoned carts).
- Within a micro-batch, events are processed in (ts, tiebreak) order
  after accumulating ALL Arrow chunks (the chunk-order determinism rule —
  see streaming/neardup.py). ACROSS batches, ordering is watermark-best-
  effort: an event arriving after a later event was already consumed
  cannot retroactively rewind the stage — the same late-data contract as
  Flink CEP, which drops pattern-relevant late events past the watermark
  (reference has no CEP job; Flink semantics cited as the workload
  family's convention).

Greedy one-step advancement is complete for subsequence existence (see
operators/cep.py header).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from felixzh_flink_spark.streaming.pdutil import chunk_max_ms


def _output_schema(key_fields: list[T.StructField]) -> T.StructType:
    return T.StructType(list(key_fields) + [
        T.StructField("stage", T.IntegerType()),
        T.StructField("stage_ts", T.TimestampType()),
    ])


STAGE_STATE = T.StructType([T.StructField("stage", T.IntegerType())])


def make_funnel_fn(n_stages: int, n_keys: int, horizon_ms: int):
    def fn(key: tuple, pdf_iter: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        stage = state.get[0] if state.exists else 0
        pdfs = [p for p in pdf_iter if len(p)]
        if not pdfs:
            # a chunkless invocation contributes no events: keep state,
            # re-arm the idle timer off the watermark
            state.update((stage,))
            state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + horizon_ms)
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        pdf = pdf.sort_values(["_ts", "_tie"], kind="mergesort")
        out = []
        # dict-records iteration keeps the underscore-prefixed column names
        # (itertuples would positional-rename them); groups are key-sized
        for row in pdf.to_dict("records"):
            if stage < n_stages and bool(row[f"_m{stage}"]):
                stage += 1
                out.append(dict(zip(
                    [f"k{i}" for i in range(n_keys)] + ["stage", "stage_ts"],
                    [*key, stage, row["_ts"]],
                )))
        state.update((stage,))
        # anchor the idle timer on the group's LAST ACTIVITY, not the
        # current watermark: in the first micro-batch the watermark is
        # still 0 (it only advances after a batch), and a watermark-
        # relative timer would land in 1970 and purge every key at the
        # next batch
        last_ms = chunk_max_ms(pdf, "_ts")
        state.setTimeoutTimestamp(
            max(last_ms, state.getCurrentWatermarkMs()) + horizon_ms)
        if out:
            yield pd.DataFrame(out)

    return fn


def funnel_stream(df: DataFrame, key_cols: list[str], ts_col: str,
                  conditions: list[str], tiebreak_col: str | None = None,
                  watermark_delay: str = "10 seconds",
                  horizon_ms: int = 3_600_000) -> DataFrame:
    """Streaming funnel progression: one output row per stage advancement,
    (key_cols..., stage, stage_ts). `conditions` are SQL booleans over the
    input columns (e.g. ``"event_type = 'view'"``), matched in order —
    stage i+1 only after stage i."""
    matches: list[Column] = [
        F.expr(cond).alias(f"_m{i}") for i, cond in enumerate(conditions)]
    # default tiebreak: content hash (monotonically_increasing_id is not
    # stream-safe) — deterministic for replay, arbitrary-but-stable among
    # identical-timestamp events
    tie = (F.col(tiebreak_col) if tiebreak_col
           else F.xxhash64(*df.columns))
    staged = (df
              .withColumn("_ts", F.col(ts_col))
              .withWatermark("_ts", watermark_delay)
              .select(*key_cols, "_ts", tie.alias("_tie"), *matches))
    key_fields = [T.StructField(f"k{i}", staged.schema[c].dataType)
                  for i, c in enumerate(key_cols)]
    out = staged.groupBy(*key_cols).applyInPandasWithState(
        make_funnel_fn(len(conditions), len(key_cols), horizon_ms),
        outputStructType=_output_schema(key_fields),
        stateStructType=STAGE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.select(*[F.col(f"k{i}").alias(c) for i, c in enumerate(key_cols)],
                      "stage", "stage_ts")
