"""Async I/O enrichment — Flink's `AsyncDataStream.orderedWait /
unorderedWait` (RichAsyncFunction) analog.

The reference's sinks talk to external services (ES/HBase/Doris); the
matching SOURCE-side pattern is async enrichment: each record triggers a
remote lookup, and the operator overlaps many in-flight requests so
throughput is bounded by `concurrency × latency`, not `1 × latency`.

Spark analog: an Arrow-batched `mapInPandas` stage whose worker fans
each batch's rows across a thread pool (I/O-bound lookups release the
GIL while blocked on the socket, so threads are the right tool — no
extra processes). Two delivery modes, same as Flink:

- ordered=True  (orderedWait): results re-join in row order — emission
  waits for the slowest in-flight request ahead of a row;
- ordered=False (unorderedWait): results emit as they complete — lower
  latency, row order within a partition is not preserved (fine for any
  downstream keyed/aggregating consumer).

Failure contract mirrors the buffered sinks' fail-fast latch: a lookup
exception fails the task (and Spark retries it) rather than silently
dropping the row; per-row timeout falls to the caller's `fn` (wrap the
client call). State is bounded by `concurrency` futures per worker.

This is deliberately the PYTHON slow path — the point of async I/O is
hiding 1-100 ms network latency, which dwarfs Arrow serialization; for
pure-compute enrichment use expressions/broadcast joins instead.
"""

from __future__ import annotations

from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame


def async_enrich(df: DataFrame, fn: Callable[[dict], dict],
                 output_schema: str, concurrency: int = 16,
                 ordered: bool = True,
                 batch_rows: int = 1024) -> DataFrame:
    """Enrich every row via `fn(row_dict) -> extra_cols_dict` with up to
    `concurrency` lookups in flight per worker. `output_schema` is the
    FULL output schema DDL (input columns you keep + enriched columns —
    declare it explicitly; schema inference has no place in a pipeline).
    Works identically on batch and streaming frames (U4)."""

    def run(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with ThreadPoolExecutor(max_workers=concurrency) as pool:
            for pdf in pdf_iter:
                records = pdf.to_dict("records")
                for lo in range(0, len(records), batch_rows):
                    chunk = records[lo:lo + batch_rows]
                    futs = {pool.submit(fn, r): i
                            for i, r in enumerate(chunk)}
                    if ordered:
                        out = [None] * len(chunk)
                        for f, i in futs.items():
                            out[i] = {**chunk[i], **f.result()}
                        yield pd.DataFrame(out)
                    else:
                        pending = set(futs)
                        while pending:
                            done, pending = wait(
                                pending, return_when=FIRST_COMPLETED)
                            rows = [{**chunk[futs[f]], **f.result()}
                                    for f in done]
                            yield pd.DataFrame(rows)

    return df.mapInPandas(run, output_schema)
