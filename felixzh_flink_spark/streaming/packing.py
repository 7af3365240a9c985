"""Streaming sequence packing — the ingest-time counterpart of
operators/packing.py (U4 unified batch/stream for the packing op).

Docs stream in and are appended to the current open pack of their KEY
(e.g. the corpus source): state per key is just (next pack_seq, running
token total) — O(1), no doc buffering. When a doc would overflow
`pack_budget`, the open pack is closed and the doc starts the next one —
the same first-fit walk as `operators.packing.greedy_walk`, applied in
arrival order (within a micro-batch, doc_id order, so replays are
deterministic given the same batch split).

Keying by source gives one sequential packer per source, which is the
scale design: packs never mix sources (usually desired for curriculum /
provenance anyway) and thousands of sources pack concurrently. State
never expires on its own — a pack stays open until its key sees enough
tokens — so the operator runs with NoTimeout; close-out of stragglers is
an end-of-ingest batch step, not a timer.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from felixzh_flink_spark.operators.text import token_count

PACK_STREAM_OUTPUT = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_tokens", T.LongType()),
    T.StructField("pack_seq", T.LongType()),
])

PACK_STREAM_STATE = T.StructType([
    T.StructField("seq", T.LongType()),
    T.StructField("running", T.LongType()),
])


def make_pack_fn(pack_budget: int):
    def fn(key: tuple, pdf_iter: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        seq, running = state.get if state.exists else (0, 0)
        out = []
        # Concatenate ALL Arrow chunks before the single sort: a per-chunk
        # sort_values makes the walk order (and thus pack assignment)
        # depend on how the micro-batch happened to split into chunks,
        # breaking replay determinism. The group buffer is one key's slice
        # of a micro-batch — bounded by the trigger, not the stream.
        chunks = list(pdf_iter)
        whole = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if len(whole):
            whole = whole.sort_values("doc_id")
            for doc_id, n in zip(whole["doc_id"], whole["n_tokens"]):
                n = int(n)
                if running > 0 and running + n > pack_budget:
                    seq += 1
                    running = 0
                running += n
                out.append({"key": key[0], "doc_id": int(doc_id),
                            "n_tokens": n, "pack_seq": seq})
        state.update((seq, running))
        if out:
            yield pd.DataFrame(out)

    return fn


def pack_stream(df: DataFrame, pack_budget: int, key_col: str = "source",
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Streaming greedy packing: (key, doc_id, n_tokens, pack_seq), one
    sequential packer per key; pack_seq continues across micro-batches."""
    prepared = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(id_col).alias("doc_id"),
        token_count(text_col),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        make_pack_fn(pack_budget),
        outputStructType=PACK_STREAM_OUTPUT,
        stateStructType=PACK_STREAM_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
