"""Sequence packing for LLM training pipelines.

Beyond-reference capability: group documents into fixed token-budget
training sequences/shards. Two tiers, mirroring what a 100 TB corpus
actually needs:

1. `assign_token_shards` — deterministic shard assignment by cumulative
   token offset: order docs by id, exclusive running token sum, shard =
   floor(offset / shard_budget). Pure window expression (one shuffle for
   the global ordering), SQL-expressible, and the standard way to cut a
   corpus into ~equal-token shards for downstream parallel work. A shard
   may slightly exceed the budget (a doc can straddle the boundary) — the
   budget is a target, not a cap.

2. `pack_greedy` — TRUE greedy first-fit packing (cap, not target): within
   each shard, walk docs in id order and start a new pack whenever adding
   the next doc would exceed `pack_budget` (an oversized doc gets its own
   pack). Greedy packing is inherently sequential, so the scale design is
   hierarchical: the distributed shard pass bounds each sequential unit,
   then packs are built per-shard in parallel via applyInPandas (Arrow
   batches; thousands of shards pack concurrently on a cluster). Packs
   never span shards — the cost is at most one under-filled pack per
   shard, bought for full parallelism.

Token semantics match operators.text.token_count (whitespace tokens).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from felixzh_flink_spark.operators.text import token_count

PACKED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_tokens", T.LongType()),
    T.StructField("shard_id", T.LongType()),
    T.StructField("pack_seq", T.LongType()),
    T.StructField("pack_tokens", T.LongType()),
])


def _exclusive_cumsum(df: DataFrame, val_col: str, order_col: str | list[str],
                      out: str = "cum") -> DataFrame:
    """Scale-safe global exclusive running sum in `order_col` order (a
    single column name or a composite-order list; the order must be a
    total order — ties make the within-partition window nondeterministic).

    `Window.orderBy` with no partitionBy moves ALL rows to one task — the
    classic global-window scale-killer. Instead: range-partition by the
    order key, run the cumsum per partition, and add each partition's
    prefix offset (a numPartitions-row aggregate, broadcast back). Range
    boundaries are sample-based and may vary, but the result doesn't —
    offset + local cumsum is the same global prefix sum wherever the
    splits land."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    nparts = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    ob = ", ".join(f"`{c}`" for c in order_cols)
    # Two spark.sql calls instead of ~14 incremental DataFrame ops
    # (round-8 plan-time fold — this helper rides under half a dozen
    # headline queries, each paying its py4j chatter per call). Same
    # plan: range exchange, post-exchange spark_partition_id, local
    # exclusive window, numPartitions-row offsets window (the only
    # global window), broadcast join. `local` crosses a
    # DataFrame-parameter boundary on purpose — as a pure-SQL CTE a
    # nondeterministic (spark_partition_id) subtree referenced twice
    # gets wrapped in an extra REBALANCE exchange (the
    # exact_percentiles_frame lesson); a substituted frame resolves
    # like the former Column form.
    local = df.sparkSession.sql(f"""
SELECT *, COALESCE(SUM(`{val_col}`) OVER (PARTITION BY _pid ORDER BY {ob}
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       CAST(0 AS BIGINT)) AS _local
FROM (SELECT ranged.*, spark_partition_id() AS _pid
      FROM (SELECT /*+ REPARTITION_BY_RANGE({nparts}, {ob}) */ *
            FROM {{df}}) ranged)
""", df=df)
    # `local` has TWO consumers below (the offsets aggregate and the
    # final join) and no common-subtree sharing exists across DataFrame
    # references — un-materialized, the whole prelude (source scan +
    # `val_col` derivation + range exchange incl. its sampling pass +
    # per-partition window) executes TWICE per action, and the range
    # boundaries' cross-branch consistency rests on sampling determinism
    # alone. One lazy localCheckpoint makes the second consumer read
    # materialized rows instead: the frame is one narrow row per input
    # row (order cols + val + _pid + _local — decision metadata, not
    # payload), so materializing it is the guide-§8 trade, and at
    # 100 TB it replaces a second full token-count scan of the corpus.
    local = local.localCheckpoint(eager=False)
    cols = ", ".join(f"l.`{c}`" for c in df.columns)
    return df.sparkSession.sql(f"""
WITH offsets AS (
  SELECT _pid, COALESCE(SUM(_ptot) OVER (ORDER BY _pid
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         CAST(0 AS BIGINT)) AS _off
  FROM (SELECT _pid, SUM(`{val_col}`) AS _ptot FROM {{local}}
        GROUP BY _pid))
SELECT /*+ BROADCAST(o) */ {cols},
       CAST(l._local + o._off AS BIGINT) AS `{out}`
FROM {{local}} l JOIN offsets o ON l._pid = o._pid
""", local=local)


def assign_token_shards(df: DataFrame, shard_budget: int,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, shard_id) with shard = floor(exclusive-cumulative
    tokens / shard_budget) in doc-id order. No per-row Python; the global
    prefix sum uses the two-phase range-partitioned form above."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), token_count(text_col))
    cum = _exclusive_cumsum(toks, "n_tokens", "doc_id")
    return cum.select(
        "doc_id", "n_tokens",
        (F.col("cum") / F.lit(shard_budget)).cast("bigint").alias("shard_id"),
    )


def greedy_walk(tokens: list[int], budget: int) -> tuple[list[int], list[int]]:
    """The sequential first-fit walk: returns (pack_seq per doc, running
    total per doc). A new pack starts when adding the next doc would exceed
    `budget` and the current pack is non-empty, so an oversized doc gets a
    pack of its own (zero-token docs never open a pack — they ride along
    wherever the walk stands). Pure function — property-tested directly."""
    seqs, totals = [], []
    seq, running = 0, 0
    for n in tokens:
        if running > 0 and running + n > budget:
            seq += 1
            running = 0
        running += int(n)
        seqs.append(seq)
        totals.append(running)
    return seqs, totals


def pack_greedy(df: DataFrame, pack_budget: int, shard_budget: int | None = None,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Greedy first-fit packing: (doc_id, n_tokens, shard_id, pack_seq,
    pack_tokens) where pack_seq numbers packs within a shard and
    pack_tokens is the pack's total (≤ pack_budget unless a single doc
    exceeds the budget alone).

    Deterministic: shard assignment is order-defined, and the per-shard
    walk is in doc_id order inside a sorted Arrow batch."""
    shard_budget = shard_budget or pack_budget * 64
    sharded = assign_token_shards(df, shard_budget, text_col, id_col)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs, totals = greedy_walk(list(pdf["n_tokens"]), pack_budget)
        pdf["pack_seq"] = pd.Series(seqs, dtype="int64")
        # pack_tokens = final total of the pack each row landed in
        totals = pd.Series(totals, dtype="int64")
        pdf["pack_tokens"] = totals.groupby(
            pd.Series(seqs)).transform("max").astype("int64")
        return pdf[["doc_id", "n_tokens", "shard_id", "pack_seq", "pack_tokens"]]

    return sharded.groupBy("shard_id").applyInPandas(pack, PACKED_SCHEMA)
