"""Joins, set ops, sorts/top-k, analytic windows, rollup/cube.

The reference contains NONE of these (SURVEY.md §2.7 — verified absent from
all 49 Java sources), but the engine must expose a real analytics surface.
These are thin, scale-aware wrappers over native Spark operators; the value
added is the join-strategy policy (broadcast small dims) and deterministic
top-k tie-breaking for reproducible results.

Scale notes:
- `join_dim` broadcasts the dimension side: at 100 TB fact scale a broadcast
  hash join removes the fact-side shuffle entirely; only do this when the dim
  fits in executor memory (region/nation always; customer/supplier per SF).
- `top_k_per_group` uses row_number over a partitioned window — one shuffle by
  group key, no global sort.
- `top_k` (global) uses orderBy+limit which Spark executes as a distributed
  TakeOrdered — no full sort materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def join_dim(fact: DataFrame, dim: DataFrame, on, how: str = "inner",
             broadcast: bool = True) -> DataFrame:
    """Fact⋈dim join with broadcast hint for the dimension side."""
    return fact.join(F.broadcast(dim) if broadcast else dim, on, how)


def semi_join(df: DataFrame, other: DataFrame, on) -> DataFrame:
    """EXISTS — left_semi (no columns from `other`, no row multiplication)."""
    return df.join(other, on, "left_semi")


def anti_join(df: DataFrame, other: DataFrame, on) -> DataFrame:
    """NOT EXISTS — left_anti."""
    return df.join(other, on, "left_anti")


def union_all(*dfs: DataFrame) -> DataFrame:
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """Global top-k: distributed TakeOrdered (partial top-k per partition,
    merged on the driver) — never a full global sort."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(df: DataFrame, group: list[str], order: list[Column], k: int,
                    rank_alias: str = "rn") -> DataFrame:
    """Top-k per group via row_number. Callers must include a unique
    tie-breaker in `order` for deterministic output."""
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .filter(F.col(rank_alias) <= k)
    )


def rollup_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    """GROUP BY ROLLUP — hierarchical subtotals (beyond-reference fill)."""
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    """GROUP BY CUBE — all grouping-set combinations."""
    return df.cube(*keys).agg(*aggs)
