"""Single-pass table profiling — data-quality statistics for pipeline
monitoring (beyond-reference capability; the training-data analog of the
reference's eyeball-the-console verification, SURVEY.md §5).

One aggregate pass computes per-column null counts, min/max, and exact
distinct counts — every stat is a partial-aggregable expression, so the
whole profile is one shuffle regardless of table width. For 100 TB scans
swap count_distinct → approx_count_distinct (HLL++) per column; exact is
kept here because it is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """Wide one-row profile of numeric columns: n, nulls/min/max/distinct
    per column, deterministically named `<col>_<stat>`."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}_nulls"),
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            F.countDistinct(c).alias(f"{c}_distinct"),
        ]
    return df.agg(*aggs)
