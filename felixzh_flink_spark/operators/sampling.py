"""Deterministic sampling / dataset splitting — training-data pipeline
staples (beyond-reference capability).

`df.sample()` is seed-dependent per partitioning and not reproducible across
engines; these operators hash a stable key instead, so the same row lands in
the same split on any engine, any partitioning, any day — the property a
train/held-out split must have at 100 TB (and what makes the split
oracle-checkable against DuckDB via md5).

The hash is md5(key) taken as 8 hex digits → int — uniform enough for
splitting, available in every engine; xxhash64 is faster but Spark-specific.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from md5 of the key's string form."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10) \
        .cast("bigint") % buckets


def deterministic_sample(df: DataFrame, key: str, pct: int,
                         buckets: int = 100) -> DataFrame:
    """Keep rows whose hash bucket < pct — a reproducible pct% sample."""
    return df.filter(hash_bucket(F.col(key), buckets) < pct)


def train_test_split(df: DataFrame, key: str, test_pct: int = 10,
                     buckets: int = 100) -> tuple[DataFrame, DataFrame]:
    """(train, test) split on the stable hash — disjoint, exhaustive, and
    identical across runs/engines. Split at the KEY level: all rows of one
    key land on the same side (no leakage between splits)."""
    b = hash_bucket(F.col(key), buckets)
    return df.filter(b >= test_pct), df.filter(b < test_pct)


def stratified_sample(df: DataFrame, key: str, strata_col: str,
                      fractions: dict[str, float],
                      default_fraction: float = 0.0,
                      buckets: int = 10_000) -> DataFrame:
    """Deterministic per-stratum sampling — the domain-mixing primitive of a
    training-data pipeline (keep 100% of wiki, 10% of crawl, ...).

    Row kept iff hash_bucket(key) < fraction[stratum] × buckets. Unlike
    `df.sampleBy`, the decision is a pure function of (key, stratum), so
    mixes are reproducible across engines/runs and a key keeps the same
    fate when fractions of OTHER strata change. Single scan, no shuffle —
    the filter is a CASE over the stratum column."""
    frac = F.lit(default_fraction)
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(frac)
    return df.filter(
        hash_bucket(F.col(key), buckets) < (frac * buckets).cast("bigint"))
