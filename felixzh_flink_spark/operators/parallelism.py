"""Per-operator parallelism (SURVEY.md §2 U7) — Flink's
`.setParallelism(n)` (reference Kafka2ES.java:74,80;
SocketAppV2.java:30,41,53,67; DataGen2Doris.java:82-86) mapped onto
Spark's partition model AS CODE.

Spark has no per-operator parallelism knob: a stage's width is its
partition count, set by the source split count, shuffle partitions, or
an explicit redistribution. The faithful mapping is therefore a
redistribution boundary wherever Flink would change parallelism:

- upscale / general `setParallelism(n)` → `repartition(n)` (round-robin
  full shuffle — the same network move Flink's rebalance-on-parallelism-
  change performs);
- `rebalance` mode → the REBALANCE hint: AQE sizes the partitions at
  runtime and splits skewed ones, the right default at 100 TB where a
  fixed n is a guess;
- sink/downscale parallelism (Kafka2ES's `.setParallelism(1)` before
  the sink) → `coalesce(n)` — narrows WITHOUT a shuffle by stitching
  upstream partitions, the zero-cost way to bound writer count.

`coalesce` caveat encoded here: it caps, never raises, and collapses
the UPSTREAM stage's parallelism too (the stitched partitions execute
as one task each) — so the default is the shuffle forms, and
`coalesce` is opt-in via allow_narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def with_parallelism(df: DataFrame, n: int | None = None,
                     mode: str = "repartition") -> DataFrame:
    """Insert a parallelism boundary: mode = 'repartition' (round-robin
    to exactly n), 'rebalance' (AQE-sized; n optional advisory), or
    'coalesce' (narrow to ≤ n, no shuffle). The Spark analog of
    `.setParallelism(n)` on the operator that FOLLOWS this call."""
    if mode == "repartition":
        if n is None or n < 1:
            raise ValueError("repartition needs n >= 1")
        return df.repartition(n)
    if mode == "rebalance":
        return df.hint("rebalance")
    if mode == "coalesce":
        if n is None or n < 1:
            raise ValueError("coalesce needs n >= 1")
        return df.coalesce(n)
    raise ValueError(f"unknown parallelism mode '{mode}'")


def sink_parallelism(df: DataFrame, n: int = 1,
                     allow_narrow: bool = True) -> DataFrame:
    """Bound the number of concurrent sink writers — the reference's
    `.setParallelism(1)` before its ES/Doris sinks (Kafka2ES.java:80).
    Narrow coalesce by default (no shuffle: a sink cap shouldn't cost a
    network pass); set allow_narrow=False to force a repartition when
    the upstream stage must keep its own width (heavy transform before
    a single-writer sink)."""
    return df.coalesce(n) if allow_narrow else df.repartition(n)
