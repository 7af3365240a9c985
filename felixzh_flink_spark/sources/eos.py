"""Consumer side of the effective-exactly-once Kafka contract (K1).

The reference's Kafka2Kafka pipeline (Kafka2Kafka/src/main/java/
Kafka2Kafka.java:45-46) gets topic-level exactly-once from Flink's
transactional Kafka sink plus `isolation.level=read_committed`
consumers. Spark's Kafka sink cannot open topic transactions, so this
engine ships the guarantee in two halves:

- `sinks.writers.keyed_eos_kafka_sink` (the producing half) emits
  byte-identical replays under deterministic keys
  ``{topic}/{batchId}/{row identity}`` — at-least-once delivery where
  every duplicate agrees on (key, value) byte-for-byte; and
- THIS module (the consuming half) — key-dedup that turns that
  at-least-once stream back into exactly-once rows, so the end-to-end
  story is runnable code, not a README contract.

Scale shape: batch dedup is a hash aggregate on the key (one shuffle,
partial-agg combined map-side). Streaming dedup uses
`dropDuplicatesWithinWatermark`, so state is bounded by the watermark
horizon — replays land promptly after the original (the crash window is
one micro-batch), so a horizon of minutes-to-hours covers every replay
the checkpoint contract can produce while old keys age out of state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .builders import kafka_source


def eos_dedup(df: DataFrame, key_col: str = "key",
              event_time_col: str | None = None,
              within_watermark: str | None = None) -> DataFrame:
    """Collapse the at-least-once keyed stream to exactly-once rows.

    Batch frames (and streams with no horizon given) dedup with
    `dropDuplicates([key])`. Streaming frames with `within_watermark`
    (an interval string, e.g. '1 hour') bound the dedup state: the
    watermark is attached to `event_time_col` (the Kafka broker
    timestamp, for `read_kafka_eos`) and duplicates arriving within the
    horizon are dropped via `dropDuplicatesWithinWatermark` — the
    unbounded-state footgun of plain streaming dropDuplicates is the
    reason the horizon parameter exists; pass None only for bounded
    replay tests."""
    if df.isStreaming and within_watermark is not None:
        if event_time_col is None:
            raise ValueError(
                "within_watermark requires event_time_col to anchor the "
                "watermark")
        return (df.withWatermark(event_time_col, within_watermark)
                .dropDuplicatesWithinWatermark([key_col]))
    return df.dropDuplicates([key_col])


def read_kafka_eos(spark: SparkSession, bootstrap_servers: str, topic: str, *,
                   starting_offsets: str = "earliest",
                   within_watermark: str | None = "1 hour",
                   streaming: bool = True,
                   extra_options: dict[str, str] | None = None) -> DataFrame:
    """Kafka source pre-wired for the effective-EOS contract: subscribe
    to the topic `keyed_eos_kafka_sink` produced, cast key/value to
    strings, and key-dedup within the watermark horizon. Returns
    (key, value, timestamp) — exactly-once rows under the producer's
    replay contract. Option plumbing rides `kafka_source` (S1/S2);
    needs a live broker to run, like every Kafka builder here."""
    raw = kafka_source(spark, bootstrap_servers, topic,
                       starting_offsets=starting_offsets,
                       streaming=streaming, value_as_string=True,
                       extra_options=extra_options)
    keyed = raw.selectExpr("CAST(key AS STRING) AS key", "value",
                           "timestamp")
    if streaming:
        return eos_dedup(keyed, "key", "timestamp", within_watermark)
    return eos_dedup(keyed, "key")
