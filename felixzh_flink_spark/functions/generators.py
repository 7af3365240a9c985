"""Random payload generators (SURVEY.md §2.1 S8, §2.6 F8).

Reference parity:
- printable-ASCII payloads of a target byte size —
  DataGen2ES/src/main/java/RandomPrintableDataGenerator.java:26-46,
  CustomSource/src/main/java/CustomSourceV2.java:37-51,
  CustomSource/src/main/java/PrintableCharGenerator.java:4-13.
- timestamped JSON payloads — DataGen2Doris/src/main/java/DataGen2Doris.java:90-95
  (`{"id": nextLong, "name": currentTimeMillis}`).

All JVM expressions: payload bytes come from seeded rand() chains so datagen
is reproducible (the reference's SecureRandom/Random split maps to the seed
argument).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

PRINTABLE_LOW = 33   # '!' — matches PrintableCharGenerator's printable range
PRINTABLE_SPAN = 94  # through '~'


def printable_payload(size_bytes: int, seed_col: Column) -> Column:
    """Printable-ASCII string of exactly `size_bytes` chars, deterministic in
    `seed_col` (RandomPrintableDataGenerator.generate analog).

    Built as transform over a sequence: char_i = chr(33 + xxhash64(seed, i) %
    94) — pure JVM, one row-level expression regardless of size.
    """
    return F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), F.lit(size_bytes - 1)),
            lambda i: F.char(
                F.lit(PRINTABLE_LOW)
                + F.pmod(F.xxhash64(seed_col, i), F.lit(PRINTABLE_SPAN)).cast("int")
            ),
        ),
    )


def datagen_batch(spark: SparkSession, total_records: int, payload_bytes: int = 512,
                  seed: int = 42) -> DataFrame:
    """Bounded datagen (DataGen2Doris's `source.record.sum=100000` contract):
    spark.range is already parallel and partition-pruned; payload derived
    from the row id, so regeneration is deterministic."""
    base = spark.range(total_records).withColumnRenamed("id", "record_id")
    return base.select(
        "record_id",
        printable_payload(payload_bytes, F.xxhash64("record_id", F.lit(seed))).alias("payload"),
    )


def datagen_json_payload(df: DataFrame, id_col: str = "record_id") -> DataFrame:
    """DataGen2Doris.java:90-95 payload shape: {"id": <long>, "name": <millis>}
    as a JSON string column (current_timestamp is non-deterministic → keep out
    of oracle-checked paths)."""
    return df.select(
        F.to_json(F.struct(
            F.col(id_col).alias("id"),
            (F.unix_millis(F.current_timestamp())).alias("name"),
        )).alias("value")
    )
