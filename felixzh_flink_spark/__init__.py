"""felixzh_flink_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference repo ``felixzh2020/felixzh-flink``
(a collection of Flink streaming applications; see SURVEY.md).

Architecture is Spark-first: DataFrame/SQL logical plans optimized by Catalyst,
Structured Streaming for streams, Pandas-UDF-backed stateful operators only
where built-ins genuinely can't express the semantics (count triggers,
changelog normalization).

Subpackages
-----------
- ``operators``  — relational core: transforms, aggregations, joins/set-ops/
  windows-analytic, dedup, similarity, text analysis, multimodal plumbing.
- ``sources``    — batch + streaming source builders (parquet, values, rate,
  socket, kafka, datagen).
- ``sinks``      — console/kafka/parquet writers and the generic buffered bulk
  sink (foreachBatch) with flush-by-count/bytes/interval + retry.
- ``functions``  — format codecs (csv/json/avro), changelog decoders
  (canal-json / debezium-json), payload generators, a UDF registry.
- ``streaming``  — watermarked windows, count/hybrid triggers
  (applyInPandasWithState), batch/stream-unified execution helpers.
- ``plans``      — properties-file-compatible pipeline spec (source →
  transforms → sink) executable in batch or streaming mode.
"""

from felixzh_flink_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
