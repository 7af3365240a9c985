"""Config-driven pipeline spec: source → transforms → sink.

Reference parity (SURVEY.md §2.8):
- U8 properties-file config with `source.*` / `sink.*` / `env.*` key families
  (ParameterTool.fromPropertiesFile — Kafka2ES.java:31; key inventory e.g.
  Kafka2HBase/src/main/resources/Kafka2HBase.properties:1-17).
- U4 batch/stream unified execution (env.setRuntimeMode STREAMING/BATCH/
  AUTOMATIC — ExecutionModes/src/main/java/ExecutionMode.java:16-18): one
  PipelineSpec runs via spark.read or spark.readStream depending on
  `env.runtime.mode`.
- U5 checkpointing → `env.checkpoint.location` → checkpointLocation.

The transform stage is a named chain from TRANSFORMS (each a
DataFrame → DataFrame callable) so specs stay declarative; Catalyst sees the
whole composed plan and optimizes across stage boundaries.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from felixzh_flink_spark.operators import transforms as TR
from felixzh_flink_spark.sources import builders as SRC


def load_properties(path: str | Path) -> dict[str, str]:
    """ParameterTool.fromPropertiesFile analog: `k=v` lines, '#' comments."""
    props: dict[str, str] = {}
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        k, _, v = line.partition("=")
        props[k.strip()] = v.strip()
    return props


#: named transforms available to specs (extend freely)
TRANSFORMS: dict[str, Callable[[DataFrame], DataFrame]] = {
    "identity": TR.identity_process,
    "tokenize": lambda df: TR.tokenize(df, "value"),
    "word_count": lambda df: TR.tokenize(df, "value").groupBy("word").count(),
    "uppercase": lambda df: df.withColumn("value", F.upper("value")),
}


@dataclass
class PipelineSpec:
    """One reference-style job: properties in, running pipeline out."""
    props: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_properties(cls, path: str | Path) -> "PipelineSpec":
        return cls(load_properties(path))

    # ------------------------------------------------------------ source
    def _build_source(self, spark: SparkSession, streaming: bool) -> DataFrame:
        kind = self.props.get("source.type", "parquet")
        if kind == "kafka":
            return SRC.kafka_source(
                spark,
                self.props["source.kafka.bootstrap.servers"],
                self.props["source.kafka.topic"],
                group_id=self.props.get("source.kafka.group.id"),
                starting_offsets=self.props.get("source.kafka.starting.offsets", "latest"),
                streaming=streaming,
            )
        if kind == "socket":
            return SRC.socket_source(
                spark, self.props["source.socket.host"], int(self.props["source.socket.port"]))
        if kind == "rate":
            return SRC.rate_source(spark, int(self.props.get("source.record.per.sec", "1")))
        if kind == "parquet":
            path = self.props["source.path"]
            if streaming:
                schema = spark.read.parquet(path).schema
                return spark.readStream.schema(schema).parquet(path)
            return spark.read.parquet(path)
        raise ValueError(f"unknown source.type: {kind}")

    # ------------------------------------------------------------ transforms
    def _apply_transforms(self, df: DataFrame) -> DataFrame:
        chain = [t for t in self.props.get("transform.chain", "identity").split(",") if t]
        for name in chain:
            df = TRANSFORMS[name.strip()](df)
        return df

    # ------------------------------------------------------------ run
    def run_batch(self, spark: SparkSession) -> DataFrame:
        """BATCH runtime mode: returns the result DataFrame; caller writes."""
        return self._apply_transforms(self._build_source(spark, streaming=False))

    def run_stream(self, spark: SparkSession):
        """STREAMING runtime mode: starts the query against the configured sink."""
        df = self._apply_transforms(self._build_source(spark, streaming=True))
        sink = self.props.get("sink.type", "console")
        mode = self.props.get("sink.output.mode", "append")
        if sink == "console":
            writer = df.writeStream.format("console").outputMode(mode)
        elif sink == "memory":
            writer = (df.writeStream.format("memory")
                      .queryName(self.props.get("sink.memory.name", "out")).outputMode(mode))
        elif sink == "parquet":
            writer = (df.writeStream.format("parquet")
                      .option("path", self.props["sink.path"]).outputMode(mode))
        elif sink == "kafka":
            writer = (df.selectExpr("CAST(value AS STRING) AS value")
                      .writeStream.format("kafka")
                      .option("kafka.bootstrap.servers", self.props["sink.kafka.bootstrap.servers"])
                      .option("topic", self.props["sink.kafka.topic"]).outputMode(mode))
        else:
            raise ValueError(f"unknown sink.type: {sink}")
        ckpt = self.props.get("env.checkpoint.location")
        if ckpt:
            writer = writer.option("checkpointLocation", ckpt)
        # micro-batch cadence — maps the reference's smallest batching window
        # (50 ms ES bulk window, ContainerKill/src/main/java/Kafka2ES.java:34)
        # and checkpoint-interval knobs onto the processing-time trigger
        trig = self.props.get("env.trigger.processing.time")
        if trig:
            writer = writer.trigger(processingTime=trig)
        return writer.start()

    def run_supervised(self, spark: SparkSession, drain: bool = False):
        """U6 wired into the U8 spec: run the streaming pipeline under
        the `restart-strategy.*` properties — the reference configures
        its restart strategy in the same per-job properties as
        everything else (Json2Json.java:21 next to the job's Kafka
        props). Each (re)start rebuilds the query against the spec's
        checkpointLocation, so Structured Streaming resumes the failed
        micro-batch exactly. `drain=True` runs each attempt to
        processAllAvailable then stops (test / bounded-backlog mode);
        the default blocks on awaitTermination like a deployed job."""
        from felixzh_flink_spark.streaming.restart import (
            policy_from_properties,
            run_streaming_with_restart,
        )

        def attempt():
            q = self.run_stream(spark)
            try:
                if drain:
                    q.processAllAvailable()
                else:
                    q.awaitTermination()
            finally:
                if drain:
                    q.stop()
                    q.awaitTermination()
            if q.exception() is not None:
                raise q.exception()

        run_streaming_with_restart(attempt,
                                   policy_from_properties(self.props))

    def run(self, spark: SparkSession):
        """U4 AUTOMATIC mode: stream if the source is unbounded, else batch."""
        mode = self.props.get("env.runtime.mode", "AUTOMATIC").upper()
        if mode == "BATCH":
            return self.run_batch(spark)
        if mode == "STREAMING":
            return self.run_stream(spark)
        unbounded = self.props.get("source.type") in ("kafka", "socket", "rate")
        return self.run_stream(spark) if unbounded else self.run_batch(spark)
