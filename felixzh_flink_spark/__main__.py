"""``python -m felixzh_flink_spark <job.properties>`` — run one job.

The reference ships each capability as a runnable main() driven by a
properties file (ParameterTool.fromPropertiesFile — Kafka2ES.java:31);
this is the engine's equivalent single entrypoint: a PipelineSpec
(plans/pipeline.py) built from the same `source.* / transform.* / sink.* /
env.*` key families, executed batch or streaming per `env.runtime.mode`
(U4), on a session with the engine defaults (AQE, UTC, shuffle
partitions).

Batch mode writes the result to the configured sink and exits; streaming
mode starts the query and blocks until termination (or
`env.timeout.ms`, useful for smoke runs).
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame


def _write_batch(df: DataFrame, props: dict[str, str]) -> None:
    sink = props.get("sink.type", "console")
    if sink == "console":
        df.show(int(props.get("sink.num.rows", "20")), truncate=False)
    elif sink == "parquet":
        df.write.mode(props.get("sink.save.mode", "overwrite")) \
            .parquet(props["sink.path"])
    elif sink == "memory":
        df.createOrReplaceTempView(props.get("sink.memory.name", "out"))
    else:
        raise ValueError(f"batch mode cannot write sink.type: {sink}")


def main(argv: list[str]) -> int:
    if len(argv) != 1:
        print("usage: python -m felixzh_flink_spark <job.properties>",
              file=sys.stderr)
        return 2
    from felixzh_flink_spark.plans.pipeline import PipelineSpec
    from felixzh_flink_spark.session import get_spark

    spec = PipelineSpec.from_properties(argv[0])
    spark = get_spark(spec.props.get("env.job.name", "felixzh-flink-spark"))
    out = spec.run(spark)
    if isinstance(out, DataFrame):        # batch: a result to write
        _write_batch(out, spec.props)
        return 0
    timeout_ms = spec.props.get("env.timeout.ms")
    if timeout_ms:
        out.awaitTermination(int(timeout_ms) / 1000.0)
        out.stop()
    else:                                  # run until externally stopped
        out.awaitTermination()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
