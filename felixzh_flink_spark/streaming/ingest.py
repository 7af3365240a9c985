"""Streaming document ingest: the corpus-cleaning pipeline as a stream.

The U4 unified-mode showpiece for the LLM-data surface: the same quality
gate, classifier filter, and exact-dedup semantics as the batch corpus
pipeline (operators/text.py::corpus_pipeline, operators/inference.py),
running continuously on a document stream. Stateless stages (fingerprint,
token stats, model score) are identical Column expressions in both modes —
Structured Streaming runs them per micro-batch with zero changes; the only
stateful stage is the watermark-bounded dedup, whose state is evictable
past the horizon (same guarantee as dedup.dedup_exact_stream).

Scale shape: the gates are scan-local projections (no shuffle); dedup
shuffles each micro-batch once on the fingerprint. Rejections are routed
to a side output with a reason column — the stream analog of the CDC
quarantine channel — so a corpus build can audit WHAT the gates dropped
without re-running them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from felixzh_flink_spark.operators.inference import linear_score_col
from felixzh_flink_spark.operators.text import fingerprint_md5, token_count


def document_ingest_split(
    stream: DataFrame,
    weights: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    min_tokens: int = 3,
    threshold: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """(accepted, rejected): split an incoming document stream.

    accepted — passes the length gate (≥ min_tokens) AND the classifier
    (score > threshold), and is the FIRST occurrence of its content
    fingerprint within the watermark horizon. Duplicate arrivals are
    dropped silently by state (they are not re-scored and not routed to
    `rejected` — dedup state decides after the gates, so the rejected
    stream stays a pure stateless projection that can run as its own
    independent query over the same source).

    rejected — failed a stateless gate, with `reason` ∈
    {'null_text', 'too_short', 'low_quality'} (first failing gate wins).
    Every input row lands on exactly one side: the gate predicate is
    null-safe (NULL text is an explicit rejection, not a three-valued
    NULL that would filter out of BOTH streams and vanish unaudited).

    Both returns are unstarted DataFrames over the SAME source; start one
    sink per side. On a BATCH DataFrame the stateless gates are the
    identical expressions and dedup switches to the deterministic batch
    form (first occurrence by (ts, id) per fingerprint —
    dropDuplicatesWithinWatermark is streaming-only).
    """
    enriched = (
        fingerprint_md5(stream, text_col)
        .withColumn("_n_tokens", token_count(text_col))
        .withColumn("_score", linear_score_col(weights, text_col))
    )
    non_null = F.col(text_col).isNotNull()
    # False & NULL = False, so `ok` is never NULL: null-text rows take the
    # rejected side instead of disappearing from both
    ok = non_null & (F.col("_n_tokens") >= min_tokens) \
        & (F.col("_score") > threshold)
    passed = enriched.filter(ok)
    if stream.isStreaming:
        deduped = (
            passed.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["fingerprint"])
        )
    else:
        from pyspark.sql import Window
        wnd = Window.partitionBy("fingerprint").orderBy(ts_col, id_col)
        deduped = (
            passed.withColumn("_rn", F.row_number().over(wnd))
            .filter(F.col("_rn") == 1).drop("_rn")
        )
    accepted = deduped.select(
        ts_col, id_col, text_col, "fingerprint",
        F.col("_n_tokens").alias("n_tokens"),
        F.col("_score").alias("score"))
    rejected = (
        enriched.filter(~ok)
        .select(ts_col, id_col, "fingerprint",
                F.when(~non_null, F.lit("null_text"))
                 .when(F.col("_n_tokens") < min_tokens, F.lit("too_short"))
                 .otherwise(F.lit("low_quality")).alias("reason"))
    )
    return accepted, rejected
