"""Chunking / redaction / decontamination — training-data pipeline text ops."""

from pyspark.sql import functions as F

from felixzh_flink_spark.operators.text import (
    chunk_documents,
    decontaminate,
    redact_text,
)


def test_chunking_overlap_and_final_partial(spark):
    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(chunk_documents(df, chunk_tokens=4, overlap_tokens=1).collect(),
                  key=lambda r: r["chunk_idx"])
    # stride 3: starts at 0,3,6 — the chunk at 6 reaches the last token, so
    # coverage is complete with no redundant tail window
    assert [r["chunk_text"] for r in rows] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9"]
    assert [r["n_chunk_tokens"] for r in rows] == [4, 4, 4]
    # consecutive chunks share exactly `overlap` tokens
    assert rows[0]["chunk_text"].split()[-1] == rows[1]["chunk_text"].split()[0]


def test_chunking_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "   ")], "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=64, overlap_tokens=8).collect()
    assert len(rows) == 1  # blank doc dropped
    assert rows[0]["chunk_text"] == "a b" and rows[0]["n_chunk_tokens"] == 2


def test_redaction_scrubs_emails_and_urls(spark):
    df = spark.createDataFrame(
        [("mail me at a.b@example.com or see https://x.io/page?q=1 now",)],
        "text string")
    out = df.select(redact_text("text").alias("t")).head()["t"]
    assert out == "mail me at [REDACTED] or see [REDACTED] now"


def test_decontaminate_drops_benchmark_matches(spark):
    corpus = spark.createDataFrame(
        [(1, "keep me"), (2, "TEST  question"), (3, "also kept")],
        "doc_id long, text string")
    bench = spark.createDataFrame([(9, "test question")], "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in decontaminate(corpus, bench).collect())
    assert kept == [1, 3]  # normalization catches case/whitespace variants
