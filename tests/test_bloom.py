"""Bloom-filter semi-join pruning (operators/bloom.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from felixzh_flink_spark.operators import bloom
from felixzh_flink_spark.operators.text import decontaminate


def test_sized_bits_pow2_and_floor():
    assert bloom.sized_bits(0) == 1024
    assert bloom.sized_bits(1) == 1024
    assert bloom.sized_bits(200) == 2048  # 2000 bits -> next pow2
    m = bloom.sized_bits(1_000_000)
    assert m >= 10_000_000 and (m & (m - 1)) == 0


def test_membership_no_false_negatives(spark):
    keys = spark.createDataFrame([Row(k=f"key-{i}") for i in range(300)])
    num_bits = bloom.sized_bits(300)
    words = bloom.bloom_build(keys, "k", num_bits)
    probed = bloom.with_bloom_hit(keys, "k", words, num_bits)
    assert probed.filter(~F.col("_bloom_hit")).count() == 0


def test_false_positive_rate_bounded(spark):
    keys = spark.createDataFrame([Row(k=f"key-{i}") for i in range(500)])
    num_bits = bloom.sized_bits(500)
    words = bloom.bloom_build(keys, "k", num_bits)
    other = spark.createDataFrame([Row(k=f"absent-{i}") for i in range(2000)])
    fp = bloom.with_bloom_hit(other, "k", words, num_bits) \
        .filter(F.col("_bloom_hit")).count()
    # 10 bits/key, k=7 -> ~1% expected; assert a loose 5% ceiling
    assert fp <= 100


def test_empty_benchmark_keeps_everything(spark):
    corpus = spark.createDataFrame([Row(doc_id=i, text=f"doc {i}") for i in range(20)])
    bench = spark.createDataFrame([], "doc_id long, text string")
    out = bloom.decontaminate_bloom(corpus, bench)
    assert out.count() == 20


def test_equals_exact_decontaminate(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    got = {r["doc_id"] for r in
           bloom.decontaminate_bloom(docs, bench).select("doc_id").collect()}
    want = {r["doc_id"] for r in
            decontaminate(docs, bench).select("doc_id").collect()}
    assert got == want
    # duplicated texts of benchmark docs are dropped too (fingerprint match,
    # not id match): nothing kept shares a fingerprint with the benchmark
    kept = bloom.decontaminate_bloom(docs, bench)
    overlap = (kept.select(F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias("f"))
               .join(bench.select(F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias("f")),
                     "f", "inner"))
    assert overlap.count() == 0


def test_signed_word_conversion():
    assert bloom._to_signed64((1 << 63)) == -(1 << 63)
    assert bloom._to_signed64((1 << 64) - 1) == -1
    assert bloom._to_signed64(5) == 5


def test_bloom_words_not_inlined_as_plan_literals(spark):
    """The bit set must travel as a broadcast relation, not a plan literal
    repeated per hash probe (expression-bloat guard — the IVF lesson)."""
    keys = spark.createDataFrame([Row(k=f"key-{i}") for i in range(10)])
    words = bloom.bloom_build(keys, "k", 1024)
    probed = bloom.with_bloom_hit(keys, "k", words, 1024, num_hashes=7)
    plan = probed._jdf.queryExecution().optimizedPlan().toString()
    big_word = next((str(w) for w in words if abs(w) > 1 << 32), None)
    if big_word is not None:
        assert plan.count(big_word) == 0  # lives in the broadcast, not the plan
    assert "Join" in plan  # one-row broadcast relation attached
