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


def test_word_agg_build_bit_identical_to_local_path(spark):
    keys = spark.createDataFrame([Row(k=f"key-{i}") for i in range(400)])
    num_bits = bloom.sized_bits(400)
    assert bloom.bloom_build_words(keys, "k", num_bits) == \
        bloom.bloom_build(keys, "k", num_bits)


def test_large_filter_dispatches_to_word_agg(spark, monkeypatch):
    called = {}
    real = bloom.bloom_build_words

    def spy(*a, **kw):
        called["yes"] = True
        return real(*a, **kw)

    monkeypatch.setattr(bloom, "bloom_build_words", spy)
    keys = spark.createDataFrame([Row(k="a"), Row(k="b")])
    words = bloom.bloom_build(keys, "k", bloom.WORD_AGG_THRESHOLD_BITS)
    assert called.get("yes") and len(words) == \
        bloom.WORD_AGG_THRESHOLD_BITS // 64


def test_distinct_path_stays_a_second_implementation_above_threshold(spark):
    """`bloom_build_distinct` is directly callable ABOVE the word-agg
    dispatch threshold and bit-matches `bloom_build_words` there — the
    two-implementation comparison the `bloom_word_agg_checks` assertion
    oracle relies on (ADVICE r7: routed through the `bloom_build`
    dispatcher it compared the word-agg path against itself)."""
    num_bits = bloom.WORD_AGG_THRESHOLD_BITS
    keys = spark.createDataFrame([Row(k=f"dd-{i}") for i in range(50)])
    assert bloom.bloom_build_distinct(keys, "k", num_bits) == \
        bloom.bloom_build_words(keys, "k", num_bits)


def test_word_agg_build_at_1e8_bits_bounded_driver(spark):
    """10⁸-bit filter: the collect is bounded by n_keys × num_hashes
    non-empty WORDS (≤ 7000 rows of 16 bytes here), never by num_bits;
    membership over the inserted keys has zero false negatives."""
    num_bits = 1 << 27  # 1.34e8, pow-2 as sized_bits would produce
    keys = spark.createDataFrame([Row(k=f"big-{i}") for i in range(1000)])
    words = bloom.bloom_build_words(keys, "k", num_bits)
    assert len(words) == num_bits // 64
    set_words = sum(1 for w in words if w)
    assert 0 < set_words <= 1000 * 7
    probed = bloom.with_bloom_hit(keys, "k", words, num_bits)
    assert probed.filter(~F.col("_bloom_hit")).count() == 0
    # a disjoint probe set at 10 bits/key-equivalent sparsity: the FP
    # rate at this emptiness is ~(7000/2^27)^7 ≈ 0 — expect no hits
    other = spark.createDataFrame([Row(k=f"other-{i}") for i in range(500)])
    fp = bloom.with_bloom_hit(other, "k", words, num_bits) \
        .filter(F.col("_bloom_hit")).count()
    assert fp == 0
