"""Tests: hashed-feature linear-model inference (operators/inference.py)."""

from pyspark.sql import functions as F

from felixzh_flink_spark.operators import inference as INF


def test_make_weights_deterministic_and_bounded():
    w = INF.make_weights(256)
    assert w == INF.make_weights(256)
    assert all(-500 <= x <= 500 for x in w)
    assert any(x < 0 for x in w) and any(x > 0 for x in w)


def test_hashed_linear_score_matches_python_fold(spark):
    w = INF.make_weights(64)
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha"), (3, "zzz")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in INF.hashed_linear_score(df, w).collect()}

    import hashlib

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 64

    def score(text):
        return sum(w[bucket(t)] for t in text.split(" "))

    for doc_id, text in [(1, "alpha beta gamma"), (2, "alpha alpha"), (3, "zzz")]:
        assert out[doc_id]["score"] == score(text)
        assert out[doc_id]["n_tokens"] == len(text.split(" "))
        assert out[doc_id]["keep"] == (score(text) > 0)


def test_hashed_linear_score_whitespace_normalized(spark):
    w = INF.make_weights(64)
    df = spark.createDataFrame(
        [(1, "a  b"), (2, " a b ")], "doc_id long, text string")
    rows = INF.hashed_linear_score(df, w).collect()
    scores = {r["doc_id"]: r["score"] for r in rows}
    assert scores[1] == scores[2]


def test_classifier_keep_rates_groups_by_source(spark):
    w = INF.make_weights(64)
    df = spark.createDataFrame(
        [(1, "alpha beta", "s1"), (2, "alpha beta", "s1"), (3, "gamma", "s2")],
        "doc_id long, text string, source string")
    out = {r["source"]: r for r in INF.classifier_keep_rates(df, w).collect()}
    assert out["s1"]["n_docs"] == 2 and out["s2"]["n_docs"] == 1
    assert out["s1"]["score_sum"] % 2 == 0  # two identical docs
    assert 0 <= out["s1"]["n_keep"] <= 2


def test_score_plan_is_jvm_only(spark):
    w = INF.make_weights(256)
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = INF.hashed_linear_score(df, w)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # pure expressions: codegen, no UDF stage


def test_empty_and_null_text_never_pass(spark):
    w = INF.make_weights(64)
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "real words")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in INF.hashed_linear_score(df, w).collect()}
    for blank in (1, 2, 3):
        assert out[blank]["n_tokens"] == 0
        assert out[blank]["score"] == 0        # not NULL, not W[h('')]
        assert out[blank]["keep"] is False
    assert out[4]["n_tokens"] == 2
