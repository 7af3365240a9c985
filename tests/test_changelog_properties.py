"""Property-based tests (hypothesis) for the changelog/CDC library.

Laws, not examples: row-count conservation of the canal decode, op-structure
of the debezium decode, and encode→decode round-tripping. Each example runs a
small Spark job, so example counts are deliberately low.
"""

import json

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import types as T

from felixzh_flink_spark.functions.changelog import (
    decode_canal_json,
    decode_debezium_json,
    encode_debezium_json,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
])

row_st = st.fixed_dictionaries({
    "id": st.integers(min_value=0, max_value=10**9),
    "name": st.text(alphabet="abcdefg ", max_size=8),
})

envelope_st = st.fixed_dictionaries({
    "type": st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
    "data": st.lists(row_st, min_size=1, max_size=3),
    "es": st.integers(min_value=0, max_value=2**40),
    "isDdl": st.booleans(),
})

SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])


def expected_rows(env: dict) -> int:
    if env["isDdl"]:
        return 0
    per = {"INSERT": 1, "DELETE": 1, "UPDATE": 2}[env["type"]]
    return per * len(env["data"])


@given(envs=st.lists(envelope_st, min_size=1, max_size=5))
@SLOW
def test_canal_decode_row_count_conservation(spark, envs):
    for e in envs:
        if e["type"] == "UPDATE":
            e["old"] = [{"name": "old"} for _ in e["data"]]
    payload = [(json.dumps(e),) for e in envs] + [("not json at all",), ("42",)]
    df = spark.createDataFrame(payload, "value string")
    out = decode_canal_json(df, "value", SCHEMA)
    assert out.count() == sum(expected_rows(e) for e in envs)


@given(rows=st.lists(row_st, min_size=1, max_size=6))
@SLOW
def test_debezium_encode_decode_roundtrip(spark, rows):
    df = spark.createDataFrame(
        [(r["id"], r["name"]) for r in rows], "id long, name string")
    encoded = encode_debezium_json(df, ["id", "name"], op="c")
    decoded = decode_debezium_json(encoded, "value", SCHEMA)
    got = sorted((r["id"], r["name"], r["op"]) for r in decoded.collect())
    want = sorted((r["id"], r["name"], "+I") for r in rows)
    assert got == want
