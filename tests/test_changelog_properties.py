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


def _brute_temporal(facts, hist):
    """facts: [(ts,)] , hist: [(state, frm, to)] — pick the covering
    version per fact ([from, to), None = open)."""
    out = {}
    for fid, fts in facts:
        match = None
        for state, frm, to in hist:
            if fts >= frm and (to is None or fts < to):
                match = state
        out[fid] = match
    return out


@given(changes=st.lists(
    st.tuples(st.integers(min_value=0, max_value=20),
              st.sampled_from(["a", "b", "c"])),
    min_size=1, max_size=8),
    fact_ts=st.lists(st.integers(min_value=-2, max_value=25),
                     min_size=1, max_size=8))
@SLOW
def test_temporal_join_matches_brute_force_over_scd2(spark, changes,
                                                     fact_ts):
    """Law: temporal_join over scd2_history == a per-fact linear scan of
    the version intervals, for ANY change stream (duplicate timestamps
    tie-broken by event id) and ANY fact times incl. pre-history."""
    import datetime as dt

    from felixzh_flink_spark.functions.changelog import (
        scd2_history, temporal_join)
    base = dt.datetime(2024, 1, 1)
    t = lambda h: base + dt.timedelta(hours=h)  # noqa: E731
    ch = spark.createDataFrame(
        [(1, t(h), i, s) for i, (h, s) in enumerate(changes)],
        "user_id long, ts timestamp, event_id long, state string")
    hist_df = scd2_history(ch, ["user_id"], "ts", ["state"],
                           tiebreak=["event_id"])
    hist = [(r["state"], r["valid_from"], r["valid_to"])
            for r in hist_df.collect()]
    facts = [(i, t(h)) for i, h in enumerate(fact_ts)]
    fdf = spark.createDataFrame(
        [(1, i, ts) for i, ts in facts],
        "user_id long, fact_id long, ts timestamp")
    got = {r["fact_id"]: r["state"]
           for r in temporal_join(
               fdf, hist_df.select("user_id", "state",
                                   "valid_from", "valid_to"),
               ["user_id"], "ts").collect()}
    assert got == _brute_temporal(facts, hist)
