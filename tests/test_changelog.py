"""Golden-fixture tests for the changelog/CDC library.

Fixtures are the reference's own comment-embedded sample payloads
(SURVEY.md §5): the Canal envelope at canal_json/Kafka2Print.java:63-103 and
the captured changelog outputs (-U/+U pair at :126-127; Debezium +I/-D at
debezium_json/MySqlCDC2Print.java:94-101).
"""

import json

from pyspark.sql import types as T

from felixzh_flink_spark.functions.changelog import (
    decode_canal_json,
    decode_debezium_json,
    encode_debezium_json,
    upsert_latest,
)

PRODUCTS_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField("weight", T.DecimalType(10, 2)),
])

# The reference's canonical Canal UPDATE envelope (Kafka2Print.java:63-103
# shape): data = new rows, old = changed fields only, type = UPDATE.
CANAL_UPDATE = {
    "data": [{"id": 111, "name": "scooter", "description": "Big 2-wheel scooter", "weight": 5.18}],
    "old": [{"weight": 5.15}],
    "type": "UPDATE",
    "database": "inventory",
    "table": "products",
    "pkNames": ["id"],
    "es": 1589373560000,
    "ts": 1589373560798,
    "isDdl": False,
}

CANAL_INSERT = {
    "data": [{"id": 112, "name": "wheel", "description": "wheel", "weight": 1.0}],
    "old": None, "type": "INSERT", "database": "inventory", "table": "products",
    "pkNames": ["id"], "es": 1589373560001, "ts": 1589373560999, "isDdl": False,
}

CANAL_DELETE = {
    "data": [{"id": 111, "name": "scooter", "description": "Big 2-wheel scooter", "weight": 5.18}],
    "old": None, "type": "DELETE", "database": "inventory", "table": "products",
    "pkNames": ["id"], "es": 1589373560002, "ts": 1589373561000, "isDdl": False,
}


def _df(spark, payloads):
    return spark.createDataFrame([(json.dumps(p),) for p in payloads], "value string")


def test_canal_update_expands_to_minus_u_plus_u(spark):
    # Expected rendering from the reference's captured output
    # (canal_json/Kafka2Print.java:126-127): -U(111,...,5.15) then +U(111,...,5.18)
    out = decode_canal_json(_df(spark, [CANAL_UPDATE]), "value", PRODUCTS_SCHEMA)
    rows = sorted(out.collect(), key=lambda r: r["op"])
    assert [r["op"] for r in rows] == ["+U", "-U"]
    plus_u = next(r for r in rows if r["op"] == "+U")
    minus_u = next(r for r in rows if r["op"] == "-U")
    assert float(minus_u["weight"]) == 5.15  # old value, merged fields
    assert minus_u["name"] == "scooter"      # unchanged field from data[]
    assert float(plus_u["weight"]) == 5.18
    assert minus_u["ts_ms"] == 1589373560000


def test_canal_insert_delete(spark):
    out = decode_canal_json(_df(spark, [CANAL_INSERT, CANAL_DELETE]), "value", PRODUCTS_SCHEMA)
    got = {(r["op"], r["id"]) for r in out.collect()}
    assert got == {("+I", 112), ("-D", 111)}


def test_canal_ddl_and_garbage_dropped(spark):
    ddl = dict(CANAL_INSERT, isDdl=True)
    out = decode_canal_json(_df(spark, [ddl, {"not": "canal"}]), "value", PRODUCTS_SCHEMA)
    # DDL rows dropped; non-envelope JSON parses to all-null data → no rows
    assert out.count() == 0


DBZ_ROW_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("description", T.StringType()),
])


def test_debezium_lifecycle_matches_reference_output(spark):
    # MySqlCDC2Print.java:94-101: +I(1,zhangsan,aaa) ... -D(1,zhangsan,aaa)
    payloads = [
        {"before": None, "after": {"id": 1, "name": "zhangsan", "description": "aaa"},
         "op": "c", "ts_ms": 1},
        {"before": {"id": 1, "name": "zhangsan", "description": "aaa"},
         "after": {"id": 1, "name": "zhangsan", "description": "bbb"}, "op": "u", "ts_ms": 2},
        {"before": {"id": 1, "name": "zhangsan", "description": "bbb"}, "after": None,
         "op": "d", "ts_ms": 3},
    ]
    out = decode_debezium_json(_df(spark, payloads), "value", DBZ_ROW_SCHEMA)
    ops = [(r["op"], r["description"]) for r in sorted(out.collect(), key=lambda r: (r["ts_ms"], r["op"]))]
    assert ops == [("+I", "aaa"), ("+U", "bbb"), ("-U", "aaa"), ("-D", "bbb")]


def test_debezium_snapshot_read_is_insert(spark):
    payloads = [{"before": None, "after": {"id": 7, "name": "n", "description": "d"},
                 "op": "r", "ts_ms": 10}]
    out = decode_debezium_json(_df(spark, payloads), "value", DBZ_ROW_SCHEMA)
    assert [(r["op"], r["id"]) for r in out.collect()] == [("+I", 7)]


def test_upsert_latest_newest_wins_and_deletes_drop(spark):
    changelog = spark.createDataFrame(
        [("+I", 1, 1, "a"), ("+U", 2, 1, "b"),     # update wins
         ("+I", 1, 2, "x"), ("-D", 2, 2, "x"),     # delete drops
         ("+I", 5, 3, "only")],
        "op string, ts_ms long, id long, val string")
    out = {r["id"]: r["val"] for r in upsert_latest(changelog, ["id"]).collect()}
    assert out == {1: "b", 3: "only"}


def test_upsert_latest_update_pair_same_ts(spark):
    # -U/+U at the same ts: +U must win (op_rank ordering)
    changelog = spark.createDataFrame(
        [("+I", 1, 1, "a"), ("-U", 2, 1, "a"), ("+U", 2, 1, "b")],
        "op string, ts_ms long, id long, val string")
    out = {r["id"]: r["val"] for r in upsert_latest(changelog, ["id"]).collect()}
    assert out == {1: "b"}


def test_encode_debezium_json_roundtrip(spark):
    df = spark.createDataFrame([(1, "n", "d")], "id long, name string, description string")
    encoded = encode_debezium_json(df, ["id", "name", "description"])
    payload = json.loads(encoded.head()["value"])
    assert payload["op"] == "c" and payload["after"]["name"] == "n"
