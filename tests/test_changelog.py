"""Golden-fixture tests for the changelog/CDC library.

Fixtures are the reference's own comment-embedded sample payloads
(SURVEY.md §5): the Canal envelope at canal_json/Kafka2Print.java:63-103 and
the captured changelog outputs (-U/+U pair at :126-127; Debezium +I/-D at
debezium_json/MySqlCDC2Print.java:94-101).
"""

import json

from pyspark.sql import types as T

from felixzh_flink_spark.sources.builders import file_stream_source
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


def test_streaming_cdc_upsert_end_to_end(spark, tmp_path):
    """S9-analog end-to-end: canal envelopes stream in over two micro-batches;
    foreachBatch merges each into a parquet state table. Final state must
    equal the batch upsert over the full changelog — including a cross-batch
    UPDATE and DELETE, and a late (older-ts) update that must NOT clobber."""
    import json as _json

    from felixzh_flink_spark.functions.changelog import changelog_upsert_sink

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ])

    def env(typ, data, old=None, ts=0):
        return _json.dumps({"data": data, "old": old, "type": typ,
                            "pkNames": ["id"], "es": ts, "isDdl": False})

    batch1 = [
        env("INSERT", [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}], ts=10),
        env("INSERT", [{"id": 3, "name": "c"}], ts=10),
    ]
    batch2 = [
        env("UPDATE", [{"id": 1, "name": "a2"}], old=[{"name": "a"}], ts=20),
        env("DELETE", [{"id": 2, "name": "b"}], ts=20),
        env("UPDATE", [{"id": 3, "name": "stale"}], old=[{"name": "?"}], ts=5),  # late, loses
    ]
    spark.createDataFrame([(v,) for v in batch1], "value string") \
        .coalesce(1).write.mode("append").parquet(src)

    stream = file_stream_source(
        spark, src, T.StructType([T.StructField("value", T.StringType())]),
        max_files_per_trigger=1)
    decoded = decode_canal_json(stream, "value", schema)
    q = (decoded.writeStream.foreachBatch(changelog_upsert_sink(state, ["id"]))
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    q.processAllAvailable()
    spark.createDataFrame([(v,) for v in batch2], "value string") \
        .coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = {r["id"]: r["name"]
           for r in spark.read.parquet(f"{state}/current").collect()}
    assert got == {1: "a2", 3: "c"}  # 1 updated, 2 deleted, 3 kept (late update lost)


def test_changelog_sum_equals_sum_over_materialized_state(spark):
    """Retract-aware sum (A5 retract analog) must equal aggregating the
    upserted current state when the changelog is consistent (every -U/-D
    retracts a previously-added value)."""
    from felixzh_flink_spark.functions.changelog import changelog_sum

    ch = spark.createDataFrame(
        [
            ("+I", 1, 100, 10.0),   # k=100 inserted
            ("+I", 1, 200, 20.0),   # k=200 inserted
            ("-U", 2, 100, 10.0),   # k=100 updated 10 → 15
            ("+U", 2, 100, 15.0),
            ("-D", 3, 200, 20.0),   # k=200 deleted
        ],
        "op string, ts_ms long, k long, v double")
    retract = changelog_sum(ch.withColumnRenamed("k", "g"), [], "v", "total").head()["total"]
    state = upsert_latest(ch, ["k"])
    materialized = state.agg({"v": "sum"}).head()[0]
    assert retract == materialized == 15.0
