"""Streaming CEP-lite funnel (streaming/cep.py): stage state persists
across micro-batches, within-batch ordering is event-time, and the
progression agrees with the batch fold."""

import datetime as dt

from pyspark.sql import functions as F, types as T

from felixzh_flink_spark.sources.builders import file_stream_source
from felixzh_flink_spark.streaming.cep import funnel_stream

SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
])

BASE = dt.datetime(2024, 1, 1)

CONDS = ["event_type = 'view'", "event_type = 'click'",
         "event_type = 'purchase'"]


def _write(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)


def _start(spark, src, name):
    stream = file_stream_source(spark, src, SCHEMA, max_files_per_trigger=1)
    out = funnel_stream(stream, ["user_id"], "ts", CONDS,
                        watermark_delay="5 seconds")
    return (out.writeStream.format("memory").queryName(name)
            .outputMode("append").start())


def test_funnel_state_continues_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1: user 1 views and clicks (out of order within the batch);
    # user 2 clicks only (no view -> stage stays 0)
    _write(spark, src, [
        (BASE + dt.timedelta(seconds=2), 1, "click"),
        (BASE + dt.timedelta(seconds=1), 1, "view"),
        (BASE + dt.timedelta(seconds=1), 2, "click"),
    ])
    q = _start(spark, src, "funnel_out")
    q.processAllAvailable()
    # batch 2: user 1 purchases (stage 3); user 2 views then clicks
    _write(spark, src, [
        (BASE + dt.timedelta(seconds=10), 1, "purchase"),
        (BASE + dt.timedelta(seconds=10), 2, "view"),
        (BASE + dt.timedelta(seconds=11), 2, "click"),
    ])
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM funnel_out").collect()
    stages = {}
    for r in rows:
        stages.setdefault(r["user_id"], []).append(
            (r["stage"], r["stage_ts"]))
    # user 1: view(click sorted after) -> stages 1,2 in batch 1, 3 in batch 2
    assert sorted(s for s, _ in stages[1]) == [1, 2, 3]
    # the purchase advancement carries the batch-2 timestamp
    assert (3, BASE + dt.timedelta(seconds=10)) in stages[1]
    # user 2: batch-1 click can't start the funnel; view+click later -> 1,2
    assert sorted(s for s, _ in stages[2]) == [1, 2]


def test_funnel_matches_batch_fold(spark, tmp_path):
    """Streaming progression over one batch == batch sequence_stages."""
    from felixzh_flink_spark.operators.cep import sequence_stages
    rows = []
    seqs = {
        10: ["view", "click", "purchase"],
        11: ["view", "purchase", "click"],   # purchase before click: stage 2
        12: ["click", "view", "click"],      # late start: stage 2
        13: ["error"],
    }
    for uid, events in seqs.items():
        for i, ev in enumerate(events):
            rows.append((BASE + dt.timedelta(seconds=i), uid, ev))
    src = str(tmp_path / "src")
    _write(spark, src, rows)
    q = _start(spark, src, "funnel_batch_eq")
    q.processAllAvailable()
    q.stop()
    got = {}
    for r in spark.sql("SELECT * FROM funnel_batch_eq").collect():
        got[r["user_id"]] = max(got.get(r["user_id"], 0), r["stage"])
    batch_df = spark.createDataFrame(rows, SCHEMA)
    want = {r["user_id"]: r["stage"] for r in sequence_stages(
        batch_df, ["user_id"], ["ts"],
        ["e.event_type = 'view'", "e.event_type = 'click'",
         "e.event_type = 'purchase'"]).collect()}
    for uid, st in want.items():
        assert got.get(uid, 0) == st


def test_not_followed_by_absence_window(spark):
    import datetime as dt
    from felixzh_flink_spark.operators.cep import not_followed_by
    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)  # noqa: E731
    df = spark.createDataFrame([
        (1, 1, "view", t(0)), (1, 2, "purchase", t(30)),   # followed: not emitted
        (1, 3, "view", t(40)),                              # no purchase after
        (2, 4, "view", t(0)), (2, 5, "purchase", t(90)),    # outside 1h window
        (3, 6, "view", t(10)), (3, 7, "view", t(10)),       # other user's purchase
        (4, 8, "purchase", t(20)),                          # doesn't cover user 3
    ], "user_id long, event_id long, event_type string, ts timestamp")
    got = sorted(r["event_id"] for r in not_followed_by(
        df, ["user_id"], "ts",
        anchor=F.col("event_type") == "view",
        negated=F.col("event_type") == "purchase",
        within="1 hour").collect())
    assert got == [3, 4, 6, 7]


def test_times_consecutive_quantifier(spark):
    """times(3).consecutive().within(): only unbroken pattern runs match,
    a non-pattern event resets the run, the time bound prunes slow runs,
    and every qualifying suffix emits one match at its end event."""
    import datetime as dt

    from pyspark.sql import functions as F

    from felixzh_flink_spark.operators.cep import times_consecutive
    t0 = dt.datetime(2024, 1, 1)
    m = lambda mins: t0 + dt.timedelta(minutes=mins)  # noqa: E731
    rows = [
        # u1: E E E consecutive and fast -> match at minute 2
        (1, 1, "error", m(0)), (1, 2, "error", m(1)), (1, 3, "error", m(2)),
        # u1 continues: 4th error -> second match (suffix of the run)
        (1, 4, "error", m(3)),
        # u2: run broken by a view -> no match
        (2, 5, "error", m(0)), (2, 6, "error", m(1)), (2, 7, "view", m(2)),
        (2, 8, "error", m(3)),
        # u3: three consecutive errors but spread past the bound
        (3, 9, "error", m(0)), (3, 10, "error", m(30)),
        (3, 11, "error", m(90)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp")
    got = sorted(
        (r["user_id"], r["match_end_ts"].minute, r["run_len"])
        for r in times_consecutive(
            df, ["user_id"], "ts", F.col("event_type") == "error", 3,
            within="1 hour", tiebreak=["event_id"]).collect())
    assert got == [(1, 2, 3), (1, 3, 4)]
    # without the time bound u3's slow run matches too
    unbounded = {(r["user_id"], r["run_len"])
                 for r in times_consecutive(
                     df, ["user_id"], "ts",
                     F.col("event_type") == "error", 3,
                     tiebreak=["event_id"]).collect()}
    assert unbounded == {(1, 3), (1, 4), (3, 3)}
