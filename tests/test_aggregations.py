from pyspark.sql import functions as F

from felixzh_flink_spark.operators.aggregations import (
    exact_sum,
    keyed_count,
    keyed_sum,
    salted_two_phase_count,
    weighted_avg,
)


def test_keyed_count_and_sum(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 4.0)], "k string, v double")
    counts = {r["k"]: r["cnt"] for r in keyed_count(df, "k").collect()}
    assert counts == {"a": 2, "b": 1}
    sums = {r["k"]: r["total"] for r in keyed_sum(df, "k", "v").collect()}
    assert sums == {"a": 3.0, "b": 4.0}


def test_weighted_avg_matches_reference_udaf_semantics(spark):
    # WeightedAvgAccumulator semantics: sum(v*w)/sum(w)
    df = spark.createDataFrame(
        [("k", 10.0, 2.0), ("k", 20.0, 6.0)], "k string, v double, w double")
    got = weighted_avg(df, "k", "v", "w").head()["wavg"]
    assert abs(got - (10 * 2 + 20 * 6) / 8.0) < 1e-12


def test_salted_two_phase_equals_plain_count(spark, sf_dir):
    from felixzh_flink_spark.catalog import load_table
    events = load_table(spark, sf_dir, "events").select("event_type")
    plain = {r["event_type"]: r["count"] for r in events.groupBy("event_type").count().collect()}
    salted = {r["event_type"]: r["cnt"]
              for r in salted_two_phase_count(events, "event_type").collect()}
    assert salted == plain


def test_exact_sum_is_order_insensitive(spark):
    # doubles whose naive sum differs by order; decimal path must not
    vals = [(1e15,), (1.0,), (-1e15,), (1.0,)]
    df = spark.createDataFrame(vals, "v double")
    assert df.agg(exact_sum("v", 4, "s")).head()["s"] == 2.0
    assert df.repartition(4).agg(exact_sum("v", 4, "s")).head()["s"] == 2.0


def test_exact_sum_string_contract(spark):
    """str = SQL expression text; plain identifiers are backtick-quoted
    so names shadowing SQL keywords resolve as columns (ADVICE r7)."""
    df = spark.createDataFrame([(1.5, 2.0), (2.5, 3.0)], "order double, v double")
    # keyword-named column works via the identifier fast path
    assert df.agg(exact_sum("order", 4, "s")).head()["s"] == 4.0
    # non-identifier strings are expressions, not quoted names
    assert df.agg(exact_sum("v * 2", 4, "s")).head()["s"] == 10.0
    # Column arguments unchanged
    from pyspark.sql import functions as F
    assert df.agg(exact_sum(F.col("order") + F.col("v"), 4, "s")).head()["s"] == 9.0


def test_weighted_avg_pandas_matches_expression_form(spark, sf_dir):
    from felixzh_flink_spark.operators.aggregations import (
        weighted_avg,
        weighted_avg_pandas,
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    expr_form = {r["l_returnflag"]: r["wavg"]
                 for r in weighted_avg(l, "l_returnflag", "l_extendedprice",
                                       "l_quantity").collect()}
    udaf_form = {r["l_returnflag"]: r["wavg"]
                 for r in weighted_avg_pandas(l, "l_returnflag", "l_extendedprice",
                                              "l_quantity").collect()}
    assert set(expr_form) == set(udaf_form)
    for k in expr_form:
        assert abs(expr_form[k] - udaf_form[k]) / abs(expr_form[k]) < 1e-9


def test_integer_zscore_anomalies_flags_spike_only(spark):
    """A flat series with one 10x spike: the spike hour (and only it) is
    flagged; the first `min_points` hours never flag (cold start); a
    boundary case exactly at z sigma does NOT flag (strict inequality)."""
    from felixzh_flink_spark.operators.aggregations import (
        integer_zscore_anomalies)

    rows = []
    for h in range(40):
        n = 1000 if h == 30 else (100 + (h % 3))   # mild jitter + one spike
        for i in range(n):
            rows.append((f"2024-01-01 {h % 24:02d}:00:00" if h < 24
                         else f"2024-01-02 {h - 24:02d}:00:00", "click"))
    df = spark.createDataFrame(rows, "ts string, event_type string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = integer_zscore_anomalies(df, "event_type", "ts",
                                   lookback=24, z=3, min_points=12)
    flagged = sorted(r["bucket_ts"].hour + (24 if r["bucket_ts"].day == 2 else 0)
                     for r in out.filter("is_anomaly").collect())
    assert flagged == [30]
    # cold start: nothing in the first 12 hours can flag
    assert out.filter("is_anomaly").filter(
        "bucket_ts < '2024-01-01 12:00:00'").count() == 0


def test_exact_sum_propagates_nonfinite(spark):
    """NaN/Inf inputs must poison the total (plain double-sum semantics),
    not silently vanish through the decimal cast's NULL."""
    from felixzh_flink_spark.operators.aggregations import exact_sum
    import math

    bad = spark.createDataFrame(
        [(1.0,), (float("nan"),), (2.0,)], "v double")
    assert math.isnan(bad.agg(exact_sum("v")).head()[0])
    inf = spark.createDataFrame([(1.0,), (float("inf"),)], "v double")
    assert math.isnan(inf.agg(exact_sum("v")).head()[0])
    ok = spark.createDataFrame([(1.5,), (None,), (2.5,)], "v double")
    assert ok.agg(exact_sum("v")).head()[0] == 4.0   # plain NULLs still skip


def test_anomaly_detector_flags_count_collapse_across_gap(spark):
    """Densified timeline: a key that goes completely dark after steady
    traffic gets zero-filled buckets, and the collapse itself is flagged —
    a ROWS frame over sparse counts could never see it."""
    from felixzh_flink_spark.operators.aggregations import (
        integer_zscore_anomalies)

    rows = []
    for h in range(20):                    # steady 100/hour for 20 hours
        rows += [(f"2024-01-01 {h:02d}:00:00", "click")] * 100
    rows += [("2024-01-02 06:00:00", "click")] * 100   # resumes much later
    df = spark.createDataFrame(rows, "ts string, event_type string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = integer_zscore_anomalies(df, "event_type", "ts",
                                   lookback=12, z=3, min_points=6)
    # the first dark hour (cnt 0 vs trailing ~100s) must flag
    dark = out.filter("cnt = 0 AND is_anomaly").count()
    assert dark >= 1
    # and the timeline is dense: every hour between first and last exists
    assert out.count() == 31               # 2024-01-01 00:00 .. 01-02 06:00


def test_time_spine_fill_locf(spark):
    from datetime import datetime
    from felixzh_flink_spark.operators.aggregations import time_spine_fill
    h = lambda x: datetime(2024, 1, 1, x)  # noqa: E731
    series = spark.createDataFrame([
        ("a", h(0), 1.0), ("a", h(3), 4.0),           # gaps at 1, 2
        ("b", h(2), 9.0),                              # leading gap 0, 1
    ], "k string, ts timestamp, v double")
    out = {(r["k"], r["ts"].hour): (r["v"], r["filled"])
           for r in time_spine_fill(series, "ts", "k", "v").collect()}
    assert len(out) == 8  # 2 keys x hours 0..3
    assert out[("a", 0)] == (1.0, False)
    assert out[("a", 1)] == (1.0, True)    # carried forward
    assert out[("a", 2)] == (1.0, True)
    assert out[("a", 3)] == (4.0, False)
    assert out[("b", 0)] == (None, True)   # leading gap: nothing to carry
    assert out[("b", 1)] == (None, True)
    assert out[("b", 2)] == (9.0, False)
    assert out[("b", 3)] == (9.0, True)


def test_time_spine_interpolate_linear_and_null_edges(spark):
    from datetime import datetime
    from felixzh_flink_spark.operators.aggregations import (
        time_spine_interpolate)
    h = lambda x: datetime(2024, 1, 1, x)  # noqa: E731
    series = spark.createDataFrame([
        ("a", h(0), 1.0), ("a", h(3), 7.0),   # gaps at 1, 2 -> 3.0, 5.0
        ("b", h(1), 4.0),                      # edges at 0 and 2, 3 -> NULL
    ], "k string, ts timestamp, v double")
    out = {(r["k"], r["ts"].hour): (r["v"], r["filled"])
           for r in time_spine_interpolate(series, "ts", "k", "v").collect()}
    assert out[("a", 0)] == (1.0, False)
    assert out[("a", 1)] == (3.0, True)
    assert out[("a", 2)] == (5.0, True)
    assert out[("a", 3)] == (7.0, False)
    assert out[("b", 0)] == (None, True)   # before first obs: no pair
    assert out[("b", 1)] == (4.0, False)
    assert out[("b", 2)] == (None, True)   # after last obs: no pair
    assert out[("b", 3)] == (None, True)


def test_time_spine_subsecond_step_and_null_observation(spark):
    from datetime import datetime
    from felixzh_flink_spark.operators.aggregations import (
        time_spine_fill, time_spine_interpolate)
    ms = lambda m: (datetime(2024, 1, 1, 0, 0, 1)     # noqa: E731
                    if m == 1000 else datetime(2024, 1, 1, 0, 0, 0, m * 1000))
    series = spark.createDataFrame([
        ("a", ms(0), 1.0), ("a", ms(500), None), ("a", ms(1000), 5.0),
    ], "k string, ts timestamp, v double")
    # sub-second step: unix_micros keeps t1 > t0 so the line is real,
    # not a divide-by-zero NULL
    us = lambda t: t.second * 1_000_000 + t.microsecond  # noqa: E731
    interp = {us(r["ts"]): (r["v"], r["filled"])
              for r in time_spine_interpolate(
                  series, "ts", "k", "v", step="250 milliseconds").collect()}
    assert interp[0] == (1.0, False)
    assert interp[250000] == (2.0, True)       # interpolated 1→5 at t=.25
    # the NULL observation at .5 is a REAL row: filled must be False,
    # value interpolates through it
    assert interp[500000] == (3.0, False)
    assert interp[750000] == (4.0, True)
    locf = {us(r["ts"]): (r["v"], r["filled"])
            for r in time_spine_fill(
                series, "ts", "k", "v", step="500 milliseconds").collect()}
    assert locf[500000] == (1.0, False)        # real NULL obs: carried, NOT filled


def test_rolling_time_agg_trailing_window(spark):
    from datetime import datetime, timedelta

    from felixzh_flink_spark.operators.aggregations import rolling_time_agg
    base = datetime(2024, 1, 1)
    rows = [(1, base + timedelta(minutes=m), 1.0) for m in (0, 30, 50, 120)]
    df = spark.createDataFrame(rows, "u long, ts timestamp, v double")
    got = {r["ts"].minute + 60 * r["ts"].hour: (r["n_win"], r["sum_win"])
           for r in rolling_time_agg(df, "u", "ts", "v", "1 hour").collect()}
    # trailing [t-60min, t]: m=50 sees 0,30,50; m=120 sees only itself
    # (the hour-old event at m=60 would count — RANGE bound is inclusive)
    assert got == {0: (1, 1.0), 30: (2, 2.0), 50: (3, 3.0), 120: (1, 1.0)}


def test_ewma_by_key_order_and_nulls(spark):
    """EWMA fold: seeded with the first value in (order_cols) order,
    acc·(1−α) + x·α left-to-right, nulls dropped before the fold."""
    from felixzh_flink_spark.operators.aggregations import ewma_by_key

    df = spark.createDataFrame(
        [(1, 3, 30.0), (1, 1, 10.0), (1, 2, 20.0),   # out of order
         (1, 4, None),                                # dropped
         (2, 1, 5.0)],
        "user_id long, event_id long, value double")
    got = {r.user_id: (r.n_events, r.ewma)
           for r in ewma_by_key(df, "user_id", ["event_id"],
                                "value").collect()}
    assert got[1] == (3, 22.5)          # 10 -> 15 -> 22.5
    assert got[2] == (1, 5.0)           # singleton = seed
    # alpha != 0.5 still folds in the pinned order
    got3 = {r.user_id: r.ewma
            for r in ewma_by_key(df, "user_id", ["event_id"], "value",
                                 alpha=0.25).collect()}
    exp = 10.0
    for v in (20.0, 30.0):
        exp = exp * 0.75 + v * 0.25
    assert got3[1] == exp
