"""Keyed aggregation operators — SURVEY.md §2.3.

Reference parity:
- A1 keyBy            — DataSkew/src/main/java/SocketAppV1.java:24-28.
- A2 reduce (running sum) — SocketAppV1.java:29-36.
- A3 sum(field)       — ExecutionModes/src/main/java/ExecutionMode.java:27.
- A4 AggregateFunction partial+final — DataSkew/src/main/java/MyCountAggregate.java:7-45;
  Spark's HashAggregate(partial) → shuffle → HashAggregate(final) is the same
  combiner contract, automatic.
- A5 WeightedAvg UDAF — UserDefinedFunctions/.../MyAggregateFunctionsForWeightedAvg.java:6-42.
- A7 partitionCustom  — FlinkIdeaDemo/.../NCFlinkPartitionCustomIdea.java:24,31-43.
- A8 two-stage salted agg — DataSkew/src/main/java/SocketAppV2.java:23-67.

Scale notes: every groupBy here is one hash shuffle with map-side partial
aggregation; at 100 TB the partial agg collapses per-partition cardinality
before the exchange, so shuffle volume ∝ distinct keys, not rows. Skew is
handled by AQE by default; `salted_count` is the explicit recipe for the
extreme-streaming-skew case the reference targets.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_sum(col: Column | str, scale: int = 4, alias: str | None = None) -> Column:
    """Sum of a double expression made order-insensitive by casting each
    element to DECIMAL(30, scale) before summing, then back to double.

    Plain double summation is order-dependent (shuffle/partition order varies
    run to run and engine to engine); the decimal path is exact and therefore
    deterministic, which is what the DuckDB-oracle value-hash requires. Cost
    is one decimal conversion per row — still codegen'd JVM-side.

    Non-finite and overflowing inputs PROPAGATE as NaN instead of
    silently vanishing: the decimal cast turns NaN/±Inf/|x| ≥ 10^(30−s)
    into NULL, which F.sum would skip — returning a confidently wrong
    "exact" total from corrupt data. A second tiny aggregate flags any
    non-null input the cast lost and poisons the result, preserving
    plain double-sum's corruption signal.

    STRING CONTRACT (ADVICE r7): a `str` argument is SQL EXPRESSION
    TEXT, not a column name — it takes a single-`F.expr` fast path
    (the Column-API form costs ~15 py4j round-trips per call and
    dominated q1's plan-construction time; the expr form is one
    round-trip with identical semantics). Strings matching a plain
    identifier (`[A-Za-z_][A-Za-z0-9_]*`) are backtick-quoted first,
    so simple column names — including ones shadowing SQL keywords —
    resolve exactly as `F.col` did. Names that NEED quoting (dots
    meaning a literal dot, spaces, hyphens) must be passed pre-quoted
    (`` "`my col`" ``) or as `F.col("my col")`; unquoted they parse as
    expression syntax."""
    if isinstance(col, str):
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", col):
            col = f"`{col}`"
        e = f"({col})"
        out = F.expr(
            f"CASE WHEN max({e} IS NOT NULL AND "
            f"CAST({e} AS DECIMAL(30,{scale})) IS NULL) "
            f"THEN double('NaN') "
            f"ELSE CAST(SUM(CAST({e} AS DECIMAL(30,{scale}))) AS DOUBLE) "
            f"END")
        return out.alias(alias) if alias else out
    c = col
    d = c.cast(f"decimal(30,{scale})")
    lost = F.max(F.when(c.isNotNull() & d.isNull(), True).otherwise(False))
    out = F.when(lost, F.lit(float("nan"))) \
        .otherwise(F.sum(d).cast("double"))
    return out.alias(alias) if alias else out


def keyed_count(df: DataFrame, *keys: str, alias: str = "cnt") -> DataFrame:
    """A1+A4: keyBy → distributive count (MyCountAggregate.java semantics —
    count per key with partial/final merge)."""
    return df.groupBy(*keys).agg(F.count("*").alias(alias))


def keyed_sum(df: DataFrame, key: str, value: str, alias: str = "total") -> DataFrame:
    """A2/A3: keyBy(key).sum(value) (ExecutionMode.java:26-27, running sum per
    key). Batch semantics = final value of the running sum."""
    return df.groupBy(key).agg(exact_sum(value, alias=alias))


def weighted_avg(df: DataFrame, key: str, value: str, weight: str, alias: str = "wavg") -> DataFrame:
    """A5/A6: the reference's WeightedAvg UDAF
    (MyAggregateFunctionsForWeightedAvg.java:6-42 — accumulate sum(v*w) and
    sum(w), result sum/count) as pure expressions: no UDAF object needed, and
    Spark still does partial aggregation on both sums.

    The reference's `retract()` hook exists for changelog inputs; our CDC
    library recomputes aggregates from materialized upsert state instead
    (functions/changelog.py), which is the Spark-idiomatic equivalent.
    """
    num = F.sum((F.col(value) * F.col(weight)).cast("decimal(30,6)")).cast("double")
    den = F.sum(F.col(weight).cast("decimal(30,6)")).cast("double")
    return df.groupBy(key).agg((num / den).alias(alias))


def weighted_avg_pandas(df: DataFrame, key: str, value: str, weight: str,
                        alias: str = "wavg") -> DataFrame:
    """A5 as a REAL Python UDAF — Arrow-batched pandas grouped-agg, the
    mechanism for aggregation logic expressions can't cover (the expression
    form `weighted_avg` stays the hot path; pandas grouped-aggs have no
    partial aggregation, so all rows of a group cross the shuffle).

    Uses math.fsum (exact float summation) so the result is deterministic
    under any row order — the same property the expression form gets from
    decimal casting.
    """
    import math

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _wavg(v: pd.Series, w: pd.Series) -> float:
        num = math.fsum((xv * xw) for xv, xw in zip(v, w))
        den = math.fsum(w)
        return num / den if den else float("nan")

    return df.groupBy(key).agg(_wavg(F.col(value), F.col(weight)).alias(alias))


def repartition_by_key(df: DataFrame, num_partitions: int, *keys: str) -> DataFrame:
    """A7 partitionCustom analog: hash-partition rows by key into N partitions
    (NCFlinkPartitionCustomIdea.java uses hashCode()%n — Spark's HashPartitioning
    is the same contract; arbitrary placement is intentionally not exposed)."""
    return df.repartition(num_partitions, *[F.col(k) for k in keys])


def salted_skew_join(left: DataFrame, right: DataFrame, key: str,
                     salt_buckets: int = 16) -> DataFrame:
    """A8 extended to JOIN skew, the companion of the reference's salted-agg
    recipe (DataSkew/src/main/java/SocketAppV2.java:23-67): when one join key
    dominates, salt the big (left) side with rand%N and replicate the small
    (right) side N× with every salt value, then equi-join on (key, salt) —
    the hot key spreads over N reducers instead of one.

    Results are identical to `left.join(right, key)` (inner). Prefer AQE's
    skew-join splitting (on by default in session.py) — this is the explicit
    recipe for when runtime stats are unavailable (e.g. streaming joins).
    """
    l = left.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))
    return l.join(r, [key, "_salt"]).drop("_salt")


def salted_two_phase_count(df: DataFrame, key: str, salt_buckets: int = 50,
                           alias: str = "cnt") -> DataFrame:
    """A8: explicit two-stage skew-busting count, the SocketAppV2.java:23-67
    recipe — salt the key with a random bucket, partial-count per (key, salt),
    strip the salt, final-sum.

    On batch Spark this is usually unnecessary (AQE + partial aggregation),
    but it is the documented recipe for extreme skew; results are identical to
    a plain keyed count.
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias(alias))


def cascade_time_rollup(df: DataFrame, ts_col: str, key_col: str,
                        value_col: str,
                        levels: tuple[str, ...] = ("minute", "hour", "day")) -> DataFrame:
    """Multi-resolution time rollup (the hypertable / continuous-aggregate
    pattern): aggregate raw rows ONCE at the finest resolution, then derive
    every coarser level by re-aggregating the previous level's partials —
    count-of-counts, sum-of-sums (decimal-exact), min-of-mins, max-of-maxs.

    At 100 TB the raw table is scanned exactly once; each coarser level
    reads the (tiny) finer aggregate, which is how a real rollup cascade
    stays O(raw + Σ aggregate sizes) instead of levels × raw-scan. All four
    partials re-aggregate losslessly, so every level equals a direct
    aggregate of the raw rows (the oracle checks each level against the raw
    table).

    Every level is materialized via eager `localCheckpoint` — that IS the
    continuous-aggregate materialization, and it is what makes the union's
    branches reuse the finer level instead of re-deriving it from raw
    (Spark's exchange-reuse does NOT fire across the separately-built
    union branches; without the materialization the plan re-scans raw once
    per level). localCheckpoint over `.cache()` is deliberate storage
    hygiene: RDD-level storage is reclaimed by the ContextCleaner once the
    returned frame becomes unreachable, whereas CacheManager entries pin
    plans until an explicit unpersist/clearCache — a bench or driver loop
    over many inputs would grow storage monotonically (the ADVICE-r2
    finding this replaces).

    Returns (level, bucket_start, <key_col>, cnt, total, vmin, vmax).
    """
    fine, *coarser = levels
    v = F.col(value_col).cast("double")
    cur = (
        df.groupBy(F.date_trunc(fine, F.col(ts_col)).alias("bucket_start"),
                   F.col(key_col))
        .agg(F.count("*").alias("cnt"),
             F.sum(v.cast("decimal(30,4)")).alias("_total"),
             F.min(v).alias("vmin"), F.max(v).alias("vmax"))
        .localCheckpoint(eager=True)
    )
    out = cur.select(F.lit(fine).alias("level"), "bucket_start", key_col,
                     "cnt", F.col("_total").cast("double").alias("total"),
                     "vmin", "vmax")
    for level in coarser:
        cur = (
            cur.groupBy(F.date_trunc(level, F.col("bucket_start"))
                        .alias("bucket_start"), F.col(key_col))
            .agg(F.sum("cnt").alias("cnt"), F.sum("_total").alias("_total"),
                 F.min("vmin").alias("vmin"), F.max("vmax").alias("vmax"))
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(
            cur.select(F.lit(level).alias("level"), "bucket_start", key_col,
                       "cnt", F.col("_total").cast("double").alias("total"),
                       "vmin", "vmax"))
    return out


def integer_zscore_anomalies(df: DataFrame, key_col: str, ts_col: str,
                             lookback: int = 24, z: int = 3,
                             min_points: int = 12,
                             bucket: str = "hour") -> DataFrame:
    """Trailing-window anomaly detection on event counts, with the z-score
    test rewritten into INTEGER arithmetic so the verdict is exact and
    engine-portable: floating stddev differs across engines (Welford vs
    sum-of-squares accumulation), so a float `|x−μ| > z·σ` can flip at the
    boundary — instead the flag is

        (n·x − s1)² · (n−1)  >  z² · n · (n·s2 − s1²)

    (⟺ (x−μ)² > z²·σ̂² over the trailing window, cleared of divisions),
    where n/s1/s2 are the count / sum / sum-of-squares of the previous
    `lookback` buckets — all BIGINT. Needs per-bucket counts < ~2^20 at
    lookback 24 to stay in int64; at higher volumes pre-scale counts.

    One shuffle for the bucket counts; the trailing stats ride a single
    window sort per key (`ROWS BETWEEN lookback PRECEDING AND 1
    PRECEDING`). Buckets with fewer than `min_points` trailing points are
    never flagged (cold start).

    The timeline is DENSIFIED per key (every bucket between the key's
    first and last event, zero-filled) before the window: raw counts have
    no rows for empty buckets, so a ROWS frame over them would silently
    stitch pre-gap hours onto post-gap hours — "trailing 24 buckets"
    spanning days — and the most dramatic anomaly of all, a count
    collapsing to ZERO, could never be flagged because its bucket never
    existed. Densification is one tiny per-key span aggregate + a
    sequence explode (rows ∝ key-lifetime buckets, the same cardinality a
    time-series store would hold)."""
    bucket_ts = F.date_trunc(bucket, F.col(ts_col).cast("timestamp"))
    counts = (df.groupBy(F.col(key_col).alias("k"),
                         bucket_ts.alias("bucket_ts"))
              .agg(F.count("*").alias("cnt")))
    spans = counts.groupBy("k").agg(F.min("bucket_ts").alias("_lo"),
                                    F.max("bucket_ts").alias("_hi"))
    dense = spans.select(
        "k",
        F.explode(F.sequence(
            F.col("_lo"), F.col("_hi"),
            F.expr(f"INTERVAL 1 {bucket.upper()}"))).alias("bucket_ts"))
    counts = (dense.join(counts, ["k", "bucket_ts"], "left")
              .withColumn("cnt", F.coalesce(F.col("cnt"),
                                            F.lit(0).cast("bigint"))))
    w = (Window.partitionBy("k").orderBy("bucket_ts")
         .rowsBetween(-lookback, -1))
    x, s1 = F.col("cnt"), F.col("s1")
    n, s2 = F.col("n"), F.col("s2")
    lhs = (n * x - s1) * (n * x - s1) * (n - F.lit(1))
    rhs = F.lit(z * z) * n * (n * s2 - s1 * s1)
    return (
        counts
        .withColumn("n", F.count("cnt").over(w))
        .withColumn("s1", F.sum("cnt").over(w))
        .withColumn("s2", F.sum(F.col("cnt") * F.col("cnt")).over(w))
        .select(
            F.col("k").alias(key_col), "bucket_ts", "cnt",
            ((n >= min_points) & (lhs > rhs)).alias("is_anomaly"))
    )


def global_ntile(df: DataFrame, order_cols: tuple[str, ...], n_bins: int,
                 alias: str = "bin") -> DataFrame:
    """Exact `ntile(n_bins) OVER (ORDER BY order_cols)` WITHOUT the
    single-task global sort — the scale-safe form shared by the quartile
    query and curriculum binning.

    Recipe: range-repartition on the order key (global order ACROSS
    partitions, parallel sort within), derive each partition's cumulative
    row offset from a ≤`parts`-row count aggregate, add the
    intra-partition row_number for an exact global rank, then compute the
    ntile bucket arithmetically (first n MOD bins buckets get one extra
    row — ANSI semantics). The range Exchange feeds both branches once
    (ReusedExchange); the only SinglePartition exchange carries the tiny
    per-partition count table, bounded by cluster parallelism, never by
    data. Order must be TOTAL (include a tie-breaker id in `order_cols`)
    or bin assignment is engine-dependent for tied rows.

    Returns df + `alias` (int). Requires n_bins ≥ 1; rows < n_bins is
    fine (the size-0 small-bucket branch is unreachable then, so the
    `base` division never sees zero).
    """
    parts = df.sparkSession.sparkContext.defaultParallelism
    ranged = (df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
              .withColumn("_pid", F.spark_partition_id()))
    per = ranged.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    offsets = per.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(wall).alias("_n"),
    )
    wpid = Window.partitionBy("_pid").orderBy(*order_cols)
    ranked = (ranged.withColumn("_rn", F.row_number().over(wpid))
              .join(F.broadcast(offsets), "_pid")
              .withColumn("_rank", F.col("_rn") + F.col("_off")))
    base = (F.col("_n") / n_bins).cast("bigint")
    rem = F.col("_n") % n_bins
    big = rem * (base + 1)  # rows covered by the size-(base+1) buckets
    bucket = (
        F.when(F.col("_rank") <= big, F.ceil(F.col("_rank") / (base + 1)))
        .otherwise(rem + F.ceil((F.col("_rank") - big) / base))
    )
    return (ranked.withColumn(alias, bucket.cast("int"))
            .drop("_pid", "_rn", "_off", "_n", "_rank"))


def time_spine_fill(series: DataFrame, ts_col: str, key_col: str,
                    value_col: str, step: str = "1 hour") -> DataFrame:
    """Gap-fill a regular time series with LOCF (last observation carried
    forward) — the hypertable `time_bucket_gapfill + locf` shape: emit one
    row per (key, bucket) over the DENSE time spine spanning the series'
    global [min, max], carrying the previous bucket's value into missing
    buckets. Returns (key, ts, value, filled) where `filled` marks spine
    rows that had no source observation (join miss — a REAL observation
    whose value is NULL is not "filled"; leading gaps before a key's
    first observation keep value NULL — there is nothing to carry).

    Plan shape: the bounds are a 1-row aggregate broadcast into a
    per-key `sequence()` explode (spine size = keys × buckets, generated
    scan-locally — never a driver loop); one shuffle joins observations
    onto the spine, and the LOCF window rides the SAME (key) partitioning
    — with AQE the join output is already hash-distributed by the join
    key, so the window adds a sort, not a full exchange. State per window
    partition is one value (the running last) — O(1), any series length.
    """
    bounds = series.agg(F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi"))
    keys = series.select(F.col(key_col)).distinct()
    spine = (
        keys.crossJoin(F.broadcast(bounds))
        .select(key_col, F.explode(
            F.expr(f"sequence(_lo, _hi, interval {step})")).alias(ts_col))
    )
    joined = spine.join(series.withColumn("_obs", F.lit(True)),
                        [key_col, ts_col], "left")
    w = (Window.partitionBy(key_col).orderBy(ts_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return joined.select(
        key_col, ts_col,
        F.last(value_col, ignorenulls=True).over(w).alias(value_col),
        F.col("_obs").isNull().alias("filled"),
    )


def time_spine_interpolate(series: DataFrame, ts_col: str, key_col: str,
                           value_col: str, step: str = "1 hour") -> DataFrame:
    """Gap-fill with LINEAR interpolation — the `interpolate()` sibling of
    `time_spine_fill`'s locf(): missing buckets get the straight line
    between the key's previous and next observations,
    v_prev + (v_next − v_prev) · (t − t_prev)/(t_next − t_prev).
    Buckets outside the key's first/last observation stay NULL (no pair
    to interpolate — the hypertable convention). Returns
    (key, ts, value, filled).

    Same spine/join shape as `time_spine_fill` (broadcast bounds,
    scan-local `sequence()` explode, one join); the interpolation needs
    BOTH window directions, still O(1) state each: running last non-null
    (value, ts) looking back, running first non-null looking forward,
    over the same (key) partitioning. Time deltas use microsecond epochs
    (`unix_micros`) so sub-second steps interpolate correctly instead of
    collapsing to t1==t0; `filled` marks join misses, not NULL values."""
    bounds = series.agg(F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi"))
    keys = series.select(F.col(key_col)).distinct()
    spine = (
        keys.crossJoin(F.broadcast(bounds))
        .select(key_col, F.explode(
            F.expr(f"sequence(_lo, _hi, interval {step})")).alias(ts_col))
    )
    joined = spine.join(series.withColumn("_obs", F.lit(True)),
                        [key_col, ts_col], "left")
    wb = (Window.partitionBy(key_col).orderBy(ts_col)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy(key_col).orderBy(ts_col)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    obs_ts = F.when(F.col(value_col).isNotNull(), F.col(ts_col))
    pv = F.last(value_col, ignorenulls=True).over(wb)
    pt = F.last(obs_ts, ignorenulls=True).over(wb)
    nv = F.first(value_col, ignorenulls=True).over(wf)
    nt = F.first(obs_ts, ignorenulls=True).over(wf)
    t, t0, t1 = [F.unix_micros(c.cast("timestamp")).cast("double")
                 for c in (F.col(ts_col), pt, nt)]
    interp = F.when(
        F.col(value_col).isNotNull(), F.col(value_col).cast("double")
    ).otherwise(
        F.when(pv.isNotNull() & nv.isNotNull(),
               pv.cast("double") + (nv.cast("double") - pv.cast("double"))
               * (t - t0) / (t1 - t0)))
    return joined.select(
        key_col, ts_col,
        interp.alias(value_col),
        F.col("_obs").isNull().alias("filled"),
    )


def rolling_time_agg(df: DataFrame, key_col: str, ts_col: str,
                     value_col: str, width: str = "1 hour",
                     decimal_exact: bool = True) -> DataFrame:
    """Rolling time-window aggregate per key — `SUM/COUNT OVER (ORDER BY
    ts RANGE BETWEEN INTERVAL width PRECEDING AND CURRENT ROW)`: every
    event row annotated with the trailing-window count and sum (the
    rate-limiter / rolling-KPI shape; unlike `sliding_window_agg`'s
    fixed grid, the window ends AT each event). One keyed sort-shuffle;
    the RANGE frame is O(window contents) state riding it.

    `decimal_exact` (default) runs the sum in DECIMAL(30,6): RANGE
    frames accumulate retractably, and retractable double add/remove
    order differs across engines — decimal is the hashable form.

    Interval frame bounds aren't expressible through the classic
    `Window.rangeBetween` Python API (int bounds only), so the frame is
    an `F.expr` window spec — same Catalyst plan either way."""
    v_sql = (f"CAST(`{value_col}` AS DECIMAL(30,6))" if decimal_exact
             else f"CAST(`{value_col}` AS DOUBLE)")
    over = (f"OVER (PARTITION BY `{key_col}` ORDER BY `{ts_col}` "
            f"RANGE BETWEEN INTERVAL {width} PRECEDING AND CURRENT ROW)")
    return (df
            .withColumn("n_win", F.expr(f"count(*) {over}"))
            .withColumn("sum_win",
                        F.expr(f"sum({v_sql}) {over}").cast("double")))


def ewma_by_key(df: DataFrame, key_col: str, order_cols: "list[str]",
                value_col: str, alpha: float = 0.5,
                out: str = "ewma") -> DataFrame:
    """Exponentially weighted moving average per key with an EXACT,
    order-pinned fold: each key's series is sorted by `order_cols`
    (make them a total order — e.g. (ts, event_id) — or the result is
    nondeterministic), seeded with the first value, then folded
    left-to-right as acc·(1−α) + x·α inside a single JVM `aggregate`
    expression. Because the fold order and the arithmetic are fixed,
    a SQL engine folding the same sorted list (DuckDB `list_reduce`)
    reproduces the DOUBLES bit-for-bit — the same discipline as the
    engine's exact-sum work. Null values are dropped before the fold
    (a null would poison the accumulator).

    Scale shape: one keyed shuffle (the groupBy); each key's series is
    collected into ONE row, so per-key cardinality must be bounded
    (user sessions, device days). For unbounded series use the
    streaming stateful fold instead — this is the batch/backfill
    form. Flink parity: the keyed `reduce` with a decaying
    accumulator that the reference's aggregation examples hand-roll."""
    w = df.filter(F.col(value_col).isNotNull())
    seq = F.sort_array(F.collect_list(F.struct(
        *[F.col(c) for c in order_cols], F.col(value_col).alias("__v"))))
    g = w.groupBy(key_col).agg(seq.alias("__s"),
                               F.count("*").alias("n_events"))
    vals = F.transform(F.col("__s"), lambda s: s["__v"])
    folded = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(1.0 - alpha) + x * F.lit(alpha))
    return g.select(key_col, F.col("n_events").cast("bigint"),
                    folded.alias(out))
