"""CEP-lite: ordered-pattern (subsequence) matching over keyed event rows.

Beyond-reference capability in the Flink MATCH_RECOGNIZE workload family
(the reference itself ships no CEP job): per key, how far does the event
sequence progress through an ordered list of stage conditions, where each
stage must match on an event strictly after the previous stage's match?

Spark-first design — no Python, no joins, ONE shuffle:

1. sort-aggregate each key's events into an array of structs
   (`array_sort(collect_list(struct(order_cols..., payload...)))` —
   struct ordering gives a total, engine-stable order);
2. run a generated `aggregate` fold over the array: the accumulator is
   the current stage index, and a CASE chain advances it when the next
   stage's condition matches the element. O(events) per key inside
   whole-stage codegen.

Greedy advancement (take the FIRST event matching each next stage) is
COMPLETE for plain subsequence existence: if any witness subsequence
exists, the greedy one exists too. (A `WITHIN t` whole-pattern time bound
is deliberately NOT offered here: greedy-first anchoring is not complete
under time bounds — a later stage-0 match could succeed where the first
fails — and a correct bounded matcher needs NFA-style multi-candidate
state, a different operator.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def sequence_stages(df: DataFrame, key_cols: list[str],
                    order_cols: list[str], conditions: list[str],
                    payload_cols: list[str] | None = None,
                    alias: str = "stage") -> DataFrame:
    """Per key: the number of pattern stages completed in order.

    `conditions` are SQL boolean expressions over a row alias ``e``
    (e.g. ``"e.event_type = 'view'"``); stage i+1 can only match on an
    element after the one that matched stage i. `order_cols` define the
    event order (prefix with a unique id for a total order);
    `payload_cols` are the columns the conditions read (defaults to every
    non-key column). Returns key_cols + `alias` (int in [0, len(conditions)]).
    """
    if not conditions:
        raise ValueError("conditions must be non-empty")
    payload = payload_cols
    if payload is None:
        payload = [c for c in df.columns if c not in key_cols]
    struct_cols = list(dict.fromkeys([*order_cols, *payload]))
    per_key = df.groupBy(*key_cols).agg(
        F.array_sort(F.collect_list(F.struct(*struct_cols))).alias("_evs"))
    branches = "\n".join(
        f"WHEN st = {i} AND ({cond}) THEN {i + 1}"
        for i, cond in enumerate(conditions))
    fold = F.expr(
        f"aggregate(_evs, 0, (st, e) -> CASE {branches} ELSE st END)")
    return per_key.select(*key_cols, fold.alias(alias))


def sequence_within(df: DataFrame, key_cols: list[str], ts_col: str,
                    conditions: list[str], within_ms: int,
                    payload_cols: list[str] | None = None,
                    alias: str = "matched") -> DataFrame:
    """Whole-pattern time bound — Flink CEP's `Pattern.within(t)`: does any
    ordered witness of the stage conditions complete with
    last_ts − first_ts ≤ within_ms?

    Greedy-from-first-anchor is NOT complete under a time bound (a later
    stage-0 event can succeed where the earliest fails), so this runs an
    ANCHOR SCAN: for every event matching stage 0, greedily advance the
    remaining stages among later events with ts ≤ anchor + within_ms —
    greedy is complete PER ANCHOR (earliest matches maximize remaining
    slack), so "∃ anchor that completes" is exact. O(anchors × events)
    per key in the worst case, still one shuffle and pure codegen
    expressions; keys are short event sequences in practice (bound them
    upstream if not). Returns key_cols + boolean `alias` for every key
    with ≥ 1 event.

    `conditions` reference the row as ``e`` exactly like
    `sequence_stages`; `ts_col` must be a timestamp column."""
    if not conditions:
        raise ValueError("conditions must be non-empty")
    payload = payload_cols
    if payload is None:
        payload = [c for c in df.columns if c not in key_cols]
    # MICROsecond event times — Spark timestamps are µs-precise, and the
    # relational witness definition (a.ts < b.ts) compares full precision;
    # ms truncation would collide distinct sub-ms events and stop chains
    # the oracle accepts
    prepared = df.withColumn(
        "_tms", F.unix_micros(F.col(ts_col).cast("timestamp")))
    within_us = int(within_ms) * 1000
    struct_cols = list(dict.fromkeys(["_tms", *payload]))
    per_key = prepared.groupBy(*key_cols).agg(
        F.array_sort(F.collect_list(F.struct(*struct_cols))).alias("_evs"))
    n = len(conditions)
    # anchor times via a lambda-bound filter — conditions reference the
    # bound variable `e` verbatim (no textual rewriting, which would
    # corrupt 'e.' inside string literals)
    anchors = f"transform(filter(_evs, e -> ({conditions[0]})), e -> e._tms)"
    if n == 1:
        matched = F.expr(f"exists(_evs, e -> ({conditions[0]}))")
        return per_key.select(*key_cols, matched.alias(alias))
    # accumulator (st, lt): stage reached + its event time; stages advance
    # on STRICTLY later event times (ties don't chain — matches the
    # relational a.ts < b.ts < c.ts witness definition). The fold captures
    # the outer lambda's anchor time t0 for the deadline.
    branches = "\n".join(
        f"WHEN acc.st = {j} AND e._tms > acc.lt AND "
        f"e._tms <= t0 + {within_us} AND ({cond}) "
        f"THEN named_struct('st', {j + 1}, 'lt', e._tms)"
        for j, cond in enumerate(conditions[1:], start=1))
    fold = (f"aggregate(_evs, named_struct('st', 1, 'lt', t0), "
            f"(acc, e) -> CASE {branches} ELSE acc END)")
    matched = F.expr(f"exists({anchors}, t0 -> {fold}.st = {n})")
    return per_key.select(*key_cols, matched.alias(alias))


def funnel_counts(df: DataFrame, key_cols: list[str], order_cols: list[str],
                  conditions: list[str],
                  payload_cols: list[str] | None = None) -> DataFrame:
    """One-row funnel summary over `sequence_stages`: total keys plus how
    many reached each stage (reached_1 ⊇ reached_2 ⊇ ...)."""
    staged = sequence_stages(df, key_cols, order_cols, conditions,
                             payload_cols)
    aggs = [F.count("*").alias("n_keys")]
    for i in range(1, len(conditions) + 1):
        aggs.append(F.sum((F.col("stage") >= i).cast("long"))
                    .alias(f"reached_{i}"))
    return staged.agg(*aggs)


def not_followed_by(df: DataFrame, key_cols: list[str], ts_col: str,
                    anchor: Column, negated: Column,
                    within: str) -> DataFrame:
    """CEP absence pattern — Flink's `Pattern.notFollowedBy(...).within()`:
    anchor events NOT followed by a negated-pattern event on the same key
    inside (anchor_ts, anchor_ts + within] — the alerting shape (cart
    abandonment, missing heartbeat ACK, unanswered escalation). Returns
    the anchor rows that matched the absence.

    Relational form: anchors LEFT ANTI JOIN negated events on the key
    with the interval bound folded into the join condition — Spark plans
    the band as a key-equi join with a range residual (one shuffle per
    side on the key, no per-key state machine, no Python). Streaming
    analog: the interval join + watermark closes the window before
    emitting, same as `streaming.joins.interval_left_join_streams` with
    a null-right filter."""
    a = df.filter(anchor).alias("a")
    n = (df.filter(negated)
         .select(*key_cols, F.col(ts_col).alias("_nts")).alias("n"))
    cond = None
    for k in key_cols:
        c = F.col(f"a.{k}") == F.col(f"n.{k}")
        cond = c if cond is None else (cond & c)
    cond = cond & (F.col("_nts") > F.col(f"a.{ts_col}")) & (
        F.col("_nts") <= F.col(f"a.{ts_col}") + F.expr(f"interval {within}"))
    return a.join(n, cond, "left_anti")


def times_consecutive(df: DataFrame, key_cols: list[str], ts_col: str,
                      pattern: Column, n: int,
                      within: str | None = None,
                      tiebreak: list[str] | None = None) -> DataFrame:
    """CEP count quantifier — Flink's
    `Pattern.times(n).consecutive()[.within(...)]`: emit a match for
    every position where the SAME key has n CONSECUTIVE pattern events
    (no non-matching event between them) and, with `within`, the n-run
    spans at most that duration (the "3 failed logins in 10 minutes"
    alerting shape). Returns one row per match END event:
    (key..., match_end_ts, match_start_ts, run_len).

    Relational form — gaps-and-islands instead of a per-key NFA: one
    keyed sort assigns row numbers over ALL events and over pattern
    events; their difference is constant exactly within a consecutive
    pattern run (the island id), so `lag(ts, n-1)` inside the island +
    the time bound finds every match. ONE hash exchange on the key; the
    three window functions all ride that same sort — no state machine,
    no Python, unbounded history not required (state per partition is
    the window frame).
    """
    k = [F.col(c) for c in key_cols]
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak or [])]
    w_all = Window.partitionBy(*k).orderBy(*order)
    flagged = df.withColumn("_is_p", pattern)
    ranked = flagged.withColumn("_rn", F.row_number().over(w_all))
    pat = ranked.filter(F.col("_is_p"))
    w_pat = Window.partitionBy(*k).orderBy(*order)
    islands = pat.withColumn(
        "_island", F.col("_rn") - F.row_number().over(w_pat))
    w_isl = Window.partitionBy(*k, F.col("_island")).orderBy(*order)
    runs = (islands
            .withColumn("_pos", F.row_number().over(w_isl))
            .withColumn("_start_ts", F.lag(ts_col, n - 1).over(w_isl)))
    match = runs.filter(F.col("_pos") >= n)
    if within is not None:
        match = match.filter(
            F.col(ts_col) <= F.col("_start_ts") + F.expr(f"interval {within}"))
    return match.select(
        *key_cols,
        F.col(ts_col).alias("match_end_ts"),
        F.col("_start_ts").alias("match_start_ts"),
        F.col("_pos").alias("run_len"))
