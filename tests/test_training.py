"""Distributed classifier training (operators/training.py): parity with
a pure-Python full-batch GD reference (identical IEEE arithmetic), plus
the semantic checks the lr_quality_weights oracle cannot express —
learning actually happens, and the learned separator tracks the label
rule's feature.
"""

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from felixzh_flink_spark.operators.training import (
    ieee_quant,
    lr_predictions,
    lr_train_gd,
)

SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])


def _lr_reference(rows, iterations, lr=2.0, quantize=12):
    """Independent single-machine GD with the same algebraic-sigmoid
    link. The engine sums DECIMAL(38,18)-cast addends (each addend
    rounded half-up to 1e-18 on its shortest-repr decimal, then summed
    exactly, then cast back to double); the reference mirrors that with
    exact integer arithmetic so any summation-order or cast drift in
    the engine would surface."""
    from decimal import Decimal, ROUND_HALF_UP

    d = len(rows[0][0])
    w = [0.0] * (1 + d)
    scale = 10 ** 18
    n = len(rows)
    for _ in range(iterations):
        sums = [0] * (1 + d)
        for x, y in rows:
            z = w[0]
            for j in range(d):
                z = z + w[j + 1] * x[j]
            p = 0.5 + z / (2.0 * (1.0 + abs(z)))
            err = p - y
            addends = [err] + [x[j] * err for j in range(d)]
            for j, a in enumerate(addends):
                q = (Decimal(repr(a)) * scale).quantize(
                    Decimal(1), rounding=ROUND_HALF_UP)
                sums[j] += int(q)
        g = [float(Decimal(s) / Decimal(scale)) for s in sums]
        w = [ieee_quant(wj - lr * (gj / float(n)), quantize)
             for wj, gj in zip(w, g)]
    return w


rows_st = st.lists(
    st.tuples(
        st.tuples(st.floats(0.0, 1.0, allow_nan=False, width=16),
                  st.floats(0.0, 1.0, allow_nan=False, width=16)),
        st.sampled_from([0.0, 1.0])),
    min_size=2, max_size=25)


@SLOW
@given(rows=rows_st)
def test_trainer_matches_independent_reference(spark, rows):
    """Engine weights == reference weights for arbitrary small feature
    tables (2 features + bias, 4 rounds): catches gradient-term,
    bias, learning-rate, quantization, and round-count drift. width=16
    floats keep the feature decimals short so the reference's
    decimal-cast emulation is exact."""
    rows = [(tuple(float(v) for v in x), y) for x, y in rows]
    df = spark.createDataFrame(
        [(x[0], x[1], y) for x, y in rows],
        "x1 double, x2 double, y double")
    got = lr_train_gd(df.localCheckpoint(eager=True), len(rows),
                      features=("x1", "x2"), iterations=4)
    assert got == _lr_reference(rows, iterations=4)


def test_training_learns_a_threshold_rule(spark):
    """On a clean threshold-labeled set the trained model must beat the
    majority class — the 'did it actually learn' check the hash oracle
    does not express — and put positive weight on the signal feature."""
    rows = [(i / 100.0, ((i * 37) % 100) / 100.0,
             1.0 if i >= 50 else 0.0) for i in range(100)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double") \
        .localCheckpoint(eager=True)
    w = lr_train_gd(df, 100, features=("x1", "x2"),
                    iterations=30, lr=4.0)
    pred = lr_predictions(df, w, features=("x1", "x2"))
    acc = pred.filter(F.col("pred") == F.col("y")).count() / 100.0
    assert acc >= 0.8, (acc, w)
    assert w[1] > 0  # signal feature got positive weight
    assert abs(w[1]) > abs(w[2])  # and dominates the noise feature


def test_quantization_is_pure_ieee_and_handles_negatives():
    assert ieee_quant(0.123456789012345678, 12) == \
        math.floor(0.123456789012345678 * 1e12 + 0.5) / 1e12
    assert ieee_quant(-1.23456789e-3, 12) == \
        math.floor(-1.23456789e-3 * 1e12 + 0.5) / 1e12
    assert ieee_quant(0.0, 12) == 0.0
