"""Distributed model TRAINING — the parameter-on-driver gradient-descent
shape (the fastText/CCNet-style quality-classifier training step of an
LLM data pipeline, run INSIDE the engine instead of exporting features).

Reference scope: the reference engine ships classifier INFERENCE examples
only; training the quality gate is the pipeline step upstream of them.
This module trains a linear classifier with a squashing link by full-batch
gradient descent: the dataset-scale work each round is ONE partial-
aggregated scan (d+1 decimal-exact sums — order-free, so partial
aggregation cannot perturb the doubles), the model state on the driver is
O(features) — the classic parameter-server layout degenerate to one
parameter holder, exactly how full-batch GD distributes at 100 TB.

Cross-engine determinism (the oracle contract, shared with
graph.pagerank): every scalar op in the forward pass and the update is a
single correctly-rounded IEEE double operation (+, -, *, /, abs) — the
TRUE sigmoid is deliberately NOT used because exp() is not bit-stable
across engines (JVM fdlibm vs libm differ in ulps, and a ulp inside an
iterative loop compounds). The link is the ALGEBRAIC sigmoid

    sigma_hat(z) = 0.5 + z / (2 * (1 + |z|))

(monotone, sigma_hat(0) = 0.5, range (0,1) — the "fast sigmoid" used in
low-precision hardware for the same no-transcendentals reason), and the
update is the GLM-style error gradient  g_j = sum_i x_ij (sigma_hat(z_i)
- y_i) / n,  w_j <- quant(w_j - lr * g_j)  with the same pure-IEEE grid
quantization as pagerank (floor(x*10^q + 0.5)/10^q), so a DuckDB oracle
can replay every round bit-for-bit at any scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ieee_quant(v: float, digits: int = 12) -> float:
    """floor(v*10^q + 0.5)/10^q in plain Python floats — bit-identical to
    the Spark/DuckDB floor-form quantization (every step one correctly-
    rounded IEEE op; round-half-toward-+inf, consistent for negatives)."""
    grid = 10.0 ** digits
    return math.floor(v * grid + 0.5) / grid


def lr_train_gd(feats: DataFrame, n_rows: int,
                features: tuple[str, ...] = ("x1", "x2", "x3"),
                label: str = "y", iterations: int = 8, lr: float = 2.0,
                quantize: int = 12) -> list[float]:
    """Full-batch gradient descent for a linear classifier with the
    algebraic-sigmoid link. Returns [w0 (bias), w1..wd] after
    `iterations` rounds, each weight grid-quantized per round.

    Scale shape: `feats` must be materialized by the caller
    (localCheckpoint — it is scanned once per round); a round is ONE
    aggregation job producing d+1 DECIMAL(38,18)-exact sums (order-free
    partial aggregation; the per-round shuffle is d+1 numbers per
    partition, nothing else moves). The driver holds and updates the
    d+1 weights — O(features) state, the parameter-server layout. Round
    count is a fixed budget independent of data size.

    Arithmetic order is part of the contract: z folds
    w0 + w1*x1 + ... + wd*xd LEFT-ASSOCIATIVELY (SQL's + is
    left-associative, so the oracle text matches by construction)."""
    w = [0.0] * (1 + len(features))
    for _ in range(iterations):
        z = F.lit(w[0])
        for j, c in enumerate(features):
            z = z + F.lit(w[j + 1]) * F.col(c)
        p = F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))
        err = p - F.col(label)
        aggs = [F.sum(err.cast("decimal(38,18)"))
                .cast("double").alias("g0")]
        for j, c in enumerate(features):
            aggs.append(F.sum((F.col(c) * err).cast("decimal(38,18)"))
                        .cast("double").alias(f"g{j + 1}"))
        g = feats.agg(*aggs).first()
        w = [ieee_quant(wj - lr * (g[f"g{j}"] / float(n_rows)), quantize)
             for j, wj in enumerate(w)]
    return w


def lr_predictions(feats: DataFrame, w: list[float],
                   features: tuple[str, ...] = ("x1", "x2", "x3"),
                   label: str = "y") -> DataFrame:
    """Score `feats` with trained weights: adds `z` and `pred`
    (sigma_hat(z) >= 0.5 <=> z >= 0 — the monotone link makes the
    decision boundary exact, no transcendentals in inference either)."""
    z = F.lit(w[0])
    for j, c in enumerate(features):
        z = z + F.lit(w[j + 1]) * F.col(c)
    return feats.withColumn("z", z).withColumn(
        "pred", (F.col("z") >= 0).cast("double"))
