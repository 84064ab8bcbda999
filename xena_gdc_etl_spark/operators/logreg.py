"""Distributed logistic regression as an aggregate-only driver loop.

The pattern that makes iterative algorithms survive 100 TB (same contract
as the k-means trainers in operators/similarity.py): per round, ONE scan
of the data folds into a fixed-size aggregate (here: the d+1 gradient
components via ``avg`` — map-side partial, whole-stage codegen, no Python
workers at all), and the driver holds only the weight vector. Nothing
data-sized ever reaches the driver; rounds are fixed (no data-dependent
stopping), init is zeros, so training is deterministic for a fixed
partitioning.

This is deliberately NOT an MLlib wrapper: the point is the plan shape —
full-batch gradient descent where the gradient is a Catalyst expression,
`` grad_i = avg((sigmoid(Σ w·x) − y) · x_i) `` with the CURRENT weights
folded in as literals each round, so every iteration is one codegen'd
aggregate job.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["logistic_train", "logistic_predict"]


def _sigmoid(z: Column) -> Column:
    return 1.0 / (1.0 + F.exp(-z))


def _dot(weights: list[float], feature_cols: Sequence[str], bias: float) -> Column:
    z = F.lit(float(bias))
    for w, c in zip(weights, feature_cols):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def logistic_train(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    iterations: int = 20,
    lr: float = 1.0,
) -> tuple[list[float], float]:
    """Full-batch gradient descent; returns (weights, bias).

    One aggregate job per round: d+1 ``avg`` columns (map-side partial
    combine ⇒ the shuffle carries one partial row per partition, the
    driver folds d+1 floats). ``label_col`` must be 0/1 numeric.
    """
    feature_cols = list(feature_cols)
    w = [0.0] * len(feature_cols)
    b = 0.0
    y = F.col(label_col).cast("double")
    for _ in range(iterations):
        err = _sigmoid(_dot(w, feature_cols, b)) - y
        row = df.agg(
            F.avg(err).alias("g_b"),
            *[
                F.avg(err * F.col(c)).alias(f"g{i}")
                for i, c in enumerate(feature_cols)
            ],
        ).collect()[0]
        b -= lr * row["g_b"]
        w = [wi - lr * row[f"g{i}"] for i, wi in enumerate(w)]
    return w, b


def logistic_predict(
    df: DataFrame,
    weights: Sequence[float],
    bias: float,
    feature_cols: Sequence[str],
    out_col: str = "p",
) -> DataFrame:
    """Score rows under trained weights — a pure projection (scan-stage
    codegen, no shuffle)."""
    return df.withColumn(
        out_col, F.round(_sigmoid(_dot(list(weights), feature_cols, bias)), 6)
    )


def loss(
    df: DataFrame,
    weights: Sequence[float],
    bias: float,
    feature_cols: Sequence[str],
    label_col: str,
) -> float:
    """Mean log-loss under the given weights (one aggregate job) — the
    convergence diagnostic; epsilon-clamped for numerical safety."""
    eps = 1e-12
    y = F.col(label_col).cast("double")
    p = _sigmoid(_dot(list(weights), feature_cols, bias))
    p = F.least(F.greatest(p, F.lit(eps)), F.lit(1.0 - eps))
    return df.agg(
        F.avg(-(y * F.log(p) + (1.0 - y) * F.log(1.0 - p)))
    ).collect()[0][0]


def _reference_train(
    rows: list[tuple[Sequence[float], float]],
    iterations: int = 20,
    lr: float = 1.0,
) -> tuple[list[float], float]:
    """Driver-side reference implementation (same math, plain Python) used
    by tests to pin the distributed trainer's numerics on small inputs."""
    d = len(rows[0][0])
    w = [0.0] * d
    b = 0.0
    n = len(rows)
    for _ in range(iterations):
        gb = 0.0
        gw = [0.0] * d
        for x, y in rows:
            e = 1.0 / (1.0 + math.exp(-(b + sum(wi * xi for wi, xi in zip(w, x))))) - y
            gb += e
            for i, xi in enumerate(x):
                gw[i] += e * xi
        b -= lr * gb / n
        w = [wi - lr * gi / n for wi, gi in zip(w, gw)]
    return w, b
