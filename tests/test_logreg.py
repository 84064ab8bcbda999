"""Distributed logistic-regression trainer: numerics pinned against the
driver-side reference implementation, convergence, and plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xena_gdc_etl_spark.operators import logreg

ROWS = [
    ([0.1, 0.9], 1.0),
    ([0.2, 0.8], 1.0),
    ([0.15, 0.85], 1.0),
    ([0.9, 0.1], 0.0),
    ([0.8, 0.2], 0.0),
    ([0.85, 0.15], 0.0),
]


def _df(spark, n_partitions=1):
    df = spark.createDataFrame(
        [(x[0], x[1], y) for x, y in ROWS], ["f0", "f1", "y"]
    )
    return df.coalesce(n_partitions)


def test_matches_reference_implementation(spark):
    # single partition => same fold order as the sequential reference; the
    # remaining divergence is the last ulp of JVM Math.exp vs libm exp, so
    # pin to 1e-12 rather than bit-identity
    w, b = logreg.logistic_train(_df(spark, 1), ["f0", "f1"], "y", iterations=15)
    wr, br = logreg._reference_train(ROWS, iterations=15)
    assert all(abs(a - c) < 1e-12 for a, c in zip(w, wr))
    assert abs(b - br) < 1e-12


def test_loss_decreases_and_separates(spark):
    df = _df(spark, 2)
    w0, b0 = [0.0, 0.0], 0.0
    w, b = logreg.logistic_train(df, ["f0", "f1"], "y", iterations=25)
    assert logreg.loss(df, w, b, ["f0", "f1"], "y") < logreg.loss(
        df, w0, b0, ["f0", "f1"], "y"
    )
    scored = {
        (round(r.f0, 2), round(r.f1, 2)): r.p
        for r in logreg.logistic_predict(df, w, b, ["f0", "f1"]).collect()
    }
    # positives score above every negative
    pos = [p for (f0, _), p in scored.items() if f0 < 0.5]
    neg = [p for (f0, _), p in scored.items() if f0 >= 0.5]
    assert min(pos) > max(neg)


def test_gradient_is_pure_codegen_aggregate(spark):
    # the per-round job must be JVM-only: no Python UDFs, no explode —
    # a single aggregate over literal-weighted expressions
    from xena_gdc_etl_spark.plans import python_udf_count

    df = _df(spark, 2)
    y = F.col("y").cast("double")
    err = 1.0 / (1.0 + F.exp(-(F.lit(0.0) + F.lit(0.0) * F.col("f0")))) - y
    agg = df.agg(F.avg(err).alias("g_b"), F.avg(err * F.col("f0")).alias("g0"))
    assert python_udf_count(agg) == 0


def test_registered_query_scores_every_doc(spark, sf_dir):
    from xena_gdc_etl_spark.workload import QUERIES

    out = QUERIES["quality_logreg"](spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    assert all(0.0 <= r.p_en <= 1.0 for r in rows)
    # the EN stopword-ratio feature must be informative: mean score of
    # English docs exceeds mean score of the rest
    en = [r.p_en for r in rows if r.is_en == 1]
    other = [r.p_en for r in rows if r.is_en == 0]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)
