"""Property-based invariants for the two-pass sharded prefix scan
(operators/prefix.py): for ANY input it must equal the plain
single-window prefix — independent of shard count and input partitioning.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from xena_gdc_etl_spark.operators.prefix import (
    group_prefix_sum,
    group_row_number,
)

# (group, value) rows; order key = the list index (unique by construction —
# the prefix is only well-defined under a total order)
_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 50)),
    min_size=1,
    max_size=24,
)

_SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows, n_partitions):
    return spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], ["k", "g", "v"]
    ).repartition(n_partitions)


def _reference(rows):
    out = {}
    totals = {}
    for i, (g, v) in enumerate(rows):
        totals[g] = totals.get(g, 0) + v
        out[i] = totals[g]
    return out


@_SLOW
@given(rows=_rows, shards=st.sampled_from([1, 3, 16]), parts=st.sampled_from([1, 5]))
def test_prefix_sum_equals_single_window(spark, rows, shards, parts):
    df = _df(spark, rows, parts)
    got = {
        r.k: r.ps
        for r in group_prefix_sum(
            df, ["g"], [F.col("k").asc()], "v", "ps", num_shards=shards
        ).collect()
    }
    assert got == _reference(rows)


@_SLOW
@given(rows=_rows, shards=st.sampled_from([1, 4]))
def test_row_number_matches_window_form(spark, rows, shards):
    df = _df(spark, rows, 3)
    got = {
        r.k: (r.rn, r.n)
        for r in group_row_number(
            df,
            ["g"],
            [F.col("v").desc(), F.col("k").asc()],
            "rn",
            total_col="n",
            num_shards=shards,
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("k").asc())
    want = {
        r.k: (r.rn, r.n)
        for r in df.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .collect()
    }
    assert got == want


@_SLOW
@given(rows=_rows, buckets=st.sampled_from([2, 3, 5]))
def test_bucket_arithmetic_equals_ntile(spark, rows, buckets):
    # commonness_buckets derives the ntile bucket from (rank, group size)
    # arithmetically; the formula must equal F.ntile for ANY group sizes
    from xena_gdc_etl_spark.operators.text import commonness_buckets  # noqa: F401  (formula under test lives there)

    df = _df(spark, rows, 3)
    ranked = group_row_number(
        df, ["g"], [F.col("v").desc(), F.col("k").asc()], "r", total_col="n"
    )

    def idiv(a, b):
        return F.floor(a / b).cast("bigint")

    k = F.lit(buckets).cast("bigint")
    r, n = F.col("r"), F.col("n")
    q = idiv(n, k)
    r0 = n % k
    thr = r0 * (q + F.lit(1))
    bucket = F.when(r <= thr, idiv(r + q, q + F.lit(1))).otherwise(
        r0 + idiv(r - thr + q - F.lit(1), F.greatest(q, F.lit(1)))
    )
    got = {x.k: x.b for x in ranked.select("k", bucket.alias("b")).collect()}
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("k").asc())
    want = {
        x.k: x.b
        for x in df.withColumn("b", F.ntile(buckets).over(w)).collect()
    }
    assert got == want
