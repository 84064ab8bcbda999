"""Property-based invariants for the two-pass sharded prefix scan
(operators/prefix.py): for ANY input it must equal the plain
single-window prefix — independent of shard count, input partitioning,
and (since the shard id became a pure function of row values) of whether
Catalyst exchange reuse fires at all.
"""

from __future__ import annotations

import pytest
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
            df, ["g"], ["k"], "v", "ps", num_shards=shards, sample_cap=4
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
            [("v", "desc"), "k"],
            "rn",
            total_col="n",
            num_shards=shards,
            sample_cap=4,
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


def test_prefix_correct_with_exchange_reuse_disabled(spark):
    """The round-4 fragility: the old construction was only correct while
    Catalyst reused the range exchange so spark_partition_id() agreed
    between subtrees. The shard id is now a pure function of row values,
    so the scan must stay exact with exchange reuse OFF."""
    rows = [("a", i % 7) for i in range(40)] + [("b", i % 5) for i in range(23)]
    old = spark.conf.get("spark.sql.exchange.reuse", "true")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        df = _df(spark, rows, 6)
        got = {
            r.k: r.ps
            for r in group_prefix_sum(
                df, ["g"], ["k"], "v", "ps", num_shards=8, sample_cap=16
            ).collect()
        }
        assert got == _reference(rows)
    finally:
        spark.conf.set("spark.sql.exchange.reuse", old)


def test_fractional_values_not_truncated(spark):
    """A double value column must carry its own type end-to-end (the old
    unconditional bigint cast silently truncated fractional sums)."""
    rows = [("a", 0.5), ("a", 0.25), ("a", 0.25), ("b", 1.5)]
    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], ["k", "g", "v"]
    )
    out = group_prefix_sum(df, ["g"], ["k"], "v", "ps", num_shards=3, sample_cap=2)
    assert dict(out.dtypes)["ps"] == "double"
    got = {r.k: r.ps for r in out.collect()}
    assert got == {0: 0.5, 1: 0.75, 2: 1.0, 3: 1.5}


def test_sort_expression_rejected(spark):
    df = spark.createDataFrame([(1, "a", 1)], ["k", "g", "v"])
    with pytest.raises(ValueError, match="desc"):
        group_prefix_sum(df, ["g"], [F.col("k").desc()], "v", "ps")


def test_null_order_keys_match_window(spark):
    """Null order-key values must shard consistently with Spark's
    nulls-first (asc) / nulls-last (desc) window ordering."""
    data = [(i, "g", v, 1) for i, v in enumerate([None, 3, None, 1, 2, None, 0])]
    df = spark.createDataFrame(data, ["k", "g", "v", "one"])
    for direction in ("asc", "desc"):
        got = {
            r.k: r.rn
            for r in group_row_number(
                df, ["g"], [("v", direction), "k"], "rn", num_shards=4,
                sample_cap=4,
            ).collect()
        }
        order = (
            [F.col("v").asc(), F.col("k").asc()]
            if direction == "asc"
            else [F.col("v").desc(), F.col("k").asc()]
        )
        w = Window.partitionBy("g").orderBy(*order)
        want = {
            r.k: r.rn
            for r in df.withColumn("rn", F.row_number().over(w)).collect()
        }
        assert got == want, direction


@_SLOW
@given(rows=_rows, buckets=st.sampled_from([2, 3, 5]))
def test_bucket_arithmetic_equals_ntile(spark, rows, buckets):
    # commonness_buckets derives the ntile bucket from (rank, group size)
    # arithmetically; the formula must equal F.ntile for ANY group sizes
    from xena_gdc_etl_spark.operators.text import commonness_buckets  # noqa: F401  (formula under test lives there)

    df = _df(spark, rows, 3)
    ranked = group_row_number(
        df, ["g"], [("v", "desc"), "k"], "r", total_col="n"
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


# ---------------------------------------------------------------------------
# group_rolling: sharded bounded-frame rolling aggregate
# ---------------------------------------------------------------------------


def _rolling_reference(rows, preceding, agg):
    """Pure-python ROWS BETWEEN preceding PRECEDING AND CURRENT ROW."""
    hist: dict[str, list[tuple[int, int]]] = {}
    out = {}
    for i, (g, v) in enumerate(rows):
        hist.setdefault(g, []).append((i, v))
        frame = [v2 for _, v2 in hist[g][-(preceding + 1):]]
        if agg == "avg":
            out[i] = sum(frame) / len(frame)
        elif agg == "sum":
            out[i] = sum(frame)
        elif agg == "min":
            out[i] = min(frame)
        elif agg == "max":
            out[i] = max(frame)
        elif agg == "count":
            out[i] = len(frame)
    return out


@_SLOW
@given(
    rows=_rows,
    shards=st.sampled_from([1, 3, 16]),
    parts=st.sampled_from([1, 5]),
    preceding=st.sampled_from([0, 1, 3]),
    agg=st.sampled_from(["avg", "sum", "min", "max", "count"]),
)
def test_rolling_matches_reference(spark, rows, shards, parts, preceding, agg):
    from xena_gdc_etl_spark.operators.prefix import group_rolling

    df = _df(spark, rows, parts)
    got = {
        r.k: r.roll
        for r in group_rolling(
            df, ["g"], ["k"], "v", "roll",
            agg=agg, preceding=preceding, num_shards=shards, sample_cap=4,
        ).collect()
    }
    want = _rolling_reference(rows, preceding, agg)
    assert got == want  # int sums/avg-of-int-sums are exact doubles


def test_rolling_group_spanning_many_shards(spark):
    """The carry-no-chaining argument: one group sliced into many shards,
    each slice shorter than the frame in places — every frame must still
    see its true predecessors even when they live 2+ shards back (tails
    of ALL earlier slices are re-ranked per target, so a slice with 1 row
    never truncates the carry)."""
    from xena_gdc_etl_spark.operators.prefix import group_rolling

    rows = [("hot", v) for v in range(200)]
    df = _df(spark, rows, 7)
    got = {
        r.k: r.roll
        for r in group_rolling(
            df, ["g"], ["k"], "v", "roll",
            agg="sum", preceding=5, num_shards=64, sample_cap=64,
        ).collect()
    }
    assert got == _rolling_reference(rows, 5, "sum")


def test_rolling_matches_plain_window_on_events(spark, sf_dir):
    """Bitwise parity with the single-window plan on real float data:
    sliding frames recompute per row (no retraction), so identical frame
    contents give identical doubles."""
    from xena_gdc_etl_spark.operators.prefix import group_rolling

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    want = {
        r.event_id: r.roll
        for r in ev.select(
            "event_id", F.avg("value").over(w).alias("roll")
        ).collect()
    }
    got = {
        r.event_id: r.roll
        for r in group_rolling(
            ev, ["user_id"], ["ts", "event_id"], "value", "roll",
            agg="avg", preceding=3, num_shards=16, sample_cap=64,
        ).select("event_id", "roll").collect()
    }
    assert got == want


def test_rolling_rejects_bad_args(spark):
    import pytest as _pytest

    from xena_gdc_etl_spark.operators.prefix import group_rolling

    df = _df(spark, [("a", 1)], 1)
    with _pytest.raises(ValueError, match="agg must be"):
        group_rolling(df, ["g"], ["k"], "v", "o", agg="median")
    with _pytest.raises(ValueError, match="preceding"):
        group_rolling(df, ["g"], ["k"], "v", "o", preceding=-1)


def test_prefix_sum_null_group_key(spark):
    """NULL is a regular group (Window.partitionBy semantics): rows with a
    null group key must get correct prefix sums, not silently vanish in
    the offsets join."""
    rows = [(None, k, 1) for k in range(1, 21)] + [("a", k, 2) for k in range(1, 6)]
    df = spark.createDataFrame(rows, "g string, k int, v int")
    out = group_prefix_sum(df, ["g"], ["k"], "v", "ps", num_shards=4, sample_cap=8)
    got = {(r.g, r.k): r.ps for r in out.collect()}
    assert len(got) == 25  # nothing dropped
    for k in range(1, 21):
        assert got[(None, k)] == k  # running sum of 1s
    for k in range(1, 6):
        assert got[("a", k)] == 2 * k


def test_group_rolling_null_group_key(spark):
    """The reviewer repro: 20 null-group rows across 4 shards,
    preceding=3 — rows at shard starts must see carried context."""
    from pyspark.sql import Window as W

    from xena_gdc_etl_spark.operators.prefix import group_rolling

    rows = [(None, k, float(k)) for k in range(1, 21)]
    df = spark.createDataFrame(rows, "g string, k int, v double")
    out = group_rolling(
        df, ["g"], ["k"], "v", "roll", agg="avg", preceding=3, num_shards=4,
        sample_cap=4,
    )
    got = {r.k: r.roll for r in out.collect()}
    w = W.partitionBy("g").orderBy("k").rowsBetween(-3, W.currentRow)
    exp = {
        r.k: r.roll
        for r in df.withColumn("roll", F.avg("v").over(w)).collect()
    }
    assert got == exp


def test_small_frame_fallback_plain_window(spark):
    """The boundary sample doubles as a row-count probe: a frame proven
    smaller than sample_cap takes the plain-window path (no __shard, no
    offsets join — fewer jobs), with results identical to the sharded
    form. The sharded tests above force their path with a small
    sample_cap for exactly this reason."""
    rows = [("a", k, 1) for k in range(1, 11)] + [("b", k, 3) for k in range(1, 4)]
    df = spark.createDataFrame(rows, "g string, k int, v int")
    out = group_prefix_sum(df, ["g"], ["k"], "v", "ps", num_shards=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__shard" not in plan
    got = {(r.g, r.k): r.ps for r in out.collect()}
    want = {
        (r.g, r.k): r.ps
        for r in group_prefix_sum(
            df, ["g"], ["k"], "v", "ps", num_shards=8, sample_cap=4
        ).collect()
    }
    assert got == want

    from xena_gdc_etl_spark.operators.prefix import group_rolling

    roll = group_rolling(
        df, ["g"], ["k"], "v", "r", agg="sum", preceding=2, num_shards=8
    )
    rplan = roll._jdf.queryExecution().executedPlan().toString()
    assert "__shard" not in rplan
    got_r = {(r.g, r.k): r.r for r in roll.collect()}
    want_r = {
        (r.g, r.k): r.r
        for r in group_rolling(
            df, ["g"], ["k"], "v", "r",
            agg="sum", preceding=2, num_shards=8, sample_cap=4,
        ).collect()
    }
    assert got_r == want_r


def test_both_paths_emit_identical_schema_order(spark):
    """Positional consumers (union-by-position, row-tuple compares) must
    see ONE schema no matter which path the row-count probe picked — the
    sharded path's join used to emit (total_col, out_col) while the
    fast path emitted (out_col, total_col)."""
    rows = [("a", k, 1) for k in range(1, 11)] + [("b", k, 3) for k in range(1, 4)]
    df = spark.createDataFrame(rows, "g string, k int, v int")
    fast = group_prefix_sum(
        df, ["g"], ["k"], "v", "ps", total_col="tot", num_shards=8
    )
    sharded = group_prefix_sum(
        df, ["g"], ["k"], "v", "ps", total_col="tot", num_shards=8,
        sample_cap=4,
    )
    assert fast.columns == sharded.columns == ["g", "k", "v", "ps", "tot"]
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, sharded.collect())
    )


def test_rolling_benign_skew_takes_plain_window(spark):
    """The skew probe: many uniform groups and a frame over the sample
    cap — no group is anywhere near a shard width, so the plain
    per-group window (one shuffle, one sort) is chosen over the
    tail-carry machinery. Results are bitwise-identical either way;
    this pins the PHYSICAL choice."""
    from xena_gdc_etl_spark.operators.prefix import group_rolling

    rows = [(f"g{i % 100}", i % 7) for i in range(2000)]
    out = group_rolling(
        _df(spark, rows, 5), ["g"], ["k"], "v", "roll",
        agg="avg", preceding=3, num_shards=8, sample_cap=64,
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan and "__shard" not in plan
    got = {r.k: r.roll for r in out.collect()}
    assert got == _rolling_reference(rows, 3, "avg")


def test_rolling_hot_key_still_sharded(spark):
    """One group owning half the rows trips the skew probe: the
    tail-carry path engages (the plain window would funnel the hot
    group through one task at scale) and still matches the reference."""
    from xena_gdc_etl_spark.operators.prefix import group_rolling

    rows = [
        ("hot", i % 7) if i % 2 == 0 else (f"g{i % 50}", i % 7)
        for i in range(2000)
    ]
    out = group_rolling(
        _df(spark, rows, 5), ["g"], ["k"], "v", "roll",
        agg="avg", preceding=3, num_shards=8, sample_cap=64,
        carry_min_rows=0,
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" in plan
    got = {r.k: r.roll for r in out.collect()}
    assert got == _rolling_reference(rows, 3, "avg")


def test_no_substituted_shard_filter_in_sharded_plans(spark):
    """Round-17 regression pin (§hot-carry-r17): predicates on the
    derived shard column must never be pushed below its Project — the
    optimizer substitutes the FULL boundary when-chain into a per-row
    Filter (join-inferred isnotnull, or a pre-filter pushed through a
    window), too large for codegen (78s → 5.8s on a 16M-row fixture).
    The shard expression is coalesce-wrapped (non-nullable) and the
    targets frame carries no pushable pre-filter, so every Filter left
    in the sharded plans is one of the short structural predicates."""
    from xena_gdc_etl_spark.operators.prefix import (
        group_prefix_sum,
        group_rolling,
    )

    rows = [("hot", i % 7) for i in range(400)]
    df = _df(spark, rows, 4)
    plans = [
        group_rolling(
            df, ["g"], ["k"], "v", "r",
            agg="avg", preceding=2, num_shards=8, sample_cap=16,
            carry_min_rows=0,
        ),
        group_prefix_sum(
            df, ["g"], ["k"], "v", "ps", num_shards=8, sample_cap=16,
        ),
    ]
    for out in plans:
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "__shard" in plan  # the sharded path actually engaged
        for line in plan.split("\n"):
            t = line.strip().lstrip(":+- *(0123456789)")
            if t.startswith("Filter"):
                assert len(t) < 800, (
                    "substituted shard expression in a Filter: "
                    + t[:200]
                )


def test_empty_group_cols_take_sharded_path_and_match(spark):
    """With no group columns the whole frame is one 'group': the skew
    probe must report hot_frac=1.0 (round-17 review finding — 0.0 would
    route a 100M-row frame to ONE global window task), the sharded
    machinery must handle the degenerate grouping, and values must
    match the global window."""
    from xena_gdc_etl_spark.operators.prefix import (
        group_prefix_sum,
        group_rolling,
    )

    df = _df(spark, [("a", i % 7) for i in range(300)], 3).drop("g")
    roll = group_rolling(
        df, [], ["k"], "v", "r",
        agg="avg", preceding=3, num_shards=4, sample_cap=16,
        carry_min_rows=0,
    )
    assert "Union" in roll._jdf.queryExecution().optimizedPlan().toString()
    w = Window.orderBy("k").rowsBetween(-3, Window.currentRow)
    plain = df.withColumn("r", F.avg("v").over(w))
    assert plain.exceptAll(roll).count() + roll.exceptAll(plain).count() == 0

    ps = group_prefix_sum(
        df, [], ["k"], "v", "ps", num_shards=4, sample_cap=16
    )
    w2 = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    plain2 = df.withColumn("ps", F.sum(F.col("v").cast("bigint")).over(w2))
    assert plain2.exceptAll(ps).count() + ps.exceptAll(plain2).count() == 0


def test_rolling_crossover_routes_midsize_hot_to_plain(spark):
    """§hot-carry-r18: a hot group that SPANS shards but whose frame is
    below the measured plain-vs-carry crossover must take the plain
    window (the tail-carry constant loses below ~_CARRY_MIN_ROWS), with
    identical values. carry_min_rows=0 on the same frame still forces
    tail-carry — the routing knob, not the results, is what changed.

    The routed frame is built from ``spark.range`` so Catalyst stats are
    KNOWN (Range → Project propagates a real sizeInBytes): since the r19
    ADVICE fix, the router treats UNKNOWN stats as huge (skip probe,
    keep tail-carry) — the last assertion pins that contract on the same
    logical rows from an RDD-backed ``createDataFrame`` source."""
    from xena_gdc_etl_spark.operators.prefix import group_rolling

    rows = [
        ("hot", i % 7) if i % 2 == 0 else (f"g{i % 50}", i % 7)
        for i in range(2000)
    ]
    df = (
        spark.range(2000)
        .select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 2 == 0, F.lit("hot"))
            .otherwise(
                F.concat(F.lit("g"), (F.col("id") % 50).cast("string"))
            )
            .alias("g"),
            (F.col("id") % 7).alias("v"),
        )
        .repartition(5)
    )
    routed = group_rolling(
        df, ["g"], ["k"], "v", "roll",
        agg="avg", preceding=3, num_shards=8, sample_cap=64,
    )
    plan = routed._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan and "__shard" not in plan
    forced = group_rolling(
        df, ["g"], ["k"], "v", "roll",
        agg="avg", preceding=3, num_shards=8, sample_cap=64,
        carry_min_rows=0,
    )
    assert "Union" in forced._jdf.queryExecution().optimizedPlan().toString()
    got = {r.k: r.roll for r in routed.collect()}
    assert got == _rolling_reference(rows, 3, "avg")
    assert (
        routed.exceptAll(forced).count()
        + forced.exceptAll(routed).count()
        == 0
    )
    # Unknown Catalyst stats (RDD-backed source) cannot prove the frame
    # small: no count probe, tail-carry stands (ADVICE r19).
    unknown = group_rolling(
        _df(spark, rows, 5), ["g"], ["k"], "v", "roll",
        agg="avg", preceding=3, num_shards=8, sample_cap=64,
    )
    assert "Union" in unknown._jdf.queryExecution().optimizedPlan().toString()
