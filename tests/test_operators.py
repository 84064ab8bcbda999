"""Per-operator unit tests on tiny in-memory frames with exact expectations
(the reference's test style: small fixtures, known answers —
/root/reference/tests/test_utils.py, tests/fixtures/merge-xena*.csv).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from xena_gdc_etl_spark.filters import FilterSpec, search
from xena_gdc_etl_spark.operators import matrix as mx
from xena_gdc_etl_spark.operators import snv
from xena_gdc_etl_spark.operators.mapping import field_map, rename_by_mapping
from xena_gdc_etl_spark.operators.phenotype import latest_per_key
from xena_gdc_etl_spark.operators.survival import survival_matrix


def rows(df, *cols):
    out = df.select(*cols) if cols else df
    return sorted(tuple(r) for r in out.collect())


def test_filter_spec_in_and_exclude(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("a", 3), ("c", 4)], ["k", "v"]
    )
    out = FilterSpec(include={"k": ["a", "b"]}, exclude={"v": [2]}).apply(df)
    assert rows(out) == [("a", 1), ("a", 3)]


def test_search_projects_fields(spark):
    df = spark.createDataFrame([("a", 1, "x"), ("b", 2, "y")], ["k", "v", "w"])
    out = search(df, include={"k": "a"}, fields=["k", "w"])
    assert out.columns == ["k", "w"]
    assert rows(out) == [("a", "x")]


def test_merge_sample_cols_averages_then_log2(spark):
    # reference semantics: average repeats FIRST, then log2(x+1)
    # (xena_dataset.py:221-241)
    df = spark.createDataFrame(
        [("s1", "g1", 1.0), ("s1", "g1", 3.0), ("s1", "g2", 7.0)],
        ["s", "g", "v"],
    )
    out = {(r.sample, r.feature): r.value for r in
           mx.merge_sample_cols(df, "s", "g", "v").collect()}
    assert out[("s1", "g1")] == pytest.approx(math.log2(3.0))  # avg(1,3)=2 → log2(3)
    assert out[("s1", "g2")] == pytest.approx(3.0)


def test_union_matrices_aligns_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], ["id", "c1"])
    b = spark.createDataFrame([(2, "y")], ["id", "c2"])
    out = mx.union_matrices([a, b])
    assert rows(out, "id", "c1", "c2") == [(1, "x", None), (2, None, "y")]


def test_coalesce_join_left_priority(spark):
    left = spark.createDataFrame([(1, "L"), (2, None)], ["k", "v"])
    right = spark.createDataFrame([(1, "R"), (2, "R2"), (3, "R3")], ["k", "v"])
    out = mx.coalesce_join(left, right, on="k")
    assert rows(out) == [(1, "L"), (2, "R2"), (3, "R3")]


def test_matrix_equal_counts_mismatches(spark):
    a = spark.createDataFrame([(1, 1.0), (2, 2.0)], ["k", "v"])
    b = spark.createDataFrame([(1, 1.0), (2, 99.0), (3, 3.0)], ["k", "v"])
    r = mx.matrix_equal(a, b, keys=["k"]).collect()[0]
    assert r.compared_rows == 3
    assert r.mismatched_rows == 2  # value diff on k=2, missing left row k=3


def test_pivot_and_melt_roundtrip(spark):
    long_df = spark.createDataFrame(
        [("s1", "g1", 1.0), ("s1", "g2", 2.0), ("s2", "g1", 3.0)],
        ["sample", "feature", "value"],
    )
    wide = mx.pivot_wide(long_df, features=["g1", "g2"])
    back = mx.melt_long(wide, "sample", ["g1", "g2"])
    assert rows(back.filter(F.col("value").isNotNull())) == rows(long_df)


def test_snv_placeholder_kept_only_for_empty_samples(spark):
    df = spark.createDataFrame(
        [("s1", -1), ("s1", 10), ("s2", -1)], ["sample", "start"]
    )
    out = snv.drop_placeholders_with_data(df, "sample", F.col("start") == -1)
    assert rows(out) == [("s1", 10), ("s2", -1)]


def test_survival_matrix_flips_censored_and_fans_out(spark):
    surv = spark.createDataFrame(
        [(10, True, 100.0, "P1"), (20, False, 50.0, "P2")],
        ["case_id", "censored", "time", "submitter_id"],
    )
    cs = spark.createDataFrame(
        [(10, "S10a"), (10, "S10b"), (20, "S20")], ["case_id", "sample"]
    )
    out = survival_matrix(surv, cs, "case_id")
    assert rows(out) == [
        ("S10a", 0, 100.0, "P1"),
        ("S10b", 0, 100.0, "P1"),
        ("S20", 1, 50.0, "P2"),
    ]


def test_latest_per_key_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "2020-01-01", "a"), (1, "2020-01-01", "b"), (2, "2019-01-01", "c")],
        ["k", "d", "tag"],
    )
    out = latest_per_key(df, "k", "d", tiebreak_cols=("tag",))
    assert rows(out, "k", "tag") == [(1, "b"), (2, "c")]


def test_field_map_sorted_distinct(spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "a"), (1, "b"), (2, "z")], ["k", "v"]
    )
    out = field_map(df, "k", "v")
    assert rows(out) == [(1, "a,b"), (2, "z")]


def test_rename_by_mapping_keeps_unmapped(spark):
    df = spark.createDataFrame([("x", 1), ("y", 2)], ["s", "v"])
    m = spark.createDataFrame([("x", "X!")], ["frm", "to"])
    out = rename_by_mapping(df, m, "s", "frm", "to")
    assert rows(out) == [("X!", 1), ("y", 2)]


def test_catalog_table_rejects_midstream_timezone_change(spark):
    """The UTC contract is re-CHECKED (never re-mutated) at every read:
    a zone changed between Catalog construction and table() fails loudly
    instead of silently re-zoning the NTZ cast."""
    import pytest

    from xena_gdc_etl_spark.catalog import Catalog

    cat = Catalog(spark, "/root/testdata/sf0.001")
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(ValueError, match="zone has since changed"):
            cat.table("region")
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
