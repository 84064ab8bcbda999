"""Nested normalization + GDC filter-grammar rendering."""

from __future__ import annotations

from pyspark.sql import functions as F

from xena_gdc_etl_spark.filters import FilterSpec
from xena_gdc_etl_spark.operators.nested import (
    explode_nested,
    flatten_structs,
    reduce_array,
)


def test_flatten_structs_recursive(spark):
    df = spark.createDataFrame(
        [(1, {"a": 2, "inner": {"b": 3}})],
        "id int, s struct<a:int, inner:struct<b:int>>",
    )
    out = flatten_structs(df)
    assert out.columns == ["id", "s_a", "s_inner_b"]
    row = out.collect()[0]
    assert (row.id, row.s_a, row.s_inner_b) == (1, 2, 3)


def test_explode_nested_outer_keeps_empty(spark):
    df = spark.createDataFrame(
        [(1, [{"x": 10}, {"x": 20}]), (2, [])],
        "id int, arr array<struct<x:int>>",
    )
    out = explode_nested(df, "arr").orderBy("id", "arr_x").collect()
    assert [(r.id, r.arr_x) for r in out] == [(1, 10), (1, 20), (2, None)]


def test_reduce_array_semantics(spark):
    df = spark.createDataFrame(
        [(1, ["only"]), (2, ["b", "a", "b"]), (3, [])],
        "id int, v array<string>",
    )
    out = {r.id: r.red for r in df.select("id", reduce_array(F.col("v")).alias("red")).collect()}
    assert out == {1: "only", 2: "a,b", 3: None}


def test_filterspec_to_gdc_matches_reference_grammar():
    # shape parity with gdc.py:175 simple_and_filter
    assert FilterSpec().to_gdc() == {}
    spec = FilterSpec(
        include={"project.project_id": "TCGA-BRCA", "data_type": ["Copy Number Segment"]},
        exclude={"access": "controlled"},
    )
    assert spec.to_gdc() == {
        "op": "and",
        "content": [
            {"op": "in", "content": {"field": "project.project_id", "value": ["TCGA-BRCA"]}},
            {"op": "in", "content": {"field": "data_type", "value": ["Copy Number Segment"]}},
            {"op": "exclude", "content": {"field": "access", "value": ["controlled"]}},
        ],
    }


def test_gdc_search_payload_shape():
    from xena_gdc_etl_spark.sources.gdc_api import data_url, search_payload

    url, body = search_payload(
        "files",
        FilterSpec(include={"data_type": "Gene Expression Quantification"}),
        fields=["file_id", "md5sum"],
        size=500,
    )
    assert url == "https://api.gdc.cancer.gov/files"
    assert body["size"] == 500 and body["from"] == 0
    assert body["fields"] == "file_id,md5sum"
    import json as _json
    assert _json.loads(body["filters"])["op"] == "and"
    assert data_url("abc-123") == "https://api.gdc.cancer.gov/data/abc-123"

    import pytest as _pytest
    with _pytest.raises(ValueError):
        search_payload("nope")


def test_gdc_search_payload_expand_and_get():
    """The reference's expand= field groups and method='GET' query-string
    form (gdc.py:276-296; mirrors reference tests/test_gdc.py:96
    test_search's method validation)."""
    import pytest as _pytest

    from xena_gdc_etl_spark.sources.gdc_api import search_payload

    # expand: list form, comma-joined like fields
    url, body = search_payload(
        "cases",
        FilterSpec(include={"project.project_id": "TARGET-CCSK"}),
        fields=["submitter_id"],
        expand=["samples", "samples.portions"],
        method="GET",
    )
    assert url == "https://api.gdc.cancer.gov/cases"
    assert body["expand"] == "samples,samples.portions"
    assert body["fields"] == "submitter_id"

    # str form passes through verbatim (reference promotes str -> [str]);
    # a bare string must not be char-iterated
    _, body = search_payload(
        "cases", fields="case_id", expand="samples.portions.analytes"
    )
    assert body["fields"] == "case_id"
    assert body["expand"] == "samples.portions.analytes"

    # no expand -> key absent (reference: only set when truthy)
    _, body = search_payload("cases")
    assert "expand" not in body and "fields" not in body

    # method validation with the reference's exact error text
    with _pytest.raises(ValueError) as exc:
        search_payload("cases", method="PUT")
    assert exc.value.args[0] == (
        'Invalid method: PUT\n method must be either "GET" or "POST".'
    )
    # GET/POST both accepted, case-insensitively
    for m in ("GET", "get", "POST", "post"):
        search_payload("cases", method=m)


def test_format_multiple_collapses_per_id(spark):
    from xena_gdc_etl_spark.operators.nested import format_multiple

    df = spark.createDataFrame(
        [
            ("a", "chemo", 2010),
            ("a", "radiation", 2010),
            ("b", "surgery", None),
            ("c", None, None),
        ],
        ["id", "treatment", "year"],
    )
    rows = {r.id: r for r in format_multiple(df, "id").collect()}
    # multiple distinct values -> sorted joined list (gdc.py:156 semantics)
    assert rows["a"].treatment == "chemo,radiation"
    # single value -> scalar
    assert rows["a"].year == "2010"
    assert rows["b"].treatment == "surgery"
    # all-null field -> empty string (reference fillna(''))
    assert rows["b"].year == ""
    assert rows["c"].treatment == ""
