"""Nested-data normalization — the engine-side analog of the reference's
JSON handling: ``get_samples_clinical`` flattens nested case JSON with
``pandas.json_normalize`` (/root/reference/xena_gdc_etl/gdc.py:462) and
``reduce_json_array`` collapses single-element arrays
(/root/reference/xena_gdc_etl/utils.py:164). Here the same semantics are
native Catalyst expressions: struct star-expansion stays in whole-stage
codegen, arrays collapse with higher-order functions — no Python in the
path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def flatten_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively star-expand struct columns into flat ``parent<sep>child``
    columns (arrays are left as-is; explode is a caller decision because it
    changes row cardinality). Pure projection — zero shuffles, and column
    pruning still reaches the parquet scan for untouched fields.
    """
    while True:
        struct_cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, StructType)
        ]
        if not struct_cols:
            return df
        cols: list[Column] = []
        for f in df.schema.fields:
            if isinstance(f.dataType, StructType):
                cols.extend(
                    F.col(f"`{f.name}`.`{sub.name}`").alias(f"{f.name}{sep}{sub.name}")
                    for sub in f.dataType.fields
                )
            else:
                cols.append(F.col(f"`{f.name}`"))
        df = df.select(*cols)


def explode_nested(
    df: DataFrame, array_col: str, keep_empty: bool = True, sep: str = "_"
) -> DataFrame:
    """Explode an array-of-struct column (one row per element, prefixed
    ``<array_col><sep><field>``), then flatten — the reference's
    one-dict-per-nested-object expansion (``get_json_objects``,
    /root/reference/xena_gdc_etl/utils.py:207). ``keep_empty`` keeps rows
    whose array is null/empty (outer explode), matching left-join semantics.
    """
    exploder = F.explode_outer if keep_empty else F.explode
    out = df.withColumn(array_col, exploder(F.col(array_col)))
    if isinstance(out.schema[array_col].dataType, StructType):
        out = flatten_structs(out, sep=sep)
    return out


def reduce_array(col: Column) -> Column:
    """Collapse an array the way ``reduce_json_array`` does: a single
    (distinct) value becomes the scalar itself; genuinely multiple values
    join into one sorted, comma-separated string; empty/null becomes null.
    """
    distinct = F.array_sort(F.array_distinct(col))
    return (
        F.when(F.size(distinct) == 0, F.lit(None).cast("string"))
        .when(F.size(distinct) == 1, distinct.getItem(0).cast("string"))
        .otherwise(F.concat_ws(",", distinct))
    )
