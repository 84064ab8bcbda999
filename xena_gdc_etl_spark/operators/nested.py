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


def format_multiple(
    df: DataFrame, id_col: str = "id", sep: str = ","
) -> DataFrame:
    """Collapse multiple rows per id into one — the engine-side
    ``format_multiple_data`` (/root/reference/xena_gdc_etl/gdc.py:156): a
    field with one (distinct, non-null) value per id becomes that scalar; a
    field with several values becomes a deterministic ``sep``-joined list
    (the reference keeps a Python list in the cell; a joined sorted string
    is the engine-portable equivalent). One partial-aggregated groupBy.
    """
    value_cols = [c for c in df.columns if c != id_col]
    aggs = []
    for c in value_cols:
        vals = F.sort_array(
            F.array_distinct(
                F.collect_list(F.col(f"`{c}`").cast("string"))
            )
        )
        aggs.append(
            F.when(F.size(vals) == 0, F.lit(""))
            .when(F.size(vals) == 1, F.element_at(vals, 1))
            .otherwise(F.array_join(vals, sep))
            .alias(c)
        )
    return df.groupBy(F.col(f"`{id_col}`")).agg(*aggs)


def drop_list_columns(df: DataFrame) -> DataFrame:
    """Drop columns whose type is an array of scalars — the engine-side
    ``get_to_drops`` (/root/reference/xena_gdc_etl/utils.py:235): the
    reference walks the nested case dict and drops leaf paths whose values
    are lists (they can't be tabulated per-sample). After
    ``flatten_structs``, those paths are exactly the scalar-array columns;
    arrays of structs are kept (they're ``explode_nested`` material, a
    caller decision). Pure projection — no shuffle.
    """
    keep = [
        f.name
        for f in df.schema.fields
        if not (
            isinstance(f.dataType, ArrayType)
            and not isinstance(f.dataType.elementType, StructType)
        )
    ]
    return df.select(*[F.col(f"`{c}`") for c in keep])


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
