"""Field-mapping / catalog summary operators.

Covers gdc.py's metadata-shaping helpers: two-field mapping
(/root/reference/xena_gdc_etl/gdc.py:655 ``map_two_fields``), the updated-file
impact summary (gdc.py:615 ``gdc_check_new``), project catalog info
(gdc.py:434 ``get_project_info``), list-aggregation of repeated fields
(gdc.py:156 ``format_multiple_data``), and postprocessing's rename-and-dedup
(/root/reference/xena_gdc_etl/postprocessing.py:65).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def field_map(
    df: DataFrame,
    input_col: str,
    output_col: str,
    as_string: bool = True,
) -> DataFrame:
    """input value → sorted distinct set of output values (gdc.py:655 builds
    ``{input: set(outputs)}``). collect_set + array_sort keeps it
    deterministic; ``as_string`` concat_ws's for stable hashing/export.
    """
    agg = F.array_sort(F.collect_set(F.col(output_col)))
    if as_string:
        agg = F.concat_ws(",", agg)
    return df.groupBy(F.col(input_col)).agg(agg.alias("mapped"))


def check_new(
    files: DataFrame,
    id_col: str,
    ids: Sequence,
    summary_cols: Sequence[str],
) -> DataFrame:
    """Summarize projects/types impacted by a list of updated file ids
    (gdc.py:615): filter by id membership, project the summary fields,
    distinct. The IN-list predicate pushes to the scan.
    """
    return (
        files.filter(F.col(id_col).isin(list(ids)))
        .select(*summary_cols)
        .distinct()
    )


def rename_by_mapping(
    df: DataFrame,
    mapping: DataFrame,
    value_col: str,
    map_from: str,
    map_to: str,
) -> DataFrame:
    """Replace values via a mapping table, keeping unmapped values as-is —
    postprocessing.py:80-98 renames sample ids to case ids using the GDC
    sample→case map. Broadcast left join + coalesce (the mapping table is a
    dim table; the big side never shuffles).
    """
    m = mapping.select(
        F.col(map_from).alias("__from"), F.col(map_to).alias("__to")
    ).distinct()
    return (
        df.join(broadcast(m), on=df[value_col] == F.col("__from"), how="left")
        .withColumn(value_col, F.coalesce(F.col("__to"), F.col(value_col)))
        .drop("__from", "__to")
    )


def dedup_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Drop duplicate rows (postprocessing.py:100-102 ``drop_duplicates``).
    Hash-based distinct — map-side partial dedup then shuffle on the hash.
    """
    return df.dropDuplicates(subset=list(subset) if subset else None)


def list_agg_per_key(
    df: DataFrame,
    key_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Collapse repeated per-key records into per-key lists —
    ``format_multiple_data`` (gdc.py:156 groupby('id').agg(list), used for
    diagnoses/treatments arrays). Sorted for determinism.
    """
    aggs = [
        F.array_sort(F.collect_list(F.col(c))).alias(c) for c in value_cols
    ]
    return df.groupBy(F.col(key_col)).agg(*aggs)
