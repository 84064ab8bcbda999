"""Phenotype-matrix operators.

Covers the reference's clinical/biospecimen handling: most-recent-follow-up
selection, keep-samples semi-join filtering, and case→sample phenotype
mapping (README.rst §"transform phenotype";
/root/reference/xena_gdc_etl/xena_dataset.py:1232 ``GDCPhenoset``,
:264 ``get_keep_samples``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    key_cols: str | Sequence[str],
    order_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Pick the most recent row per key — the reference's "the most recent
    follow up will be found out" rule for TCGA clinical XML (README.rst
    §transform-phenotype). Window row_number over (key ORDER BY order DESC);
    deterministic via explicit tiebreakers.

    Scale: one shuffle on the key; with AQE skew handling. For a known heavy
    hitter key, pre-aggregate with max(order) + rejoin instead.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def keep_samples_filter(
    data: DataFrame,
    memberships: DataFrame,
    sample_col: str,
) -> DataFrame:
    """Keep only rows whose sample appears in the membership set — the
    reference's ``get_keep_samples`` + drop loop
    (/root/reference/xena_gdc_etl/xena_dataset.py:264, :1404-1408) as a
    LEFT SEMI join (never materializes the membership list on the driver).
    """
    members = memberships.select(sample_col).distinct()
    return data.join(members, on=sample_col, how="left_semi")


def samples_clinical(
    cases: DataFrame,
    samples_field: str = "samples",
    sample_id_field: str = "submitter_id",
    sep: str = ".",
) -> DataFrame:
    """Per-sample clinical table from nested GDC case records — the
    reference's ``get_samples_clinical`` (gdc.py:462: fetch nested case
    JSON, ``pandas.json_normalize`` per sample) as native Catalyst ops:
    explode the samples array (one row per sample, outer — cases without
    samples survive), star-expand nested structs into dotted columns, drop
    list-valued leaves (``get_to_drops`` rule), and surface the sample's
    submitter id as the ``sample`` column (the reference's
    'submitter_id.samples' → 'sample' rename, xena_dataset.py:1399).
    """
    from xena_gdc_etl_spark.operators.nested import (
        drop_list_columns,
        explode_nested,
        flatten_structs,
    )

    if samples_field in cases.columns:
        flat = explode_nested(cases, samples_field, keep_empty=True, sep=sep)
    else:
        # a hit page where no case carried samples: schema inference drops
        # the field entirely — case-level rows pass through unexploded
        flat = cases
    flat = drop_list_columns(flatten_structs(flat, sep=sep))
    sample_col = f"{samples_field}{sep}{sample_id_field}"
    if sample_col in flat.columns:
        flat = flat.withColumnRenamed(sample_col, "sample")
    return flat


def case_to_samples(
    per_case: DataFrame,
    case_samples: DataFrame,
    case_key: str,
) -> DataFrame:
    """Map per-case (patient) attributes onto every sample of the case —
    TARGET phenotype / API phenotype behavior (README.rst: "All related
    samples for each case/patient will be identified and phenotype data will
    be mapped to corresponding samples"). Broadcast-friendly inner join.
    """
    return case_samples.join(per_case, on=case_key, how="inner")
