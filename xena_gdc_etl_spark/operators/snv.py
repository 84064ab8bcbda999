"""Somatic-mutation (MAF) transform operators.

Parity with /root/reference/xena_gdc_etl/xena_dataset.py:81
``snv_maf_matrix``: compute variant allele frequency, drop the count columns,
rename to the Xena schema, trim the sample barcode, and remove "no mutation"
placeholder rows for samples that do have real mutations.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_vaf(
    df: DataFrame,
    alt_count_col: str,
    depth_col: str,
    out_col: str = "dna_vaf",
    drop_inputs: bool = True,
) -> DataFrame:
    """dna_vaf = t_alt_count / t_depth, then drop both inputs
    (xena_dataset.py:139-142). Pure projection — stays in whole-stage codegen.
    """
    out = df.withColumn(out_col, F.col(alt_count_col) / F.col(depth_col))
    if drop_inputs:
        out = out.drop(alt_count_col, depth_col)
    return out


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Bulk column rename (xena_dataset.py:144-155 rename to Xena names)."""
    return df.select(
        *[F.col(c).alias(mapping.get(c, c)) for c in df.columns]
    )


def trim_barcode(df: DataFrame, col: str, length: int = 16) -> DataFrame:
    """Trim sample barcode to sample-vial level (README: 'Trim
    "Tumor_Sample_Barcode" to sample vial level') — a substring projection.
    """
    return df.withColumn(col, F.substring(F.col(col), 1, length))


def drop_placeholders_with_data(
    df: DataFrame,
    sample_col: str,
    placeholder_pred,
) -> DataFrame:
    """Remove placeholder rows for samples that also have real rows.

    The reference inserts a sentinel "no mutation" row per empty sample file
    and later removes it if the same sample got real mutations from another
    file (xena_dataset.py:157-161). Distributed form: keep a placeholder row
    only if its sample has NO real row — an anti-join of placeholders against
    the real-row sample set, unioned with the real rows. The real-sample set
    is tiny relative to the data (distinct samples), so the join broadcasts
    under AQE.
    """
    real = df.filter(~placeholder_pred)
    placeholders = df.filter(placeholder_pred)
    real_samples = real.select(sample_col).distinct()
    orphans = placeholders.join(real_samples, on=sample_col, how="left_anti")
    return real.unionByName(orphans)
