"""Xena-matrix TSV reader/writer.

The reference's on-disk interchange format is a wide tab-separated matrix
with the row index in the first column (written by ``to_csv(sep='\\t')``
throughout /root/reference/xena_gdc_etl/xena_dataset.py, read back by
``pd.read_csv(sep='\\t', index_col=0)`` in utils.py:122 and main.py:28).

Reading converts wide → the engine's long format; writing pivots long →
wide. The wide shape is an EDGE format only: fine for export of bounded
matrices, wrong as an internal representation at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from xena_gdc_etl_spark.operators.matrix import melt_long


def read_xena_tsv(
    spark: SparkSession,
    path: str,
    id_col: str | None = None,
    long: bool = True,
) -> DataFrame:
    """Read a Xena TSV. With ``long=True`` returns the engine-native long
    form (sample, feature, value) where ``feature`` is the first column's
    values and samples are the remaining column names.
    """
    wide = spark.read.options(
        sep="\t", header=True, inferSchema=True, nullValue="NA"
    ).csv(path)
    if not long:
        return wide
    first = id_col or wide.columns[0]
    value_cols = [c for c in wide.columns if c != first]
    # Rename the id column BEFORE melting: Xena matrices commonly head
    # their index column "sample", which would collide with the melted
    # sample-name column and make every later reference ambiguous.
    wide = wide.withColumnRenamed(first, "__feature_id")
    melted = melt_long(
        wide, "__feature_id", value_cols, feature_name="sample",
        value_name="value",
    )
    return melted.withColumnRenamed("__feature_id", "feature").select(
        "sample", "feature", "value"
    )


def write_xena_tsv(
    long_df: DataFrame,
    path: str,
    sample_col: str = "sample",
    feature_col: str = "feature",
    value_col: str = "value",
    max_samples: int = 50_000,
) -> None:
    """Export a long matrix as a Xena-style TSV directory (features as the
    index column, one column per sample — the reference's matrix layout).
    Pivot width = number of samples; exporting is only sane for bounded
    sample sets, which is exactly the reference's use case (TCGA cohorts
    top out near 11k samples; pan-cancer ~12.6k). ``max_samples`` turns an
    over-wide pivot — a driver-OOM-by-collect otherwise — into an
    actionable error, checked with a ``limit(max+1)`` count so the guard
    job itself is bounded.
    """
    from pyspark.sql import functions as F

    distinct_samples = long_df.select(sample_col).distinct()
    if distinct_samples.limit(max_samples + 1).count() > max_samples:
        raise ValueError(
            f"write_xena_tsv: >{max_samples} distinct {sample_col!r} values; "
            "a pivot this wide is not driver-sized (and not a sane TSV) — "
            "export a bounded cohort or raise max_samples"
        )
    samples = [
        r[0] for r in distinct_samples.orderBy(sample_col).collect()
    ]
    wide = (
        long_df.groupBy(feature_col)
        .pivot(sample_col, [str(s) for s in samples])
        .agg(F.first(value_col))
    )
    wide.coalesce(1).write.options(sep="\t", header=True, nullValue="NA").mode(
        "overwrite"
    ).csv(path)
