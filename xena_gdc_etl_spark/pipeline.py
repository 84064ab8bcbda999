"""End-to-end dataset pipeline — the engine's ``XenaDataset`` family.

The reference orchestrates each dataset as download → transform → metadata
(/root/reference/xena_gdc_etl/xena_dataset.py:308 ``XenaDataset``, :728
``GDCOmicset``, :1232 ``GDCPhenoset``, :1417 ``GDCSurvivalset``). The Spark
version keeps the same three-step surface but swaps the I/O model: the
"download" step resolves a DataFrame from any source (parquet dir, Xena
TSV) instead of fetching per-sample files, the transform is the registered
per-dtype plan (gdc_pipelines), and the sink writes a Xena-TSV matrix plus
the JSON metadata sidecar. Everything between source and sink is a single
lazy plan — Catalyst sees the whole pipeline.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from xena_gdc_etl_spark.filters import FilterSpec
from xena_gdc_etl_spark.gdc_pipelines import (
    DTYPE_SPECS,
    transform_maf_dtype,
    transform_matrix_dtype,
    transform_segment_dtype,
)
from xena_gdc_etl_spark.metadata import build_metadata, write_metadata
from xena_gdc_etl_spark.sources.xena_tsv import write_xena_tsv


@dataclass
class XenaDatasetSpark:
    """One dataset = (projects, dtype, source) with transform + export.

    Mirrors the reference's constructor surface (projects, xena_dtype,
    root_dir) and its ``filter`` hook (``GDCOmicset.gdc_filter``): the
    FilterSpec compiles into the scan as a pushdown predicate rather than
    into an API query string.
    """

    projects: str | list[str]
    xena_dtype: str
    root_dir: str = "."
    gdc_filter: FilterSpec = field(default_factory=FilterSpec)
    gdc_release: str = ""

    def __post_init__(self) -> None:
        if self.xena_dtype not in DTYPE_SPECS:
            raise ValueError(
                f"Unsupported dtype {self.xena_dtype!r}; see supported_dtypes()"
            )

    # -- step 1: source resolution (the reference's "download") ------------
    def load(self, spark: SparkSession, source_path: str) -> DataFrame:
        """Resolve raw data (long-format parquet) and apply the dataset's
        declarative filter — pushed into the scan, the engine-side analog of
        the GDC API filtering server-side."""
        return self.gdc_filter.apply(spark.read.parquet(source_path))

    # -- step 2: per-dtype transform ---------------------------------------
    def transform(self, raw: DataFrame) -> DataFrame:
        kind = DTYPE_SPECS[self.xena_dtype].kind
        if kind == "matrix":
            return transform_matrix_dtype(raw, self.xena_dtype)
        if kind == "segment":
            return transform_segment_dtype(raw, self.xena_dtype)
        return transform_maf_dtype(raw, self.xena_dtype)

    # -- step 3: sink + metadata sidecar -----------------------------------
    @property
    def matrix_dir(self) -> str:
        projects = (
            ",".join(self.projects)
            if isinstance(self.projects, list)
            else self.projects
        )
        # reference layout: <root>/<projects>/Xena_Matrices (xena_dataset.py:460)
        return os.path.join(self.root_dir, projects, "Xena_Matrices")

    def export(self, matrix: DataFrame, name: str | None = None) -> str:
        projects = (
            ",".join(self.projects)
            if isinstance(self.projects, list)
            else self.projects
        )
        name = name or f"{projects}.{self.xena_dtype}.tsv"
        out = os.path.join(self.matrix_dir, name)
        if DTYPE_SPECS[self.xena_dtype].kind == "matrix":
            write_xena_tsv(matrix, out)
        else:
            # segment/MAF matrices are row-stacked tables, not pivoted
            matrix.coalesce(1).write.options(
                sep="\t", header=True, nullValue="NA"
            ).mode("overwrite").csv(out)
        self.metadata(out)
        return out

    def metadata(self, matrix_path: str) -> str:
        meta = build_metadata(
            self.projects, self.xena_dtype, matrix_path, self.gdc_release
        )
        return write_metadata(meta, matrix_path)

    # -- one-call pipeline --------------------------------------------------
    def run(self, spark: SparkSession, source_path: str) -> str:
        """download → transform → export, as the reference's CLI does per
        dataset (main.py etl subcommand)."""
        return self.export(self.transform(self.load(spark, source_path)))
