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

    def download(
        self,
        manifest: DataFrame,
        download_dir: str,
        md5_col: str | None = None,
        fetcher=None,
    ) -> DataFrame:
        """The reference's literal step 1 (``XenaDataset.download``,
        xena_dataset.py:597: per-UUID fetch loop via ``download_map``) as a
        cluster fan-out: hand a UUID manifest to ``sources.download`` and
        get back a status table (path, md5, md5_ok per file). Callers then
        parse the landed files into the long-format table ``load`` reads.
        """
        from xena_gdc_etl_spark.sources.download import download_files

        return download_files(
            manifest, download_dir, md5_col=md5_col, fetcher=fetcher
        )

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


def _projects_str(projects: str | list[str]) -> str:
    return ",".join(projects) if isinstance(projects, list) else projects


@dataclass
class GDCPhenosetSpark:
    """Phenotype dataset — the reference's ``GDCPhenoset``
    (/root/reference/xena_gdc_etl/xena_dataset.py:1232) re-expressed:
    case-level clinical merges onto sample-level biospecimen with
    clinical-over-biospecimen priority on overlapping columns
    (:1385 ``transform``), nested fields flatten into dotted columns
    (``pandas.json_normalize`` → ``flatten_structs``), and list-valued leaf
    paths drop (``get_to_drops``, utils.py:235 → ``drop_list_columns``).

    Scale: clinical is per-case (orders of magnitude smaller than
    per-sample data at cohort size) so the merge broadcasts it; everything
    else is pure projection.
    """

    projects: str | list[str]
    xena_dtype: str = "GDC_phenotype"  # clinical | biospecimen | GDC_phenotype
    root_dir: str = "."
    gdc_release: str = ""

    _VALID = ("clinical", "biospecimen", "raw_phenotype", "GDC_phenotype")

    def __post_init__(self) -> None:
        if self.xena_dtype not in self._VALID:
            raise ValueError(
                f"xena_dtype must be one of {self._VALID}, got {self.xena_dtype!r}"
            )

    def load(
        self, spark: SparkSession, clinical_path: str, biospecimen_path: str | None = None
    ) -> tuple[DataFrame, DataFrame | None]:
        clin = spark.read.parquet(clinical_path)
        bio = (
            spark.read.parquet(biospecimen_path) if biospecimen_path else None
        )
        return clin, bio

    def transform(
        self,
        clinical: DataFrame,
        biospecimen: DataFrame | None = None,
        sample_col: str = "sample",
        case_col: str = "case_id",
    ) -> DataFrame:
        from pyspark.sql import functions as F

        from xena_gdc_etl_spark.operators.matrix import coalesce_join
        from xena_gdc_etl_spark.operators.nested import (
            drop_list_columns,
            flatten_structs,
        )

        clin = drop_list_columns(flatten_structs(clinical, sep="."))
        if self.xena_dtype in ("clinical", "raw_phenotype") or biospecimen is None:
            return clin
        bio = drop_list_columns(flatten_structs(biospecimen, sep="."))
        if self.xena_dtype == "biospecimen":
            return bio
        # GDC_phenotype: per-sample biospecimen rows enriched with case-level
        # clinical; clinical wins on overlap (coalesce_join takes the LEFT
        # value, so clinical is the left side; right-outer keeps every
        # sample). Broadcast the small per-case side — the per-sample big
        # side never shuffles.
        key = case_col if case_col in clin.columns else sample_col
        if key == case_col and case_col in bio.columns:
            merged = coalesce_join(
                F.broadcast(clin), bio, on=case_col, how="right"
            )
        else:
            merged = coalesce_join(clin, bio, on=sample_col, how="full")
        return merged

    @property
    def matrix_dir(self) -> str:
        return os.path.join(
            self.root_dir, _projects_str(self.projects), "Xena_Matrices"
        )

    def export(self, matrix: DataFrame, name: str | None = None) -> str:
        name = name or f"{_projects_str(self.projects)}.{self.xena_dtype}.tsv"
        out = os.path.join(self.matrix_dir, name)
        matrix.coalesce(1).write.options(
            sep="\t", header=True, nullValue="NA"
        ).mode("overwrite").csv(out)
        meta = build_metadata(
            self.projects, "clinical", out, self.gdc_release
        )
        write_metadata(meta, out)
        return out

    def run(
        self,
        spark: SparkSession,
        clinical_path: str,
        biospecimen_path: str | None = None,
    ) -> str:
        clin, bio = self.load(spark, clinical_path, biospecimen_path)
        return self.export(self.transform(clin, bio))


@dataclass
class GDCSurvivalsetSpark:
    """Survival dataset — the reference's ``GDCSurvivalset``
    (/root/reference/xena_gdc_etl/xena_dataset.py:1417): the per-case
    survival table becomes the 4-column Xena survival matrix
    (sample, OS, OS.time, _PATIENT; :1520 ``transform``) with one row per
    sample of each case. ``survival_matrix`` broadcasts the per-case side
    onto the case→sample map, so the big side never shuffles.
    """

    projects: str | list[str]
    root_dir: str = "."
    gdc_release: str = ""
    xena_dtype: str = "survival"

    def transform(
        self,
        survival: DataFrame,
        case_samples: DataFrame,
        case_key: str = "case_id",
    ) -> DataFrame:
        from xena_gdc_etl_spark.operators.survival import survival_matrix

        return survival_matrix(survival, case_samples, case_key)

    @property
    def matrix_dir(self) -> str:
        return os.path.join(
            self.root_dir, _projects_str(self.projects), "Xena_Matrices"
        )

    def export(self, matrix: DataFrame, name: str | None = None) -> str:
        name = name or f"{_projects_str(self.projects)}.survival.tsv"
        out = os.path.join(self.matrix_dir, name)
        # Xena's header spells it "OS.time" (xena_dataset.py:1545); the
        # engine keeps OS_time internally (dots in Spark names fight column
        # resolution) and renames only at the sink.
        matrix.withColumnRenamed("OS_time", "OS.time").coalesce(1).write.options(
            sep="\t", header=True, nullValue="NA"
        ).mode("overwrite").csv(out)
        meta = build_metadata(self.projects, "survival", out, self.gdc_release)
        write_metadata(meta, out)
        return out

    def run(
        self,
        spark: SparkSession,
        survival_path: str,
        case_samples_path: str,
        case_key: str = "case_id",
    ) -> str:
        surv = spark.read.parquet(survival_path)
        samples = spark.read.parquet(case_samples_path)
        return self.export(self.transform(surv, samples, case_key))
