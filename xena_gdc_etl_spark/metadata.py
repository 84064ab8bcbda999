"""Matrix metadata generation.

The reference renders a JSON sidecar per matrix from Jinja2 templates
(/root/reference/xena_gdc_etl/xena_dataset.py metadata(); templates in
xena_gdc_etl/resources/template.*.meta.json) with variables project_id,
date, gdc_release and xena_cohort. Same fields here, rendered with the
stdlib — the artifact is a plain dict/JSON file next to the matrix.
"""

from __future__ import annotations

import json
import os
import time

# Xena cohort display names for multi-project TCGA cohorts
# (constants.py GDC_XENA_COHORT in the reference).
TCGA_STUDY_COHORT_PREFIX = "GDC "

TYPE_LABELS = {
    "star_counts": "gene expression RNAseq - STAR - Counts",
    "star_tpm": "gene expression RNAseq - STAR - TPM",
    "star_fpkm": "gene expression RNAseq - STAR - FPKM",
    "star_fpkm-uq": "gene expression RNAseq - STAR - FPKM-UQ",
    "mirna": "stem loop expression - miRNA Expression Quantification",
    "mirna_isoform": "miRNA isoform expression",
    "somaticmutation_wxs": "somatic mutation (SNP and INDEL)",
    "somaticmutation_targeted": "somatic mutation (SNP and INDEL) - targeted",
    "segment_cnv_ascat-ngs": "copy number segments - AscatNGS",
    "masked_cnv_DNAcopy": "masked copy number segments - DNAcopy",
    "methylation27": "DNA methylation - Illumina Human Methylation 27",
    "methylation450": "DNA methylation - Illumina Human Methylation 450",
    "methylation_epic": "DNA methylation - Illumina EPIC",
    "protein": "protein expression RPPA",
    "clinical": "phenotype",
    "survival": "survival data",
}


def build_metadata(
    project_id: str | list[str],
    xena_dtype: str,
    matrix_path: str,
    gdc_release: str = "",
) -> dict:
    """Metadata variables for one matrix — field parity with the reference's
    metadata_vars (xena_dataset.py:553-576): project, cohort, type label,
    matrix mtime as the date, release URL.
    """
    projects = (
        ",".join(project_id) if isinstance(project_id, list) else project_id
    )
    if os.path.exists(matrix_path):
        date = time.strftime(
            "%m-%d-%Y", time.gmtime(os.path.getmtime(matrix_path))
        )
    else:
        date = time.strftime("%m-%d-%Y", time.gmtime())
    return {
        "project_id": projects,
        "xena_cohort": TCGA_STUDY_COHORT_PREFIX + projects,
        "type": TYPE_LABELS.get(xena_dtype, xena_dtype),
        "xena_dtype": xena_dtype,
        "date": date,
        "gdc_release": gdc_release,
    }


def write_metadata(metadata: dict, matrix_path: str) -> str:
    """Write ``<matrix>.json`` next to the matrix (the reference's fixed
    naming rule — 'no way to change this behavior', README.rst)."""
    out = matrix_path + ".json"
    with open(out, "w", encoding="utf-8") as f:
        json.dump(metadata, f, indent=2, sort_keys=True)
    return out
