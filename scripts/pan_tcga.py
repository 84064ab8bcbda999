#!/usr/bin/env python
"""Pan-cancer batch merge — the reference's ``scripts/panTCGA.py`` recipe
(/root/reference/xena_gdc_etl/scripts/panTCGA.py:1) on the Spark engine.

For each datatype, find every per-project matrix that a ``gdc2xena`` batch
run landed under ``<root>/TCGA-*/Xena_Matrices/``, union them into one
GDC-PANCAN matrix, and write it with PANCAN metadata. The reference
distinguishes merge axes (axis=1 appends sample columns for genomic
matrices, axis=0 appends rows for segment/SNV/phenotype tables); in the
engine's long format both are the same keyed row union, so one code path
covers every dtype.

Usage::

    python scripts/pan_tcga.py --root-dir /data/gdc --out-dir /data/pancan \
        --datatypes star_counts survival

This composes with the ``gdc2xena`` CLI subcommand: run the per-project
batch import first, then this merge — the reference's intended workflow
("should be used right after importing/updating any individual TCGA
project").
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PANCAN_PROJECT = "GDC-PANCAN"
PANCAN_COHORT = "GDC Pan-Cancer (PANCAN)"


def pan_merge(
    spark,
    root_dir: str,
    datatypes: list[str],
    out_dir: str | None = None,
    gdc_release: str = "",
    project_glob: str = "TCGA-*",
) -> list[str]:
    """Merge per-project matrices into pan-cancer matrices; returns the
    written matrix paths. Datatypes with no per-project matrices are
    skipped with a message (parity with the reference's per-dtype loop)."""
    from xena_gdc_etl_spark.gdc_pipelines import DTYPE_SPECS
    from xena_gdc_etl_spark.metadata import build_metadata, write_metadata
    from xena_gdc_etl_spark.operators.matrix import union_matrices
    from xena_gdc_etl_spark.sources.xena_tsv import read_xena_tsv, write_xena_tsv

    out_dir = out_dir or os.path.join(root_dir, PANCAN_PROJECT, "Xena_Matrices")
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for dtype in datatypes:
        pattern = os.path.join(
            root_dir, project_glob, "Xena_Matrices", f"*.{dtype}.tsv"
        )
        paths = sorted(glob.glob(pattern))
        if not paths:
            print(f"No {dtype} matrices under {pattern}; skipping.")
            continue
        print(f"Merging {len(paths)} {dtype} matrices ...")
        out = os.path.join(out_dir, f"{PANCAN_PROJECT}.{dtype}.tsv")
        spec = DTYPE_SPECS.get(dtype)
        if spec is not None and spec.kind == "matrix":
            merged = union_matrices([read_xena_tsv(spark, p) for p in paths])
            write_xena_tsv(merged, out)
        else:
            # survival / phenotype / segment tables: schema-aligned row union
            # of the per-project TSVs (the reference's axis=0 concat)
            df = spark.read.options(
                sep="\t", header=True, nullValue="NA"
            ).csv(paths)
            df.coalesce(1).write.options(
                sep="\t", header=True, nullValue="NA"
            ).mode("overwrite").csv(out)
        meta = build_metadata(
            PANCAN_PROJECT,
            dtype if dtype in DTYPE_SPECS or dtype in ("survival", "clinical")
            else "clinical",
            out,
            gdc_release,
        )
        # the reference renders the PANCAN cohort explicitly (panTCGA.py:62)
        meta["cohort"] = meta["xena_cohort"] = PANCAN_COHORT
        write_metadata(meta, out)
        print(f"Pan-cancer {dtype} matrix is ready at {out}")
        written.append(out)
    return written


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-r", "--root-dir", required=True)
    ap.add_argument("-t", "--datatypes", nargs="+", required=True)
    ap.add_argument("-o", "--out-dir", default=None)
    ap.add_argument("--release", default="")
    args = ap.parse_args(argv)

    from xena_gdc_etl_spark.session import get_spark

    spark = get_spark(app_name="pan-tcga-merge")
    spark.sparkContext.setLogLevel("ERROR")
    written = pan_merge(
        spark, args.root_dir, args.datatypes, args.out_dir, args.release
    )
    return 0 if written else 1


if __name__ == "__main__":
    sys.exit(main())
