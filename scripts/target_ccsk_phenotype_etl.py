#!/usr/bin/env python
"""Per-cohort phenotype ETL recipe — the reference's specialized
``scripts/TARGET-CCSK_phenotype_ETL.py``
(/root/reference/xena_gdc_etl/scripts/TARGET-CCSK_phenotype_ETL.py:1)
composed from the engine's standard pheno pipeline.

The cohort quirk being worked around: TARGET-CCSK clinical tables carry a
"TARGET USI" column whose IDs are missing the ``TARGET-51-`` prefix that
GDC's ``cases.submitter_id`` uses, so a naive case join matches nothing.
The recipe:

1. union the per-file clinical tables (``unionByName`` with missing-column
   tolerance — the reference concatenates raw clinical dataframes);
2. repair the join key: prefix bare USIs (idempotent — already-prefixed
   rows pass through, so re-runs and mixed inputs are safe);
3. flatten the nested cases→samples records into a (sample, case) map
   (``samples_clinical`` — the reference fetches the same mapping via
   ``gdc.search('cases', fields=['submitter_id','samples.submitter_id'])``
   then ``json_normalize``);
4. map per-case clinical onto every sample with a broadcast inner join
   (``case_to_samples`` — clinical is per-case, orders of magnitude
   smaller than per-sample data, so the big side never shuffles);
5. export the per-sample matrix + Xena metadata.

Offline by design: cases come from a JSON file of GDC hit dicts (the
shape ``sources.gdc_api.fetch_table`` returns when the network is
available) so the recipe runs and is testable without the live API.

Usage::

    python scripts/target_ccsk_phenotype_etl.py \
        --clinical /data/ccsk/clin_*.parquet --cases-json /data/ccsk/cases.json \
        --root-dir /data/xena
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROJECT = "TARGET-CCSK"
USI_COL = "TARGET USI"
USI_PREFIX = "TARGET-51-"


def repair_usi(clinical, usi_col: str = USI_COL, prefix: str = USI_PREFIX):
    """Prefix bare TARGET USIs so they match ``cases.submitter_id``.

    The reference renames every index row unconditionally
    (``rename(index=lambda x: 'TARGET-51-' + x)``); this version is
    idempotent, which matters when re-running over partially-repaired
    inputs. Pure codegen expression — no shuffle.
    """
    from pyspark.sql import functions as F

    c = F.col(usi_col)
    return clinical.withColumn(
        usi_col,
        F.when(c.startswith(prefix) | c.isNull(), c).otherwise(
            F.concat(F.lit(prefix), c)
        ),
    )


def ccsk_phenotype_matrix(spark, clinical_paths: list[str], cases_json: str):
    """Per-sample TARGET-CCSK phenotype matrix (the reference's
    ``ccsk_clin_dfs2matrix``, Spark-first)."""
    from pyspark.sql import functions as F

    from xena_gdc_etl_spark.operators.phenotype import (
        case_to_samples,
        samples_clinical,
    )
    from xena_gdc_etl_spark.sources.gdc_api import hits_to_df

    frames = [spark.read.parquet(p) for p in clinical_paths]
    clin = frames[0]
    for f in frames[1:]:
        clin = clin.unionByName(f, allowMissingColumns=True)
    clin = repair_usi(clin)

    with open(cases_json) as fh:
        hits = json.load(fh)
    cases = samples_clinical(hits_to_df(spark, hits))
    # (sample, case submitter id) map; reference renames
    # 'cases.submitter_id' -> 'TARGET USI' before its pandas merge
    case_samples = cases.select(
        F.col("sample").alias("sample_id"),
        F.col("submitter_id").alias(USI_COL),
    )
    return case_to_samples(clin, F.broadcast(case_samples), USI_COL)


def main(argv: list[str] | None = None) -> str:
    from xena_gdc_etl_spark.pipeline import GDCPhenosetSpark
    from xena_gdc_etl_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clinical", nargs="+", required=True,
                    help="per-file clinical parquet paths (globs ok)")
    ap.add_argument("--cases-json", required=True,
                    help="GDC cases hits (nested JSON list) for the cohort")
    ap.add_argument("--root-dir", default=".")
    ap.add_argument("--gdc-release", default="")
    args = ap.parse_args(argv)

    paths = [p for pat in args.clinical for p in sorted(glob.glob(pat)) or [pat]]
    spark = get_spark(app_name=f"{PROJECT}-phenotype-etl")
    matrix = ccsk_phenotype_matrix(spark, paths, args.cases_json)
    pheno = GDCPhenosetSpark(
        projects=PROJECT,
        xena_dtype="raw_phenotype",
        root_dir=args.root_dir,
        gdc_release=args.gdc_release,
    )
    out = pheno.export(matrix, name=f"{PROJECT}.phenotype.tsv")
    print(f"wrote {out}")
    return out


if __name__ == "__main__":
    main()
