"""Batch orchestration parity with the reference's ``gdc2xena`` driver:
projects × dtypes loop, per-dataset failure capture (etl_*.err +
unfinished.json), continue-on-error; and the composed offline
download → parse → transform → export flow the reference ``etl``
subcommand drives (main.py:19)."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from xena_gdc_etl_spark.gdc2xena import (
    DatasetResult,
    etl_download_transform,
    gdc2xena,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_fixture_root(spark, root: str, projects: list[str], skip: tuple = ()):
    """Reference layout: <root>/<project>/Raw_Data/<inputs>. ``skip`` names
    (project, dtype) datasets whose inputs are deliberately absent."""
    for p in projects:
        raw = os.path.join(root, p, "Raw_Data")
        if (p, "star_counts") not in skip:
            spark.createDataFrame(
                [(f"{p}-s1", "ENSG1", 3.0), (f"{p}-s1", "ENSG2", 7.0),
                 (f"{p}-s2", "ENSG1", 1.0)],
                ["sample", "feature", "value"],
            ).write.mode("overwrite").parquet(
                os.path.join(raw, "star_counts.parquet")
            )
        if (p, "survival") not in skip:
            spark.createDataFrame(
                [("c1", False, 100.0, f"{p}-pat1")],
                ["case_id", "censored", "time", "submitter_id"],
            ).write.mode("overwrite").parquet(
                os.path.join(raw, "survival.parquet")
            )
            spark.createDataFrame(
                [("c1", f"{p}-s1"), ("c1", f"{p}-s2")],
                ["case_id", "sample"],
            ).write.mode("overwrite").parquet(
                os.path.join(raw, "case_samples.parquet")
            )


def test_gdc2xena_continues_past_failures_and_logs(spark, tmp_path):
    root = str(tmp_path / "batch")
    projects = ["TCGA-AAA", "TCGA-BBB"]
    # TCGA-BBB's star_counts inputs are missing -> that dataset must fail
    _write_fixture_root(spark, root, projects, skip=(("TCGA-BBB", "star_counts"),))

    results = gdc2xena(spark, root, projects, ["star_counts", "survival"])

    by_key = {(r.project, r.dtype): r for r in results}
    assert len(results) == 4
    assert by_key[("TCGA-AAA", "star_counts")].status == "done"
    assert by_key[("TCGA-AAA", "survival")].status == "done"
    assert by_key[("TCGA-BBB", "survival")].status == "done"
    bad = by_key[("TCGA-BBB", "star_counts")]
    assert bad.status == "error" and bad.error

    # successful datasets landed matrix + sidecar in the reference layout
    for p, d in [("TCGA-AAA", "star_counts"), ("TCGA-AAA", "survival"),
                 ("TCGA-BBB", "survival")]:
        out = by_key[(p, d)].path
        assert out and os.path.exists(out), (p, d)
        assert os.path.exists(out + ".json")
        assert f"{os.sep}{p}{os.sep}Xena_Matrices{os.sep}" in out

    # failure capture: unfinished.json + a traceback in etl_*.err
    assert json.load(open(os.path.join(root, "unfinished.json"))) == {
        "TCGA-BBB": ["star_counts"]
    }
    errs = glob.glob(os.path.join(root, "etl_*.err"))
    assert len(errs) == 1
    log = open(errs[0]).read()
    assert "No star_counts data for cohort TCGA-BBB." in log
    assert "Traceback" in log  # exc_info recorded, like the reference


def test_gdc2xena_delete_raw_data(spark, tmp_path):
    root = str(tmp_path / "batch2")
    _write_fixture_root(spark, root, ["TCGA-CCC"])
    results = gdc2xena(
        spark, root, ["TCGA-CCC"], ["star_counts"], delete_raw_data=True
    )
    assert results[0].status == "done"
    assert not os.path.exists(os.path.join(root, "TCGA-CCC", "Raw_Data"))
    assert os.path.exists(results[0].path)


def test_gdc2xena_cli_end_to_end(spark, tmp_path):
    from conftest import run_cli_inprocess

    root = str(tmp_path / "cli_batch")
    _write_fixture_root(
        spark, root, ["TCGA-XXX", "TCGA-YYY"],
        skip=(("TCGA-YYY", "survival"),),
    )
    proc = run_cli_inprocess(
        "gdc2xena", "-r", root, "-p", "TCGA-XXX", "TCGA-YYY",
        "-t", "star_counts", "survival",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Imported 3/4 datasets." in proc.stdout
    # the induced failure is logged, the other datasets landed
    assert json.load(open(os.path.join(root, "unfinished.json"))) == {
        "TCGA-YYY": ["survival"]
    }
    for p in ("TCGA-XXX", "TCGA-YYY"):
        assert os.path.exists(
            os.path.join(root, p, "Xena_Matrices", f"{p}.star_counts.tsv")
        )


def test_pan_tcga_merge_smoke(spark, tmp_path):
    # gdc2xena lands two projects; pan_merge unions them into GDC-PANCAN
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "pan_tcga", os.path.join(REPO, "scripts", "pan_tcga.py")
    )
    pan_tcga = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pan_tcga)

    root = str(tmp_path / "pan")
    projects = ["TCGA-AAA", "TCGA-BBB"]
    _write_fixture_root(spark, root, projects)
    results = gdc2xena(spark, root, projects, ["star_counts", "survival"])
    assert all(r.status == "done" for r in results)

    written = pan_tcga.pan_merge(spark, root, ["star_counts", "survival", "nope"])
    assert len(written) == 2  # 'nope' skipped, not fatal

    from xena_gdc_etl_spark.sources.xena_tsv import read_xena_tsv

    merged = read_xena_tsv(spark, written[0])
    samples = {r.sample for r in merged.select("sample").distinct().collect()}
    assert {"TCGA-AAA-s1", "TCGA-AAA-s2", "TCGA-BBB-s1", "TCGA-BBB-s2"} <= samples
    meta = json.load(open(written[0] + ".json"))
    assert meta["cohort"] == "GDC Pan-Cancer (PANCAN)"
    # survival merge stacked both projects' rows
    surv = spark.read.options(sep="\t", header=True).csv(written[1])
    pats = {r._PATIENT for r in surv.collect()}
    assert pats == {"TCGA-AAA-pat1", "TCGA-BBB-pat1"}


def test_etl_download_transform_offline_end_to_end(spark, tmp_path):
    # manifest → distributed download (injectable fetcher) → landed TSV
    # parse → star_counts matrix + metadata, all offline
    def fake_gdc(url: str):
        uuid = url.rsplit("/", 1)[1]
        body = (
            "gene_id\tunstranded\n"
            f"ENSG1\t{10 if uuid == 'u1' else 30}\n"
            f"ENSG2\t{70 if uuid == 'u1' else 0}\n"
        ).encode()
        return f"{uuid}.rna_seq.augmented_star_gene_counts.tsv", iter([body])

    manifest = spark.createDataFrame(
        [("u1", "TCGA-ZZ-0001-01"), ("u2", "TCGA-ZZ-0002-01")],
        ["uuid", "sample"],
    )
    root = str(tmp_path / "etl_e2e")
    out, status = etl_download_transform(
        spark,
        manifest,
        download_dir=os.path.join(root, "TCGA-ZZ", "Raw_Data"),
        dtype="star_counts",
        project="TCGA-ZZ",
        root_dir=root,
        feature_col="gene_id",
        value_col="unstranded",
        fetcher=fake_gdc,
    )
    assert {r.uuid for r in status.collect()} == {"u1", "u2"}
    assert all(r.error is None for r in status.collect())
    assert os.path.exists(out) and os.path.exists(out + ".json")
    meta = json.load(open(out + ".json"))
    assert meta["type"] == "genomicMatrix"

    from xena_gdc_etl_spark.sources.xena_tsv import read_xena_tsv

    m = read_xena_tsv(spark, out)
    vals = {
        (r.sample, r.feature): r.value
        for r in m.filter(F.col("value").isNotNull()).collect()
    }
    import math

    # star_counts recipe: log2(x+1)
    assert math.isclose(vals[("TCGA-ZZ-0001-01", "ENSG2")], math.log2(71), rel_tol=1e-9)
    assert math.isclose(vals[("TCGA-ZZ-0002-01", "ENSG1")], math.log2(31), rel_tol=1e-9)
