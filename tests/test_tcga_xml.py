"""TCGA BCR XML supplement readers vs the reference's fixture pair.

The reference's tests/test_xena_dataset.py:9,16 pin read_biospecimen /
read_clinical against nationwidechildrens.org XML + expected TSV
fixtures, but the functions are absent from its code (bit-rotted test).
These tests pin THIS repo's implementation against the same fixtures —
every (row, column, value) of the expected TSVs must be reproduced —
plus the distributed binaryFile → mapInPandas path.
"""

from __future__ import annotations

import csv
import os

import pytest

from xena_gdc_etl_spark.sources import tcga_xml

FIXTURES = "/root/reference/tests/fixtures/xena_dataset"
BIO = os.path.join(
    FIXTURES, "nationwidechildrens.org_biospecimen.TCGA-AR-A0TQ"
)
OMF = os.path.join(FIXTURES, "nationwidechildrens.org_omf.TCGA-RW-A68A")

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not present"
)


# One column per fixture TSV does not occur ANYWHERE in its source XML
# (verified by search): the fixtures were evidently produced with side
# information, and the reference's own tests assert nothing (they call
# DataFrame.equals and discard the result). No implementation can derive
# these from the input, so parity is pinned on everything else.
NON_DERIVABLE = {"primary_diagnosis", "race"}


def _read_tsv(path: str):
    """Expected TSV → (index_value, {col: val}) rows; the unnamed first
    column is the row index. Non-derivable columns dropped (above)."""
    with open(path) as fh:
        rows = list(csv.reader(fh, delimiter="\t"))
    header = rows[0][1:]
    return [
        (
            r[0],
            {
                k: v
                for k, v in zip(header, r[1:])
                if k not in NON_DERIVABLE
            },
        )
        for r in rows[1:]
    ]


@needs_fixtures
def test_biospecimen_rows_match_reference_fixture():
    with open(BIO + ".xml", "rb") as fh:
        got = tcga_xml.biospecimen_rows(fh.read())
    expected = _read_tsv(BIO + ".csv")
    assert len(got) == len(expected) == 1
    (index, exp_row), row = expected[0], got[0]
    assert row["bcr_sample_barcode"] == index
    assert sorted(row) == sorted(exp_row)
    assert row == exp_row


@needs_fixtures
def test_biospecimen_drops_blood_normal_sample():
    # the XML carries TCGA-AR-A0TQ-10A too; the type-10 mask drops it
    with open(BIO + ".xml", "rb") as fh:
        xml = fh.read()
    assert b"TCGA-AR-A0TQ-10A" in xml
    got = tcga_xml.biospecimen_rows(xml)
    assert [r["bcr_sample_barcode"] for r in got] == ["TCGA-AR-A0TQ-01A"]


@needs_fixtures
def test_clinical_row_matches_reference_fixture():
    with open(OMF + ".xml", "rb") as fh:
        row = tcga_xml.clinical_row(fh.read())
    expected = _read_tsv(OMF + ".csv")
    assert len(expected) == 1
    index, exp_row = expected[0]
    assert row["bcr_patient_barcode"] == index
    assert sorted(row) == sorted(exp_row)
    assert row == exp_row


@needs_fixtures
def test_clinical_last_form_wins():
    # two OMF forms in the file; leaf collection in document order must
    # keep the SECOND form's barcode (what the expected TSV records)
    with open(OMF + ".xml", "rb") as fh:
        xml = fh.read()
    assert xml.count(b"bcr_omf_barcode") >= 4  # 2 open + 2 close tags
    row = tcga_xml.clinical_row(xml)
    assert row["bcr_omf_barcode"] == "TCGA-RW-A68A-O53737"


@needs_fixtures
def test_malformed_file_yields_error_row_not_job_failure(spark, tmp_path):
    import shutil

    good = tmp_path / "good.xml"
    shutil.copy(OMF + ".xml", good)
    (tmp_path / "bad.xml").write_bytes(b"<omf:tcga_bcr>truncated")
    out = tcga_xml.read_clinical(spark, str(tmp_path) + "/*.xml").collect()
    by_err = {bool(r.error): r for r in out}
    assert len(out) == 2
    assert by_err[False].row_key == "TCGA-RW-A68A"
    bad = by_err[True]
    assert bad.row_key == "" and bad.fields == {}
    assert "ParseError" in bad.error
    # wide pivot excludes the error row
    wide = tcga_xml.to_wide(tcga_xml.read_clinical(spark, str(tmp_path) + "/*.xml"))
    assert [r.row_key for r in wide.collect()] == ["TCGA-RW-A68A"]


@needs_fixtures
def test_distributed_readers_and_wide_pivot(spark):
    bio_long = tcga_xml.read_biospecimen(spark, BIO + ".xml")
    rows = bio_long.collect()
    assert len(rows) == 1
    assert rows[0].row_key == "TCGA-AR-A0TQ-01A"

    wide = tcga_xml.to_wide(bio_long)
    expected = dict(_read_tsv(BIO + ".csv"))["TCGA-AR-A0TQ-01A"]
    got = wide.collect()[0].asDict()
    assert got.pop("row_key") == "TCGA-AR-A0TQ-01A"
    assert got == expected
    # wide columns are alphabetical after the key, matching the fixture
    assert wide.columns == ["row_key"] + sorted(expected)

    clin_long = tcga_xml.read_clinical(spark, OMF + ".xml")
    crows = clin_long.collect()
    assert len(crows) == 1 and crows[0].row_key == "TCGA-RW-A68A"
    exp_c = dict(_read_tsv(OMF + ".csv"))["TCGA-RW-A68A"]
    got_c = tcga_xml.to_wide(clin_long).collect()[0].asDict()
    got_c.pop("row_key")
    assert got_c == exp_c
