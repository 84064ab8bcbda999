"""TCGA BCR XML supplement readers — biospecimen + clinical (OMF etc.).

Parity target: the reference's tests/test_xena_dataset.py:9,16 call
``read_biospecimen``/``read_clinical`` on nationwidechildrens.org XML
fixtures and compare to expected TSVs. Those functions are absent from
the reference's own code (bit-rotted test — lxml is imported at
xena_dataset.py:28 but unused), so this module implements the *intent*
pinned by the reference's fixture pair:

* **biospecimen**: one row per ``<bio:sample>`` — admin fields +
  patient DIRECT children (containers like ``bcr_canonical_check`` and
  ``samples`` appear as empty strings; their nested leaves do NOT) +
  NON-EMPTY sample direct children with the ``portions`` subtree
  skipped (empty sample fields like the fixture's ``composition`` are
  absent from the expected TSV, while empty PATIENT fields like
  ``gender`` are present — two different collection rules, both pinned
  by the fixture); samples whose barcode type code is ``10``
  (blood-derived normal) are dropped; row key is the sample barcode.
* **clinical**: every LEAF element in document order, later occurrences
  overwriting earlier ones (so the last form in a multi-form supplement
  wins — exactly what the OMF fixture's expected TSV shows); row key is
  the patient barcode.

Both shapes are verified value-for-value against the reference's
fixture TSVs in tests/test_tcga_xml.py — except one column per fixture
(biospecimen ``primary_diagnosis``, omf ``race``) whose name does not
occur ANYWHERE in the corresponding XML: the fixture TSVs were
evidently produced with side information, and the reference's own
tests assert nothing (they call ``DataFrame.equals`` and discard the
result), so no implementation could derive those columns from the
input. The tests document this exclusion explicitly.

Spark decomposition: parsing is pure stdlib-ElementTree functions over
bytes (unit-testable, no Spark); the distributed readers run them inside
``mapInPandas`` over ``binaryFile`` rows — one task per XML supplement,
so a 100k-file GDC project parses cluster-wide with the driver holding
nothing. Because supplement schemas vary per disease/form version, the
distributed frame is LONG (file, row key, map<field,value>); ``to_wide``
pivots to the reference's wide layout with one bounded distinct-keys
job (field-name cardinality, not data-scale).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _local(tag: str) -> str:
    """Strip the {namespace} prefix ElementTree packs into tags."""
    return tag.rsplit("}", 1)[-1]


def _text(elem) -> str:
    """Element text, stripped; empty/nil/container elements yield ''."""
    return (elem.text or "").strip()


def biospecimen_rows(xml_bytes: bytes) -> "list[dict[str, str]]":
    """Parse one biospecimen supplement into per-sample dicts (the
    reference fixture's row shape). Pure function over bytes."""
    root = ET.fromstring(xml_bytes)
    common: "dict[str, str]" = {}
    admin = next(c for c in root if _local(c.tag) == "admin")
    for child in admin:
        common[_local(child.tag)] = _text(child)
    patient = next(c for c in root if _local(c.tag) == "patient")
    for child in patient:
        common[_local(child.tag)] = _text(child)
    samples_el = next(
        (c for c in patient if _local(c.tag) == "samples"), None
    )
    rows = []
    for sample in samples_el if samples_el is not None else ():
        if _local(sample.tag) != "sample":
            continue
        row = dict(common)
        for child in sample:
            tag = _local(child.tag)
            # portions subtree skipped; EMPTY sample fields dropped
            # (fixture rule — empty patient fields stay, see module doc)
            if tag == "portions" or not _text(child):
                continue
            row[tag] = _text(child)
        barcode = row.get("bcr_sample_barcode", "")
        # blood-derived-normal mask (sample type code 10), as pinned by
        # the fixture: TCGA-..-....-01A kept, -10A dropped
        if len(barcode) >= 3 and barcode[-3:-1] == "10":
            continue
        rows.append(row)
    return rows


def clinical_row(xml_bytes: bytes) -> "dict[str, str]":
    """Parse one clinical supplement (OMF and friends) into a single
    dict: every leaf element in document order, later occurrences
    overwriting — the last form in a multi-form file wins, matching the
    reference fixture's expected TSV."""
    root = ET.fromstring(xml_bytes)
    row: "dict[str, str]" = {}
    for elem in root.iter():
        if len(elem) == 0:
            row[_local(elem.tag)] = _text(elem)
    return row


_LONG_SCHEMA = (
    "path string, row_key string, fields map<string,string>, error string"
)


def _reader(parse, key_field: str):
    """Per-file parse with PER-FILE error capture: one malformed
    supplement in a 100k-file batch must yield one error row, not kill
    the whole job — the same failure-row discipline as the distributed
    downloader (sources/download.py). Successful rows carry error=NULL;
    a failed file contributes exactly one row with empty fields and the
    exception text."""

    def _parse_files(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            paths, keys, maps, errs = [], [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    rows = parse(bytes(content))
                except Exception as exc:  # malformed XML → error row
                    paths.append(path)
                    keys.append("")
                    maps.append({})
                    errs.append(f"{type(exc).__name__}: {exc}")
                    continue
                for row in rows:
                    paths.append(path)
                    keys.append(row.get(key_field, ""))
                    maps.append(row)
                    errs.append(None)
            yield pd.DataFrame(
                {
                    "path": paths,
                    "row_key": keys,
                    "fields": maps,
                    "error": errs,
                }
            )

    return _parse_files


def read_biospecimen(spark: SparkSession, path: str) -> DataFrame:
    """Distributed biospecimen reader: binaryFile scan → per-task XML
    parse → long (path, row_key=sample barcode, fields) frame."""
    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(
        _reader(biospecimen_rows, "bcr_sample_barcode"),
        schema=_LONG_SCHEMA,
    )


def read_clinical(spark: SparkSession, path: str) -> DataFrame:
    """Distributed clinical reader: one row per supplement file, keyed
    by patient barcode."""
    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(
        _reader(lambda b: [clinical_row(b)], "bcr_patient_barcode"),
        schema=_LONG_SCHEMA,
    )


def to_wide(long_df: DataFrame) -> DataFrame:
    """Pivot the long (row_key, fields) frame to the reference's wide
    per-row layout: one column per field name, alphabetically ordered,
    missing fields as empty strings. Error rows (malformed files) are
    excluded — read them off the long frame's ``error`` column. The
    distinct-keys job is bounded by FIELD-NAME cardinality (a few
    hundred across all BCR form versions), never data volume."""
    ok = (
        long_df.filter(F.col("error").isNull())
        if "error" in long_df.columns
        else long_df
    )
    keys = sorted(
        r[0]
        for r in ok.select(
            F.explode(F.map_keys("fields")).alias("k")
        )
        .distinct()
        .collect()
    )
    cols = [F.col("row_key")] + [
        F.coalesce(F.col("fields").getItem(k), F.lit("")).alias(k)
        for k in keys
    ]
    return ok.select(*cols)
