"""JSONL corpus source/sink: roundtrip fidelity and corrupt-line
quarantine (never drop, never die)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from xena_gdc_etl_spark.sources.jsonl import (
    DOC_SCHEMA,
    read_jsonl_corpus,
    write_jsonl,
)


def test_jsonl_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "hello world", "en", "src0", 11), (2, "bonjour", "fr", "src1", 7)],
        DOC_SCHEMA,
    )
    out = str(tmp_path / "corpus")
    write_jsonl(docs, out)
    back, bad = read_jsonl_corpus(spark, out)
    assert bad.count() == 0
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in docs.collect()}


def test_jsonl_quarantines_malformed_lines(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json at all\n"
        "\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
        "   \t\n"
        '{"broken": \n'
    )
    valid, quarantine = read_jsonl_corpus(spark, str(p))
    # blank/whitespace-only lines must land in quarantine, never as
    # all-null valid rows
    assert sorted(r.doc_id for r in valid.collect()) == [1, 2]
    bad = sorted(r.raw_line for r in quarantine.collect())
    assert len(bad) == 4
    assert any("not json" in line for line in bad)
    assert "" in bad and "   \t" in bad


def test_jsonl_partitioned_export(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "a", "en", "s0", 1), (2, "b", "fr", "s1", 1)], DOC_SCHEMA
    )
    out = str(tmp_path / "by_lang")
    write_jsonl(docs, out, partition_by=["lang"])
    assert sorted(
        d for d in os.listdir(out) if d.startswith("lang=")
    ) == ["lang=en", "lang=fr"]
    back, bad = read_jsonl_corpus(spark, out)
    # partition column moved to directory level: read back via spark.read
    assert bad.count() == 0
