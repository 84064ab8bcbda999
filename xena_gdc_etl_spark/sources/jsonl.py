"""JSONL corpus source/sink — the interchange format LLM training corpora
actually arrive in (one JSON document per line, schema drifting, some lines
broken).

Reading splits cleanly into (valid rows, quarantined raw lines) using
Spark's PERMISSIVE corrupt-record channel, so a 100 TB ingest never dies on
one bad line and never silently drops it either — the quarantine is a
DataFrame you can count, sample, and land next to the good data. Writing
exports any corpus DataFrame back to line-delimited JSON.

Plays the role the reference's TSV/XML readers play on the GDC side
(/root/reference/xena_gdc_etl/xena_dataset.py raw-data read step), for the
corpus tables this engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the documents-table shape (TESTDATA.md) as the default corpus schema
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOC_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON with an explicit schema; return
    ``(valid, quarantine)``.

    - An explicit schema (never inference) keeps the read single-pass and
      the column types stable across corpus shards — schema inference on
      100 TB is a full extra scan.
    - Lines are read as text and parsed with ``from_json`` (codegen'd JVM
      expression) carrying an explicit corrupt-record field: a malformed
      line sets that field (modern Spark's PERMISSIVE ``from_json``
      returns a row of nulls, NOT a null struct, so null-struct checks
      silently admit garbage rows) and lands in the quarantine WITH its
      raw bytes, instead of failing the job or being dropped. This also
      sidesteps Spark's restriction on filtering the internal
      corrupt-record column of a file-based JSON scan.
    """
    full = T.StructType(
        [*schema.fields, T.StructField(_CORRUPT, T.StringType())]
    )
    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("__r"),
        F.col("value"),
    )
    # Blank/whitespace-only lines parse to a NULL struct (not a struct with
    # the corrupt field set), so the corrupt-field test alone would admit
    # them as all-null rows; a null struct is equally quarantine-worthy.
    bad = F.col(f"__r.{_CORRUPT}").isNotNull() | F.col("__r").isNull()
    valid = parsed.filter(~bad).select("__r.*").drop(_CORRUPT)
    quarantine = parsed.filter(bad).select(F.col("value").alias("raw_line"))
    return valid, quarantine


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Export a corpus DataFrame as line-delimited JSON (optionally
    hive-partitioned) — the hand-off format for downstream tokenizer/
    training jobs that don't speak parquet."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
