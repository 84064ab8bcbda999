"""Durable token-statistics artifact: the materialize-once seam for every
unigram consumer.

Five registered queries (lm_score, quality_buckets, oov_rate, tfidf_topk,
vocab_topk) plus bm25 and the PMI marginals all start from the same
(doc_id, tok, tf) frame; the workload's ``_shared_doc_tf`` session cache
simulates what a deployment does for real — tokenize the corpus ONCE per
snapshot, persist the statistics, and fan consumers out from the artifact.
This module is that persistence seam (same sentinel discipline as
sources/ann_index.py and parquet_sink's ``_manifest.json``).

Layout under ``<path>/``:

- ``tf.parquet``     — (doc_id bigint, tok string, tf bigint): the per-doc
  term frequencies. Corpus-scaled — written at the input's parallelism,
  NEVER coalesced.
- ``vocab.parquet``  — (tok string, tf bigint, doc_freq bigint): the
  corpus-level rollup most consumers actually need (vocabulary building,
  LM denominators, idf) — vocabulary-scaled, far below the tf table.
- ``_stats.json``    — format version, tokenizer tag, n_docs / n_tokens /
  n_vocab totals; written LAST so its presence marks a complete artifact.
  Cheap consumers (mixture planning needs only the totals) read the
  manifest and never touch the tables.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xena_gdc_etl_spark.sources.artifact import (
    begin_save,
    check_format,
    check_params,
    endorse,
    open_manifest,
)

STATS_FORMAT_VERSION = 1
_SENTINEL = "_stats.json"

# tag for the house tokenization (lowercase, whitespace split, empties
# dropped — operators/text.py doc_term_freqs); a loader can refuse to mix
# artifacts built under a different tokenizer
DEFAULT_TOKENIZER = "ws_lower_v1"


def save_token_stats(
    tf: DataFrame, path: str, tokenizer: str = DEFAULT_TOKENIZER
) -> dict:
    """Persist a ``doc_term_freqs`` frame (+ its vocabulary rollup);
    returns the manifest dict.

    Crash-consistency contract (same as save_ann_index): a re-save first
    removes the old sentinel, then writes both tables, then writes the
    manifest to a temp file and atomically renames it into place — the
    sentinel's presence always endorses a complete artifact. ``path``
    must be local / ``file://`` (the sentinel uses local file IO while
    the tables go through Spark writers; remote schemes are rejected
    loudly rather than splitting the artifact across filesystems).
    """
    path, spark_uri = begin_save(path, _SENTINEL, "save_token_stats")
    tf = tf.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("tok"),
        F.col("tf").cast("bigint").alias("tf"),
    )
    tf.write.mode("overwrite").parquet(spark_uri + "/tf.parquet")
    # roll the vocabulary up from the WRITTEN table: one read replaces
    # recomputing the tokenize+groupBy lineage, and the rollup is a plain
    # partial-agged groupBy over the already-combined tf rows
    written = tf.sparkSession.read.parquet(spark_uri + "/tf.parquet")
    vocab = written.groupBy("tok").agg(
        F.sum("tf").cast("bigint").alias("tf"),
        # count_distinct, not count(*): the contract input
        # (doc_term_freqs) is unique per (doc_id, tok), but an
        # off-contract union of shard snapshots would silently
        # overcount document frequency and corrupt every idf/bm25
        # consumer
        F.count_distinct("doc_id").cast("bigint").alias("doc_freq"),
    )
    vocab.write.mode("overwrite").parquet(spark_uri + "/vocab.parquet")
    totals = written.agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.sum("tf").alias("n_tokens"),
        F.count_distinct("tok").alias("n_vocab"),
    ).collect()[0]
    manifest = {
        "format_version": STATS_FORMAT_VERSION,
        "tokenizer": tokenizer,
        "n_docs": int(totals["n_docs"] or 0),
        "n_tokens": int(totals["n_tokens"] or 0),
        "n_vocab": int(totals["n_vocab"] or 0),
    }
    return endorse(path, _SENTINEL, manifest)


def load_token_stats(
    spark: SparkSession,
    path: str,
    tokenizer: str = DEFAULT_TOKENIZER,
) -> "tuple[DataFrame, DataFrame, dict]":
    """Load (tf, vocab, manifest). Refuses an incomplete artifact (no
    sentinel) or one built under a different tokenizer tag — mixing
    tokenizations silently corrupts every downstream statistic."""
    path, spark_uri, manifest = open_manifest(
        path, _SENTINEL, "load_token_stats"
    )
    check_format(manifest, STATS_FORMAT_VERSION, "load_token_stats")
    check_params(
        manifest,
        {"tokenizer": tokenizer},
        "load_token_stats",
        "statistics from different tokenizations must not mix",
    )
    tf = spark.read.parquet(spark_uri + "/tf.parquet")
    vocab = spark.read.parquet(spark_uri + "/vocab.parquet")
    return tf, vocab, manifest
