"""Durable MinHash signature artifact: the persistence seam for
incremental near-dedup.

ANN state (sources/ann_index.py) and token statistics
(sources/token_stats.py) already follow the build-once → persist →
consume pattern; LSH signature state was the one dedup family still
re-derived per session — a day-N incremental run re-shingled and
re-hashed the entire LANDED corpus just to probe today's arrivals
against it. This module persists the (doc_id, mh0..mh{n-1}) signature
table once per corpus snapshot, so day-N dedup loads yesterday's
artifact (a digest-sized table — signatures are num_hashes longs per
doc, orders of magnitude under the text) and only signs the increment.

Layout under ``<path>/``:

- ``signatures.parquet`` — (doc_id bigint, mh0..mh{n-1} bigint): the
  per-doc MinHash slots exactly as ``dedup.minhash_signatures`` emits
  them. Corpus-scaled — written at the input's parallelism, NEVER
  coalesced.
- ``_minhash.json``     — format version + the parameters that make
  signatures comparable (num_hashes, shingle_k, band_size, normalized)
  + n_docs; written LAST so its presence marks a complete artifact
  (same sentinel discipline as ann_index/token_stats/parquet_sink).

The parameter tag is load-bearing: signatures built under different
num_hashes/shingle sizes are incomparable numbers, and probing day-N
signatures against a day-N−1 artifact built with other params silently
yields garbage candidates instead of an error — the loader refuses the
mix. ``band_size`` is stamped too: banding happens at probe time, but a
consumer that bands an artifact differently from the corpus's standing
dedup policy changes recall silently, so the artifact records the
policy it was built for.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xena_gdc_etl_spark.sources.artifact import (
    check_format,
    check_params,
    endorse,
    local_artifact_paths,
    open_manifest,
    remove_sentinel,
)

MINHASH_FORMAT_VERSION = 1
_SENTINEL = "_minhash.json"


def save_minhash_index(
    signatures: DataFrame,
    path: str,
    num_hashes: int,
    shingle_k: int,
    band_size: int,
    normalized: bool = False,
    id_col: str = "doc_id",
) -> dict:
    """Persist a ``minhash_signatures`` frame; returns the manifest dict.

    ``signatures`` must carry exactly the ``mh0..mh{num_hashes-1}``
    slot columns (the declared tag must describe the table — a mismatch
    is rejected here, not discovered as NULLs at probe time).
    ``shingle_k``/``normalized`` record how the text was shingled
    (``dedup.shingles(k=...)``, optionally over ``normalize_text``);
    ``band_size`` records the banding policy this corpus dedups under.

    Crash-consistency contract (same as save_dedup_decisions):
    STAGE-then-SWAP — the table is written to a staging directory,
    validated there, and only then swapped over the live table with the
    sentinel removed for the two-rename window. This makes the
    roll-forward pattern safe (``save(loaded.union(increment))`` back to
    the SAME path reads signatures.parquet inside the plan being
    written; an in-place overwrite would delete the input mid-scan), and
    a validation failure leaves the previous artifact AND its sentinel
    untouched. ``path`` must be local / ``file://`` (sentinel via local
    file IO, table via Spark writers; remote schemes are rejected
    loudly).
    """
    slot_cols = [f"mh{j}" for j in range(num_hashes)]
    missing = [c for c in slot_cols if c not in signatures.columns]
    extra = [
        c
        for c in signatures.columns
        if c.startswith("mh") and c not in slot_cols
    ]
    if missing or extra:
        raise ValueError(
            f"save_minhash_index: signature columns do not match "
            f"num_hashes={num_hashes} (missing {missing}, unexpected "
            f"{extra}) — the manifest tag must describe the table"
        )
    # The id column is persisted as bigint; a non-integral id column
    # either throws mid-write (ANSI cast) or — under try_cast'd lineages
    # — silently becomes all NULLs while the sentinel endorses the
    # artifact, deferring the failure to garbage probe results. Refuse
    # the type up front, matching the module's fail-loud parameter-tag
    # discipline.
    id_type = dict(signatures.dtypes).get(id_col)
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"save_minhash_index: {id_col} has type {id_type!r} — the "
            "artifact persists ids as bigint and only integral id "
            "columns cast losslessly; map your ids to integers first"
        )
    path, spark_uri = local_artifact_paths(path, "save_minhash_index")
    out = signatures.select(
        F.col(id_col).cast("bigint").alias(id_col),
        *[F.col(c).cast("bigint").alias(c) for c in slot_cols],
    )
    import shutil

    final_dir = os.path.join(path, "signatures.parquet")
    staging = os.path.join(path, "signatures.parquet.staging")
    if os.path.exists(staging):
        shutil.rmtree(staging)
    out.write.mode("overwrite").parquet(
        spark_uri + "/signatures.parquet.staging"
    )
    # Validate from the STAGING table — one cheap parquet-stats/column
    # read instead of re-executing the (shingle → sha256 → min)
    # signature lineage, and BEFORE the live table is touched: NULL ids
    # (possible even in an integral column) produce garbage probe joins,
    # and a failure here must leave the previous artifact endorsed.
    written = signatures.sparkSession.read.parquet(
        spark_uri + "/signatures.parquet.staging"
    )
    counts = written.agg(
        F.count(F.lit(1)).alias("n"), F.count(id_col).alias("n_id")
    ).collect()[0]
    n_docs = counts["n"]
    if counts["n_id"] != n_docs:
        shutil.rmtree(staging)
        raise ValueError(
            f"save_minhash_index: {id_col} contains "
            f"{n_docs - counts['n_id']} NULLs out of {n_docs} rows — "
            "refusing to endorse the artifact (the previous "
            "signatures.parquet is left untouched)"
        )
    remove_sentinel(path, _SENTINEL)
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.replace(staging, final_dir)
    manifest = {
        "format_version": MINHASH_FORMAT_VERSION,
        "num_hashes": int(num_hashes),
        "shingle_k": int(shingle_k),
        "band_size": int(band_size),
        "normalized": bool(normalized),
        "id_col": id_col,
        "n_docs": int(n_docs),
    }
    return endorse(path, _SENTINEL, manifest)


def load_minhash_index(
    spark: SparkSession,
    path: str,
    num_hashes: int,
    shingle_k: int,
    band_size: int,
    normalized: bool = False,
) -> "tuple[DataFrame, dict]":
    """Load (signatures, manifest). Refuses an incomplete artifact (no
    sentinel), a future format, or ANY parameter mismatch — signatures
    under different hash/shingle/banding parameters are incomparable
    numbers and must never mix."""
    path, spark_uri, manifest = open_manifest(
        path, _SENTINEL, "load_minhash_index"
    )
    check_format(manifest, MINHASH_FORMAT_VERSION, "load_minhash_index")
    check_params(
        manifest,
        {
            "num_hashes": int(num_hashes),
            "shingle_k": int(shingle_k),
            "band_size": int(band_size),
            "normalized": bool(normalized),
        },
        "load_minhash_index",
        "signatures built under different hash/shingle/banding "
        "parameters must not mix",
    )
    sigs = spark.read.parquet(spark_uri + "/signatures.parquet")
    return sigs, manifest


def build_signatures(
    docs: DataFrame,
    num_hashes: int,
    shingle_k: int,
    normalized: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The house signature recipe under an explicit parameter set — the
    builder half of the artifact, so the saver's tag and the signature
    lineage can never drift apart. One aggregation pass (see
    ``dedup.minhash_signatures``); ``normalized=True`` routes the text
    through ``dedup.normalize_text`` first (the near-dup family's
    whitespace/punct-insensitive variant)."""
    from xena_gdc_etl_spark.operators import dedup as dd

    if normalized:
        docs = docs.withColumn(text_col, dd.normalize_text(F.col(text_col)))
    sh = dd.shingles(
        docs, id_col=id_col, text_col=text_col, k=shingle_k, distinct=False
    )
    return dd.minhash_signatures(sh, id_col=id_col, num_hashes=num_hashes)


def lsh_probe_pairs(
    new_signatures: DataFrame,
    landed_signatures: DataFrame,
    num_hashes: int,
    band_size: int,
    id_col: str = "doc_id",
    broadcast_new: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs BETWEEN an increment and the landed
    corpus: (new_id, landed_id), distinct, for every pair sharing an LSH
    (band, bucket) — the day-N probe of incremental near-dedup.

    Scale shape: both sides band statelessly (``dedup.lsh_buckets`` —
    a projection, no shuffle); the join runs on (band, bucket). A day's
    increment is orders of magnitude under the landed corpus, so the
    NEW side's bucket frame broadcasts by default and the landed corpus
    never shuffles — pass ``broadcast_new=False`` for a backfill-sized
    increment and let AQE pick the join. Within-increment duplicates are
    a separate, cheaper question (``lsh_candidate_pairs`` on the
    increment alone, or the digest path for exact ones).

    The pair set equals ``lsh_candidate_pairs`` over the UNION restricted
    to new×landed pairs (pinned by test) — probing the artifact loses
    nothing vs rescanning the landed corpus.
    """
    from xena_gdc_etl_spark.operators.dedup import lsh_buckets

    new_b = lsh_buckets(
        new_signatures, id_col=id_col, num_hashes=num_hashes,
        band_size=band_size,
    ).select(F.col(id_col).alias("new_id"), "band", "bucket")
    landed_b = lsh_buckets(
        landed_signatures, id_col=id_col, num_hashes=num_hashes,
        band_size=band_size,
    ).select(F.col(id_col).alias("landed_id"), "band", "bucket")
    if broadcast_new:
        new_b = F.broadcast(new_b)
    return (
        landed_b.join(new_b, ["band", "bucket"])
        .select("new_id", "landed_id")
        .distinct()
    )
