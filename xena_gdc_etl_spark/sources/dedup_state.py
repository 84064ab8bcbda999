"""Durable dedup-DECISION artifact: frozen cluster labels + the
incremental update path.

The incremental loop (examples/incremental_dedup_daily.py) persists
digests and MinHash signatures, but cluster labels and keep decisions
were re-derived per run — so a day-N arrival that joins an existing
duplicate cluster could flip yesterday's keep decision (a smaller
arriving doc_id would steal the representative under the plain min-id
rule). This module freezes the DECISION itself:

- ``save_dedup_decisions`` / ``load_dedup_decisions`` persist the
  (doc_id, cluster_rep) table under the same sentinel + parameter-tag
  discipline as the signature artifact (sources/minhash_index.py): the
  tag records the LSH parameters the clusters were derived under, and
  the loader refuses a mix — labels built under different banding are
  different equivalence relations, and joining them silently yields
  garbage keep decisions.
- ``incremental_cc_update`` labels a day-N increment against the FROZEN
  table: arrivals joining an existing cluster INHERIT its
  representative (landed labels never change — append-only decisions),
  arrivals forming new clusters among themselves get min-arrival-id
  representatives via the house CC operator.

Stability contract (the reason this artifact exists): a landed doc's
(cluster_rep, keep) never changes after it is frozen — keep is simply
``doc_id == cluster_rep``, so an arrival inheriting a landed rep is
always a drop, and yesterday's keeps stay keeps. The one deliberate
divergence from a full recompute: an increment component that BRIDGES
two frozen clusters cannot merge them (that would relabel landed docs);
its members inherit the smallest touched representative and the merge
is deferred to the next full rebuild — the standard frozen-labels
compromise, surfaced in the docstring rather than hidden.

Scale shape: the frozen table is corpus-scale but only ever touched by
one key join against the increment's cross-edges (AQE broadcasts the
increment side when day-sized); the CC over the increment's own edges
is increment-scale. The landed corpus is never re-clustered, never
re-shuffled.
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

DEDUP_STATE_FORMAT_VERSION = 1
_SENTINEL = "_dedup_state.json"


def save_dedup_decisions(
    decisions: DataFrame,
    path: str,
    num_hashes: int,
    shingle_k: int,
    band_size: int,
    normalized: bool = False,
    id_col: str = "doc_id",
    rep_col: str = "cluster_rep",
) -> dict:
    """Persist a (doc_id, cluster_rep) decision table; returns the
    manifest. Same crash-consistency contract as save_minhash_index —
    the sentinel's presence always endorses a complete artifact — but
    validation happens on the STAGING table, so a failed check (NULL
    id/rep) leaves the previous endorsed artifact fully intact,
    sentinel included. Order: write staging, validate staging, remove
    stale sentinel, swap staging into place, write manifest last via
    atomic rename. Integral id/rep columns only, no NULLs."""
    for c in (id_col, rep_col):
        if c not in decisions.columns:
            raise ValueError(
                f"save_dedup_decisions: missing column {c!r} "
                f"(columns: {decisions.columns})"
            )
        ctype = dict(decisions.dtypes)[c]
        if ctype not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"save_dedup_decisions: {c} has type {ctype!r} — decision "
                "tables persist integral ids only"
            )
    # resolve WITHOUT removing the sentinel yet: this saver validates
    # staging first, so the prior artifact stays endorsed until the swap
    path, spark_uri = local_artifact_paths(path, "save_dedup_decisions")
    out = decisions.select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.col(rep_col).cast("bigint").alias(rep_col),
    )
    # Stage-then-swap, NOT mode("overwrite") onto the live table: the
    # roll-forward pattern (save(frozen.union(increment)) back to the
    # SAME path) reads decisions.parquet inside the very plan being
    # written — an in-place overwrite deletes the input files mid-scan
    # (FAILED_READ_FILE). Writing to a staging dir materializes the
    # union first; the swap is two local renames under the already-
    # removed sentinel, so every intermediate state is unendorsed.
    final_dir = os.path.join(path, "decisions.parquet")
    staging = os.path.join(path, "decisions.parquet.staging")
    if os.path.exists(staging):
        import shutil

        shutil.rmtree(staging)
    out.write.mode("overwrite").parquet(spark_uri + "/decisions.parquet.staging")
    # Validate the STAGING table before touching the live one: in the
    # roll-forward pattern (save(frozen.union(increment)) to the same
    # path) a NULL discovered only after the swap would have already
    # destroyed the previous good artifact with no rollback. A failed
    # check here leaves the prior table AND its sentinel intact — the
    # stale sentinel is removed only below, once staging has validated,
    # so the unendorsed window shrinks to the two-rename swap itself.
    staged = decisions.sparkSession.read.parquet(
        spark_uri + "/decisions.parquet.staging"
    )
    counts = staged.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(id_col).alias("n_id"),
        F.count(rep_col).alias("n_rep"),
    ).collect()[0]
    if counts["n_id"] != counts["n"] or counts["n_rep"] != counts["n"]:
        import shutil

        shutil.rmtree(staging)
        raise ValueError(
            "save_dedup_decisions: NULL ids or representatives in the "
            "decision table — refusing to endorse the artifact (the "
            "previous decisions.parquet is left untouched)"
        )
    remove_sentinel(path, _SENTINEL)
    if os.path.exists(final_dir):
        import shutil

        shutil.rmtree(final_dir)
    os.replace(staging, final_dir)
    manifest = {
        "format_version": DEDUP_STATE_FORMAT_VERSION,
        "num_hashes": int(num_hashes),
        "shingle_k": int(shingle_k),
        "band_size": int(band_size),
        "normalized": bool(normalized),
        "id_col": id_col,
        "rep_col": rep_col,
        "n_docs": int(counts["n"]),
    }
    return endorse(path, _SENTINEL, manifest)


def load_dedup_decisions(
    spark: SparkSession,
    path: str,
    num_hashes: int,
    shingle_k: int,
    band_size: int,
    normalized: bool = False,
) -> "tuple[DataFrame, dict]":
    """Load a decision artifact, refusing a parameter mismatch — labels
    derived under different LSH parameters encode a different
    equivalence relation and must not mix."""
    path, spark_uri, manifest = open_manifest(
        path, _SENTINEL, "load_dedup_decisions"
    )
    check_format(
        manifest, DEDUP_STATE_FORMAT_VERSION, "load_dedup_decisions"
    )
    check_params(
        manifest,
        {
            "num_hashes": int(num_hashes),
            "shingle_k": int(shingle_k),
            "band_size": int(band_size),
            "normalized": bool(normalized),
        },
        "load_dedup_decisions",
        "decisions derived under different hash/shingle/banding "
        "parameters must not mix",
    )
    return spark.read.parquet(spark_uri + "/decisions.parquet"), manifest


def incremental_cc_update(
    frozen_labels: DataFrame,
    new_nodes: DataFrame,
    cross_pairs: DataFrame,
    new_pairs: "DataFrame | None" = None,
    id_col: str = "doc_id",
    rep_col: str = "cluster_rep",
    new_id_col: str = "new_id",
    landed_id_col: str = "landed_id",
) -> DataFrame:
    """Label a day-N increment against frozen day-N−1 decisions.

    Inputs: ``frozen_labels`` — the loaded (doc_id, cluster_rep)
    artifact; ``new_nodes`` — one ``id_col`` row per arriving doc;
    ``cross_pairs`` — (``new_id_col``, ``landed_id_col``) duplicate
    edges between the increment and the landed corpus
    (``lsh_probe_pairs`` output, or the
    digest probe's matches); ``new_pairs`` — (a, b) duplicate edges
    WITHIN the increment (``lsh_candidate_pairs`` over the increment
    alone), or None when within-increment dedup is handled separately.

    Output: (doc_id, cluster_rep) for the INCREMENT only — append it to
    the frozen table (and re-save) to roll the artifact forward. Rules,
    in precedence order:

    1. an increment component touching >=1 frozen cluster inherits the
       SMALLEST touched representative (deterministic; landed labels
       never change — a bridge between two frozen clusters defers their
       merge to the next full rebuild, see module docstring);
    2. otherwise the component's representative is its smallest arrival
       id (the house CC convention), so a brand-new duplicate cluster
       gets a stable rep of its own.

    A ``cross_pairs`` row whose landed id is absent from
    ``frozen_labels`` indicates the signature and decision artifacts
    are out of sync; it contributes nothing (inner join) — keep the two
    artifacts frozen from the same snapshot.
    """
    from xena_gdc_etl_spark.operators.dedup import connected_components

    spark = new_nodes.sparkSession
    for c in (new_id_col, landed_id_col):
        if c not in cross_pairs.columns:
            raise ValueError(
                f"incremental_cc_update: cross_pairs is missing column "
                f"{c!r} (columns: {cross_pairs.columns}); pass "
                "new_id_col/landed_id_col to name the edge endpoints"
            )
    if new_pairs is None:
        new_pairs = spark.createDataFrame([], "a bigint, b bigint")
    comp = connected_components(new_pairs, new_nodes, id_col=id_col)
    # (new id, frozen rep) for every cross edge, then the component-wide
    # minimum inherited rep
    anchors = (
        cross_pairs.select(
            F.col(new_id_col).alias(id_col),
            F.col(landed_id_col).cast("bigint").alias("__landed"),
        )
        .join(
            frozen_labels.select(
                F.col(id_col).alias("__landed"),
                F.col(rep_col).alias("__rep"),
            ),
            "__landed",
        )
        .select(id_col, "__rep")
    )
    comp_anchor = (
        comp.join(anchors, id_col)
        .groupBy("cluster_id")
        .agg(F.min("__rep").alias("__anchor"))
    )
    return (
        comp.join(comp_anchor, "cluster_id", "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__anchor"), F.col("cluster_id"))
            .cast("bigint")
            .alias(rep_col),
        )
    )
