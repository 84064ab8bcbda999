"""End-to-end corpus curation: the LLM-training-data pipeline composed from
the engine's operators, as one lazy-until-write Spark job.

    raw documents
      → quality_filter          (C4/Gopher rule chain, scan-stage predicates)
      → dedup: exact hash       (drop byte-identical copies)
      → dedup: MinHash clusters (near-dups → keep longest per cluster)
      → contamination guard     (drop docs overlapping the held-out set)
      → mixture rebalance       (downsample over-represented sources)
      → quality-weighted sample (importance sampling by quality score)
      → leakage-safe split      (train/valid/test keyed on near-dup cluster)
      → sequence_pack           (concat-and-chunk pack layout)
      → partitioned parquet     (hive-partitioned by source)

Every stage is a DataFrame transformation — Catalyst sees the whole
pipeline, so filters push into the scan and the only shuffles are the ones
the semantics require (dedup groupBys, the CC rounds, the pack window).

Run: python examples/corpus_curation.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def preflight_bucket_cap(
    docs: DataFrame,
    hot_share: float = 0.01,
    cap: int = 64,
) -> "int | None":
    """Skew pre-flight on the dedup key — run BEFORE shipping the LSH job
    (operators/skew.py heavy_hitters is built for exactly this). Profiles
    the content-hash key: if any single hash holds ≥ ``hot_share`` of the
    corpus, the corpus is template-heavy — its LSH buckets will be
    degenerate hot keys — so the pipeline branches to the pre-expansion
    ``max_bucket_size`` cap (SURVEY §6 cap table). A healthy long-tail
    key profile keeps the exact default (no cap). Bounded: heavy_hitters
    collapses to one row per distinct key map-side and collects k=1 rows.
    """
    from xena_gdc_etl_spark.operators.skew import heavy_hitters

    top = heavy_hitters(
        docs.select(F.md5("text").alias("__h")), ["__h"], k=1
    ).collect()
    if top and top[0]["share"] >= hot_share:
        print(
            f"preflight: hottest content hash holds "
            f"{top[0]['share']:.1%} of the corpus (>= {hot_share:.1%}) — "
            f"capping LSH buckets at {cap}"
        )
        return cap
    return None


def curate(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    pack_budget: int = 256,
    hot_share: float = 0.01,
) -> DataFrame:
    """Returns the curated, packed corpus; writes it when out_dir is set."""
    from xena_gdc_etl_spark.catalog import Catalog
    from xena_gdc_etl_spark.operators import dedup as dd
    from xena_gdc_etl_spark.operators import text as tx

    docs = Catalog(spark, sf_dir).documents

    # 0. skew pre-flight on the dedup key (before any heavy job ships):
    #    template-heavy corpus → pre-expansion LSH bucket cap
    bucket_cap = preflight_bucket_cap(docs, hot_share=hot_share)

    # 1. rule-chain quality filter (keeps doc_id only; rejoin text below so
    #    the heavy column rides through as few stages as possible)
    kept = tx.quality_filter(docs).select("doc_id")
    docs = docs.join(kept, "doc_id", "left_semi")

    # 2. exact dedup: keep the smallest doc_id per content hash
    exact_keep = dd.dedup_exact(docs).select(
        F.col("keep_id").alias("doc_id")
    )
    docs = docs.join(exact_keep, "doc_id", "left_semi")

    # 3. near-dedup: MinHash → LSH candidates → Jaccard-estimate GATE →
    #    connected components over the strong pairs → keep the longest
    #    member of every cluster. The gate matters: raw bucket-sharing is a
    #    RECALL device (candidates), not a similarity verdict — clustering
    #    ungated buckets chains a low-diversity corpus into one giant
    #    component and deletes nearly everything.
    sig = dd.minhash_signatures(
        dd.shingles(docs, k=5, distinct=False), num_hashes=8
    ).localCheckpoint(eager=True)
    pairs = dd.lsh_candidate_pairs(
        sig, num_hashes=8, band_size=2, max_bucket_size=bucket_cap
    )
    strong = dd.minhash_jaccard_estimate(
        pairs, sig, num_hashes=8, threshold=0.75
    )
    clusters = dd.connected_components(strong.select("a", "b"), docs)
    # keep-longest via aggregate argmax (max over a lexicographic struct,
    # map-side partial) — a per-cluster window would single-task a
    # mega-cluster of boilerplate docs at scale
    near_keep = (
        clusters.join(
            docs.select("doc_id", F.length("text").alias("__len")), "doc_id"
        )
        .groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(F.col("__len"), (-F.col("doc_id")).alias("nid"))
            ).alias("b")
        )
        .select((-F.col("b.nid")).alias("doc_id"))
    )
    docs = docs.join(near_keep, "doc_id", "left_semi")

    # 4. contamination guard: drop training docs sharing ≥20% of their
    #    word trigrams with the held-out slice (here: doc_id % 10 == 7)
    heldout = Catalog(spark, sf_dir).documents.filter(
        F.col("doc_id") % 10 == 7
    )
    contam = dd.ngram_contamination(docs, heldout, n=3)
    clean_ids = contam.filter(F.col("contam_frac") < 0.2).select("doc_id")
    docs = docs.join(clean_ids, "doc_id", "left_semi")

    # 5. data mixing: cap over-represented sources at 2× the smallest
    #    source's share, then keep long-enough documents at a rate
    #    proportional to a simple quality weight (deterministic hash
    #    sampling both times — reproducible on any engine/cluster layout)
    from xena_gdc_etl_spark.operators.sampling import (
        rebalance_groups,
        weighted_sample,
    )

    n_sources = docs.select("source").distinct().count()
    docs = rebalance_groups(
        docs,
        "source",
        "doc_id",
        target={
            r.source: 2.0 / max(n_sources, 2)
            for r in docs.select("source").distinct().collect()
        },
    )
    docs = weighted_sample(
        docs, "doc_id", F.least(F.length("text") / 200.0, F.lit(1.0))
    )

    # 6. leakage-safe split: train/valid/test keyed on the near-dup
    #    CLUSTER id (reusing the cluster labels from stage 3), so no
    #    duplicate family ever straddles train/eval — the assignment is a
    #    zero-shuffle hash projection
    from xena_gdc_etl_spark.operators.sampling import split_assign

    docs = docs.join(
        split_assign(clusters, "cluster_id").select("doc_id", "split"),
        "doc_id",
    )

    # 7. pack layout: chunk index + offset under concat-and-chunk, via the
    #    two-pass sharded prefix scan (operators/prefix.py) so no task ever
    #    holds a whole source
    from xena_gdc_etl_spark.operators.prefix import group_prefix_sum
    from xena_gdc_etl_spark.operators.text import WS_RE

    toks = docs.select(
        "doc_id",
        "source",
        "split",
        "text",
        F.size(F.filter(F.split("text", WS_RE), lambda t: t != ""))
        .cast("bigint")
        .alias("n_tokens"),
    )
    packed = group_prefix_sum(
        # pack WITHIN (source, split): a pack that mixed train and eval
        # docs would defeat the leakage-safe split at training time
        toks, ["source", "split"], ["doc_id"], "n_tokens", "__cum"
    ).withColumn(
        "__start", F.col("__cum") - F.col("n_tokens")
    ).select(
        "doc_id",
        "source",
        "split",
        "text",
        "n_tokens",
        F.floor(F.col("__start") / pack_budget).cast("bigint").alias("pack_id"),
        (F.col("__start") % pack_budget).cast("bigint").alias("pack_offset"),
    )

    if out_dir:
        from xena_gdc_etl_spark.sources.parquet_sink import write_partitioned

        write_partitioned(
            packed, out_dir, partition_by=["source", "split"],
            sort_within=["pack_id", "pack_offset"],
        )
    return packed


if __name__ == "__main__":
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from xena_gdc_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark(app_name="corpus-curation")
    spark.sparkContext.setLogLevel("ERROR")
    result = curate(spark, sf_dir, out)
    kept = result.count()
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    print(f"curated corpus: kept {kept}/{total} documents")
