"""Incremental (day-N) dedup against persisted day-N−1 state — the
continuous-ingest loop the `incremental_dedup` query simulates, run
through the DURABLE artifacts instead of rescanning the landed corpus:

    day 0 (snapshot job, once per corpus freeze):
        landed docs → md5 digest index            (exact-dup state)
                    → MinHash signature artifact  (near-dup state,
                      sources/minhash_index.py: params stamped in the
                      sentinel so a future probe can't silently mix
                      hash/shingle/banding settings)

    day N (per increment):
        new docs → digest  → LEFT JOIN digest index     → exact dups
                 → sign ONLY the increment (same params)
                 → lsh_probe_pairs vs loaded signatures → near-dup
                   candidates, landed side never reshingled

At 100 TB the difference is the whole point: the landed corpus's text
is never re-read — the probe touches only the signature table
(num_hashes longs per doc) and the increment's own lineage; the
increment's bucket frame broadcasts, so the landed side never shuffles.

Run: python examples/incremental_dedup_daily.py [sf_dir] [state_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

NUM_HASHES, SHINGLE_K, BAND_SIZE = 8, 5, 2


def day0_snapshot(spark, landed, state_dir: str) -> None:
    """Freeze the landed corpus's dedup state: digest index + signature
    artifact. Both are derived tables orders of magnitude under the text."""
    from xena_gdc_etl_spark.sources import minhash_index as mh

    digest_index = landed.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").cast("bigint").alias("dup_of")
    )
    digest_index.write.mode("overwrite").parquet(
        os.path.join(state_dir, "digest_index.parquet")
    )
    sigs = mh.build_signatures(
        landed, num_hashes=NUM_HASHES, shingle_k=SHINGLE_K
    )
    manifest = mh.save_minhash_index(
        sigs,
        os.path.join(state_dir, "minhash"),
        num_hashes=NUM_HASHES,
        shingle_k=SHINGLE_K,
        band_size=BAND_SIZE,
    )
    print(f"day 0: froze dedup state for {manifest['n_docs']} landed docs")


def dayN_probe(spark, new_docs, state_dir: str):
    """Probe the increment against yesterday's artifacts; returns
    (exact_dups, near_candidates) DataFrames."""
    from xena_gdc_etl_spark.sources import minhash_index as mh

    digest_index = spark.read.parquet(
        os.path.join(state_dir, "digest_index.parquet")
    )
    # no broadcast hint: the digest index is LANDED-corpus-scale (one
    # row per distinct landed text) — at the 100 TB scale this loop is
    # written for, force-broadcasting it is a driver-OOM hazard. AQE
    # broadcasts it while it is genuinely small and shuffles the join
    # once it is not; the day-sized increment side is the broadcast
    # candidate if any.
    exact = (
        new_docs.select("doc_id", F.md5("text").alias("h"))
        .join(digest_index, "h", "left")
        .select("doc_id", "dup_of")
    )
    # the loader refuses an artifact built under other params — change
    # NUM_HASHES/SHINGLE_K/BAND_SIZE here without re-freezing day 0 and
    # this raises instead of producing garbage candidates
    landed_sigs, _ = mh.load_minhash_index(
        spark,
        os.path.join(state_dir, "minhash"),
        num_hashes=NUM_HASHES,
        shingle_k=SHINGLE_K,
        band_size=BAND_SIZE,
    )
    new_sigs = mh.build_signatures(
        new_docs, num_hashes=NUM_HASHES, shingle_k=SHINGLE_K
    )
    near = mh.lsh_probe_pairs(
        new_sigs, landed_sigs, num_hashes=NUM_HASHES, band_size=BAND_SIZE
    )
    return exact, near


def day0_decisions(spark, landed, state_dir: str) -> None:
    """Freeze the day-0 KEEP DECISIONS (doc_id, cluster_rep) — the third
    artifact: digests answer 'seen before?', signatures answer 'near
    what?', decisions answer 'who is the representative?' so day-N
    arrivals inherit reps instead of re-deriving (and possibly
    flipping) them."""
    from xena_gdc_etl_spark.operators import dedup as dd
    from xena_gdc_etl_spark.sources import dedup_state as ds

    sigs = dd.minhash_signatures(
        dd.shingles(landed, k=SHINGLE_K, distinct=False),
        num_hashes=NUM_HASHES,
    )
    pairs = dd.lsh_candidate_pairs(
        sigs, num_hashes=NUM_HASHES, band_size=BAND_SIZE
    )
    labels = dd.connected_components(
        pairs, landed.select("doc_id")
    ).withColumnRenamed("cluster_id", "cluster_rep")
    ds.save_dedup_decisions(
        labels,
        os.path.join(state_dir, "decisions"),
        num_hashes=NUM_HASHES,
        shingle_k=SHINGLE_K,
        band_size=BAND_SIZE,
    )


def dayN_decisions(spark, new_docs, near_pairs, state_dir: str):
    """Label today's arrivals against the frozen decision artifact: an
    arrival near-dupping a landed cluster inherits its representative
    (keep decisions never flip), arrivals clustering among themselves
    get their own stable reps. Returns the increment's decision rows;
    union + re-save rolls the artifact forward."""
    from xena_gdc_etl_spark.operators import dedup as dd
    from xena_gdc_etl_spark.sources import dedup_state as ds

    frozen, _ = ds.load_dedup_decisions(
        spark,
        os.path.join(state_dir, "decisions"),
        num_hashes=NUM_HASHES,
        shingle_k=SHINGLE_K,
        band_size=BAND_SIZE,
    )
    new_sigs = dd.minhash_signatures(
        dd.shingles(new_docs, k=SHINGLE_K, distinct=False),
        num_hashes=NUM_HASHES,
    )
    within = dd.lsh_candidate_pairs(
        new_sigs, num_hashes=NUM_HASHES, band_size=BAND_SIZE
    )
    return ds.incremental_cc_update(
        frozen, new_docs.select("doc_id"), near_pairs, within
    )


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from xena_gdc_etl_spark.catalog import Catalog
    from xena_gdc_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    state = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dedup_state"
    spark = get_spark(app_name="incremental-dedup-daily")
    spark.sparkContext.setLogLevel("ERROR")

    docs = Catalog(spark, sf_dir).documents
    landed = docs.filter(F.col("doc_id") % 5 == 0)   # "yesterday's corpus"
    new_docs = docs.filter(F.col("doc_id") % 5 != 0)  # "today's arrivals"

    day0_snapshot(spark, landed, state)
    day0_decisions(spark, landed, state)
    exact, near = dayN_probe(spark, new_docs, state)
    n_new = new_docs.count()
    n_exact = exact.filter(F.col("dup_of").isNotNull()).count()
    n_near = near.count()
    print(
        f"day N: {n_new} arrivals — {n_exact} exact dups of landed docs, "
        f"{n_near} near-dup candidate pairs vs landed signatures"
    )
    decisions = dayN_decisions(spark, new_docs, near, state)
    n_inherit = decisions.filter(
        F.col("cluster_rep") % 5 == 0  # landed ids are doc_id % 5 == 0
    ).count()
    n_drop = decisions.filter(
        F.col("doc_id") != F.col("cluster_rep")
    ).count()
    print(
        f"day N: {n_inherit} arrivals inherited a landed cluster rep, "
        f"{n_drop} arrivals are drops (doc_id != cluster_rep)"
    )


if __name__ == "__main__":
    main()
