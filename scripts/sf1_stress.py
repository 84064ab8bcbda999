#!/usr/bin/env python
"""sf1-equivalent stress run for the dedup + similarity families.

The plan-shape tests prove the 100 TB posture symbolically; this script
EXECUTES the LSH/IVF pipelines at ~10× the bench scale factor (a
deterministic sf1-equivalent fixture derived from sf0.1) and reports
per-stage wall times + result invariants. No oracle — at this scale the
checks are structural: row counts, pair-set bounds, cluster sanity.

Fixture construction (deterministic, no RNG): each sf0.1 document is
replicated ``COPIES`` times; copy 0 is verbatim, copy i>0 gets a short
``v{i}`` prefix — so every document ships with COPIES-1 true near-dups,
which is a WORST-CASE dedup load (every LSH bucket is hot, every cluster
is real). Embeddings are replicated with one coordinate deterministically
nudged per copy, preserving near-neighbour structure for the IVF path.

Run: python scripts/sf1_stress.py [sf_dir] [work_dir]
Prints one JSON object per stage plus a final summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

COPIES = 10
ID_STRIDE = 10_000_000


def build_fixture(spark, sf_dir: str, work_dir: str) -> tuple[str, str]:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    doc_parts = []
    emb_parts = []
    for i in range(COPIES):
        off = F.lit(i * ID_STRIDE)
        prefix = F.lit("" if i == 0 else f"v{i} ")
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + off).alias("doc_id"),
                F.concat(prefix, F.col("text")).alias("text"),
                "lang",
                "source",
                (F.length(F.concat(prefix, F.col("text")))).alias("n_chars"),
            )
        )
        nudge = F.lit(float(i) * 1e-3)
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + off).alias("vec_id"),
                F.concat(
                    F.slice("embedding", 1, 1).cast("array<float>"),
                    F.transform(
                        F.slice(
                            "embedding", 2, F.size("embedding") - F.lit(1)
                        ),
                        lambda x: (x + nudge).cast("float"),
                    ),
                ).alias("embedding"),
                "label",
            )
        )
    big_docs = doc_parts[0]
    for p in doc_parts[1:]:
        big_docs = big_docs.unionByName(p)
    big_emb = emb_parts[0]
    for p in emb_parts[1:]:
        big_emb = big_emb.unionByName(p)
    dpath = os.path.join(work_dir, "documents.parquet")
    epath = os.path.join(work_dir, "embeddings.parquet")
    big_docs.repartition(32).write.mode("overwrite").parquet(dpath)
    big_emb.repartition(32).write.mode("overwrite").parquet(epath)
    return dpath, epath


def main() -> None:
    from xena_gdc_etl_spark.operators import dedup as dd
    from xena_gdc_etl_spark.operators import similarity as sim
    from xena_gdc_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_stress"
    os.makedirs(work, exist_ok=True)
    spark = get_spark(
        app_name="sf1-stress", master="local[32]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")

    stages: dict[str, float] = {}
    facts: dict[str, int] = {}

    def stage(name: str, fn):
        start = time.perf_counter()
        out = fn()
        stages[name] = round(time.perf_counter() - start, 2)
        print(json.dumps({"stage": name, "sec": stages[name], "n": out}))
        return out

    dpath, epath = build_fixture(spark, sf_dir, work)
    docs = spark.read.parquet(dpath)
    emb = spark.read.parquet(epath)
    facts["n_docs"] = docs.count()
    facts["n_vecs"] = emb.count()

    # --- dedup family -----------------------------------------------------
    sig = dd.minhash_signatures(
        dd.shingles(docs, k=5, distinct=False), num_hashes=8
    ).persist()
    facts["n_sigs"] = stage("signatures_build", sig.count)
    assert facts["n_sigs"] == facts["n_docs"]

    # worst-case buckets (every doc has 9 near-copies) → cap is load-bearing
    pairs = dd.lsh_candidate_pairs(
        sig, num_hashes=8, band_size=2, max_bucket_size=512
    ).persist()
    facts["n_pairs"] = stage("lsh_candidate_pairs", pairs.count)
    # Pigeonhole upper bound from the cap: per band each doc sits in ONE
    # bucket of ≤512 members, so a band emits at most n_docs·(cap−1)/2
    # pairs; 8 hashes / band_size 2 = 4 bands. (Cross-band dedup only
    # lowers the count.) A blown cap — the failure mode this fixture is
    # built to provoke — breaks this bound loudly.
    n_bands = 8 // 2
    pair_bound = n_bands * facts["n_docs"] * (512 - 1) // 2
    assert 0 < facts["n_pairs"] <= pair_bound, (facts["n_pairs"], pair_bound)
    facts["pair_bound"] = pair_bound

    # --- distributed CC on the UNGATED candidate set (round-9 task 6) ---
    # The 1M-edge driver cap exists to divert exactly THIS load: the raw
    # LSH candidate pair set before the Jaccard gate (~8.5M pairs on this
    # fixture). Run the alternating-star path on it at the DEFAULT cap
    # (which diverts naturally, no forcing) and pin its keep count to the
    # driver union-find on the same edges (cap lifted above the set size).
    def _cc_ungated_distributed() -> int:
        st: dict = {}
        lab = dd.connected_components(
            pairs.select("a", "b"), docs, stats=st
        )
        n = lab.filter(F.col("doc_id") == F.col("cluster_id")).count()
        _ug = facts.setdefault("_ungated", {})
        _ug["stats"] = st
        return n

    facts["n_keeps_ungated_distributed"] = stage(
        "cc_ungated_distributed(>2M edges)", _cc_ungated_distributed
    )
    ug_stats = facts.pop("_ungated")["stats"]
    assert ug_stats["path"] == "distributed_alternating_star", ug_stats
    print(json.dumps({"ungated_cc_stats": ug_stats}))
    facts["ungated_cc_rounds"] = ug_stats["rounds"]

    def _cc_ungated_driver() -> int:
        lab = dd.connected_components(
            pairs.select("a", "b"), docs, driver_max_edges=50_000_000
        )
        return lab.filter(F.col("doc_id") == F.col("cluster_id")).count()

    facts["n_keeps_ungated_driver"] = stage(
        "cc_ungated_driver_unionfind", _cc_ungated_driver
    )
    assert (
        facts["n_keeps_ungated_distributed"]
        == facts["n_keeps_ungated_driver"]
    ), (
        facts["n_keeps_ungated_distributed"],
        facts["n_keeps_ungated_driver"],
    )

    strong = dd.minhash_jaccard_estimate(
        pairs, sig, num_hashes=8, threshold=0.75
    ).persist()
    facts["n_strong"] = stage("jaccard_gate", strong.count)
    assert facts["n_strong"] <= facts["n_pairs"]

    # constructed INSIDE the timer (once): the driver union-find fallback
    # (and the distributed loop's eager checkpoints) run at construction
    # time, so building outside the stage would hide the labeling cost
    _cc: dict = {}

    def _cc_count() -> int:
        _cc["df"] = dd.connected_components(strong.select("a", "b"), docs)
        return _cc["df"].count()

    facts["n_clustered"] = stage("connected_components", _cc_count)
    clusters = _cc["df"]

    # distributed-CC stress lane: at this scale the edge set (~0.7M)
    # falls under the 1M driver cap, so the 100 TB min-label path would
    # otherwise never execute above unit-test scale — force it with
    # driver_max_edges=0 and pin its keep count to the fallback's
    _cc["fallback_keeps"] = clusters.filter(
        F.col("doc_id") == F.col("cluster_id")
    ).count()

    def _cc_distributed() -> int:
        st: dict = {}
        lab = dd.connected_components(
            strong.select("a", "b"), docs, driver_max_edges=0, stats=st
        )
        n = lab.filter(F.col("doc_id") == F.col("cluster_id")).count()
        _cc["dist_stats"] = st
        return n

    facts["n_keeps_distributed_cc"] = stage(
        "connected_components_distributed", _cc_distributed
    )
    print(json.dumps({"distributed_cc_stats": _cc["dist_stats"]}))
    assert facts["n_keeps_distributed_cc"] == _cc["fallback_keeps"], (
        facts["n_keeps_distributed_cc"],
        _cc["fallback_keeps"],
    )
    facts["n_keeps_cc"] = _cc["fallback_keeps"]

    # keep-longest per cluster: the aggregate argmax (map-side partial),
    # same shape as workload.dedup_keep_best
    keep = (
        clusters.join(
            docs.select("doc_id", F.length("text").alias("__len")), "doc_id"
        )
        .groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(F.col("__len"), (-F.col("doc_id")).alias("nid"))
            ).alias("b")
        )
    )
    facts["n_keep"] = stage("keep_best", keep.count)
    assert facts["n_keep"] <= facts["n_clustered"]

    fp = dd.simhash(docs).persist()
    facts["n_fp"] = stage("simhash_fingerprints", fp.count)
    sp = dd.simhash_pairs(fp, max_bucket_size=512)
    facts["n_simhash_pairs"] = stage("simhash_pairs", sp.count)
    exact = dd.dedup_exact(docs)
    facts["n_exact_groups"] = stage("dedup_exact", exact.count)

    # --- similarity family -------------------------------------------------
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = sim.ivf_assign(emb, centroids).persist()
    facts["n_assigned"] = stage("ivf_assign", assigned.count)
    assert facts["n_assigned"] == facts["n_vecs"]

    dup_pairs = sim.cosine_dup_pairs(assigned, threshold=0.995).persist()
    facts["n_dup_pairs"] = stage("cosine_dup_pairs@0.995", dup_pairs.count)

    # semantic_dedup returns (id, cluster_id, keep) for ALL ids — the
    # collapse invariant is the KEEP count, not the row count (which is
    # n_vecs by contract). On this fixture every vector ships with 9
    # deliberate near-copies, so the keeps must collapse well below the
    # input; ≤ 40% is a loose ceiling for a 10-copy fixture (a perfect
    # collapse is 10%; imperfect IVF cell splits can only raise it).
    def _sem_keeps() -> int:
        sem = sim.semantic_dedup(assigned, threshold=0.995, pairs=dup_pairs)
        return sem.filter(F.col("keep") == 1).count()

    facts["n_sem_keep"] = stage("semantic_dedup_keep", _sem_keeps)
    assert 0 < facts["n_sem_keep"] <= int(0.4 * facts["n_vecs"]), (
        facts["n_sem_keep"],
        facts["n_vecs"],
    )

    # deliberate cost-ceiling variant: cap cells at 512 members and use
    # the accounting API to report HOW MANY cells the cap excluded — the
    # "no silent caps" discipline (SURVEY §6) exercised at stress scale
    facts["n_capped_cells"] = stage(
        "capped_cell_count@512",
        lambda: sim.capped_cell_count(assigned, max_cell_size=512),
    )
    capped_pairs = sim.cosine_dup_pairs(
        assigned, threshold=0.995, max_cell_size=512
    )
    facts["n_dup_pairs_capped"] = stage(
        "cosine_dup_pairs@0.995,cap=512", capped_pairs.count
    )
    assert facts["n_dup_pairs_capped"] <= facts["n_dup_pairs"]
    if facts["n_capped_cells"] == 0:
        assert facts["n_dup_pairs_capped"] == facts["n_dup_pairs"]

    facts["n_trained_centroids"] = stage(
        "ivf_train(k=16,3it)",
        lambda: sim.ivf_train(emb, k=16, iterations=3).count(),
    )

    total = round(sum(stages.values()), 2)
    print(
        json.dumps(
            {
                "metric": "sf1_stress_total",
                "value": total,
                "unit": "sec",
                "stages": stages,
                "facts": facts,
            }
        )
    )


if __name__ == "__main__":
    main()
