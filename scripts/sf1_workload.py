#!/usr/bin/env python
"""sf1 FULL-WORKLOAD scaling lane (round-9 task 8).

The 2× performance gate is defended at sf0.1, where half the rows are
sub-second noise; this lane measures how the MOST EXPENSIVE workload
queries scale to a 10× (sf1-equivalent) fixture and reports a per-query
scaling exponent: e = log(t_sf1 / t_sf0.1) / log(10). Linear scaling
(shuffle- and scan-bound plans) shows e ≈ 1; e > 1 flags a superlinear
stage that would not survive the next 100×.

Unlike scripts/sf1_stress.py (a deliberate WORST-CASE dedup fixture —
every doc ships with 9 near-copies), this fixture preserves the sf0.1
duplicate/neighbor structure so the scaling exponent measures plan
behavior, not output-cardinality blowup:

- documents: copy i>0 suffixes EVERY token with "_i", making copies
  token-disjoint (no cross-copy shingle/minhash/ngram collisions; the
  within-copy duplicate structure of sf0.1 replicates verbatim).
- embeddings: copy i>0 shifts the first coordinate by 0.37·i — far
  outside every cosine threshold the workload uses, so near-neighbor
  sets stay per-copy.
- lineitem/orders/customer/supplier/part/events: keys offset by
  i·STRIDE so per-key group sizes and join fan-outs stay constant
  (the TPC-H scaling model: more keys, not denser keys).
- region/nation: fixed dims, copied as-is.

Run: python scripts/sf1_workload.py [sf_dir] [work_dir] [q1 q2 ...]
Prints one JSON line per query plus a final summary table (also written
to sf1_workload.json next to this script).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

COPIES = 10
STRIDE = 10_000_000

# Default lane: the most expensive rows of the §r9 gate table (queries
# only — the shared warm stages are timed separately per sf_dir below).
DEFAULT_QUERIES = [
    "rolling_avg_sharded",
    "containment_pairs",
    "ngram_jaccard",
    "dup_spans",
    "bigram_lm_score",
    "ann_ivf_pq",
    "simhash_pairs",
    "contamination",
    "postprocess_dedup",
    "vocab_overlap",
]


def _replicate(df, id_shifts: dict, text_suffix_col: str | None = None):
    """COPIES stacked copies; integer key columns in ``id_shifts`` get
    +i·STRIDE; ``text_suffix_col`` (if set) gets every token suffixed
    with _i on copies i>0 (token-disjoint, structure-preserving)."""
    parts = []
    for i in range(COPIES):
        sel = []
        for c in df.columns:
            col = F.col(c)
            if c in id_shifts:
                col = (col + F.lit(i * STRIDE)).alias(c)
            elif c == text_suffix_col and i > 0:
                col = F.array_join(
                    F.transform(
                        F.split(c, " "),
                        lambda w: F.concat(w, F.lit(f"_{i}")),
                    ),
                    " ",
                ).alias(c)
            else:
                col = col.alias(c)
            sel.append(col)
        parts.append(df.select(*sel))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_fixture(spark, sf_dir: str, work_dir: str) -> None:
    from xena_gdc_etl_spark.catalog import Catalog

    cat = Catalog(spark, sf_dir)
    plans = {
        "region": cat.region,
        "nation": cat.nation,
        "customer": _replicate(cat.customer, {"c_custkey"}),
        "supplier": _replicate(cat.supplier, {"s_suppkey"}),
        "part": _replicate(cat.part, {"p_partkey"}),
        "orders": _replicate(cat.orders, {"o_orderkey", "o_custkey"}),
        "lineitem": _replicate(
            cat.lineitem, {"l_orderkey", "l_partkey", "l_suppkey"}
        ),
        "events": _replicate(cat.events, {"event_id", "user_id"}),
        "documents": _replicate(
            cat.documents, {"doc_id"}, text_suffix_col="text"
        ).withColumn("n_chars", F.length("text").cast("long")),
        "embeddings": None,  # built below (coordinate shift)
    }
    emb_parts = []
    for i in range(COPIES):
        shift = F.lit(0.37 * i)
        emb_parts.append(
            cat.embeddings.select(
                (F.col("vec_id") + F.lit(i * STRIDE)).alias("vec_id"),
                F.concat(
                    F.transform(
                        F.slice("embedding", 1, 1),
                        lambda x: (x + shift).cast("float"),
                    ),
                    F.slice(
                        "embedding", 2, F.size("embedding") - F.lit(1)
                    ).cast("array<float>"),
                ).alias("embedding"),
                "label",
            )
        )
    emb = emb_parts[0]
    for p in emb_parts[1:]:
        emb = emb.unionByName(p)
    plans["embeddings"] = emb
    for name, df in plans.items():
        path = os.path.join(work_dir, f"{name}.parquet")
        n_out = 32 if name in ("lineitem", "orders", "events",
                               "documents", "embeddings") else 1
        df.repartition(n_out).write.mode("overwrite").parquet(path)


def _warm_shared(spark, sf_dir: str, timings: dict) -> None:
    from xena_gdc_etl_spark import workload as wl

    for label, fn in (
        ("shared_signatures_warm", wl._shared_signatures),
        ("shared_lsh_pairs_warm", wl._shared_lsh_pairs),
        ("shared_ivf_warm", wl._shared_ivf_assigned),
        ("shared_pairs_warm", wl._shared_dup_pairs),
        ("shared_tf_warm", wl._shared_doc_tf),
        ("shared_pack_warm", wl._shared_pack_layout),
    ):
        start = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[label] = round(time.perf_counter() - start, 3)


def main() -> None:
    from xena_gdc_etl_spark.session import get_spark
    from xena_gdc_etl_spark.workload import QUERIES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_workload"
    names = sys.argv[3:] or DEFAULT_QUERIES
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    os.makedirs(work, exist_ok=True)

    spark = get_spark(
        app_name="sf1-workload", master="local[32]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    build_fixture(spark, sf_dir, work)
    print(json.dumps({"stage": "build_fixture",
                      "sec": round(time.perf_counter() - t0, 2)}))

    def consume(df) -> int:
        # the bench's full-row hash consumer: Catalyst can't prune
        h = F.xxhash64(*[F.col(c) for c in df.columns])
        row = df.select(h.alias("__h")).agg(
            F.count("__h").alias("n"), F.bit_xor("__h")
        ).collect()[0]
        return row["n"]

    results: dict[str, dict] = {}
    for scale, d in (("sf0.1", sf_dir), ("sf1", work)):
        warm: dict[str, float] = {}
        _warm_shared(spark, d, warm)
        print(json.dumps({"scale": scale, "shared_warms": warm}))
        for label, sec in warm.items():
            results.setdefault(label, {})[scale] = sec
        for name in names:
            best, n = float("inf"), -1
            for _ in range(2):
                start = time.perf_counter()
                n = consume(QUERIES[name](spark, d))
                best = min(best, time.perf_counter() - start)
            results.setdefault(name, {})[scale] = round(best, 3)
            results[name][f"rows_{scale}"] = n
            print(json.dumps({"scale": scale, "query": name,
                              "sec": results[name][scale], "rows": n}))

    for name, r in results.items():
        if "sf0.1" in r and "sf1" in r and r["sf0.1"] > 0:
            ratio = r["sf1"] / r["sf0.1"]
            r["ratio"] = round(ratio, 2)
            r["exponent"] = round(math.log(max(ratio, 1e-9)) / math.log(10), 2)

    out = {"metric": "sf1_workload", "copies": COPIES, "results": results}
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", "sf1_workload.json"),
        "w",
    ) as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
