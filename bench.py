#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from xena_gdc_etl_spark.session import get_spark  # noqa: E402
from xena_gdc_etl_spark.workload import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# Per-query trials; the reported time is the MIN. One-shot timing charges
# whole-stage-codegen compilation (seconds of javac/JIT for the biggest
# plans) to whichever query compiles it first — min-of-N measures the
# steady-state plan cost, which is what regressions against BASELINE.md
# are judged on. BASELINE.md has always been per-query best-of-N.
TRIALS = max(1, int(os.environ.get("SPARK_GRAFT_TRIALS", "2")))


def infer_sf(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


def main() -> None:
    spark = get_spark(
        app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    # Warm the session so no single query is charged for one-time init:
    # JVM/codegen, the parquet reader path, and the Arrow Python worker pool
    # (reused across queries once started).
    spark.range(1).count()
    region = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    # compile the hash-agg and join codegen paths on 5 rows
    region.groupBy("r_name").count().count()
    region.join(
        region.select(region["r_regionkey"].alias("rk")),
        region["r_regionkey"] == F.col("rk"),
    ).count()

    def _identity(batches):
        yield from batches

    spark.range(int(CPUS) * 2).repartition(int(CPUS)).mapInPandas(
        _identity, schema="id long"
    ).count()
    # JIT-warm the JVM paths the workload leans on (java.util.regex, hash
    # digests, higher-order array funcs, window frames): first use costs
    # seconds of HotSpot warmup that says nothing about plan quality.
    from pyspark.sql import Window

    warm = spark.range(2000).select(
        F.col("id"), F.concat(F.lit("a b1 c,d "), F.col("id").cast("string")).alias("t")
    )
    warm.select(
        F.regexp_replace(F.regexp_replace("t", r"[^a-z0-9\s]", ""), r"\s+", " ").alias("r"),
        F.regexp_count("t", F.lit(r"[A-Za-z]+|[0-9]")).alias("c"),
        F.md5("t").alias("h"),
        F.sha2("t", 256).alias("s"),
        F.xxhash64("t", "id").alias("x"),
        F.aggregate(
            F.filter(F.split("t", r"\s+"), lambda x: x != ""),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + F.length(x),
        ).alias("agg"),
        F.row_number().over(Window.partitionBy(F.col("id") % 8).orderBy("id")).alias("rn"),
    ).count()
    # Materialize the shared minhash signature table up front and report it
    # as its own line: four family queries start from it, and whichever ran
    # first used to absorb the whole build cost — making per-query numbers
    # incomparable across rounds (the attribution drift flagged in round 2).
    from xena_gdc_etl_spark.workload import (
        _shared_dup_pairs,
        _shared_ivf_assigned,
        _shared_lsh_pairs,
        _shared_signatures,
    )

    start = time.perf_counter()
    _shared_signatures(spark, SF_DIR).count()
    timings["shared_signatures_warm"] = round(time.perf_counter() - start, 4)
    # ...and the LSH candidate-pair expansion three queries read off it.
    start = time.perf_counter()
    _shared_lsh_pairs(spark, SF_DIR).count()
    timings["shared_lsh_pairs_warm"] = round(time.perf_counter() - start, 4)
    # Same attribution story for the embedding family (ann_ivf,
    # embed_cosine_dup, semantic_dedup): the shared IVF assignment is
    # materialized once per session; report its build as its own line.
    start = time.perf_counter()
    _shared_ivf_assigned(spark, SF_DIR).count()
    timings["shared_ivf_warm"] = round(time.perf_counter() - start, 4)
    # ...and the τ-pair frame both embed_cosine_dup and semantic_dedup
    # read (embed_cosine_dup IS this frame; semantic_dedup clusters it).
    start = time.perf_counter()
    _shared_dup_pairs(spark, SF_DIR).count()
    timings["shared_pairs_warm"] = round(time.perf_counter() - start, 4)

    def consume(df) -> int:
        """Full-row consumer: xxhash64 over EVERY column, folded to one
        row. A bare count() lets Catalyst prune unused projections, so
        projection-heavy queries (scrub_pii, doc_fingerprint, snv_vaf)
        timed as near no-ops; the driver's gate hashes every value, and
        the bench should cost what the driver costs.
        """
        h = F.xxhash64(*[F.col(c) for c in df.columns])
        row = df.select(h.alias("__h")).agg(
            F.count("__h").alias("n"), F.bit_xor("__h")  # xor: no overflow
        ).collect()[0]
        return row["n"]

    for name, fn in QUERIES.items():
        best = float("inf")
        for _ in range(TRIALS):
            start = time.perf_counter()
            consume(fn(spark, SF_DIR))
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 4)
    # Host-drift sentinel: re-time the flagship AFTER the whole run. q1's
    # plan has been byte-stable since round 1, so (a) q1_end_repeat vs the
    # in-order q1 line exposes WITHIN-run host drift, and (b) its value is
    # comparable ACROSS rounds to normalize totals for shared-host speed —
    # round-5 measured the same binary 1.3-2x apart days apart
    # (BASELINE.md round-5 appendix). A real query, not a synthetic probe:
    # JVM microbenchmarks were observed eliding synthetic hash loops.
    start = time.perf_counter()
    consume(QUERIES["q1_pricing_summary"](spark, SF_DIR))
    timings["q1_end_repeat"] = round(time.perf_counter() - start, 4)
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "workload_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": infer_sf(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
