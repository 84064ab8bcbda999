"""LIVE incremental dedup: the streaming serve-side of the day-0 freeze.

examples/incremental_dedup_daily.py freezes the landed corpus's dedup
state (digest index + param-tagged MinHash signature artifact) and
probes a BATCH increment; this example serves the same state against a
STREAM of arriving documents — the shape a continuously-fed ingest
pipeline actually runs:

    arrivals (readStream)
      ├─ exact:  md5 digest → stream-static left join vs digest index
      │          (streaming_incremental_dedup — stateless beyond the
      │           optional within-stream watermarked digest dedup)
      └─ near:   stateless per-doc MinHash signature (pure codegen
                 projection) → band → stream-static join vs the LOADED
                 signature artifact (streaming_lsh_probe); the per-band
                 match rows collapse to distinct pairs in foreachBatch
                 (the two-tier discipline — a global distinct would be
                 unbounded stream state)

Nothing corpus-sized moves: the landed text is never re-read, the
arrivals carry a digest + num_hashes longs into the joins, and both
sinks land through the engine's partitioned parquet writer.

Run: python examples/streaming_incremental_probe.py [sf_dir] [state_dir] [out_dir]
(builds the day-0 state first if the artifact is missing).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, functions as F

NUM_HASHES, SHINGLE_K, BAND_SIZE = 8, 5, 2


def serve_stream(
    spark,
    arrivals: DataFrame,
    state_dir: str,
    out_dir: str,
) -> "tuple[object, object]":
    """Wire both probes over an arriving-documents stream; returns the
    two started queries (exact, near). ``arrivals`` must be a streaming
    DataFrame with (doc_id, text)."""
    from xena_gdc_etl_spark.sources.minhash_index import load_minhash_index
    from xena_gdc_etl_spark.streaming import (
        streaming_incremental_dedup,
        streaming_lsh_probe,
    )

    digest_index = spark.read.parquet(
        os.path.join(state_dir, "digest_index.parquet")
    )
    landed_sigs, _ = load_minhash_index(
        spark,
        os.path.join(state_dir, "minhash"),
        num_hashes=NUM_HASHES,
        shingle_k=SHINGLE_K,
        band_size=BAND_SIZE,
    )

    exact = streaming_incremental_dedup(arrivals, digest_index)
    exact_q = (
        exact.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "exact"))
        .option(
            "checkpointLocation", os.path.join(out_dir, "_ckpt_exact")
        )
        .trigger(availableNow=True)
        .start()
    )

    near = streaming_lsh_probe(
        arrivals, landed_sigs,
        num_hashes=NUM_HASHES, band_size=BAND_SIZE, shingle_k=SHINGLE_K,
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # the tiny per-micro-batch distinct-pair collapse (two-tier
        # discipline: the stream emits one row per matching band)
        batch_df.select("new_id", "landed_id").distinct().write.mode(
            "append"
        ).parquet(os.path.join(out_dir, "near"))

    near_q = (
        near.writeStream.foreachBatch(_sink)
        .option(
            "checkpointLocation", os.path.join(out_dir, "_ckpt_near")
        )
        .trigger(availableNow=True)
        .start()
    )
    return exact_q, near_q


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from xena_gdc_etl_spark.catalog import Catalog
    from xena_gdc_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    state = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dedup_state"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/dedup_serve"
    spark = get_spark(app_name="streaming-incremental-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = Catalog(spark, sf_dir).documents
    if not os.path.exists(os.path.join(state, "minhash", "_minhash.json")):
        from examples.incremental_dedup_daily import day0_snapshot

        day0_snapshot(spark, docs.filter(F.col("doc_id") % 5 == 0), state)

    # replay today's arrivals as a file stream
    arrivals_dir = os.path.join(out, "_arrivals")
    docs.filter(F.col("doc_id") % 5 != 0).select("doc_id", "text").write.mode(
        "overwrite"
    ).parquet(arrivals_dir)
    arrivals = spark.readStream.schema("doc_id long, text string").parquet(
        arrivals_dir
    )

    exact_q, near_q = serve_stream(spark, arrivals, state, out)
    exact_q.awaitTermination(600)
    near_q.awaitTermination(600)
    n_exact = (
        spark.read.parquet(os.path.join(out, "exact"))
        .filter(F.col("dup_of").isNotNull())
        .count()
    )
    n_near = spark.read.parquet(os.path.join(out, "near")).count()
    print(
        f"served stream: {n_exact} exact dups, "
        f"{n_near} distinct near-dup candidate pairs vs landed state"
    )


if __name__ == "__main__":
    main()
