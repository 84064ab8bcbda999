"""LIVE decontamination: the streaming serve-side of a held-out freeze.

An eval suite changes rarely; training documents arrive continuously.
The standing-decontamination loop therefore freezes the held-out
WINNOW FINGERPRINT SET once per suite snapshot (sources/winnow_index.py
— (k, w)-tagged artifact under the house written-last sentinel) and
scores every arriving training doc against it with the winnowing
verbatim-span guarantee (any shared >= k+w-1 token run between an
arrival and the suite shares a fingerprint — the MOSS selector, so a
doc quoting a single eval sentence verbatim is caught even when its
overall gram overlap is tiny):

    held-out suite ──(freeze once)──> fingerprint artifact
    arrivals (readStream)
      └─ winnow selector (pure codegen projection, no state)
         → explode fingerprints
         → stream-static LEFT join vs the LOADED fingerprint set
         → watermarked per-doc windowed aggregate
         → (ws, doc_id, n_fps, n_hit, contam_fp_frac) landed as parquet

Nothing suite-sized moves per arrival: the suite text is never re-read,
the fingerprint set is eval-suite-scaled (broadcast territory), and the
arriving doc carries only its own fingerprints into the join. The
per-doc aggregate is watermark-finalized — append-mode, bounded state.

Run: python examples/streaming_decontamination_serve.py [sf_dir] [state_dir] [out_dir]
(builds the fingerprint artifact first if missing).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, functions as F

K, W = 5, 4


def serve_stream(spark, arrivals: DataFrame, state_dir: str, out_dir: str):
    """Score an arriving (doc_id, text, ts) stream against the frozen
    fingerprint artifact; returns the started query."""
    from xena_gdc_etl_spark.sources.winnow_index import (
        load_winnow_fingerprints,
    )
    from xena_gdc_etl_spark.streaming import (
        streaming_winnow_decontamination,
    )

    held_fps, _ = load_winnow_fingerprints(
        spark, os.path.join(state_dir, "winnow"), k=K, w=W
    )
    scored = streaming_winnow_decontamination(
        arrivals, held_fps, k=K, w=W, window_duration="24 hours"
    )
    return (
        scored.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "scores"))
        .option(
            "checkpointLocation", os.path.join(out_dir, "_ckpt_scores")
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from xena_gdc_etl_spark.catalog import Catalog
    from xena_gdc_etl_spark.session import get_spark
    from xena_gdc_etl_spark.sources.winnow_index import (
        save_winnow_fingerprints,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    state = sys.argv[2] if len(sys.argv) > 2 else "/tmp/decontam_state"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/decontam_serve"
    spark = get_spark(app_name="streaming-decontamination-serve")
    spark.sparkContext.setLogLevel("ERROR")

    docs = Catalog(spark, sf_dir).documents
    heldout = docs.filter(F.col("doc_id") % 10 == 0)
    if not os.path.exists(os.path.join(state, "winnow", "_winnow.json")):
        m = save_winnow_fingerprints(
            heldout, os.path.join(state, "winnow"), k=K, w=W
        )
        print(f"froze held-out fingerprint set: {m['n_fps']} fingerprints")

    # Replay training arrivals as a file stream with an event time.
    # Append-mode watermarked aggregates only EMIT a window once the
    # watermark passes its end — in production later days' arrivals
    # advance it; a bounded replay needs the same signal. TWO staggered
    # next-day heartbeat files follow the day-1 file
    # (maxFilesPerTrigger=1 → separate micro-batches): the watermark a
    # batch evaluates with comes from the PREVIOUS batch's max event
    # time, so heartbeat #1 advances it past the day-1 window and
    # heartbeat #2's batch performs the emit — and availableNow stops
    # after the last file, with no flush batch of its own. Each
    # heartbeat doc is sub-k-token, so it has no fingerprints and never
    # appears in the output.
    arrivals_dir = os.path.join(out, "_arrivals")
    docs.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id", "text",
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    ).coalesce(1).write.mode("overwrite").parquet(arrivals_dir)
    for hb_id, hb_ts in ((-1, "2026-01-03"), (-2, "2026-01-05")):
        spark.createDataFrame(
            [(hb_id, "hb")], "doc_id long, text string"
        ).select(
            "doc_id", "text",
            F.to_timestamp(F.lit(f"{hb_ts} 00:00:00")).alias("ts"),
        ).coalesce(1).write.mode("append").parquet(arrivals_dir)
    arrivals = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals_dir)
    )

    q = serve_stream(spark, arrivals, state, out)
    q.awaitTermination(600)
    scores = spark.read.parquet(os.path.join(out, "scores"))
    n = scores.count()
    n_hit = scores.filter(F.col("n_hit") > 0).count()
    print(
        f"served stream: {n} arrivals scored, {n_hit} carry at least one "
        "held-out fingerprint (verbatim-span suspects)"
    )


if __name__ == "__main__":
    main()
