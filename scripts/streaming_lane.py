#!/usr/bin/env python
"""STREAMING LANE: throughput + bounded-state evidence for the stateful
streaming twins (round 14).

Every batch family in this repo has measured 10x/100x exponents
(BASELINE §sf1 / §sf10-*), but the 19 streaming twins' evidence so far is
CORRECTNESS-shaped: batch equivalence, append-mode liveness, restart
recovery. This lane adds the scale claim a 100 TB/day feed needs:

- **throughput holds as volume grows**: 10x the input volume arrives as
  10x as many micro-batches of the SAME size (the realistic scale-up —
  a production trigger is sized by latency, not by backlog), so
  rows/sec should be flat-or-better (fixed per-batch overhead
  amortizes) — NOT the batch lanes' sub-linear-wall-clock shape;
- **state is bounded by the watermark horizon, not by stream length**:
  max in-flight state rows across the run should be ~scale-invariant
  for the watermarked twins (the fixture's copies are time-disjoint, so
  at any watermark position only ~one copy's windows are live), and
  O(keys) / timeout-evicted for the applyInPandasWithState twins.

Fixture: the sf0.1 events table (100k rows), sorted by event time and
split into fixed-size chronological parquet files (one per micro-batch,
mtimes strictly increasing so FileStreamSource drains them in event-time
order). The x10 side is 10 copies, copy i shifted +i*31 days with
user_id/event_id offset i*10M (per-copy structure identical — the
temporal-fixture discipline of scripts/sf10_spotlane.py). Each twin
drains the directory with trigger(availableNow) + maxFilesPerTrigger=1
into a noop sink; per-batch numInputRows / stateOperators[].numRowsTotal
/ triggerExecution come from the query's progress events.

Results merge into streaming_lane.json at the repo root (same
merge-don't-clobber discipline as sf10_spotlane.json).

Run: python scripts/streaming_lane.py [sf_dir] [work_dir] [twin ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

COPIES = 10
STRIDE = 10_000_000
ROWS_PER_FILE = 10_000  # one micro-batch; constant across scales

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double"
)
DOCS_SCHEMA = "doc_id bigint, ts timestamp, text string"
DOC_ROWS_PER_FILE = 500  # one micro-batch of arriving documents
DOC_TWINS = ("lsh_probe", "winnow_decontam")


def build_fixture(spark, sf_dir: str, work: str, scale: str) -> str:
    """Chronological one-file-per-batch layout; returns the stream dir."""
    out = os.path.join(work, scale)
    done = os.path.join(out, "_FIXTURE_OK")
    if os.path.exists(done):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    base = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
    )
    copies = COPIES if scale == "x10" else 1
    import pandas as pd

    pdf = base.toPandas().sort_values("ts").reset_index(drop=True)
    seq = 0
    for i in range(copies):
        c = pdf.copy()
        if i:
            c["event_id"] += i * STRIDE
            c["user_id"] += i * STRIDE
            c["ts"] = c["ts"] + pd.Timedelta(days=31 * i)
        for lo in range(0, len(c), ROWS_PER_FILE):
            path = os.path.join(out, f"b{seq:05d}.parquet")
            # microsecond physical type: the session reads TIMESTAMP(NANOS)
            # as long (nanosAsLong), which would break the stream schema
            c.iloc[lo : lo + ROWS_PER_FILE].to_parquet(
                path,
                index=False,
                coerce_timestamps="us",
                allow_truncated_timestamps=True,
            )
            # strictly increasing mtimes: FileStreamSource takes files
            # oldest-first, so batches arrive in event-time order and
            # the watermark advances (and evicts) as it would live
            os.utime(path, (1_700_000_000 + seq, 1_700_000_000 + seq))
            seq += 1
    open(done, "w").close()
    return out


def build_docs_fixture(spark, sf_dir: str, work: str, scale: str) -> str:
    """Arriving-document stream: sf0.1 documents with a synthetic
    chronological ts, DOC_ROWS_PER_FILE per micro-batch file. ×10 = 10
    copies (doc_id offset i·10M, ts shifted +31 days each) — text is
    deliberately UNCHANGED per copy, so every copy probes the same
    artifact matches: the serving claim is per-batch work and state,
    not match sparsity."""
    out = os.path.join(work, f"{scale}_docs")
    done = os.path.join(out, "_FIXTURE_OK")
    if os.path.exists(done):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    import pandas as pd

    base = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    base["ts"] = pd.Timestamp("2026-01-01") + pd.to_timedelta(
        base.index * 2, unit="s"
    )
    copies = COPIES if scale == "x10" else 1
    seq = 0
    for i in range(copies):
        c = base.copy()
        if i:
            c["doc_id"] += i * STRIDE
            c["ts"] = c["ts"] + pd.Timedelta(days=31 * i)
        for lo in range(0, len(c), DOC_ROWS_PER_FILE):
            path = os.path.join(out, f"b{seq:05d}.parquet")
            c.iloc[lo : lo + DOC_ROWS_PER_FILE][
                ["doc_id", "ts", "text"]
            ].to_parquet(
                path,
                index=False,
                coerce_timestamps="us",
                allow_truncated_timestamps=True,
            )
            os.utime(path, (1_700_000_000 + seq, 1_700_000_000 + seq))
            seq += 1
    open(done, "w").close()
    return out


def build_serving_artifacts(spark, sf_dir: str):
    """Day-0 freeze the two static serve-side artifacts, eagerly
    persisted once for the whole lane: the landed corpus's MinHash
    signatures (probe target) and the held-out winnow fingerprint set
    (decontamination target)."""
    from pyspark.sql import functions as F  # noqa: F811

    from xena_gdc_etl_spark.catalog import Catalog
    from xena_gdc_etl_spark.operators import text as tx
    from xena_gdc_etl_spark.sources import minhash_index as mh

    docs = Catalog(spark, sf_dir).documents
    landed_sigs = mh.build_signatures(
        docs.filter(F.col("doc_id") % 5 == 0), num_hashes=8, shingle_k=5
    ).persist()
    landed_sigs.count()
    held_fps = tx.winnow_fingerprint_set(
        docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    ).persist()
    held_fps.count()
    return {"landed_sigs": landed_sigs, "held_fps": held_fps}


def doc_twins(spark, src_dir: str, artifacts: dict) -> dict:
    """Artifact-serving twins over the arriving-documents stream —
    the standing near-dedup probe and the standing decontamination
    serve loop, each scoring arrivals against a frozen static side."""
    from xena_gdc_etl_spark import streaming as S

    def reader():
        return (
            spark.readStream.schema(DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )

    return {
        # stateless: sign → band → stream-static join on the frozen
        # signature artifact; no join state accumulates
        "lsh_probe": (
            lambda: S.streaming_lsh_probe(
                reader().select("doc_id", "text"),
                artifacts["landed_sigs"],
            ),
            "append",
        ),
        # watermarked windowed agg over the fingerprint hits — state is
        # the open window's docs, dropped as the watermark passes
        "winnow_decontam": (
            lambda: S.streaming_winnow_decontamination(
                reader(),
                artifacts["held_fps"],
                watermark="30 minutes",
                window_duration="10 minutes",
            ),
            "append",
        ),
    }


def _drain(spark, make_stream, work: str, mode: str):
    """Run one twin to completion; return (wall_s, progress rows)."""
    ckpt = os.path.join(work, "ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)
    t0 = time.perf_counter()
    q = (
        make_stream()
        .writeStream.format("noop")
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    prog = [json.loads(p.json) for p in q.recentProgress]
    return wall, prog


def _metrics(wall: float, prog: list[dict]) -> dict:
    rows = sum(p.get("numInputRows", 0) for p in prog)
    batches = sum(1 for p in prog if p.get("numInputRows", 0) > 0)
    state_by_batch = [
        sum(s.get("numRowsTotal", 0) for s in p.get("stateOperators", []))
        for p in prog
    ]
    trig = [
        p["durationMs"]["triggerExecution"]
        for p in prog
        if p.get("durationMs", {}).get("triggerExecution")
    ]
    return {
        "rows": rows,
        "batches": batches,
        "wall_s": round(wall, 2),
        "rows_per_s": round(rows / wall, 0) if wall else None,
        "mean_batch_ms": round(sum(trig) / len(trig), 0) if trig else None,
        "max_state_rows": max(state_by_batch) if state_by_batch else 0,
        "final_state_rows": state_by_batch[-1] if state_by_batch else 0,
    }


def twins(spark, src_dir: str) -> dict:
    """name -> (make_stream, outputMode). Each make_stream builds a fresh
    reader so every scale/twin run gets its own source."""
    from xena_gdc_etl_spark import streaming as S
    from xena_gdc_etl_spark.streaming import stateful as ST

    def reader():
        return (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )

    return {
        "windowed_agg": (
            lambda: S.streaming_windowed_agg(reader()),
            "append",
        ),
        "sessionize": (
            lambda: S.streaming_sessionize(reader()),
            "append",
        ),
        "dedup_exact": (
            lambda: S.streaming_dedup_exact(
                reader(), key_cols=["event_id"], watermark="1 hour"
            ),
            "append",
        ),
        "heavy_hitters": (
            lambda: S.streaming_heavy_hitters(reader()),
            "append",
        ),
        "running_totals": (
            lambda: ST.streaming_running_totals(reader()),
            "update",
        ),
        "funnel": (
            # EventTimeTimeout: users idle 1h past the watermark are
            # evicted — state lifetime bounded, not just size
            lambda: ST.streaming_funnel(
                reader().withWatermark("ts", "2 hours"),
                idle_timeout_ms=3_600_000,
            ),
            "update",
        ),
    }


def main() -> None:
    from xena_gdc_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/streaming_lane"
    only = set(sys.argv[3:])
    os.makedirs(work, exist_ok=True)

    # shuffle partitions sized to the MICRO-BATCH volume (10k rows), not
    # the corpus: the state store inherits this as its shard count for
    # the checkpoint's lifetime, and 32 shards on a 10k-row batch is
    # pure per-batch fixed cost — the same sizing call a production
    # trigger makes (shards ~ batch volume / executor memory, scaled
    # out by ADDING executors, not by over-sharding a small batch)
    spark = get_spark(
        app_name="streaming-lane", master="local[32]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    # x10 drains 100 micro-batches; keep every progress event on record
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "256")

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "streaming_lane.json",
    )
    try:
        with open(out_path) as fh:
            results = dict(json.load(fh).get("results", {}))
    except (OSError, ValueError):
        results = {}

    artifacts = None
    for scale in ("x1", "x10"):
        all_twins = {}
        if not only or (set(only) - set(DOC_TWINS)):
            src = build_fixture(spark, sf_dir, work, scale)
            all_twins.update(twins(spark, src))
        if not only or (set(only) & set(DOC_TWINS)):
            if artifacts is None:
                artifacts = build_serving_artifacts(spark, sf_dir)
            dsrc = build_docs_fixture(spark, sf_dir, work, scale)
            all_twins.update(doc_twins(spark, dsrc, artifacts))
        for name, (mk, mode) in all_twins.items():
            if only and name not in only:
                continue
            wall, prog = _drain(
                spark, mk, os.path.join(work, f"{scale}_{name}"), mode
            )
            m = _metrics(wall, prog)
            # SPARK_GRAFT_STATE_STORE (session.py) swaps the state-store
            # provider; its rows land under the env value as a suffix
            # ("@rocksdb", "@rocksdb-changelog") so the heap-backed
            # baseline rows stay pinned alongside every variant
            ss = os.environ.get("SPARK_GRAFT_STATE_STORE", "").lower()
            rec = f"{name}@{ss}" if ss else name
            row = results.setdefault(rec, {})
            row[scale] = m
            if "x1" in row and "x10" in row:
                r1, r10 = row["x1"], row["x10"]
                if r1.get("rows_per_s") and r10.get("rows_per_s"):
                    row["throughput_ratio_x10_over_x1"] = round(
                        r10["rows_per_s"] / r1["rows_per_s"], 2
                    )
                if r1.get("max_state_rows"):
                    row["state_growth_x10_over_x1"] = round(
                        r10["max_state_rows"] / r1["max_state_rows"], 2
                    )
            print(
                json.dumps({"scale": scale, "twin": rec, **m}), flush=True
            )
            with open(out_path, "w") as fh:
                json.dump(
                    {
                        "metric": "streaming_lane",
                        "copies": COPIES,
                        "rows_per_file": ROWS_PER_FILE,
                        "results": results,
                    },
                    fh,
                    indent=1,
                )

    print(json.dumps({"metric": "streaming_lane", "results": results}),
          flush=True)


if __name__ == "__main__":
    main()
