#!/usr/bin/env python
"""§sf1 evidence for the IVF cell-count scaling knob (round-9 verdict #3).

The within-cell pair stage of embedding dedup does O(Σ cell²) similarity
work. With a FIXED n_cells the per-cell population grows ∝ corpus and the
stage goes quadratic; with n_cells = suggest_n_cells(rows, target) the
per-cell population stays ~constant and the stage stays ~linear.

This script replicates the sf0.1 embeddings table K× (coordinate-rotation
copies — cosine-invariant within a copy, ~orthogonal across copies, the
sf1_workload fixture trick) and times ivf_train → ivf_assign →
cosine_dup_pairs at each scale twice: n_cells fixed at 8 vs scaled by
suggest_n_cells(rows, target_cell_rows=512). Pair counts are reported so
the two configurations can be compared for recall on the same corpus
(scaled cells are a different candidate structure, not a silent cap).

Run:  python scripts/ivf_cells_scaling.py [sf_dir] [copies_csv]
Output: one JSON line per (scale, config) + ivf_cells_scaling.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from xena_gdc_etl_spark.operators import similarity as sim  # noqa: E402
from xena_gdc_etl_spark.session import get_spark  # noqa: E402

STRIDE = 100_000_000


def replicate(emb, copies: int):
    parts = []
    for i in range(copies):
        if i == 0:
            parts.append(emb.select("vec_id", "embedding"))
        else:
            parts.append(
                emb.select(
                    (F.col("vec_id") + F.lit(i * STRIDE)).alias("vec_id"),
                    F.concat(
                        F.slice(
                            "embedding", i + 1, F.size("embedding") - F.lit(i)
                        ).cast("array<float>"),
                        F.slice("embedding", 1, i).cast("array<float>"),
                    ).alias("embedding"),
                )
            )
            # planted near-dups: every 20th BASE vector re-appears
            # UNROTATED under a fresh id — cosine-1 with the base copy,
            # so the pair stage has real duplicates to find and the two
            # cell configurations can be compared on recall, not just
            # cost (identical vectors always share a cell, so exact-dup
            # recall must match at ANY n_cells)
            parts.append(
                emb.filter(F.col("vec_id") % 20 == 0).select(
                    (F.col("vec_id") + F.lit(i * STRIDE) + F.lit(STRIDE // 2)
                     ).alias("vec_id"),
                    "embedding",
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def run_config(spark, emb, rows: int, n_cells: int, label: str, threshold: float) -> dict:
    t0 = time.perf_counter()
    cents = sim.ivf_train(emb, k=n_cells, iterations=2)
    assigned = sim.ivf_assign(emb, cents).persist()
    assigned.count()
    train_sec = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    n_pairs = sim.cosine_dup_pairs(assigned, threshold=threshold).count()
    pair_sec = round(time.perf_counter() - t0, 2)
    assigned.unpersist()
    return {
        "config": label,
        "rows": rows,
        "n_cells": n_cells,
        "train_assign_sec": train_sec,
        "pair_sec": pair_sec,
        "pairs": n_pairs,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = [int(c) for c in (sys.argv[2] if len(sys.argv) > 2 else "1,4,10").split(",")]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 0.7
    spark = get_spark(
        app_name="ivf-cells-scaling", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    results = []
    for k in copies:
        emb = replicate(base, k).persist()
        rows = emb.count()
        for label, cells in (
            ("fixed8", 8),
            ("scaled", sim.suggest_n_cells(rows, target_cell_rows=512)),
        ):
            cell = run_config(spark, emb, rows, cells, label, threshold)
            cell["copies"] = k
            results.append(cell)
            print(json.dumps(cell), flush=True)
        emb.unpersist()
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "..", "ivf_cells_scaling.json"), "w") as fh:
        json.dump({"results": results}, fh, indent=1)


if __name__ == "__main__":
    main()
