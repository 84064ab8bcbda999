#!/usr/bin/env python
"""Arrow-vs-column crossover probe for _cell_mean_agg (r17 verdict ask).

IVF_MEAN_ARROW_MIN_DIM=256 was set from d=1024 evidence in round 11 and
never probed in the 64-256 band the registered kmeans_round fixture
(d=64) actually lives in. This probe builds synthetic assigned-vector
frames (N rows, k cells, dim d) and times both _cell_mean_agg paths
("column": d avg aggregate columns in whole-stage codegen; "arrow": a
mapInPandas (cell, count, sum) partial folded per cell) at dims
bracketing the constant, min-of-3 per cell after a warm run.

The assignment stage is deliberately excluded (a fixed mapInPandas cost
shared by both paths — measured separately by the kmeans_round
decomposition in OPTIMIZATION_r18.md); what differs between paths is
only the aggregation.

Run: python scripts/ivf_mean_dim_probe.py [n_rows] [n_cells]
Writes ivf_mean_dim_probe.json at the repo root.
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

DIMS = (32, 64, 128, 192, 256, 384)
TRIALS = 3


def main() -> None:
    from xena_gdc_etl_spark.operators import similarity as sim
    from xena_gdc_etl_spark.session import get_spark

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "ivf_mean_dim_probe.json",
    )
    spark = get_spark(
        app_name="ivf-mean-dim-probe", master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for d in DIMS:
        # deterministic synthetic frame: vec_id, centroid_id, embedding[d]
        assigned = spark.range(n_rows).select(
            F.col("id").alias("vec_id"),
            (F.col("id") % n_cells).alias("centroid_id"),
            F.array(
                *[
                    ((F.col("id") * (i + 3)) % 97).cast("double")
                    for i in range(d)
                ]
            ).alias("embedding"),
        ).localCheckpoint(eager=True)  # freeze the input so the probe
        # times the aggregation, not the synthetic projection
        row: dict = {}
        for path in ("column", "arrow"):
            agg = sim._cell_mean_agg(assigned, d, mean_path=path)
            times = []
            for trial in range(TRIALS + 1):  # first run = warm, dropped
                t0 = time.perf_counter()
                agg.write.format("noop").mode("overwrite").save()
                if trial > 0:
                    times.append(round(time.perf_counter() - t0, 4))
            row[path] = min(times)
            row[f"{path}_all"] = times
        row["winner"] = "column" if row["column"] <= row["arrow"] else "arrow"
        results[f"d{d}"] = row
        print(json.dumps({"dim": d, **{k: row[k] for k in ("column", "arrow", "winner")}}), flush=True)
    with open(out_path, "w") as fh:
        json.dump(
            {
                "metric": "ivf_mean_dim_probe",
                "n_rows": n_rows,
                "n_cells": n_cells,
                "trials": TRIALS,
                "arrow_min_dim_constant": sim.IVF_MEAN_ARROW_MIN_DIM,
                "results": results,
            },
            fh,
            indent=1,
        )


if __name__ == "__main__":
    main()
