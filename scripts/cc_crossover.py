#!/usr/bin/env python
"""Measure the driver-union-find vs distributed-alternating-star crossover
for connected_components, to choose ``driver_max_edges``'s default from
data instead of folklore (round-9 verdict task 4).

Method: synthetic candidate-pair sets at increasing edge counts, two graph
shapes that bracket real LSH pair graphs —

- ``clustered``: many small components (the common dedup shape: families
  of near-dups), built as ring edges within groups of ~8 nodes;
- ``chained``: long chains (the worst diameter shape the sf1 stress
  surfaced), rings of 4096.

For each (shape, E) the SAME edge set runs through both paths
(``driver_max_edges`` lifted vs 0) and we record wall seconds and keep
counts (must match exactly). Output: one JSON line per cell + a summary,
also written to cc_crossover.json.

Run:  python scripts/cc_crossover.py [--edges 500000,1000000,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from xena_gdc_etl_spark.operators.dedup import connected_components  # noqa: E402
from xena_gdc_etl_spark.session import get_spark  # noqa: E402


def edge_set(spark, n_edges: int, shape: str):
    """Deterministic synthetic pair set with ~n_edges edges."""
    if shape == "clustered":
        # groups of 8: node i links to i+1 within its group (7 edges per
        # 8-node group -> components of size 8)
        ids = spark.range(n_edges + n_edges // 7 + 8)
        df = ids.select(
            F.col("id").alias("a"), (F.col("id") + 1).alias("b")
        ).filter((F.col("id") + 1) % 8 != 0)
    else:  # chained: rings of 4096 (long diameter)
        ids = spark.range(n_edges + n_edges // 4095 + 4096)
        df = ids.select(
            F.col("id").alias("a"), (F.col("id") + 1).alias("b")
        ).filter((F.col("id") + 1) % 4096 != 0)
    return df.limit(n_edges)


def run_cell(spark, n_edges: int, shape: str) -> dict:
    pairs = edge_set(spark, n_edges, shape).persist()
    pairs.count()
    nodes = pairs.select(F.col("a").alias("doc_id")).union(
        pairs.select(F.col("b").alias("doc_id"))
    ).distinct().persist()
    nodes.count()
    out = {"shape": shape, "edges": n_edges}
    for label, cap in (("driver", 1_000_000_000), ("distributed", 0)):
        stats: dict = {}
        t0 = time.perf_counter()
        cc = connected_components(
            pairs, nodes, a_col="a", b_col="b",
            driver_max_edges=cap or None, stats=stats,
        )
        keeps = cc.filter(F.col("doc_id") == F.col("cluster_id")).count()
        out[f"{label}_sec"] = round(time.perf_counter() - t0, 2)
        out[f"{label}_keeps"] = keeps
        if "rounds" in stats:
            out["rounds"] = stats["rounds"]
    out["parity"] = out["driver_keeps"] == out["distributed_keeps"]
    pairs.unpersist()
    nodes.unpersist()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--edges", default="250000,500000,1000000,2000000,4000000,8000000"
    )
    args = ap.parse_args()
    sizes = [int(s) for s in args.edges.split(",")]
    spark = get_spark(
        app_name="cc_crossover", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    here = os.path.dirname(os.path.abspath(__file__))
    out_path = os.path.join(here, "..", "cc_crossover.json")
    for shape in ("clustered", "chained"):
        for n in sizes:
            cell = run_cell(spark, n, shape)
            results.append(cell)
            print(json.dumps(cell), flush=True)
            with open(out_path, "w") as fh:  # incremental: survives timeouts
                json.dump({"results": results}, fh, indent=1)


if __name__ == "__main__":
    main()
