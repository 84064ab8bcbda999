#!/usr/bin/env python
"""Hot-key scaling probe for group_rolling's tail-carry path.

The benign-distribution lanes (§sf1-r17/§sf10-r17) measure the
REGISTERED rolling query, which the round-17 skew probe routes to the
plain per-group window — correct, but it leaves the tail-carry
machinery itself (the path that exists precisely FOR a degenerate hot
key) without a lane row on data that actually engages it. This probe
builds synthetic hot fixtures — one group owning ``HOT_FRAC`` of all
rows, the rest spread over many benign groups — at 1x/4x/16x row
counts, and times:

- ``sharded``: group_rolling with defaults (the skew probe reads the
  hot group and engages tail-carry; every task stays bounded by the
  shard width, so time should scale ~linearly with ROWS and never with
  the hot group's size).
- ``plain``: the single-window plan on the same data (the hot group
  funnels through ONE task — the quantity the sharded path's constant
  buys out of; its scaling shows the straggler growing with the hot
  group).

Rows are generated with spark.range (deterministic, no data files);
results verify equal before timing. min-of-2 fresh-plan trials, same
discipline as the other lanes.

Run: python scripts/rolling_hot_probe.py [base_rows] [hot_frac]
Writes rolling_hot_probe.json at the repo root.
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

BASE_ROWS = 1_000_000
HOT_FRAC = 0.4
BENIGN_GROUPS = 5_000
SCALES = (1, 4, 16)


def hot_frame(spark, n_rows: int, hot_frac: float):
    """One group ("hot" id 0) owns ~hot_frac of rows; the rest spread
    uniformly over BENIGN_GROUPS ids — deterministic in id."""
    # id % 10 < hot_frac*10 → the hot group, else a benign id
    cut = int(round(hot_frac * 10))
    return spark.range(n_rows).select(
        F.when(F.col("id") % 10 < cut, F.lit(0))
        .otherwise((F.col("id") % BENIGN_GROUPS) + 1)
        .alias("g"),
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def main() -> None:
    from xena_gdc_etl_spark.operators.prefix import group_rolling
    from xena_gdc_etl_spark.session import get_spark

    base = int(sys.argv[1]) if len(sys.argv) > 1 else BASE_ROWS
    hot = float(sys.argv[2]) if len(sys.argv) > 2 else HOT_FRAC
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "rolling_hot_probe.json",
    )
    spark = get_spark(
        app_name="rolling-hot-probe", master="local[32]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import Window

    results: dict[str, dict] = {}
    for scale in SCALES:
        n = base * scale
        df = hot_frame(spark, n, hot)
        label = f"x{scale}"
        row: dict = {"rows": n, "hot_rows": int(n * hot)}
        # value parity once per scale (cheap at x1, pricey above — the
        # bitwise-identity argument is the per-row-recompute property,
        # already pinned by tests; here we spot-check the hot fixture)
        if scale == 1:
            w = (
                Window.partitionBy("g").orderBy("k")
                .rowsBetween(-3, Window.currentRow)
            )
            plain = df.withColumn("r", F.avg("v").over(w))
            sharded = group_rolling(
                df, ["g"], ["k"], "v", "r", agg="avg", preceding=3
            )
            # symmetric: one direction only proves containment and leans
            # on an unasserted equal-row-count assumption (ADVICE r17)
            diff = (
                plain.exceptAll(sharded).count()
                + sharded.exceptAll(plain).count()
            )
            row["parity_diff_rows"] = diff
            assert diff == 0, "sharded != plain on the hot fixture"
        # "sharded" FORCES tail-carry (carry_min_rows=0) so the lane keeps
        # measuring the machinery itself; "routed" is what the default
        # router actually picks at this size (the §hot-carry-r18
        # crossover: plain below _CARRY_MIN_ROWS, tail-carry above).
        for name in ("sharded", "plain", "routed"):
            best = float("inf")
            for trial in range(2):
                t0 = time.perf_counter()
                if name == "sharded":
                    out = group_rolling(
                        df, ["g"], ["k"], "v", "r", agg="avg", preceding=3,
                        carry_min_rows=0,
                    )
                elif name == "routed":
                    out = group_rolling(
                        df, ["g"], ["k"], "v", "r", agg="avg", preceding=3
                    )
                else:
                    w = (
                        Window.partitionBy("g").orderBy("k")
                        .rowsBetween(-3, Window.currentRow)
                    )
                    out = df.withColumn("r", F.avg("v").over(w))
                if name == "routed" and trial == 0:
                    plan = (
                        out._jdf.queryExecution().optimizedPlan().toString()
                    )
                    row["routed_plan"] = (
                        "tail-carry" if "__shard" in plan else "plain"
                    )
                out.write.format("noop").mode("overwrite").save()
                sec = round(time.perf_counter() - t0, 3)
                best = min(best, sec)
                print(json.dumps({
                    "scale": label, "plan": name, "trial": trial,
                    "sec": sec, "rows": n,
                }), flush=True)
            row[name] = best
        # the router must have picked the faster physical plan — unless
        # the two are within 1.3x (shared-host noise), where either
        # choice is fine: the §hot-carry-r18 ask
        lo, hi = sorted((row["sharded"], row["plain"]))
        faster_plan = (
            "tail-carry" if row["sharded"] <= row["plain"] else "plain"
        )
        row["router_ok"] = (
            row["routed_plan"] == faster_plan or hi / max(lo, 1e-9) < 1.3
        )
        results[label] = row
        with open(out_path, "w") as fh:
            json.dump({
                "metric": "rolling_hot_probe", "base_rows": base,
                "hot_frac": hot, "benign_groups": BENIGN_GROUPS,
                "results": results,
            }, fh, indent=1)
    # exponents vs x1 (log base = scale factor)
    for label, r in results.items():
        s = int(label[1:])
        if s == 1:
            continue
        for name in ("sharded", "plain"):
            ratio = r[name] / results["x1"][name]
            r[f"{name}_e"] = round(
                math.log(max(ratio, 1e-9)) / math.log(s), 3
            )
    with open(out_path, "w") as fh:
        json.dump({
            "metric": "rolling_hot_probe", "base_rows": base,
            "hot_frac": hot, "benign_groups": BENIGN_GROUPS,
            "results": results,
        }, fh, indent=1)
    print(json.dumps({"metric": "rolling_hot_probe", "results": results}),
          flush=True)


if __name__ == "__main__":
    main()
