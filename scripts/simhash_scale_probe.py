#!/usr/bin/env python
"""SimHash banding scale probe (round 14): classic 16-bit bands vs
Manku combination banding at 1× and 100×.

The round-14 100× lane measured the REGISTERED simhash_pairs query
going super-linear (e=1.22, 431× output at 100×) — that row is the
documented 16-bit ORACLE fixture (64 bucket values total, kept so
DuckDB can compute the signature in SQL), not the scale path. This
probe measures the real thing on the same 100× documents fixture:
64-bit signatures, full corpus (no %10 sample), hamming ≤ 3, under

- ``band16``: bands=4, match_blocks=1 — the classic 4×16-bit scheme.
  Random-candidate volume Θ(4·N²/2¹⁶): birthday-saturates as N grows.
- ``manku20``: bands=6, match_blocks=3 — C(6,3)=20 tables keyed on
  ~30 bits. Θ(20·N²/2³⁰) random candidates: the linear table fan-out
  buys an exponential collision drop (Manku/Jain/Sarma WWW'07).

Both are COMPLETE for hamming ≤ 3 (pigeonhole over block combinations),
so their outputs must be IDENTICAL — the probe asserts that at both
scales, which doubles as a 500k-doc completeness check of the
match_blocks implementation. Results merge into sf10_spotlane.json as
stages ``simhash64_band16`` / ``simhash64_manku20`` (min-of-2, same
protocol as the lane).

Run AFTER scripts/sf10_spotlane.py has built the 100× fixture:
    python scripts/simhash_scale_probe.py [sf_dir] [x100_dir]
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

CONFIGS = {
    "simhash64_band16": dict(bands=4, match_blocks=1),
    "simhash64_manku20": dict(bands=6, match_blocks=3),
}
SCALE = 100


def main() -> None:
    from pyspark.sql import functions as F

    from xena_gdc_etl_spark.catalog import Catalog
    from xena_gdc_etl_spark.operators import dedup as dd
    from xena_gdc_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    x100 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10_spotlane"
    spark = get_spark(
        app_name="simhash-probe", master="local[32]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "sf10_spotlane.json",
    )
    try:
        with open(out_path) as fh:
            doc = json.load(fh)
            results = dict(doc.get("results", {}))
    except (OSError, ValueError):
        doc, results = {"metric": "sf10_spotlane", "copies": SCALE}, {}

    def consume(df) -> int:
        h = F.xxhash64(*[F.col(c) for c in df.columns])
        return df.select(h.alias("__h")).agg(
            F.count("__h").alias("n"), F.bit_xor("__h")
        ).collect()[0]["n"]

    for scale, d in (("x1", sf_dir), ("x100", x100)):
        per_config_rows: dict[str, int] = {}
        for trial in range(2):
            spark.catalog.clearCache()
            # one shared signature build per trial, on its own clock —
            # the configs must read the SAME signatures for the
            # equal-output assertion to mean anything
            t0 = time.perf_counter()
            fps = dd.simhash(
                Catalog(spark, d).documents, bits=64
            ).persist()
            n_docs = fps.count()
            sig_sec = round(time.perf_counter() - t0, 3)
            r = results.setdefault("simhash64_signatures", {})
            r[scale] = min(r.get(scale, float("inf")), sig_sec)
            r[f"rows_{scale}"] = n_docs
            print(json.dumps({"scale": scale, "trial": trial,
                              "stage": "simhash64_signatures",
                              "sec": sig_sec, "rows": n_docs}), flush=True)
            for name, cfg in CONFIGS.items():
                start = time.perf_counter()
                n = consume(
                    dd.simhash_pairs(
                        fps, bits=64, max_distance=3, **cfg
                    )
                )
                sec = round(time.perf_counter() - start, 3)
                r = results.setdefault(name, {})
                r[scale] = min(r.get(scale, float("inf")), sec)
                r[f"rows_{scale}"] = n
                per_config_rows.setdefault(name, n)
                print(json.dumps({"scale": scale, "trial": trial,
                                  "stage": name, "sec": sec, "rows": n}),
                      flush=True)
            fps.unpersist()
        distinct = set(per_config_rows.values())
        assert len(distinct) == 1, (
            f"completeness violated at {scale}: {per_config_rows}"
        )
        for name in list(CONFIGS) + ["simhash64_signatures"]:
            row = results[name]
            if row.get("x1", 0) > 0 and "x100" in row:
                ratio = row["x100"] / row["x1"]
                row["ratio"] = round(ratio, 2)
                row["exponent"] = round(
                    math.log(max(ratio, 1e-9)) / math.log(SCALE), 3
                )
                if row.get("rows_x1"):
                    row["rows_ratio"] = round(
                        row["rows_x100"] / row["rows_x1"], 2
                    )
        doc["results"] = results
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=1)

    print(json.dumps({k: results[k] for k in
                      list(CONFIGS) + ["simhash64_signatures"]}),
          flush=True)


if __name__ == "__main__":
    main()
