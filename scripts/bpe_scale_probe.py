#!/usr/bin/env python
"""bpe_encode scaling lane: 10x / 100x exponents for the encode path
(round-16 verdict ask: the vocab-frame claim is plan-pinned but had no
lane row).

The claim under test — bpe_encode's Python merge loop runs on the
DISTINCT-WORD frame only (Arrow-batched), while the corpus-scale token
stream is explode + join + flatten — predicts sub-linear encode time in
corpus size EXCEPT where the fixture multiplies the vocabulary itself.
The affine documents fixture (scripts/sf10_spotlane.py) is exactly that
stress: each copy rewrites the alphabet bijectively, so a k-copy corpus
has ~k x the distinct words (vocab-frame work scales WITH copies, the
worst case for the claim) while per-copy word structure replicates
exactly.

Method: the merge list is learned ONCE on the 1x corpus (32 merges,
disjoint batches of 4) and reused verbatim at every scale — encode cost
is then a pure function of corpus/vocab size, not of training noise.
Each scale runs min-of-2 fresh-plan trials of
bpe_encode -> count + total-subword consume.

Run: python scripts/bpe_scale_probe.py [sf_dir] [work_root]
Writes bpe_scale_probe.json at the repo root (merge-write per scale).
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from sf10_spotlane import build_fixture

    from xena_gdc_etl_spark.operators.bpe import bpe_encode, bpe_train
    from xena_gdc_etl_spark.operators.text import WS_RE
    from xena_gdc_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bpe_scale_probe"
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "bpe_scale_probe.json",
    )

    spark = get_spark(
        app_name="bpe-scale-probe", master="local[32]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")

    def word_freqs(docs):
        return (
            docs.select(
                F.explode(
                    F.filter(
                        F.split(F.lower("text"), WS_RE), lambda t: t != ""
                    )
                ).alias("word")
            )
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("freq"))
        )

    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    t0 = time.perf_counter()
    merges, _ = bpe_train(word_freqs(base), 32, merges_per_round=4)
    print(json.dumps({
        "stage": "bpe_train_x1", "sec": round(time.perf_counter() - t0, 2),
        "n_merges": len(merges),
    }), flush=True)

    scales = [("x1", 1, sf_dir)]
    for label, copies in (("x10", 10), ("x100", 100)):
        d = os.path.join(work_root, label)
        os.makedirs(d, exist_ok=True)
        tb = time.perf_counter()
        build_fixture(spark, sf_dir, d, copies=copies)
        print(json.dumps({
            "stage": f"build_{label}",
            "sec": round(time.perf_counter() - tb, 2),
        }), flush=True)
        scales.append((label, copies, d))

    results: dict[str, dict] = {}
    for label, copies, d in scales:
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        vocab = docs.select(
            F.explode(
                F.filter(F.split(F.lower("text"), WS_RE), lambda t: t != "")
            ).alias("w")
        ).agg(
            F.countDistinct("w").alias("v"), F.count("w").alias("toks")
        ).collect()[0]
        best = float("inf")
        n_docs = total_subwords = 0
        for trial in range(2):
            t1 = time.perf_counter()
            enc = bpe_encode(docs, merges, lowercase=True)
            row = enc.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.size("subwords")).alias("subs"),
            ).collect()[0]
            sec = round(time.perf_counter() - t1, 3)
            best = min(best, sec)
            n_docs, total_subwords = row["n"], row["subs"]
            print(json.dumps({
                "scale": label, "trial": trial, "stage": "bpe_encode",
                "sec": sec, "docs": n_docs, "subwords": total_subwords,
                "vocab": vocab["v"], "tokens": vocab["toks"],
            }), flush=True)
        results[label] = {
            "sec": best, "docs": n_docs, "subwords": total_subwords,
            "vocab": vocab["v"], "tokens": vocab["toks"],
            "copies": copies,
        }
        summary = {"metric": "bpe_scale_probe", "n_merges": len(merges),
                   "results": results}
        for lbl, r in results.items():
            if lbl == "x1" or results.get("x1", {}).get("sec", 0) <= 0:
                continue
            ratio = r["sec"] / results["x1"]["sec"]
            r["ratio"] = round(ratio, 2)
            r["exponent"] = round(
                math.log(max(ratio, 1e-9)) / math.log(r["copies"]), 3
            )
        with open(out_path, "w") as fh:
            json.dump(summary, fh, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
