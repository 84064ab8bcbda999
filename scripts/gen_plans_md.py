#!/usr/bin/env python
"""Generate PLANS.md — the per-query PHYSICAL-PLAN fingerprint page.

"The plan is the one you'd want at 100×" should be auditable without
re-running anything: for every registered query this script builds the
plan at sf0.001 (local[8]) and records a NORMALIZED fingerprint — node
COUNTS only, never expression ids, so the page is stable across runs and
diffs only when a plan actually changes shape:

- pushdown: whether the parquet scans carry PushedFilters (queries that
  filter a base table should; pure-aggregation queries have none to push)
- bhj / smj / shj: broadcast-hash / sort-merge / shuffled-hash join counts
- exch: shuffle exchanges (each is a full repartition of its input)
- py: Arrow Python stages (MapInPandas / FlatMapGroupsInPandas /
  ArrowEvalPython) — the deliberate non-JVM islands
- wsc: whole-stage-codegen span count (JVM compiled regions)
- rows@sf0.001: the row count the driver's smoke sees

Caveats, by design:
- fingerprints are the INITIAL AQE plan at sf0.001 — AQE may re-plan at
  runtime (that is the point of keeping exchanges visible), and the
  eagerly-filled operator caches mean join strategies legitimately
  differ at other scales (BASELINE §sf10-spotlane shows the 100× forms).
- building the plans EXECUTES the shared-cache fills (cheap at
  sf0.001); the script is a reporting tool, not a test dependency.

Run:  python scripts/gen_plans_md.py   # rewrites PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def fingerprint(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = any(
        seg.split("]")[0].strip()
        for seg in plan.split("PushedFilters: [")[1:]
    )
    return {
        "pushdown": pushed,
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "exch": plan.count("Exchange "),
        "py": plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("ArrowEvalPython"),
        # codegen spans appear as "*(k) Node" markers in the plan string;
        # count DISTINCT span ids (each id wraps several nodes)
        "wsc": len(set(re.findall(r"\*\((\d+)\)", plan))),
    }


def build() -> str:
    from xena_gdc_etl_spark.session import get_spark
    from xena_gdc_etl_spark.workload import ORACLES, QUERIES

    spark = get_spark(
        app_name="gen-plans", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# PLANS — physical-plan fingerprints (generated; do not edit)",
        "",
        "Regenerate with `python scripts/gen_plans_md.py` (plan shapes at",
        "sf0.001, initial AQE plan, local[8]; see the script docstring for",
        "what each column means and why join strategies legitimately differ",
        "at other scales). Sorted by query key.",
        "",
        "| query | oracle | pushdown | bhj | smj | shj | exch | py | wsc | rows |",
        "| --- | --- | --- | --- | --- | --- | --- | --- | --- | --- |",
    ]
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        try:
            df = fn(spark, SF_DIR)
            fp = fingerprint(df)
            rows = df.count()
        except Exception as e:  # pragma: no cover - trainer guards etc.
            lines.append(f"| {name} | — | ERROR: {type(e).__name__} |"
                         + " — |" * 7)
            continue
        lines.append(
            "| {n} | {o} | {p} | {bhj} | {smj} | {shj} | {exch} | {py} | {wsc} | {r} |".format(
                n=name,
                o="full" if name in ORACLES else "rows-only",
                p="yes" if fp["pushdown"] else "—",
                r=rows,
                **{k: fp[k] for k in ("bhj", "smj", "shj", "exch", "py", "wsc")},
            )
        )
    lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    out = build()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANS.md",
    )
    with open(path, "w") as fh:
        fh.write(out)
    print(f"wrote {path} ({len(out.splitlines())} lines)")
