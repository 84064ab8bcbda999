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


def _walk_counts(jnode, counts: dict) -> None:
    """Count physical-node classes over the EXECUTABLE tree: descend
    through AQE wrappers, stop at InMemoryTableScanExec (the cached
    relation's embedded build plan is not executed by this query — the
    string-based counter used to N-count it per scan: round 12 saw
    source_jsd report 90 'exchanges' after a seam that REMOVED work),
    and skip ReusedExchangeExec subtrees (a reuse is not a new
    shuffle)."""
    cls = jnode.getClass().getSimpleName()
    counts[cls] = counts.get(cls, 0) + 1
    if cls in ("InMemoryTableScanExec", "ReusedExchangeExec"):
        return
    if cls == "AdaptiveSparkPlanExec":
        child = None
        for getter in ("initialPlan", "inputPlan", "executedPlan"):
            try:
                child = getattr(jnode, getter)()
                break
            except Exception:
                continue
        if child is not None:
            _walk_counts(child, counts)
        return
    it = jnode.children().iterator()
    while it.hasNext():
        _walk_counts(it.next(), counts)
    try:  # scalar/IN subqueries hang off expressions, not children
        sit = jnode.subqueries().iterator()
        while sit.hasNext():
            _walk_counts(sit.next(), counts)
    except Exception:
        pass


def fingerprint(df) -> dict:
    qe = df._jdf.queryExecution()
    # pushdown is judged on the FULL string: a pushed filter inside a
    # shared-cache build is a real pushdown (it ran at fill time)
    full = qe.executedPlan().toString()
    pushed = any(
        seg.split("]")[0].strip()
        for seg in full.split("PushedFilters: [")[1:]
    )
    counts: dict = {}
    _walk_counts(qe.executedPlan(), counts)

    def n(*names):
        return sum(counts.get(x, 0) for x in names)

    return {
        "pushdown": pushed,
        "bhj": n("BroadcastHashJoinExec"),
        "smj": n("SortMergeJoinExec"),
        "shj": n("ShuffledHashJoinExec"),
        "exch": n("ShuffleExchangeExec", "BroadcastExchangeExec"),
        "py": n(
            "MapInPandasExec",
            "FlatMapGroupsInPandasExec",
            "ArrowEvalPythonExec",
        ),
        # codegen spans only exist once AQE materializes stages, so the
        # tree walk over the initial plan can't see them — count the
        # "*(k)" markers in the string (distinct span ids), as before
        "wsc": len(set(re.findall(r"\*\((\d+)\)", full))),
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
        "at other scales). Counts cover the EXECUTABLE plan only — each",
        "cached relation's embedded build subtree is excluded, so a frame",
        "persisted once and scanned N times no longer N-counts its build",
        "(round-12 fix). Sorted by query key.",
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
