"""Plan-shape inspection helpers.

Used by tests to assert the physical plans the engine promises: filters
pushed to the parquet scan, pruned read schemas, broadcast joins for dim
tables, and no row-at-a-time Python UDFs in hot paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the scan's PushedFilters mention ``fragment``."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in the parquet scan's ReadSchema (pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(f.split(":")[0].strip() for f in inner.split(",") if ":" in f)
    return cols

def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def python_udf_count(df: DataFrame) -> int:
    """Count row-at-a-time Python UDF evals (BatchEvalPython). Arrow-batched
    pandas stages (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)
    are allowed and not counted.
    """
    return formatted_plan(df).count("BatchEvalPython")


def window_specs(df: DataFrame) -> list[str]:
    """Raw ``windowspecdefinition(...)`` fragments from the physical plan —
    lets tests assert window partitioning shapes (e.g. "every window that
    orders the big table also partitions by the shard id, so no task holds
    a whole group").
    """
    import re

    return re.findall(r"windowspecdefinition\([^)]*\)", formatted_plan(df))


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes in the physical plan (broadcast
    exchanges excluded — they ship a dim table, not the fact stream).
    """
    import re

    return len(re.findall(r"^\(\d+\) Exchange", formatted_plan(df), re.M))
