"""As-of (backward-looking temporal) join.

Spark has no native ASOF JOIN. The classic distributed formulation is the
union + window trick: interleave both sides on (key, ts), then carry the
most recent right-side row forward with ``last(..., ignorenulls=True)`` over
an unbounded-preceding window. One shuffle on the key (same cost as the
sort-merge join Spark would run anyway), no range cross-join, no per-key
driver loop — holds at 100 TB with AQE handling key skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    right_cols: Sequence[str] = (),
    right_order: Sequence[str] = (),
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``ts_col`` <= left's ``ts_col`` within the same ``on`` key group
    (``direction="backward"``, ties at equal ts match) or the smallest
    ``ts_col`` >= left's (``direction="forward"``) — pandas ``merge_asof``
    direction parity on a distributed plan.

    ``tolerance`` (a Column-compatible interval/number, e.g.
    ``F.expr("INTERVAL 5 MINUTES")``) nulls the match when the matched
    row's ts is farther than the tolerance from the left ts — applied as a
    cheap post-projection, never widening the window.

    ``right_order`` breaks ties among right rows sharing (key, ts): the row
    greatest under this ordering wins, making the result deterministic (the
    equivalent of deduplicating the right side to one row per (key, ts)).
    Right columns are exposed as ``{prefix}{col}``; left rows with no match
    get NULLs (left-outer semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    on = list(on)
    right_cols = [c for c in right_cols if c not in on and c != ts_col]
    payload = [*right_cols, ts_col]

    # The whole right payload travels as ONE struct: carrying columns
    # individually with last(ignorenulls) would mix values from different
    # right rows whenever a payload column is genuinely NULL.
    payload_struct = F.struct(*[F.col(c).alias(c) for c in payload])
    payload_type = right.select(payload_struct.alias("s")).schema["s"].dataType

    left_tagged = left.select(
        *left.columns,
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__payload"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__ord_{c}")
            for c in right_order
        ],
    )
    # SQL comparison semantics: a NULL ts compares UNKNOWN to everything,
    # so a NULL-ts right row can never be an as-of match — but NULLs sort
    # FIRST in the window ordering, where last(ignorenulls) would carry
    # its payload into every left row as a spurious match. Drop them.
    right = right.filter(F.col(ts_col).isNotNull())
    right_tagged = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on and c != ts_col
        ],
        *on,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        payload_struct.alias("__payload"),
        *[F.col(c).alias(f"__ord_{c}") for c in right_order],
    )
    unioned = left_tagged.unionByName(right_tagged)

    if direction == "backward":
        # Right rows (__side=0) sort before left rows at equal ts, so an
        # equal-ts right row is visible to the left row (>= semantics);
        # among equal-(key, ts) right rows the last under right_order wins.
        w = (
            Window.partitionBy(*on)
            .orderBy(
                F.col(ts_col),
                F.col("__side"),
                *[F.col(f"__ord_{c}") for c in right_order],
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.withColumn(
            "__c", F.last(F.col("__payload"), ignorenulls=True).over(w)
        )
    else:
        # Forward: left rows sort before equal-ts right rows (side desc) so
        # an equal-ts right row is inside the following frame; first()
        # picks the earliest right >= left ts, and ord desc keeps the
        # greatest-under-right_order winner among equal-(key, ts) rights.
        w = (
            Window.partitionBy(*on)
            .orderBy(
                F.col(ts_col),
                F.col("__side").desc(),
                *[F.col(f"__ord_{c}").desc() for c in right_order],
            )
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = unioned.withColumn(
            "__c", F.first(F.col("__payload"), ignorenulls=True).over(w)
        )
    # a NULL-ts LEFT row matches nothing either (in forward mode it sorts
    # first and first() would hand it the earliest right row)
    carried = carried.withColumn(
        "__c", F.when(F.col(ts_col).isNotNull(), F.col("__c"))
    )
    if tolerance is not None:
        matched_ts = F.col("__c").getField(ts_col)
        in_tol = (
            matched_ts >= F.col(ts_col) - tolerance
            if direction == "backward"
            else matched_ts <= F.col(ts_col) + tolerance
        )
        carried = carried.withColumn("__c", F.when(in_tol, F.col("__c")))
    return carried.filter(F.col("__side") == 1).select(
        *left.columns,
        *[F.col("__c").getField(c).alias(f"{prefix}{c}") for c in payload],
    )
