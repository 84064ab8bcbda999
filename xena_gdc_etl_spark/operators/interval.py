"""Range (point-in-interval) join.

Spark has no native range join either (cf. operators/asof.py). The naive
formulation is a cross join + filter — quadratic, dead at scale. The
distributed formulation buckets time into fixed-width bins: every interval
explodes to the bins it covers (≈ interval_len / bin_width + 1 rows, ~2 when
the widths match), every point lives in exactly one bin, and the match
becomes an equi-join on the bin key that Catalyst shuffles/broadcasts like
any other join. Each (point, interval) pair appears exactly once — a point's
bin is covered by the interval iff the point can match — so no dedup pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICROS = 1_000_000


def _bin(ts: Column, bin_seconds: int) -> Column:
    # floor-division of epoch-µs; negative-safe via floor(double/width).
    # NTZ columns cast to TIMESTAMP first (value-preserving in the UTC
    # session) — unix_micros rejects TIMESTAMP_NTZ outright.
    return F.floor(
        F.unix_micros(ts.cast("timestamp")) / F.lit(bin_seconds * MICROS)
    ).cast("bigint")


def point_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int,
    max_bins_per_interval: int = 1_000_000,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= point_ts < end`` (half-open, the SQL-inequality-join shape).

    ``bin_seconds`` should be on the order of the typical interval length:
    shorter bins inflate the interval fan-out, longer bins inflate the
    post-join filter work. Degenerate intervals (end <= start) match
    nothing. Column names must be disjoint across the two inputs.

    ``max_bins_per_interval`` fails the job LOUDLY (with the offending
    span in the error) instead of letting one open-ended sentinel
    interval (end = 9999-12-31) materialize a multi-billion-element
    sequence — which would otherwise OOM the task or hit Spark's sequence
    length ceiling with an unhelpful error. Raise the cap deliberately if
    genuinely enormous spans are real; the right fix is usually a bigger
    ``bin_seconds`` or clamping sentinel end dates first.
    """
    p = points.withColumn("__bin", _bin(F.col(point_ts), bin_seconds))
    last_bin = _bin(
        F.timestamp_micros(F.unix_micros(F.col(end_col).cast("timestamp")) - 1),
        bin_seconds,
    )
    first_bin = _bin(F.col(start_col), bin_seconds)
    n_bins = last_bin - first_bin + 1
    guard = F.when(
        n_bins <= F.lit(int(max_bins_per_interval)),
        F.lit(True),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "point_interval_join: interval spans %s bins of "
                f"{bin_seconds}s (cap {max_bins_per_interval}) — a "
                "sentinel end date or too-small bin_seconds",
                n_bins.cast("string"),
            )
        )
    )
    bins = F.when(
        F.col(end_col) > F.col(start_col),
        F.when(guard, F.sequence(first_bin, last_bin)),
    ).otherwise(F.array().cast("array<bigint>"))
    i = intervals.withColumn("__bin", F.explode(bins))
    return (
        p.join(i, "__bin")
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("__bin")
    )
