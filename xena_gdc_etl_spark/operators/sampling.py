"""Deterministic sampling / split assignment for training-data pipelines.

Splits must be (a) stable across runs and cluster layouts — membership is a
pure function of the record key, never of partition order or RNG state —
and (b) computable without a shuffle. Both come from hashing the key with a
portable digest (md5 → 60-bit int, the same construction as
functions.md5_hash60), so any other engine can reproduce the assignment.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Hash-space resolution for split boundaries: fractions are exact at 1/10000.
_BUCKETS = 10_000


def _bucket(key: Column, seed: str) -> Column:
    # Null keys hash as a sentinel string, not null — otherwise every
    # comparison on the bucket is null and null-keyed rows silently fall
    # into whatever the otherwise-branch is.
    key_str = F.coalesce(key.cast("string"), F.lit("\x00null"))
    digest = F.md5(F.concat(F.lit(seed), key_str))
    return F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint") % _BUCKETS


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: Mapping[str, float] | None = None,
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Label every row with its split ("train"/"valid"/"test" by default).

    Fractions are cumulative bucket ranges over the key hash; rows with the
    same key always land in the same split (leakage-safe for grouped data).
    Pure projection — no shuffle, survives any repartitioning.
    """
    splits = dict(splits or {"train": 0.8, "valid": 0.1, "test": 0.1})
    bucket = _bucket(F.col(key_col), seed)
    expr = None
    upper = 0.0
    names = list(splits)
    for name in names[:-1]:
        upper += splits[name]
        cond = bucket < int(round(upper * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: str = "",
) -> DataFrame:
    """Deterministic ~``fraction`` sample by key hash. Unlike
    ``DataFrame.sample`` this is reproducible across runs/planners and keeps
    all rows of a sampled key together.
    """
    return df.filter(_bucket(F.col(key_col), seed) < int(round(fraction * _BUCKETS)))


def sample_by_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-group sampling rates (e.g. downsample boilerplate-heavy sources,
    keep rare ones whole) — the deterministic twin of ``sampleBy``.
    """
    bucket = _bucket(F.col(key_col), seed)
    thresh: Column = F.lit(int(round(default_fraction * _BUCKETS)))
    for value, frac in fractions.items():
        thresh = (
            F.when(F.col(group_col) == value, int(round(frac * _BUCKETS)))
            .otherwise(thresh)
        )
    return df.filter(bucket < thresh)
