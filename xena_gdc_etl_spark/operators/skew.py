"""Skew mitigation for hot join keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but it only kicks in for sort-merge joins and after a shuffle has
already materialized the hot partition. Salting attacks the skew *before*
the shuffle: the skewed (big) side scatters each hot key across ``n_salts``
sub-keys, the small side replicates each row ``n_salts`` times, and the join
key becomes (key, salt) — no partition ever holds a whole hot key. Classic
MapReduce-era technique; use when one key holds >~1 partition's worth of
rows and the other side is too big to broadcast outright.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on ``on`` with the hot-key scatter above.

    The big side's salt is a deterministic hash of the whole row (stable
    across retries — no RNG), so the same row always lands in the same
    sub-partition. The small side grows ``n_salts``× — keep it the
    dimension/mapping side. Result rows are identical to the unsalted join.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side must not grow nulls)")
    salted_big = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    salted_small = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("bigint"))
    return salted_big.join(salted_small, [*on, _SALT], how).drop(_SALT)
