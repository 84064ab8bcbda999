"""Custom stateful streaming operators via ``applyInPandasWithState``.

For aggregations Spark's built-ins can't express (running totals that must
emit on every micro-batch, custom eviction policies), the state store API
gives an Arrow-batched hook: per group key, the handler sees this batch's
rows plus its persisted state, updates the state, and emits. State lives in
the checkpointed state store — executor loss does not lose it.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_running_totals(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) emitted after every micro-batch — the
    "lifetime counters" pattern built-in windowed aggs can't give you
    (they emit per window, not per key-forever).

    State is one (count, sum) pair per key — O(distinct keys), independent
    of stream length.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} string, n bigint, total double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
