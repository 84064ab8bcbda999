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

    # the key column's OUTPUT type is the input's type, not a
    # hardcoded string — a bigint-keyed stream would otherwise die (or
    # silently coerce) in the Arrow conversion of the handler's output
    key_dt = events.schema[key_col].dataType.simpleString()
    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} {key_dt}, n bigint, total double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_funnel(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming twin of the batch ``event_funnel`` query: per user, track
    the earliest timestamp of each ORDERED funnel stage (stage k only
    counts after stage k-1's time) and emit the user's current stage depth
    every micro-batch.

    State per user is just ``len(stages)`` epoch-micros — O(users), stream
    length independent; order-correct across micro-batches because stage
    times only ever move earlier-or-stay, never depend on within-batch
    arrival order (each batch is sorted by ts before the fold).

    Bounded-state caveat: an event that arrives AFTER a later-stage event
    it should have enabled (cross-batch out-of-order beyond the fold's
    view) can under-count that user's depth — the discarded later-stage
    event is not replayed. The batch ``event_funnel`` query is the exact
    form; in production pair this with a watermark and periodic batch
    reconciliation, the standard lambda treatment for ordered-sequence
    state.

    ``idle_timeout_ms`` bounds state LIFETIME, not just size: with a
    watermarked input, a user idle past the timeout is evicted (final
    depth emitted, state removed) once the watermark passes — without it,
    state is O(all users ever seen), which on an unbounded stream is a
    slow leak no matter how small each entry is.
    """
    n_stages = len(stages)

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if idle_timeout_ms is not None and state.hasTimedOut:
            times = list(state.get) if state.exists else [None] * n_stages
            depth = 0
            for t in times:
                if t is None:
                    break
                depth += 1
            state.remove()
            yield pd.DataFrame({user_col: [key[0]], "stage_depth": [depth]})
            return
        times: list[int | None] = (
            list(state.get) if state.exists else [None] * n_stages
        )
        latest_ms = None
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for typ, ts in zip(pdf[type_col], pdf[ts_col]):
                micros = int(pd.Timestamp(ts).value // 1000)
                ms = micros // 1000
                latest_ms = ms if latest_ms is None else max(latest_ms, ms)
                for k, stage in enumerate(stages):
                    if typ != stage:
                        continue
                    prev_ok = k == 0 or (
                        times[k - 1] is not None and micros > times[k - 1]
                    )
                    if prev_ok and (times[k] is None or micros < times[k]):
                        times[k] = micros
        state.update(tuple(times))
        if idle_timeout_ms is not None and latest_ms is not None:
            state.setTimeoutTimestamp(latest_ms + idle_timeout_ms)
        depth = 0
        for t in times:
            if t is None:
                break
            depth += 1
        yield pd.DataFrame({user_col: [key[0]], "stage_depth": [depth]})

    state_schema = ", ".join(f"t{k} bigint" for k in range(n_stages))
    # key output type derived from the input (see streaming_running_totals)
    user_dt = events.schema[user_col].dataType.simpleString()
    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=f"{user_col} {user_dt}, stage_depth int",
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
