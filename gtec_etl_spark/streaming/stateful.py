"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.10: "applyInPandasWithState for custom stateful operators").

Implements a per-user running aggregate (event count + value total) that
survives across micro-batches — the canonical custom-state shape that
windowed aggregation can't express (state is keyed, unbounded in time, and
updated incrementally). Arrow-batched: the Python hop processes whole
pandas DataFrames per key, never row-at-a-time.

At scale: state lives in the state store partitioned by user_id (one shuffle
on the grouping key); a processing-time timeout evicts idle users so state
is bounded by the active-key set, not history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _make_update_fn(idle_timeout_ms: int | None):
    def _update_user_totals(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # Idle-key eviction: drop the state, emit nothing. The running
            # total restarts from zero if the user ever reappears.
            state.remove()
            return
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return _update_user_totals


def running_user_totals(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-user running totals with explicit keyed state. Each micro-batch
    emits the updated cumulative row for every user seen in the batch.

    State bounding: pass idle_timeout_ms on a continuous stream to evict
    keys idle for that much processing time (state tracks the ACTIVE key
    set, not every user ever seen). The default (None) keeps state for the
    query's lifetime — correct for finite replays, where a processing-time
    timeout would also stall Trigger.AvailableNow termination (the trigger
    waits on registered timeouts)."""
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _make_update_fn(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
