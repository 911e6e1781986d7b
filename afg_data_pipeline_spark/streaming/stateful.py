"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.10 / north star: "applyInPandasWithState for custom
stateful operators").

The built-in windows (streaming/windows.py) cover time-bucketed
aggregation; this module covers arbitrary per-key running state —
the shape the built-ins can't express (per-user lifetime counters,
custom session logic, model-ish online accumulators).

State design rules encoded here:
- state is a tiny fixed-width tuple per key (counters), not row
  history — the store is keyed by group and must stay O(keys);
- a processing-time timeout evicts idle keys so an unbounded key
  space cannot grow state forever;
- output is emitted per micro-batch (update semantics): one row per
  key per batch with the running totals after that batch.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import (
    GroupState,
    GroupStateTimeout,
)

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, "
    "max_value double"
)
STATE_SCHEMA = "n long, total double, mx double"


def _make_update_fn(timeout_ms: int | None):
    def update_user_totals(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Running per-user totals across micro-batches.

        The pandas frames of one key in one micro-batch stream
        through; the (count, sum, max) triple persists in the state
        store between batches.
        """
        if timeout_ms is not None and state.hasTimedOut:
            # Idle key: drop the state (bounded store), emit an
            # empty typed frame — the protocol still expects output
            # batches from a timed-out invocation.
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "total_value": pd.Series([], dtype="float64"),
                    "max_value": pd.Series([], dtype="float64"),
                }
            )
            return
        n, total, mx = (
            state.get if state.exists else (0, 0.0, float("-inf"))
        )
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, total, mx))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "max_value": [mx],
            }
        )

    return update_user_totals


def running_user_totals(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-user lifetime (count, sum, max) updated every batch.

    Works only on streaming DataFrames (state needs a stream); the
    batch twin for parity checks is a plain groupBy aggregate.

    ``idle_timeout_ms`` (processing-time state eviction) is for
    continuous jobs with unbounded key spaces. Leave None for
    availableNow backfills/tests: a ProcessingTimeTimeout query
    NEVER terminates under availableNow — after the data is drained
    it keeps firing state-cleanup triggers forever.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
