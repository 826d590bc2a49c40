"""Custom stateful streaming operators via applyInPandasWithState.

Beyond built-in windows/dedup, a training-data pipeline needs arbitrary
per-key state machines over unbounded streams (running profiles, quota
counters, incremental sketches). Spark's primitive for that is
``applyInPandasWithState``: per key, Arrow batches in, an explicit
GroupState carried across micro-batches, updated rows out.

The operator here — per-user running totals — is deliberately simple so
the test can prove the part that matters: state SURVIVES across
micro-batches (the test forces one file per trigger) and the final
answer equals the batch groupBy over the same input.

Scale notes: state lives in the executor state store partitioned by the
group key (one shuffle per batch, same key partitioning reused); state
size here is O(distinct keys) x 16 bytes. Unbounded key spaces need a
timeout policy (GroupStateTimeout) or watermark-based eviction — wired
through the `timeout` argument.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n LONG, total DOUBLE"
OUTPUT_SCHEMA = "user_id LONG, n_events LONG, total_value DOUBLE"


def fold_totals(n: int, total: float, values: "pd.Series") -> tuple[int, float]:
    """ONE micro-batch state transition of the running-totals machine:
    (n, total) x batch -> (n', total'). Shared by the streaming operator
    below and its batch twin (`stateful_running_totals_twin` in
    operators/sessionize.py), so the hash-checked batch replay exercises
    the exact transition code the state store runs."""
    return n + len(values), total + float(values.sum())


def _update_running_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State machine for one user: fold this batch's rows into (n, total)
    and emit the updated running totals once per batch."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n, total = fold_totals(n, total, pdf["value"])
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(
    events: DataFrame, timeout: str = GroupStateTimeout.NoTimeout
) -> DataFrame:
    """Per-user cumulative (count, value) over a streaming events frame
    with (user_id, value) columns. Each micro-batch emits one updated row
    per active user (output mode 'update')."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
