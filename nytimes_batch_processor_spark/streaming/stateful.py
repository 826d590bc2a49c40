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


def replay_dedup_within_watermark(ts_us_seq, wm_us_seq, delay_us: int) -> list[int]:
    """Replay ONE key's records (arrival order) through the
    ``dropDuplicatesWithinWatermark`` state machine; returns the indices
    of the kept records.

    ``wm_us_seq[i]`` is the EVICTION watermark already applied to the
    state store when record *i* is processed (``None`` while no
    watermark exists — Spark's initial epoch watermark). Semantics
    replayed, pinned against the real streaming operator in
    ``tests/test_streaming.py::test_dedup_twin_matches_real_stream``
    (empirically probed per micro-batch — the subtleties below are NOT
    what the docs alone suggest):

    - first occurrence of a key is kept and stores state with
      ``expiry = event_ts + delay`` (the FIRST record's event time —
      duplicate arrivals do NOT refresh the expiry);
    - the per-record dedup check consults ONLY state existence: any
      record whose key has live state is dropped, even with a drifted
      timestamp (the retry/replay shape) and even if the current
      batch's watermark already exceeds the expiry;
    - state eviction (``expiry < watermark``) runs at the END of each
      micro-batch using THAT batch's watermark, so it becomes visible
      one batch late: the caller must pass the PREVIOUS batch's
      watermark as ``wm_us_seq[i]`` (batch b's records see evictions
      performed with W(b-1), i.e. max event time through batch b-2
      minus the delay). This bounded, lagging eviction is what keeps
      the state store finite at scale.
    """
    kept: list[int] = []
    expiry: int | None = None
    for i, (ts, wm) in enumerate(zip(ts_us_seq, wm_us_seq)):
        live = expiry is not None and not (wm is not None and expiry < wm)
        if not live:
            kept.append(i)
            expiry = int(ts) + delay_us
    return kept


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
