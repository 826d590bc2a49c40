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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4): typed state + event-time timers
# ---------------------------------------------------------------------------

SESSION_OUT_SCHEMA = (
    "user_id LONG, session_start_us LONG, session_end_us LONG, "
    "n_events LONG, total_value DOUBLE"
)


def fold_session(state, ts_us_seq, value_seq, gap_us: int):
    """ONE batch of one user's rows (event-time order) through the
    session machine: returns (new_state, closed_sessions). State is
    (start_us, last_us, n, total) or None. Shared by the streaming
    processor and its replay tests — same transition-code-reuse pattern
    as `fold_totals`.

    Late-event semantics (ADVICE r7): an in-gap event whose ts is
    EARLIER than the stored session start (possible only across
    micro-batches under a nonzero watermark delay — within a batch the
    caller feeds event-time order) extends the session start downward
    via min(start, ts); last/timer-horizon are unaffected (max). If the
    late event is even earlier than start - gap, it is still absorbed
    into the open session rather than opening a retroactive one — the
    state machine cannot split an already-merged session.

    DIVERGENCE, stated explicitly (ADVICE r8): that absorb boundary is
    unreachable only while the watermark delay is <= the session gap.
    The shipped timer configuration uses delay 1h > gap 30min
    (sessionize.py _TIMER_DELAY_US/_TIMER_GAP_US), so a
    watermark-admissible event more than one gap before the open
    session's start CAN arrive across micro-batches, and the live
    operator MERGES it (monotone min-start absorb) where batch
    gaps-and-islands would place it in its own earlier session. This is
    the operator's chosen semantics — a streaming state machine that
    emitted-or-kept exactly one open session per key cannot
    retroactively split — and it is pinned, not hidden:
    tests/test_streaming.py::test_fold_session_unsorted_across_batches
    asserts the absorb, and the hash-checked twin
    (sessionize_timers_twin) certifies the event-time-ordered replay,
    where the boundary cannot occur, so twin and oracle stay exact."""
    closed = []
    for ts, v in zip(ts_us_seq, value_seq):
        ts = int(ts)
        if state is not None and ts > state[1] + gap_us:
            closed.append(state)
            state = None
        if state is None:
            state = (ts, ts, 1, float(v))
        else:
            start, last, n, total = state
            state = (min(start, ts), max(last, ts), n + 1, total + float(v))
    return state, closed


def make_session_processor(gap_us: int):
    """Builds a StatefulProcessor closing sessions EITHER by a newer
    in-gap-violating event (emitted from handleInputRows) OR by the
    event-time watermark passing last_ts + gap (emitted from
    handleExpiredTimer) — the piece applyInPandasWithState cannot
    express: its timeouts are per-key opaque, while timers here are
    explicit event-time alarms the processor sets and re-sets.

    Requires the RocksDB state store provider
    (`spark.sql.streaming.stateStore.providerClass` =
    `...state.RocksDBStateStoreProvider`) — transformWithState keeps
    multiple named state variables + timers per key, which the
    HDFS-backed provider does not support — and the `protobuf` package
    (Spark's transformWithState driver<->worker state protocol); the
    sandbox ships neither protobuf nor an install path, so the live
    streaming test skips there (`tests/test_streaming.py`) while the
    transition function stays pinned engine-free via `fold_session`. Scale notes: state is
    O(active keys) x 32 B; timers live in the same store, partitioned
    by key; each micro-batch shuffles only that batch's rows on the
    group key (same exchange the aggregation would need) and RocksDB
    spills state to local disk, so total state may exceed executor
    memory — the property that matters at a 100M-user scale."""
    import pandas as pd  # executor-side import keeps pickling cheap

    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    def _emit(key, closed):
        return pd.DataFrame(
            {
                "user_id": [key] * len(closed),
                "session_start_us": [c[0] for c in closed],
                "session_end_us": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
                "total_value": [c[3] for c in closed],
            }
        )

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.session = handle.getValueState(
                "session", "start_us LONG, last_us LONG, n LONG, total DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues: TimerValues):
            state = tuple(self.session.get()) if self.session.exists() else None
            prev_last = state[1] if state is not None else None
            ts_all, v_all = [], []
            for pdf in rows:
                ts_all.extend(
                    int(t) // 1000 for t in pdf["ts"].astype("int64")
                )  # ns -> us
                v_all.extend(float(v) for v in pdf["value"])
            order = sorted(range(len(ts_all)), key=lambda i: ts_all[i])
            state, closed = fold_session(
                state,
                [ts_all[i] for i in order],
                [v_all[i] for i in order],
                gap_us,
            )
            self.session.update(state)
            # one live alarm per key: re-arm at the new session horizon
            if prev_last is not None:
                self.handle.deleteTimer((prev_last + gap_us) // 1000)
            self.handle.registerTimer((state[1] + gap_us) // 1000)
            if closed:
                yield _emit(key[0], closed)

        def handleExpiredTimer(
            self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
        ):
            if self.session.exists():
                state = tuple(self.session.get())
                self.session.clear()
                yield _emit(key[0], [state])

        def close(self) -> None:
            pass

    return SessionProcessor()


def sessionize_with_timers(
    events: DataFrame, gap_seconds: int = 1800, delay: str = "0 seconds"
) -> DataFrame:
    """Closed gap-sessions over a streaming (user_id, ts, value) frame,
    emitted as soon as EITHER a newer event proves the gap elapsed OR
    the event-time watermark passes last_ts + gap. Append-mode output:
    each closed session exactly once."""
    return (
        events.withWatermark("ts", delay)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=make_session_processor(gap_seconds * 1_000_000),
            outputStructType=SESSION_OUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
