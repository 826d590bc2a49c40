"""Unit tests for the bench trend generator's arithmetic
(tools/bench_trend.py::trend_lines) — the like-for-like rule must hold:
deltas compare only SHARED queries, each side divided by its own
env_factor, and pre-anchor rounds (no env_factor) degrade to raw-only
lines instead of crashing."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from bench_trend import trend_lines  # noqa: E402


def _parsed(queries: dict, env: float | None = None) -> dict:
    out = {"value": round(sum(queries.values()), 3), "sf": 0.1, "queries": queries}
    if env is not None:
        out["env_factor"] = env
        out["value_env_corrected"] = round(out["value"] / env, 3)
    return out


def test_shared_corrected_ratio_is_like_for_like():
    r1 = _parsed({"a": 1.0, "b": 2.0}, env=1.0)
    # r2: query b doubled, new query c added, host 2x slower (env=2.0)
    r2 = _parsed({"a": 2.0, "b": 4.0, "c": 9.0}, env=2.0)
    lines = trend_lines([(1, r1), (2, r2)])
    vp = lines[1]["vs_prev"]
    assert vp["shared_queries"] == 2
    assert vp["shared_raw_ratio"] == 2.0  # (2+4)/(1+2)
    # corrected: (6/2.0) / (3/1.0) = 1.0 — all raw growth was host drift
    assert vp["shared_corrected_ratio"] == 1.0
    # the new query c never contaminates the delta
    assert lines[1]["n_queries"] == 3


def test_pre_anchor_rounds_degrade_gracefully():
    r1 = _parsed({"a": 1.0})  # no env_factor (pre-r9 shape)
    r2 = _parsed({"a": 1.5}, env=1.0)
    lines = trend_lines([(1, r1), (2, r2)])
    assert lines[0]["env_factor"] is None
    assert lines[0]["corrected_total_sec"] is None
    vp = lines[1]["vs_prev"]
    assert vp["shared_raw_ratio"] == 1.5
    assert vp["shared_corrected_ratio"] is None  # no prev anchor: no claim


def test_disjoint_query_sets_report_zero_shared():
    lines = trend_lines([(1, _parsed({"a": 1.0})), (2, _parsed({"b": 2.0}))])
    vp = lines[1]["vs_prev"]
    assert vp["shared_queries"] == 0
    assert vp["shared_raw_ratio"] is None
