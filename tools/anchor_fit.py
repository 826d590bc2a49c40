#!/usr/bin/env python
"""Fit each headline query's anchor-class weight vector from the
recorded bench history (VERDICT r16 item 1 — the derivation behind
``bench._ANCHOR_WEIGHTS``).

Model: a query's min-wall in round r is ``base * (w . drift_r)`` where
``drift_r`` is the round's three anchor walls divided by their REF
values and ``w`` lives on the 2-simplex (w_cpu + w_shuffle + w_scan
= 1). For each query, grid-search the simplex at 0.05 resolution
minimizing the variance of ``log(wall / (w . drift))`` across rounds —
the weight vector under which the query's residual (its true cost) is
most nearly constant. This is exact enough for its purpose: the r16
adjudication churn came from a 1.51x shuffle-drift host being corrected
by a 1.12x composite, an error far larger than the fit's residuals
(log-rmse <= 0.12 for every stable-shape query).

Caveats the table in bench.py encodes by hand:
- entries whose BENCH SHAPE changed mid-history fit garbage on the full
  window (sim_ann_ivf_topk gained its in-query recall judge in r11:
  rmse 0.40 full-window vs 0.095 from r11) — pass ``--since`` per query
  to refit on the stable window;
- entries with < 4 anchored rounds are not fitted at all — bench.py
  assigns those from the plan shape and marks them provisional.

Usage: python tools/anchor_fit.py [--since N] [name ...]
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = {"anchor_cpu": 0.42, "anchor_shuffle": 0.31, "anchor_scan": 0.125}
CLASSES = ("cpu", "shuffle", "scan")


def load_history() -> dict[int, tuple[dict, dict]]:
    rounds: dict[int, tuple[dict, dict]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        m = re.search(r"_r0*(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            parsed = json.load(f).get("parsed")
        if not parsed:
            continue
        anchors = parsed.get("env_anchor") or {}
        if set(anchors) != set(REF):
            continue  # only rounds with all three anchors constrain w
        drift = {
            cls: anchors[f"anchor_{cls}"] / REF[f"anchor_{cls}"]
            for cls in CLASSES
        }
        rounds[int(m.group(1))] = (parsed["queries"], drift)
    return rounds


def fit(
    name: str, rounds: dict[int, tuple[dict, dict]], since: int = 0
) -> tuple[tuple[float, float, float], float, float, int] | None:
    obs = [
        (q[name], drift)
        for rnd, (q, drift) in sorted(rounds.items())
        if rnd >= since and q.get(name)
    ]
    if len(obs) < 4:
        return None
    grid = [i / 20 for i in range(21)]
    best = None
    for a in grid:
        for b in grid:
            if a + b > 1.0001:
                continue
            w = (a, b, round(1 - a - b, 2))
            blended = [
                w[0] * d["cpu"] + w[1] * d["shuffle"] + w[2] * d["scan"]
                for _, d in obs
            ]
            logs = [math.log(wall / bl) for (wall, _), bl in zip(obs, blended)]
            mu = sum(logs) / len(logs)
            err = sum((l - mu) ** 2 for l in logs)
            if best is None or err < best[0]:
                best = (err, w, math.exp(mu))
    err, w, base = best
    return w, base, math.sqrt(err / len(obs)), len(obs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--since", type=int, default=0)
    args = ap.parse_args()
    rounds = load_history()
    names = args.names
    if not names:
        names = sorted({n for q, _ in rounds.values() for n in q if q[n]})
    for name in names:
        got = fit(name, rounds, args.since)
        if got is None:
            print(f"{name}: <4 anchored rounds — assign from the plan shape")
            continue
        w, base, rmse, n = got
        print(
            f"{name}: w_cpu={w[0]:.2f} w_shuffle={w[1]:.2f} w_scan={w[2]:.2f}"
            f" base={base:.2f}s log_rmse={rmse:.3f} n={n}"
        )


if __name__ == "__main__":
    main()
