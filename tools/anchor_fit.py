#!/usr/bin/env python
"""Fit each headline query's anchor-class weight vector from the
recorded bench history (VERDICT r16 item 1 — the derivation behind
``bench._ANCHOR_WEIGHTS``).

Model: a query's min-wall in round r is ``base * (w . drift_r)`` where
``drift_r`` is the round's anchor walls divided by their REF values and
``w`` lives on the weight simplex over the anchor CLASSES (cpu +
shuffle + scan + python = 1; the python axis exists from r18). For each
query, grid-search the simplex at 0.05 resolution minimizing the
variance of ``log(wall / (w . drift))`` across rounds — the weight
vector under which the query's residual (its true cost) is most nearly
constant. Rounds missing an anchor (every round before r18 lacks
``anchor_python``) constrain the fit through the SAME renormalization
``bench._class_corrected`` applies at correction time: the blend runs
over the classes that round actually measured, weights rescaled to
unit mass — so pre-r18 rounds pin the cpu/shuffle/scan PROPORTIONS
while only python-anchored rounds inform the python share. This is
exact enough for its purpose: the r16 adjudication churn came from a
1.51x shuffle-drift host being corrected by a 1.12x composite, an
error far larger than the fit's residuals (log-rmse <= 0.12 for every
stable-shape query).

Caveats the table in bench.py encodes by hand:
- entries whose BENCH SHAPE changed mid-history fit garbage on the full
  window (sim_ann_ivf_topk gained its in-query recall judge in r11:
  rmse 0.40 full-window vs 0.095 from r11) — pass ``--since`` per query
  to refit on the stable window;
- entries with < 4 anchored rounds are not fitted at all — bench.py
  assigns those from the plan shape and marks them provisional;
- a python share resting on < 4 python-anchored rounds is reported
  with that count and stays PROVISIONAL in bench.py's table — one
  python round can be fitted exactly by ANY share (unidentifiable),
  so the tool prints n_python alongside the vector;
- REACHABLE-SIMPLEX BOUNDARY (ADVICE r19 #3): a candidate vector with
  zero blendable mass for ANY observed round is discarded — so against
  a mixed history (JVM-only rounds present), the pure-python corner
  (0, 0, 0, 1) is unreachable and the largest fittable python share is
  1 - grid_step = 0.95. A genuinely python-dominated query therefore
  SATURATES at the edge rather than fitting ~1.0; `fit` reports
  ``at_python_edge`` and the CLI prints the marker so a saturated 0.95
  is read as "at least this much, censored by the history", never as
  a measured share.

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
REF = {
    "anchor_cpu": 0.42,
    "anchor_shuffle": 0.31,
    "anchor_scan": 0.125,
    "anchor_python": 0.48,  # seeded r18; absent from earlier rounds
}
CLASSES = ("cpu", "shuffle", "scan", "python")
#: the three anchors every fit-eligible round must carry (python is
#: optional — the renormalized blend handles its absence)
REQUIRED = ("anchor_cpu", "anchor_shuffle", "anchor_scan")


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
        if not all(a in anchors for a in REQUIRED):
            continue  # only rounds with the JVM anchor trio constrain w
        drift = {
            cls: anchors[f"anchor_{cls}"] / REF[f"anchor_{cls}"]
            for cls in CLASSES
            if f"anchor_{cls}" in anchors
        }
        rounds[int(m.group(1))] = (parsed["queries"], drift)
    return rounds


def fit(
    name: str, rounds: dict[int, tuple[dict, dict]], since: int = 0
) -> tuple[tuple[float, float, float, float], float, float, int, int, bool] | None:
    obs = [
        (q[name], drift)
        for rnd, (q, drift) in sorted(rounds.items())
        if rnd >= since and q.get(name)
    ]
    if len(obs) < 4:
        return None
    n_python = sum(1 for _, d in obs if "python" in d)
    # the largest python share any candidate can carry against THIS
    # history: 1.0 when every round measured python, else one grid
    # step below (some JVM weight must remain blendable for the
    # python-less rounds) — see the module docstring's boundary note
    max_python = 1.0 if n_python == len(obs) else 0.95
    grid = [i / 20 for i in range(21)]
    best = None
    for a in grid:
        for b in grid:
            if a + b > 1.0001:
                continue
            for c in grid:
                if a + b + c > 1.0001:
                    continue
                w = dict(
                    zip(CLASSES, (a, b, c, abs(round(1 - a - b - c, 2))))
                )
                logs = []
                for wall, d in obs:
                    # bench._class_corrected's renormalization: blend
                    # only the classes this round measured, weights
                    # rescaled to unit mass
                    avail = [
                        (cls, wt) for cls, wt in w.items()
                        if cls in d and wt > 0
                    ]
                    mass = sum(wt for _, wt in avail)
                    if not avail or mass <= 0:
                        logs = None  # this w has no blend for a round
                        break
                    bl = sum(wt / mass * d[cls] for cls, wt in avail)
                    logs.append(math.log(wall / bl))
                if logs is None:
                    continue
                mu = sum(logs) / len(logs)
                err = sum((l - mu) ** 2 for l in logs)
                if best is None or err < best[0]:
                    best = (err, tuple(w.values()), math.exp(mu))
    err, w, base = best
    at_edge = w[3] >= max_python - 1e-9 and max_python < 1.0
    return w, base, math.sqrt(err / len(obs)), len(obs), n_python, at_edge


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
        w, base, rmse, n, n_py, at_edge = got
        print(
            f"{name}: w_cpu={w[0]:.2f} w_shuffle={w[1]:.2f} w_scan={w[2]:.2f}"
            f" w_python={w[3]:.2f} base={base:.2f}s log_rmse={rmse:.3f}"
            f" n={n} n_python={n_py}"
            + (
                "  [python share provisional: <4 python-anchored rounds]"
                if w[3] > 0 and n_py < 4
                else ""
            )
            + (
                "  [w_python at reachable-simplex edge: JVM-only rounds"
                " cap the fittable share at 0.95 — read as censored,"
                " not measured]"
                if at_edge
                else ""
            )
        )


if __name__ == "__main__":
    main()
