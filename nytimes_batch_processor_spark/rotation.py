"""Derive the driver-sweep window from the recorded correctness history.

The correctness driver hash-checks only the FIRST ``WINDOW`` catalog
entries per round, so ``catalog`` must emit, ahead of every sweep, the
50 names that keep each oracle-backed entry within ``MAX_AGE`` rounds of
its last driver hash-green row. For three straight rounds (r7-r9) that
window was a hand-pasted ``_PRIORITY`` tuple that went stale the moment
the new ``CORRECTNESS_r{N}.json`` landed — the only recurring pytest red
in the repo (VERDICT r9 item 1). This module makes the window a pure
function of the recorded history so it can never go stale:

    window = aged-out entries (forced by the recency gate)
           + never-swept entries (the r4 lesson: new code gets no hard
             check until the driver hashes it)
           + changed-this-round entries (the r4 lesson generalized:
             re-verify code whose semantics may have moved)
           + one-off rows-only forcings (e.g. giving a no-oracle entry
             its first-ever driver row)
           + earliest-deadline fill from the remaining cohorts.

Earliest-deadline-first is exact for this feasibility problem (single
machine, unit jobs, deadlines = last-green + MAX_AGE + 1), which is why
``tests/test_rotation.py`` simulates the same policy forward to prove
the treadmill stays solvable; this module is the production scheduler
the gate audits.

The reference has no analogue — its whole pipeline re-runs every 15 min
(`deploy/deploy.sh:29`) so every operator is re-verified every run. At
this engine's scale (115+ catalog entries, 50-slot sweeps) verification
itself needs scheduling; treating it as an EDF instance is the same move
a 100 TB table-maintenance planner makes for compaction windows.
"""

from __future__ import annotations

import glob
import json
import os
import re

#: Driver sweep size — observed constant across every recorded round.
WINDOW = 50
#: Rounds an oracle-backed entry may go without a fresh driver hash row.
MAX_AGE = 2


def repo_root() -> str:
    """The directory holding CORRECTNESS_r*.json (the repo root)."""
    env = os.environ.get("SPARK_GRAFT_ROOT")
    if env:
        return env
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def correctness_history(root: str | None = None) -> tuple[int, dict[str, int]]:
    """(latest recorded round, name -> last round with a hash_match row).

    Mirrors the independent parser in ``tests/test_rotation.py`` — the
    gate keeps its own copy on purpose, so a parsing bug here cannot
    silently excuse itself.
    """
    root = root or repo_root()
    latest = 0
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r0*(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        latest = max(latest, rnd)
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, json.JSONDecodeError):  # pragma: no cover
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match"):
                last_green[name] = max(last_green.get(name, 0), rnd)
    return latest, last_green


def plan_window(
    oracle_names: list[str],
    last_green: dict[str, int],
    latest: int,
    *,
    changed: tuple[str, ...] = (),
    rows_only_force: tuple[str, ...] = (),
    registry_names: set[str] | None = None,
) -> tuple[str, ...]:
    """The next sweep's window, deterministic given the history.

    ``oracle_names`` must be in registration order (used as the
    tie-break so the window is stable across processes). ``changed``
    and ``rows_only_force`` are the two facts the history cannot know:
    entries whose code changed this round, and no-oracle entries being
    granted a one-off driver row. ``registry_names`` (the FULL registry
    incl. no-oracle entries) validates ``rows_only_force`` — without
    it the check would be vacuous, since a rows-only name is never in
    ``oracle_names`` and a set built from the overrides themselves
    cannot catch their own typos (self-review r10).
    """
    order = {n: i for i, n in enumerate(oracle_names)}
    oracle_set = set(oracle_names)
    known_rows_only = (
        (registry_names - oracle_set) if registry_names is not None else None
    )
    missing = [n for n in changed if n not in oracle_set]
    if known_rows_only is not None:
        missing += [n for n in rows_only_force if n not in known_rows_only]
    if missing:  # guards against rename drift
        raise KeyError(f"window overrides name unknown queries: {missing}")

    aged = sorted(
        (n for n in oracle_names
         if last_green.get(n, 0) and last_green[n] <= latest - MAX_AGE),
        key=lambda n: (last_green[n], order[n]),
    )
    new = [n for n in oracle_names if n not in last_green]
    forced: list[str] = []
    for name in aged + new + list(changed) + list(rows_only_force):
        if name not in forced:
            forced.append(name)
    if len(forced) > WINDOW:
        raise ValueError(
            f"{len(forced)} forced entries exceed the {WINDOW}-slot window "
            "— consolidate oracle-backed variants before rotating"
        )
    fill = sorted(
        (n for n in oracle_names
         if n not in forced and n in last_green
         and last_green[n] > latest - MAX_AGE),
        key=lambda n: (last_green[n], order[n]),
    )
    return tuple(forced + fill[: WINDOW - len(forced)])
