#!/usr/bin/env python
"""Print the next round's 50-slot sweep window (the _PRIORITY rewrite).

The recurring round-boundary red is catalog._PRIORITY still holding the
PREVIOUS window after a new CORRECTNESS_r{N}.json lands. This tool
computes the r{N+1} window the same way tests/test_rotation.py checks
it: parse the hash-green history, force every oracle-backed entry at
MAX_AGE, then fill by earliest deadline. Run it right after recording a
sweep, paste the list into catalog._PRIORITY (annotated), re-run
`pytest tests/test_rotation.py`.

Caveats the tool cannot know — handle by hand:
- entries whose CODE changed this round must be added to the window
  even if recently green (the r4 lesson generalized);
- new entries registered this round appear under "new (never swept)"
  and must stay in the window;
- consolidations: retire old names from the registry first, then
  re-run this tool.

Usage: python tools/rotation_plan.py
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _gate():
    """Load tests/test_rotation.py as a module so the WINDOW/MAX_AGE
    constants and the history parser are the GATE'S OWN, not a copy
    that can drift (r9 second review: the first version hand-copied
    them and had already dropped the non-matching-filename guard)."""
    spec = importlib.util.spec_from_file_location(
        "rotation_gate", os.path.join(REPO, "tests", "test_rotation.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    from nytimes_batch_processor_spark.catalog import all_specs

    gate = _gate()
    WINDOW, MAX_AGE = gate.WINDOW, gate.MAX_AGE
    latest, last_green = gate._correctness_history()

    specs = all_specs()
    oracle_names = [n for n, s in specs.items() if s.oracle is not None]
    rows_only = [n for n, s in specs.items() if s.oracle is None]

    new = [n for n in oracle_names if n not in last_green]
    aged = sorted(
        (n for n in oracle_names if n in last_green
         and last_green[n] <= latest - MAX_AGE),
        key=lambda n: (last_green[n], n),
    )
    fill = sorted(
        (n for n in oracle_names if n in last_green
         and last_green[n] > latest - MAX_AGE),
        key=lambda n: (last_green[n], n),
    )

    forced = new + aged
    if len(forced) > WINDOW:
        print(f"ERROR: {len(forced)} forced entries exceed the {WINDOW}-slot "
              "window — consolidate before rotating", file=sys.stderr)
        sys.exit(1)
    window = forced + fill[: WINDOW - len(forced)]

    print(f"# r{latest + 1} window proposal ({len(window)} slots):")
    print(f"#   {len(new)} new (never swept): {new}")
    print(f"#   {len(aged)} aged (last green <= r{latest - MAX_AGE}) — forced")
    print(f"#   {WINDOW - len(forced)} earliest-deadline fill from the "
          f"r{latest - MAX_AGE + 1}+ cohorts")
    print(f"#   rows-only (exempt): {rows_only}")
    print("#   REMEMBER: add any entry whose code changed this round.")
    for n in window:
        lg = last_green.get(n)
        print(f'    "{n}",  # last green {"r%d" % lg if lg else "never"}')
    leftover = fill[WINDOW - len(forced):]
    print(f"# {len(leftover)} leftovers -> next round's mandatory core:")
    for n in leftover:
        print(f"#   {n} (last green r{last_green[n]})")


if __name__ == "__main__":
    main()
