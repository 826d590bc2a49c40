#!/usr/bin/env python
"""Print the derived driver-sweep window (now computed automatically).

Since r10 `catalog.priority_window()` derives the 50-slot window from
the CORRECTNESS_r*.json history at first use (see
`nytimes_batch_processor_spark/rotation.py`), so there is no `_PRIORITY`
tuple to paste any more. This tool remains as the human-readable view of
what the driver will sweep next round and why each name is in (or out):
run it after recording a sweep, or before committing new/changed
entries, to sanity-check the plan.

The two override maps in catalog.py are the only hand-maintained state:
`_CHANGED_BY_ROUND` (code changed this round -> re-enter the window) and
`_ROWS_ONLY_FORCE_BY_ROUND` (grant a no-oracle entry a one-off sweep
slot). Both are keyed by round and expire automatically; a stale key
fails tests/test_rotation.py.

Usage: python tools/rotation_plan.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from nytimes_batch_processor_spark import rotation
    from nytimes_batch_processor_spark.catalog import (
        _CHANGED_BY_ROUND,
        _ROWS_ONLY_FORCE_BY_ROUND,
        all_specs,
        priority_window,
    )

    latest, last_green = rotation.correctness_history()
    upcoming = latest + 1
    specs = all_specs()
    window = priority_window()
    oracle = {n for n, s in specs.items() if s.oracle is not None}
    rows_only = sorted(n for n in specs if n not in oracle)

    new = [n for n in window if n in oracle and n not in last_green]
    aged = [n for n in window if last_green.get(n, 0)
            and last_green[n] <= latest - rotation.MAX_AGE]
    changed = _CHANGED_BY_ROUND.get(upcoming, ())
    forced_rows_only = _ROWS_ONLY_FORCE_BY_ROUND.get(upcoming, ())

    print(f"# derived r{upcoming} window ({len(window)} slots):")
    print(f"#   {len(new)} new (never hash-green): {new}")
    print(f"#   {len(aged)} aged (last green <= r{latest - rotation.MAX_AGE})")
    print(f"#   changed-this-round override: {list(changed)}")
    print(f"#   rows-only one-off force: {list(forced_rows_only)}")
    print(f"#   rows-only entries (recency-exempt): {rows_only}")
    for n in window:
        lg = last_green.get(n)
        tags = []
        if n in changed:
            tags.append("changed")
        if n in forced_rows_only:
            tags.append("rows-only force")
        tag = f"  [{', '.join(tags)}]" if tags else ""
        print(f'    "{n}",  # last green {"r%d" % lg if lg else "never"}{tag}')
    leftover = sorted(
        (n for n in oracle if n not in set(window)),
        key=lambda n: last_green.get(n, 0),
    )
    print(f"# {len(leftover)} oracle-backed leftovers -> future cohorts:")
    for n in leftover:
        print(f"#   {n} (last green r{last_green.get(n, 0)})")


if __name__ == "__main__":
    main()
