#!/usr/bin/env python
"""Regenerate BENCH_TREND.jsonl from the recorded BENCH_r*.json history
(VERDICT r10 stretch 8): one line per round with the raw total, the
env_factor micro-anchor reading, the drift-corrected total, and the
per-query seconds — so round-over-round comparison stops being a
judge-side script ten files deep.

Idempotent regeneration (never append): rerunning after any round
rewrites the whole file from the recorded history, so the artifact can
never drift from its sources. Also emits, per line, the like-for-like
delta vs the PREVIOUS round: corrected totals restricted to the queries
the two rounds share (the honesty rule from the r9 bench note — a bench
list that grew by 3 queries is not a 3-query regression).

Run `python tools/bench_trend.py` from the repo root; the round
checklist runs it after each recorded bench.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rounds() -> list[tuple[int, dict]]:
    rounds = []
    for path in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"_r0*(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rec = json.load(f)
        parsed = rec.get("parsed")
        if not isinstance(parsed, dict) or "queries" not in parsed:
            continue  # a crashed bench run recorded no parsable line
        rounds.append((int(m.group(1)), parsed))
    # sort by the ROUND NUMBER, never the filename: an unpadded
    # 'BENCH_r7.json' or a 3-digit round would otherwise misorder the
    # vs_prev chain silently
    return sorted(rounds)


def trend_lines(rounds: list[tuple[int, dict]]) -> list[dict]:
    lines: list[dict] = []
    prev: tuple[int, dict] | None = None
    for rnd, parsed in rounds:
        env = parsed.get("env_factor")  # absent before r9
        corrected = parsed.get(
            "value_env_corrected",
            round(parsed["value"] / env, 3) if env else None,
        )
        line = {
            "round": rnd,
            "sf": parsed.get("sf"),
            "n_queries": len(parsed["queries"]),
            "raw_total_sec": parsed["value"],
            "env_factor": env,
            "corrected_total_sec": corrected,
            "queries": parsed["queries"],
        }
        # r17: per-anchor-class correction (VERDICT r16 item 1) — carry
        # the class-corrected total when the round recorded one
        if "value_env_corrected_by_class" in parsed:
            line["class_corrected_total_sec"] = parsed[
                "value_env_corrected_by_class"
            ]
        if prev is not None:
            prnd, pq = prev
            shared = sorted(set(parsed["queries"]) & set(pq["queries"]))
            cur_s = sum(parsed["queries"][q] for q in shared)
            prev_s = sum(pq["queries"][q] for q in shared)
            penv = pq.get("env_factor")
            line["vs_prev"] = {
                "round": prnd,
                "shared_queries": len(shared),
                "shared_raw_ratio": round(cur_s / prev_s, 3) if prev_s else None,
                # drift-corrected like-for-like: divide each side by its
                # own anchor factor before comparing
                "shared_corrected_ratio": (
                    round((cur_s / env) / (prev_s / penv), 3)
                    if env and penv and prev_s
                    else None
                ),
            }
            # class-corrected like-for-like, only when BOTH rounds
            # recorded per-query class-corrected walls (r17+)
            cc, pcc = (
                parsed.get("queries_env_corrected"),
                pq.get("queries_env_corrected"),
            )
            if cc and pcc:
                cshared = sorted(set(cc) & set(pcc) & set(shared))
                cur_c = sum(cc[q] for q in cshared)
                prev_c = sum(pcc[q] for q in cshared)
                if prev_c:
                    line["vs_prev"]["shared_class_corrected_ratio"] = round(
                        cur_c / prev_c, 3
                    )
        lines.append(line)
        prev = (rnd, parsed)
    return lines


def main() -> None:
    rounds = load_rounds()
    if not rounds:
        print("no BENCH_r*.json with a parsed payload found", file=sys.stderr)
        sys.exit(1)
    out_path = os.path.join(REPO, "BENCH_TREND.jsonl")
    lines = trend_lines(rounds)
    with open(out_path, "w") as f:
        for line in lines:
            f.write(json.dumps(line) + "\n")
    last = lines[-1]
    print(
        f"wrote {len(lines)} rounds to BENCH_TREND.jsonl; "
        f"latest r{last['round']}: raw {last['raw_total_sec']}s, "
        f"corrected {last['corrected_total_sec']}s over {last['n_queries']} queries"
    )


if __name__ == "__main__":
    main()
