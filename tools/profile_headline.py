#!/usr/bin/env python
"""Per-query profiling for the bench headline set (guide §1: measure
first). For each query, after a warmup invocation, reports:

- build_s: wall for fn(spark, sf_dir) — DataFrame construction, which
  for the lifecycle entries includes eager sub-jobs (index clones,
  localCheckpoints, admission writes);
- exec_s:  wall for the noop-sink write of the returned frame;
- phases:  Catalyst phase durations (analysis/optimization/planning)
           of the final executed plan, from QueryExecution.tracker;
- jobs/stages/tasks: counts observed during build+exec via the
  status tracker delta.

Usage: python tools/profile_headline.py [name ...]  (default: full
headline). Prints one JSON line per query and a sorted summary.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nytimes_batch_processor_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]

    import bench
    from nytimes_batch_processor_spark.catalog import all_specs
    from nytimes_batch_processor_spark.flagship import flagship

    specs = all_specs()
    if not names:
        names = [*bench.HEADLINE, "curation_pipeline", "flagship"]
    spark = get_spark(
        "profile-headline", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    tracker = spark.sparkContext.statusTracker()

    def fn_of(name):
        if name == "flagship":
            return flagship
        if name == "curation_pipeline":
            return bench.curation_pipeline
        return specs[name].fn

    results = []
    for name in names:
        fn = fn_of(name)
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"name": name, "error": f"{type(exc).__name__}: {exc}"[:300]}))
            continue
        n_jobs0 = len(tracker.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        n_jobs1 = len(tracker.getJobIdsForGroup(None))
        phases = {}
        try:
            jmap = df._jdf.queryExecution().tracker().phases()
            it = jmap.iterator()
            while it.hasNext():
                kv = it.next()
                ps = kv._2()
                phases[str(kv._1())] = round(
                    (ps.endTimeMs() - ps.startTimeMs()) / 1000.0, 3
                )
        except Exception:
            pass
        row = {
            "name": name,
            "build_s": round(t1 - t0, 3),
            "exec_s": round(t2 - t1, 3),
            "total_s": round(t2 - t0, 3),
            "jobs": n_jobs1 - n_jobs0,
            "phases": phases,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    results.sort(key=lambda r: -r["total_s"])
    print("\n=== sorted by total_s ===")
    for r in results:
        print(
            f"{r['name']:34s} total={r['total_s']:7.3f} build={r['build_s']:7.3f} "
            f"exec={r['exec_s']:7.3f} jobs={r['jobs']:3d} phases={r['phases']}"
        )
    print(f"TOTAL {sum(r['total_s'] for r in results):.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
