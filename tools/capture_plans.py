#!/usr/bin/env python
"""Capture .explain('formatted') for headline queries into plans/r<N>/.

Usage: python tools/capture_plans.py before|after [name ...]
(no names = every bench headline + curation_pipeline + flagship).
Set SPARK_GRAFT_PLANS_ROUND to pick the round directory (default r21).

The optimization-round evidence contract: the judge cannot run Spark,
so every plan claim in OPTIMIZATION_r<N>.md must be checkable against
these committed files. NOTE: several entries execute eager sub-jobs
(index builds, localCheckpoints) while *constructing* their DataFrame;
capture therefore runs a real session over $SPARK_GRAFT_SF_DIR
(default sf0.1) and takes a few minutes.

r21 (VERDICT r20 item 4): the final frame of a lifecycle entry is often
a thin projection over already-materialized localCheckpoints, so the
interesting plans — the checkpoint-PRODUCING jobs where the fan-out and
pushdown claims live — never appeared in the committed dumps. The
capture now hooks ``DataFrame.localCheckpoint`` for the duration of each
entry's construction and writes every pre-checkpoint frame's formatted
plan into ``<name>_<tag>_ckpt<i>.txt`` alongside the final plan, so
"done" is auditable from the repo without event logs.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nytimes_batch_processor_spark.session import get_spark  # noqa: E402


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    # Patch the CLASSIC DataFrame class — entries instantiate
    # pyspark.sql.classic.dataframe.DataFrame, whose own
    # localCheckpoint overrides anything set on the abstract parent.
    from pyspark.sql.classic.dataframe import DataFrame

    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r21")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        rnd,
    )
    os.makedirs(out_dir, exist_ok=True)

    import bench
    from nytimes_batch_processor_spark.catalog import all_specs
    from nytimes_batch_processor_spark.flagship import flagship

    specs = all_specs()
    if not names:
        names = [*bench.HEADLINE, "curation_pipeline", "flagship"]
    spark = get_spark("plan-capture", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    rc = 0
    orig_ckpt = DataFrame.localCheckpoint
    for name in names:
        if name == "flagship":
            fn = flagship
        elif name == "curation_pipeline":
            fn = bench.curation_pipeline
        else:
            fn = specs[name].fn
        ckpt_plans: list[str] = []

        def hooked(self, eager=True, _plans=ckpt_plans):
            # Record the frame ABOUT TO BE materialized — the job whose
            # partitioning/pushdown the optimization claims are about.
            try:
                _plans.append(_formatted(self))
            except Exception as exc:  # noqa: BLE001 — evidence best-effort
                _plans.append(f"CKPT CAPTURE ERROR: {type(exc).__name__}: {exc}")
            return orig_ckpt(self, eager=eager)

        DataFrame.localCheckpoint = hooked
        try:
            df = fn(spark, sf_dir)
            plan = _formatted(df)
        except Exception as exc:  # noqa: BLE001 — capture what we can
            plan = f"CAPTURE ERROR: {type(exc).__name__}: {exc}"
            rc = 1
        finally:
            DataFrame.localCheckpoint = orig_ckpt
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        for i, cplan in enumerate(ckpt_plans):
            cpath = os.path.join(out_dir, f"{name}_{tag}_ckpt{i}.txt")
            with open(cpath, "w") as f:
                f.write(cplan)
            print(f"wrote {cpath} ({len(cplan)} chars)")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
