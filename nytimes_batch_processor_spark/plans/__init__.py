"""Plan inspection helpers — the engine's 100 TB posture checks.

Used by tests to assert the physical plans are the ones we'd want on a
real cluster: broadcasts where expected, filters pushed into the scan,
pruned read schemas, whole-stage codegen coverage — not just that the
answers are right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan nodes (empty string if the
    plan pushes nothing — a red flag for selective queries)."""
    plan = physical_plan(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def read_schema(df: DataFrame) -> str:
    """ReadSchema lines — verifies column pruning reached the scan."""
    plan = physical_plan(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "ReadSchema" in line)
