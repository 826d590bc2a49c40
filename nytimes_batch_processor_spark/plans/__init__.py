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


def executed_plan(df: DataFrame) -> str:
    """Execute the plan and return the AQE *final* plan string (codegen
    stages appear as '*(n)' markers). The static explain of an adaptive
    plan hides both runtime re-planning and codegen placement."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans in the executed plan — widen
    these (fewer, larger spans) when tuning an operator."""
    import re

    return len(set(re.findall(r"\*\((\d+)\)", executed_plan(df))))


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


def _iter_logical_nodes(node):
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _iter_logical_nodes(children.apply(i))


def window_is_limit_bounded(node) -> bool:
    """True when a (logical) Window node's input is provably <= k rows
    because a GlobalLimit sits directly beneath it (through row-
    preserving Project/Filter nodes only). The orderBy().limit(k)
    -> rank-the-survivors top-k pattern produces exactly this shape:
    the optimizer folds the literal partition key away, but the window
    is bounded by the limit, not by the corpus — categorically safe at
    any scale. (A literal `partitionBy(lit(1))` is optimizer-erased, so
    boundedness must be read off the child, not the partitionSpec.)"""
    child = node
    while True:
        children = child.children()
        if children.size() != 1:
            return False
        child = children.apply(0)
        name = child.nodeName()
        if name == "GlobalLimit":
            return True
        if name not in ("Project", "Filter", "LocalLimit"):
            return False


def unpartitioned_window_violations(df: DataFrame) -> list[str]:
    """Single-partition windows are only acceptable POST-AGGREGATION:
    an unpartitioned Window over raw data funnels the whole input
    through one task — fine over |days| or |nations| rows, a cluster
    killer over a fact table. Walks the optimized logical plan and
    returns a description of every Window node with an empty
    partitionSpec that does NOT have an Aggregate somewhere beneath it
    (empty list = contract holds)."""
    plan = df._jdf.queryExecution().optimizedPlan()  # type: ignore[attr-defined]
    bad: list[str] = []
    for node in _iter_logical_nodes(plan):
        if node.nodeName() != "Window":
            continue
        if node.partitionSpec().size() > 0:
            continue
        if window_is_limit_bounded(node):
            # <= k rows by construction (rank-the-survivors above a
            # GlobalLimit) — safe even with no Aggregate beneath
            continue
        descendants = list(_iter_logical_nodes(node))[1:]
        if not any(d.nodeName() == "Aggregate" for d in descendants):
            bad.append(node.simpleStringWithNodeId())
    return bad
