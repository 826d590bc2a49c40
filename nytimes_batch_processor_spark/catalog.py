"""Query catalog: the driver-facing registry of every implemented operator.

Each operator from SURVEY.md §2 registers here as a named query — a
PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) an ANSI-SQL oracle string DuckDB runs on
the same parquet fixtures. ``__spark_entry__.py`` is a thin adapter over
this registry.

Determinism policy (the driver hash-compares values order-insensitively,
columns sorted by name):

- alias every computed column identically in Spark and SQL;
- cast integer SUMs to BIGINT in the oracle (DuckDB widens to HUGEINT);
- round floating aggregates (money -> 2dp, ratios/avgs -> 6dp) on BOTH
  sides so parallel-summation order can't flip the last bits;
- never return raw timestamps — cast to DATE or epoch BIGINT (tz-free);
- tie-break every window ORDER BY and top-k with a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tables: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str, *, oracle: str | None = None, tables: tuple[str, ...] = ()
) -> Callable:
    """Decorator registering an operator query. ``oracle=None`` marks a
    genuinely non-SQL-expressible operator (driver records a rows-only
    check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tables=tables, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def _load_all_modules() -> None:
    """Import every module that registers queries (import side effects)."""
    from .operators import (  # noqa: F401
        relational,
        windows,
        setops,
        asof,
        dedup,
        graph,
        similarity,
        skew,
        text,
        approx,
        sessionize,
    )
    from .functions import scalars, udfs  # noqa: F401
    from . import ingest, multimodal, tables  # noqa: F401


def all_specs() -> dict[str, QuerySpec]:
    _load_all_modules()
    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
