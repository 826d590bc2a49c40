"""Driver contract adapter — thin wrapper over the engine's query catalog.

``entry`` runs the flagship chain on sf0.001; ``queries`` /
``oracle_sql`` expose every registered operator from
``nytimes_batch_processor_spark.catalog`` (one entry per SURVEY.md §2
operator; SQL-expressible ones carry a DuckDB oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nytimes_batch_processor_spark import catalog  # noqa: E402
from nytimes_batch_processor_spark.flagship import flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
