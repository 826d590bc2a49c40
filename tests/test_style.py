"""Source-level guards for engine-wide invariants that a single red
driver row is too slow to teach twice.

These are grep-tests: they read the package source, not run it, so they
catch a violation in ANY code path — including ones the sf0.01 fixtures
never exercise.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest
from pyspark.sql import types as T

PKG = Path(__file__).resolve().parent.parent / "nytimes_batch_processor_spark"
SOURCES = sorted(PKG.rglob("*.py"))


def test_no_bare_unix_micros():
    """PySpark 4.1 ANSI rules reject ``unix_micros`` on TIMESTAMP_NTZ
    (which inferTimestampNTZ makes every parquet ts column), so the only
    allowed call site is ``functions.epoch_us`` which casts first. The
    r4 regression (3 red driver rows, 9 failed tests, a crashed bench)
    was exactly this pattern scattered across call sites."""
    offenders = []
    for path in SOURCES:
        if path == PKG / "functions" / "__init__.py":
            continue
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if re.search(r"\bF\.unix_micros\(|\bunix_micros\s*\(", line):
                # SQL oracle strings use DuckDB's epoch_us, never
                # unix_micros — any hit is Python-side and wrong.
                offenders.append(f"{path.relative_to(PKG)}:{i}: {line.strip()}")
    assert not offenders, (
        "bare unix_micros outside functions.epoch_us (NTZ-unsafe on "
        "PySpark 4.1):\n" + "\n".join(offenders)
    )


def test_no_row_at_a_time_python_udfs():
    """Plain ``F.udf`` is row-at-a-time Python — 10-100x slower than the
    Arrow-batched pandas_udf/mapInPandas paths this engine standardizes
    on (functions/udfs.py module docstring)."""
    offenders = []
    for path in SOURCES:
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if re.search(r"\bF\.udf\(|\budf\s*\(\s*lambda", line):
                offenders.append(f"{path.relative_to(PKG)}:{i}: {line.strip()}")
    assert not offenders, "row-at-a-time F.udf found:\n" + "\n".join(offenders)


def test_no_decimal_in_catalog_output_schemas(spark, sf_dir):
    """Output-boundary rule: DECIMAL is an internal determinism tool
    (order-independent money sums — functions/__init__.py precision
    policy); the *returned* schema of every catalog entry must cast it
    away. Different DuckDB/Arrow versions disagree on whether functions
    like ROUND(list_sum(decimal)) stay decimal or widen to double, so a
    decimal output column hash-matches locally and red-lines on the
    driver (r3 fn_math_surface, r4 fn_higher_order_surface — same bug
    class twice)."""
    from nytimes_batch_processor_spark.catalog import all_specs

    offenders = []
    for name, spec in sorted(all_specs().items()):
        schema = spec.fn(spark, sf_dir).schema
        for f in schema.fields:
            if isinstance(f.dataType, T.DecimalType):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, (
        "catalog entries returning DECIMAL at the output boundary "
        "(cast to double):\n" + "\n".join(offenders)
    )
