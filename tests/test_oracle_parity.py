"""Mirror of the driver's t2 gate: every catalog query with an oracle is
run in Spark AND DuckDB on the same fixtures; results must match as
order-insensitive multisets with columns sorted by name (the driver's
hash-compare, but with readable diffs)."""

from __future__ import annotations

import datetime
import decimal
import math

import pytest

from nytimes_batch_processor_spark.catalog import all_specs

SPECS = all_specs()
ORACLE_SPECS = sorted(name for name, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_SPECS = sorted(name for name, s in SPECS.items() if s.oracle is None)


def _norm_value(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver hashes raw values; we normalize only the float repr edge
        # where -0.0 == 0.0 but str differs
        return v + 0.0
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def canonical(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", ORACLE_SPECS)
def test_oracle_parity(name, spark, duck, sf_dir):
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    cur = duck.execute(spec.oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()

    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={sorted(scols)} duck={sorted(dcols)}"
    )
    s_canon = canonical(srows, scols)
    d_canon = canonical(drows, dcols)
    assert len(s_canon) == len(d_canon), (
        f"{name}: row count spark={len(s_canon)} duck={len(d_canon)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY_SPECS)
def test_rows_only_queries_run(name, spark, sf_dir):
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_dir)
    n = sdf.count()
    assert n >= 0
    assert sdf.columns  # stable schema
