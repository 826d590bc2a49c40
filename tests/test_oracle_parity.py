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

# Entries allowed to return 0 rows (none today — see the vacuity gate).
EMPTY_OK: frozenset[str] = frozenset()


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
    # Vacuity gate (VERDICT r5 stretch 8): a 0=0 "match" is vacuous —
    # past red herrings (r1 dedup_embedding_cosine, r2
    # filter_like_in_patterns) were fixture regressions that emptied an
    # entry while parity stayed green. Every current entry is non-empty
    # at both sf0.001 and sf0.01; list any future legitimately-empty
    # entry in EMPTY_OK with a comment saying why.
    assert name in EMPTY_OK or len(s_canon) > 0, (
        f"{name}: both engines returned 0 rows — vacuous parity; fixture "
        "regression or over-restrictive predicate?"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def _spark_type_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "integer"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "floating"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return "list"
    if isinstance(dt, T.MapType):
        return "map"
    if isinstance(dt, T.StructType):
        return "struct"
    return type(dt).__name__


def _arrow_type_class(dt) -> str:
    import pyarrow.types as pat

    if pat.is_integer(dt):
        return "integer"
    if pat.is_floating(dt):
        return "floating"
    if pat.is_decimal(dt):
        return "decimal"
    if pat.is_boolean(dt):
        return "boolean"
    if pat.is_string(dt) or pat.is_large_string(dt):
        return "string"
    if pat.is_date(dt):
        return "date"
    if pat.is_timestamp(dt):
        return "timestamp"
    if pat.is_binary(dt) or pat.is_large_binary(dt):
        return "binary"
    if pat.is_list(dt) or pat.is_large_list(dt):
        return "list"
    if pat.is_map(dt):
        return "map"
    if pat.is_struct(dt):
        return "struct"
    return str(dt)


@pytest.mark.parametrize("name", ORACLE_SPECS)
def test_oracle_dtype_parity(name, spark, duck, sf_dir):
    """Numeric-CLASS agreement per column between the Spark result schema
    and the DuckDB oracle's Arrow schema. The driver's value hash
    serializes BIGINT 528299 and DOUBLE 528299.0 differently, but the
    value-parity test above normalizes Decimal->float and Python compares
    528299 == 528299.0 as equal — so a pure type drift (fn_math_surface's
    r2/r3 sum_ceil/sum_floor red row) is invisible to it. This test closes
    that class of bug locally: integer vs floating vs decimal (and every
    other type family) must agree column-by-column."""
    spec = SPECS[name]
    s_schema = {f.name: _spark_type_class(f.dataType) for f in spec.fn(spark, sf_dir).schema}
    d_schema = {
        f.name: _arrow_type_class(f.type) for f in duck.execute(spec.oracle).arrow().schema
    }
    assert set(s_schema) == set(d_schema), (
        f"{name}: column sets differ spark={sorted(s_schema)} duck={sorted(d_schema)}"
    )
    diffs = {
        c: (s_schema[c], d_schema[c]) for c in s_schema if s_schema[c] != d_schema[c]
    }
    assert not diffs, f"{name}: dtype class mismatch (spark, duck): {diffs}"


@pytest.mark.parametrize("name", ROWS_ONLY_SPECS)
def test_rows_only_queries_run(name, spark, sf_dir):
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_dir)
    n = sdf.count()
    assert n > 0, f"{name}: rows-only entry returned 0 rows (vacuity gate)"
    assert sdf.columns  # stable schema


def test_grouping_multi_gid_disambiguates_data_null(spark, duck):
    """agg_grouping_multi's docstring claims the GROUPING()-derived gid
    makes the 'ALL' coalesce hash-safe even when a group key is NULL in
    the DATA — but the orders fixture has no NULL keys, so the driver
    hash never exercises that claim. Pin it on synthetic rows in BOTH
    engines: a data-NULL status coalesces to the same 'ALL' string as
    the rollup total, and only gid separates the two rows."""
    from pyspark.sql import functions as F

    rows = [("F", "1-URGENT", 10.0), (None, "1-URGENT", 20.0), ("F", None, 30.0)]
    sdf = spark.createDataFrame(rows, "st string, pr string, price double")
    sdf.createOrReplaceTempView("_gm_null_probe")
    got = spark.sql(
        """
        SELECT COALESCE(st, 'ALL') AS status,
               COALESCE(pr, 'ALL') AS priority,
               CAST(grouping(st) * 2 + grouping(pr) AS BIGINT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM _gm_null_probe
        GROUP BY GROUPING SETS ((st, pr), (st), (pr), ())
        """
    ).collect()
    duck.execute(
        "CREATE OR REPLACE TABLE _gm_null_probe(st VARCHAR, pr VARCHAR, price DOUBLE)"
    )
    duck.executemany("INSERT INTO _gm_null_probe VALUES (?, ?, ?)", rows)
    exp = duck.execute(
        """
        SELECT COALESCE(st, 'ALL') AS status,
               COALESCE(pr, 'ALL') AS priority,
               CAST(GROUPING(st) * 2 + GROUPING(pr) AS BIGINT) AS gid,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM _gm_null_probe
        GROUP BY GROUPING SETS ((st, pr), (st), (pr), ())
        """
    ).fetchall()
    got_set = sorted((r[0], r[1], r[2], r[3], r[4]) for r in got)
    exp_set = sorted(exp)
    assert got_set == exp_set, f"\nspark {got_set}\nduck  {exp_set}"
    # the claim itself: ('ALL', '1-URGENT') appears BOTH as a data-null
    # detail row (gid=0 for the (st,pr) set) and as a st-aggregated row
    # (gid=2) — distinguishable only by gid
    amb = [r for r in got_set if (r[0], r[1]) == ("ALL", "1-URGENT")]
    assert {r[2] for r in amb} >= {0, 2}, amb
