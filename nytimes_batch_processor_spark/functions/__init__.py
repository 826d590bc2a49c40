"""Scalar-function surface + determinism helpers shared by the catalog.

Precision policy (why DECIMAL appears in a double-typed engine): money
columns hold *exact decimal* values (2dp). A double SUM of them is
order-dependent in its last bits, and their sums/products sit exactly on
decimal rounding midpoints (x.xx5), where Spark (HALF_UP) and DuckDB
(round-half-away on the binary value) can disagree by one cent. So every
aggregate over money flows through DECIMAL — exact, order-independent,
identical in both engines — and only the final rounded value is cast
back to double. Continuous-valued doubles (sqrt/ln, event values,
cosines) don't have midpoint structure; plain rounding is safe there.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEC_MONEY = "decimal(18,2)"  # prices, balances: |x| < 1e16, 2dp exact
DEC_RATE = "decimal(4,2)"  # discounts/taxes in [0, 1): 2dp exact


def _c(col: Column | str) -> Column:
    return col if isinstance(col, Column) else F.col(col)


def dec2(col: Column | str) -> Column:
    """Exact-decimal view of a 2dp money column."""
    return _c(col).cast(DEC_MONEY)


def dec_rate(col: Column | str) -> Column:
    """Exact-decimal view of a 2dp rate column (discount/tax)."""
    return _c(col).cast(DEC_RATE)


def msum(col: Column | str) -> Column:
    """Order-independent exact money SUM -> 2dp double.
    Oracle twin: CAST(ROUND(SUM(CAST(x AS DECIMAL(18,2))), 2) AS DOUBLE).
    """
    return F.round(F.sum(dec2(col)), 2).cast("double")


def mavg6(col: Column | str) -> Column:
    """Money AVG as exact-decimal SUM / COUNT(*) -> 6dp double.
    Oracle twin:
    ROUND(CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6).
    """
    return F.round(F.sum(dec2(col)).cast("double") / F.count(F.lit(1)), 6)


def money(col: Column | str) -> Column:
    """Round a row-level money value to 2dp. Safe only where the input is
    already an exact 2dp decimal (identity round) or continuous; for
    sums/products of money use msum/dec2 instead."""
    return F.round(_c(col), 2)


def ratio(col: Column | str) -> Column:
    """Round a continuous-valued average/ratio to 6dp."""
    return F.round(_c(col), 6)


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch of a timestamp-like column.

    PySpark 4.1's ANSI rules make ``F.unix_micros`` reject
    ``TIMESTAMP_NTZ`` (which is what inferTimestampNTZ makes parquet
    timestamp columns) instead of implicitly casting it. With the
    session pinned to UTC the NTZ->TZ cast is value-preserving, so this
    helper is the one place allowed to call ``unix_micros`` — everything
    else goes through it (enforced by a grep-test in tests/test_style.py).
    Oracle twin: DuckDB's ``epoch_us(ts)``.
    """
    return F.unix_micros(_c(col).cast("timestamp"))
