"""Approximate and exact quantile/cardinality aggregates.

Approximate sketches (HLL, KLL/GK) are engine-specific — Spark's
approx_count_distinct and DuckDB's approx sketches give *different*
estimates, so a value-equality oracle can't compare them directly.
Instead each query returns (a) the exact value, computed identically in
both engines, and (b) a boolean asserting the Spark-side approximation
landed within its documented error bound. Both are deterministic, so the
hash compare still verifies the approximation machinery end-to-end.

Scale notes: this is the 100 TB cardinality posture — exact
COUNT(DISTINCT) shuffles every distinct value; approx_count_distinct
ships one ~1.5 KB HLL sketch per partition and merges. percentile_approx
likewise merges bounded sketches instead of sorting the column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import query
from ..functions import ratio
from ..sources import load_tables


@query(
    "approx_count_distinct_bounds",
    tables=("events",),
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE                                    AS approx_within_5pct
FROM events
GROUP BY event_type
""",
)
def approx_count_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct-user estimate per event type, asserted within 5% of
    the exact count (rsd=0.01 makes this hold with huge margin; Spark's
    HLL is deterministic for fixed input + rsd)."""
    t = load_tables(spark, sf_dir, "events")
    return (
        t.events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("_approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("approx_within_5pct"),
        )
    )


@query(
    "percentile_exact_and_approx",
    tables=("lineitem",),
    oracle="""
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.5), 6)  AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
       TRUE                                           AS approx_p50_within_1pct
FROM lineitem
GROUP BY l_returnflag
""",
)
def percentile_exact_and_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (match DuckDB quantile_cont) plus a
    bound-check on percentile_approx (GK sketch, accuracy=10000)."""
    t = load_tables(spark, sf_dir, "lineitem")
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            ratio(F.percentile("l_extendedprice", F.lit(0.5))).alias("p50"),
            ratio(F.percentile("l_extendedprice", F.lit(0.95))).alias("p95"),
            F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("_ap50"),
        )
        .select(
            "l_returnflag",
            "p50",
            "p95",
            (F.abs(F.col("_ap50") - F.col("p50")) <= 0.01 * F.col("p50")).alias(
                "approx_p50_within_1pct"
            ),
        )
    )
