"""Window functions: ranking, analytic (lag/lead), and frame-based ops.

None exist in the reference, but they are the L1 core (SURVEY.md §2.2):
its landed tables are *cumulative* time series, so daily deltas = lag,
rolling averages = frames, top-k regions = rank. Implemented over the
driver fixtures so the DuckDB oracle can check them.

Scale notes: a window's partitionBy is a shuffle key — partitions must be
numerous and balanced (here custkey/user_id, not a constant). A window
with no partitionBy collapses to a single task; every query below
partitions. Frames are bounded (rowsBetween/rangeBetween), so state per
key is O(frame), not O(partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import query
from ..functions import dec2, money, ratio
from ..sources import load_tables


@query(
    "window_rank_topk_per_group",
    tables=("orders",),
    oracle="""
SELECT * FROM (
    SELECT o_custkey,
           o_orderkey,
           ROUND(o_totalprice, 2) AS totalprice,
           CAST(DENSE_RANK() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
           ) AS INT) AS rnk
    FROM orders
) WHERE rnk <= 3
""",
)
def window_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via dense_rank — the scalable per-group
    top-k (no per-group sort materialization; one shuffle on custkey)."""
    t = load_tables(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        t.orders.withColumn("rnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", money("o_totalprice").alias("totalprice"), "rnk")
    )


@query(
    "window_analytic_surface",
    tables=("customer",),
    oracle="""
SELECT c_custkey,
       c_mktsegment AS mktsegment,
       ROUND(PERCENT_RANK() OVER w, 6)                 AS bal_pct_rank,
       ROUND(CUME_DIST() OVER w, 6)                    AS bal_cume_dist,
       ROUND(NTH_VALUE(c_acctbal, 2) OVER (
           PARTITION BY c_mktsegment
           ORDER BY c_acctbal ASC, c_custkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ), 2)                                           AS second_lowest_bal,
       CAST(NTILE(4) OVER w AS INT)                    AS acctbal_quartile,
       ROUND(FIRST_VALUE(c_acctbal) OVER w, 2)         AS segment_min_bal,
       CAST(ROW_NUMBER() OVER w AS BIGINT)             AS rn,
       ROUND(LAG(c_acctbal) OVER w, 2)                 AS prev_bal,
       ROUND(c_acctbal - LAG(c_acctbal) OVER w, 2)     AS delta_vs_prev
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
""",
)
def window_analytic_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consolidated analytic-window surface (r9 rotation-capacity
    consolidation of window_rank_extras + window_ntile_first_last +
    window_lag_daily_delta — VERDICT r8 items 2/4): percent_rank,
    cume_dist, nth_value (full-partition frame), ntile, first_value,
    row_number, lag, and a lag-delta, ALL hashed in one result over ONE
    shared window spec. Tie-broken on custkey so every rank / tile /
    lag is deterministic.

    Scale notes: one shuffle on mktsegment; every function here is a
    streaming frame (O(1) or O(frame) state per key) except nth_value's
    full frame, which buffers one partition — acceptable because the
    partition key is a real grouping column, never a constant. The
    aggregate-then-lag daily-delta decomposition the retired
    window_lag_daily_delta pinned lives on in window_range_rolling_7d
    (same O(days) post-agg spine)."""
    t = load_tables(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    bal = F.col("c_acctbal")
    return t.customer.select(
        "c_custkey",
        F.col("c_mktsegment").alias("mktsegment"),
        ratio(F.percent_rank().over(w)).alias("bal_pct_rank"),
        ratio(F.cume_dist().over(w)).alias("bal_cume_dist"),
        money(F.nth_value("c_acctbal", 2).over(w_full)).alias("second_lowest_bal"),
        F.ntile(4).over(w).alias("acctbal_quartile"),
        money(F.first("c_acctbal").over(w)).alias("segment_min_bal"),
        F.row_number().over(w).cast("long").alias("rn"),
        money(F.lag("c_acctbal").over(w)).alias("prev_bal"),
        money(bal - F.lag("c_acctbal").over(w)).alias("delta_vs_prev"),
    )


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer (running-sum frame). Ordering is
    tie-broken by o_orderkey so the prefix sums are deterministic.
    Registered through `window_agg_surface` since r10 (running_total
    path)."""
    t = load_tables(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("date").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        money(F.sum("o_totalprice").over(w)).alias("running_spend"),
    )


@query(
    "window_agg_surface",
    tables=("orders", "customer", "nation"),
    oracle="""
SELECT 'running_total'              AS path,
       CAST(o_custkey AS VARCHAR)   AS k,
       o_orderkey                   AS id,
       CAST(o_orderdate AS DATE)    AS d,
       ROUND(SUM(o_totalprice) OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 2)                        AS v1,
       CAST(NULL AS DOUBLE)         AS v2
FROM orders
UNION ALL
SELECT 'pct_of_total'               AS path,
       nation                       AS k,
       CAST(NULL AS BIGINT)         AS id,
       CAST(NULL AS DATE)           AS d,
       CAST(ROUND(rev, 2) AS DOUBLE) AS v1,
       ROUND(CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE), 6) AS v2
FROM (
    SELECT n.n_name AS nation,
           SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
)
""",
)
def window_agg_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consolidated windowed-aggregate surface (r10 rotation-
    capacity consolidation of window_running_total +
    window_pct_of_total — VERDICT r9 item 3), path-tagged into one
    hashed result:

    'running_total' rows (one per order): cumulative spend per customer
    via a per-key running-sum frame, tie-broken by o_orderkey.
    'pct_of_total' rows (one per nation): revenue share via an
    unpartitioned window over the 25-row AGGREGATED result — bounded by
    group cardinality, never the fact table (the census in
    tests/test_plans.py pins exactly this).

    Scale notes: the running total is one shuffle on o_custkey with
    O(1) frame state; the pct branch is two broadcast joins + a bounded
    groupBy; the union adds no shuffle."""
    from .relational import window_pct_of_total

    running = window_running_total(spark, sf_dir).select(
        F.lit("running_total").alias("path"),
        F.col("o_custkey").cast("string").alias("k"),
        F.col("o_orderkey").alias("id"),
        F.col("order_date").alias("d"),
        F.col("running_spend").alias("v1"),
        F.lit(None).cast("double").alias("v2"),
    )
    pct = window_pct_of_total(spark, sf_dir).select(
        F.lit("pct_of_total").alias("path"),
        F.col("nation").alias("k"),
        F.lit(None).cast("long").alias("id"),
        F.lit(None).cast("date").alias("d"),
        F.col("revenue").alias("v1"),
        F.col("share").alias("v2"),
    )
    return running.unionByName(pct)


@query(
    "window_range_rolling_7d",
    tables=("orders",),
    oracle="""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS order_date,
           CAST(EXTRACT(epoch FROM CAST(o_orderdate AS DATE)) / 86400 AS BIGINT) AS day_no,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_revenue
    FROM orders GROUP BY 1, 2
)
SELECT order_date,
       CAST(ROUND(day_revenue, 2) AS DOUBLE) AS day_revenue,
       ROUND(CAST(SUM(day_revenue) OVER w AS DOUBLE)
             / (COUNT(*) OVER w), 6) AS avg_7d
FROM daily
WINDOW w AS (ORDER BY day_no RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def window_range_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling average revenue via a RANGE frame over epoch-day —
    the reference-domain "7-day average of new cases" (SURVEY.md §2.2).

    RANGE (value-based) not ROWS: missing calendar days must still bound
    the frame to 7 *days*, not 7 *rows*.
    """
    t = load_tables(spark, sf_dir, "orders")
    daily = (
        t.orders.groupBy(F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(F.sum(dec2("o_totalprice")).alias("day_revenue"))
        .withColumn("day_no", F.datediff("order_date", F.lit("1970-01-01").cast("date")).cast("long"))
    )
    w = W.orderBy("day_no").rangeBetween(-6, 0)
    return daily.select(
        "order_date",
        F.round("day_revenue", 2).cast("double").alias("day_revenue"),
        F.round(
            F.sum("day_revenue").over(w).cast("double") / F.count(F.lit(1)).over(w), 6
        ).alias("avg_7d"),
    )


@query(
    "window_ignore_nulls_ffill",
    tables=("events",),
    oracle="""
SELECT event_id,
       user_id,
       last_value(nv IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       )                                               AS filled_value,
       first_value(nv IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       )                                               AS first_seen_value
FROM (
    SELECT event_id, user_id, ts,
           CASE WHEN event_type IN ('click', 'error') THEN NULL
                ELSE ROUND(value, 2) END AS nv
    FROM events
)
""",
)
def window_ignore_nulls_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS analytic windows: forward-fill (last non-null value
    so far) and first-non-null per user — the gap-fill idiom for sensor /
    event streams where some event types carry no measurement.

    last/first with ignorenulls are frame-based (running state is one
    value per key), so the window costs the same one shuffle as any
    per-user window; event_id tie-breaks equal timestamps so the fill is
    deterministic."""
    t = load_tables(spark, sf_dir, "events")
    nv = F.when(F.col("event_type").isin("click", "error"), F.lit(None)).otherwise(
        F.round("value", 2)
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t.events.withColumn("nv", nv).select(
        "event_id",
        "user_id",
        F.last("nv", ignorenulls=True).over(w).alias("filled_value"),
        F.first("nv", ignorenulls=True).over(w).alias("first_seen_value"),
    )
