"""Relational core: scans, projections, filters, joins, aggregations.

The reference has projection+cast only (P1-P4, SURVEY.md §2.1); joins and
aggregations are the L1 implied surface (§2.2) its landed tables exist to
serve. Everything here is declarative DataFrame API — Catalyst supplies
predicate pushdown, column pruning, join selection and AQE.

Scale notes per operator are inline. General posture: dimension tables
(region/nation/customer/supplier/part) are broadcast explicitly where we
know they're small relative to the fact side; fact-fact joins shuffle on
the join key and rely on AQE skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import query
from ..functions import dec2, dec_rate, mavg6, money, msum, ratio
from ..sources import load_tables


@query(
    "agg_pricing_summary",
    tables=("lineitem",),
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                      * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
       ROUND(AVG(l_quantity), 6)                                   AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
       CAST(COUNT(*) AS BIGINT)                                    AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '2000-12-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: filter -> hash aggregate.

    Catalyst plans this as partial (map-side) + final hash aggregation, so
    the shuffle moves one row per (flag, status, partition) — at 100 TB the
    shuffle is bounded by group cardinality (6), not data size. The date
    filter and 7-column projection push down to the parquet scan.
    """
    t = load_tables(spark, sf_dir, "lineitem")
    li = t.lineitem.filter(F.col("l_shipdate").cast("date") <= F.lit("2000-12-01").cast("date"))
    price = dec2("l_extendedprice")
    disc_price = price * (1 - dec_rate("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            money(F.sum("l_quantity")).alias("sum_qty"),
            msum("l_extendedprice").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + dec_rate("l_tax"))), 2)
            .cast("double")
            .alias("sum_charge"),
            ratio(F.avg("l_quantity")).alias("avg_qty"),
            mavg6("l_extendedprice").alias("avg_price"),
            F.round(F.sum(dec_rate("l_discount")).cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "filter_project_revenue",
    tables=("lineitem",),
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       CAST(l_shipdate AS DATE)                            AS ship_date,
       CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 25
""",
)
def filter_project_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level projection + conjunctive predicates (TPC-H Q6 shape).

    All three predicates and the 6-column ReadSchema push into the parquet
    scan (verify with .explain: PushedFilters). No shuffle at all — this
    is a map-only plan at any scale.
    """
    t = load_tables(spark, sf_dir, "lineitem")
    return (
        t.lineitem.filter(
            F.col("l_shipdate").cast("date").between("1996-01-01", "1996-12-31")
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 25)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").cast("date").alias("ship_date"),
            F.round(dec2("l_extendedprice") * (1 - dec_rate("l_discount")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "join_broadcast_star",
    tables=("customer", "nation", "region", "orders"),
    oracle="""
SELECT n.n_name                                   AS nation,
       r.r_name                                   AS region,
       CAST(COUNT(*) AS BIGINT)                   AS n_orders,
       CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_revenue,
       ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_order_value
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderstatus <> 'P'
GROUP BY n.n_name, r.r_name
""",
)
def join_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact (orders) against three broadcast dimensions.

    customer/nation/region are broadcast (explicit hint) so the fact table
    never shuffles for the join — the only shuffle is the final group-by,
    bounded by |nation| groups. This is the canonical 100 TB star-join
    plan: dimension hash maps ship to every executor once.
    """
    t = load_tables(spark, sf_dir, "customer", "nation", "region", "orders")
    return (
        t.orders.filter(F.col("o_orderstatus") != "P")
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            msum("o_totalprice").alias("total_revenue"),
            mavg6("o_totalprice").alias("avg_order_value"),
        )
    )


def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS semantics via left_semi join (the reference's ON CONFLICT
    key-membership test, W3, is semantically this operator's dual).

    Semi joins never duplicate or widen the left side — Catalyst can
    broadcast the distinct right keys; at scale prefer semi over
    join+distinct which materializes the multiplicity first. Registered
    through `join_semi_anti_surface` since r10 (the semi branch).
    """
    t = load_tables(spark, sf_dir, "customer", "orders")
    big_buyers = t.orders.filter(F.col("o_totalprice") > 400000)
    return (
        t.customer.join(big_buyers, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            msum("c_acctbal").alias("total_acctbal"),
        )
    )


def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS via left_anti join — the exact operator behind the
    engine's idempotent upsert (reference W3: insert rows whose key is
    not already present, ``…kt:138-141``). Registered through
    `join_semi_anti_surface` since r10 (the anti branch)."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    urgent = t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return t.customer.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "join_semi_anti_surface",
    tables=("customer", "orders"),
    oracle="""
SELECT 'semi_exists'                  AS op,
       c.c_mktsegment                 AS k,
       CAST(NULL AS VARCHAR)          AS detail,
       CAST(COUNT(*) AS BIGINT)       AS n,
       CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS v
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
GROUP BY c.c_mktsegment
UNION ALL
SELECT 'anti_not_exists'              AS op,
       CAST(c.c_custkey AS VARCHAR)   AS k,
       concat(c.c_name, '|', c.c_mktsegment) AS detail,
       CAST(1 AS BIGINT)              AS n,
       CAST(NULL AS DOUBLE)           AS v
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
)
def join_semi_anti_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consolidated EXISTS / NOT EXISTS join surface (r10 rotation-
    capacity consolidation of join_left_semi + join_left_anti — VERDICT
    r9 item 3), op-tagged into one hashed result:

    'semi_exists' rows: per-segment aggregate of customers having a
    >400k order (left_semi — the membership test; reference W3's dual).
    'anti_not_exists' rows: one row per customer with NO urgent order
    (left_anti — the exact operator behind the engine's idempotent
    upsert, reference ``…kt:138-141``), key + name|segment detail so
    the per-row identity stays in the hash.

    Scale notes: both branches plan as broadcast-able semi/anti hash
    joins (Catalyst broadcasts the distinct right keys while they fit;
    shuffle-hash past that) and never duplicate or widen the left side
    — prefer these over join+distinct, which materializes multiplicity
    first. The two branches union for free (no extra shuffle)."""
    semi = join_left_semi(spark, sf_dir).select(
        F.lit("semi_exists").alias("op"),
        F.col("mktsegment").alias("k"),
        F.lit(None).cast("string").alias("detail"),
        F.col("n_customers").alias("n"),
        F.col("total_acctbal").alias("v"),
    )
    anti = join_left_anti(spark, sf_dir).select(
        F.lit("anti_not_exists").alias("op"),
        F.col("c_custkey").cast("string").alias("k"),
        F.concat("c_name", F.lit("|"), "c_mktsegment").alias("detail"),
        F.lit(1).cast("long").alias("n"),
        F.lit(None).cast("double").alias("v"),
    )
    return semi.unionByName(anti)


@query(
    "join_outer_null_surface",
    tables=("customer", "orders"),
    oracle="""
SELECT 'L'                                              AS side,
       CAST(c.c_custkey AS VARCHAR)                     AS k,
       CAST(COUNT(o.o_orderkey) AS BIGINT)              AS n,
       CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS v,
       CAST(MAX(CAST(o.o_orderdate AS DATE)) AS DATE)   AS d
FROM customer c
LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
  ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
UNION ALL
SELECT 'R'                                              AS side,
       c.c_mktsegment                                   AS k,
       CAST(COUNT(DISTINCT CASE WHEN o.o_orderkey IS NULL THEN c.c_custkey END) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT c.c_custkey) AS DOUBLE)      AS v,
       CAST(NULL AS DATE)                               AS d
FROM (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def join_outer_null_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consolidated LEFT + RIGHT OUTER null-extension surface (r9
    rotation-capacity consolidation of join_left_outer_null_ext +
    join_right_outer_never_matched — VERDICT r8 item 2), one hash:

    - 'L' rows, one per customer: LEFT OUTER against big (>300k)
      orders — customers without one aggregate the null-extended right
      side (COUNT(col)=0, SUM=NULL, MAX(date)=NULL), exactly where
      Spark/DuckDB null semantics could diverge, checked row-by-row;
    - 'R' rows, one per segment: RIGHT OUTER from urgent orders — the
      preserved-side IS NULL probe (the canonical never-matched idiom
      the reference's state-vs-county reconciliation would use).

    Scale: outer joins preserve the preserved side's partitioning; the
    filtered order sides are small enough to broadcast, and broadcast
    outer joins are legal building the non-preserved side (BuildRight
    for LeftOuter / BuildLeft for RightOuter) — no customer shuffle."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    big = t.orders.filter(F.col("o_totalprice") > 300000)
    left = (
        t.customer.join(big, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n"),
            msum("o_totalprice").alias("v"),
            F.max(F.col("o_orderdate").cast("date")).alias("d"),
        )
        .select(
            F.lit("L").alias("side"),
            F.col("c_custkey").cast("string").alias("k"),
            "n",
            "v",
            "d",
        )
    )
    urgent = t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
    right = (
        urgent.join(t.customer, F.col("o_custkey") == F.col("c_custkey"), "right")
        .groupBy(F.col("c_mktsegment").alias("k"))
        .agg(
            F.countDistinct(
                F.when(F.col("o_orderkey").isNull(), F.col("c_custkey"))
            ).alias("n"),
            F.countDistinct("c_custkey").cast("double").alias("v"),
        )
        .select(
            F.lit("R").alias("side"),
            "k",
            "n",
            "v",
            F.lit(None).cast("date").alias("d"),
        )
    )
    return left.unionByName(right)


@query(
    "join_full_outer_reconcile",
    tables=("customer", "supplier"),
    oracle="""
WITH c AS (
    SELECT c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_rich_customers
    FROM customer WHERE c_acctbal > 9900 GROUP BY 1
),
s AS (
    SELECT s_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_rich_suppliers
    FROM supplier WHERE s_acctbal > 8000 GROUP BY 1
)
SELECT COALESCE(c.nationkey, s.nationkey)               AS nationkey,
       CAST(COALESCE(c.n_rich_customers, 0) AS BIGINT)  AS n_rich_customers,
       CAST(COALESCE(s.n_rich_suppliers, 0) AS BIGINT)  AS n_rich_suppliers,
       CAST(COALESCE(c.n_rich_customers, 0) - COALESCE(s.n_rich_suppliers, 0) AS BIGINT) AS imbalance
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
""",
)
def join_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation of two aggregates — the reference-domain
    'state totals vs county totals' diff (SURVEY.md §2.2 set-ops row):
    nations present on only one side are null-extended on the other, in
    BOTH directions (thresholds chosen so each side misses some nations).

    Scale: both inputs are pre-aggregated to |nation| rows before the
    join, so the full outer joins group-cardinality-sized inputs — the
    reconciliation pattern that works at any fact-table size.
    """
    t = load_tables(spark, sf_dir, "customer", "supplier")
    c = (
        t.customer.filter(F.col("c_acctbal") > 9900)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_rich_customers"))
    )
    s = (
        t.supplier.filter(F.col("s_acctbal") > 8000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_rich_suppliers"))
    )
    joined = c.join(s, "nationkey", "full_outer")
    return joined.select(
        "nationkey",
        F.coalesce("n_rich_customers", F.lit(0)).alias("n_rich_customers"),
        F.coalesce("n_rich_suppliers", F.lit(0)).alias("n_rich_suppliers"),
        (
            F.coalesce("n_rich_customers", F.lit(0))
            - F.coalesce("n_rich_suppliers", F.lit(0))
        ).alias("imbalance"),
    )


@query(
    "join_theta_range",
    tables=("lineitem", "orders"),
    oracle="""
SELECT o.o_orderpriority                         AS priority,
       CAST(COUNT(*) AS BIGINT)                  AS n_late_lines,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS late_value
FROM lineitem l
JOIN orders o
  ON l.l_orderkey = o.o_orderkey
 AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
GROUP BY o.o_orderpriority
""",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + theta (range) residual: lines shipped >60 days after
    their order date.

    The equi component (orderkey) drives a shuffle/broadcast hash join;
    the inequality evaluates as a post-join residual filter. A pure theta
    join (no equi key) would degenerate to BroadcastNestedLoop — always
    keep an equi component at scale.
    """
    t = load_tables(spark, sf_dir, "lineitem", "orders")
    return (
        t.lineitem.alias("l")
        .join(
            t.orders.alias("o"),
            (F.col("l.l_orderkey") == F.col("o.o_orderkey"))
            & (
                F.col("l.l_shipdate").cast("date")
                > F.date_add(F.col("o.o_orderdate").cast("date"), 60)
            ),
        )
        .groupBy(F.col("o.o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_late_lines"),
            msum("l.l_extendedprice").alias("late_value"),
        )
    )


@query(
    "agg_distinct_counts",
    tables=("orders", "lineitem"),
    oracle="""
SELECT o.o_orderstatus                                AS status,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT)    AS n_distinct_customers,
       CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT)    AS n_distinct_parts,
       CAST(COUNT(*) AS BIGINT)                       AS n_lines
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus
""",
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate.

    Catalyst expands multi-distinct into an Expand + two-phase aggregate;
    at scale each distinct column multiplies the shuffled rows, so prefer
    approx_count_distinct (see operators/approx.py) when exactness isn't
    contractual.
    """
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.countDistinct("o_custkey").alias("n_distinct_customers"),
            F.countDistinct("l_partkey").alias("n_distinct_parts"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "agg_grouping_multi",
    tables=("orders",),
    oracle="""
SELECT COALESCE(CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR), 'ALL') AS order_year,
       COALESCE(CAST(EXTRACT(month FROM o_orderdate) AS VARCHAR), 'ALL') AS order_month,
       COALESCE(o_orderstatus, 'ALL')   AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(GROUPING(EXTRACT(year FROM o_orderdate)) * 8
            + GROUPING(EXTRACT(month FROM o_orderdate)) * 4
            + GROUPING(o_orderstatus) * 2
            + GROUPING(o_orderpriority) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
FROM orders
GROUP BY GROUPING SETS (
  (o_orderstatus, o_orderpriority),
  (o_orderstatus),
  (o_orderpriority),
  (EXTRACT(year FROM o_orderdate), EXTRACT(month FROM o_orderdate)),
  (EXTRACT(year FROM o_orderdate)),
  ()
)
""",
)
def agg_grouping_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level grouping in one Expand+aggregate pass — the
    consolidated ROLLUP / CUBE / GROUPING SETS / time-hierarchy entry
    (r8: replaced the separate ``agg_rollup`` / ``agg_cube`` /
    ``agg_grouping_sets``; r10: absorbed ``agg_time_rollup`` — VERDICT
    r9 item 3 — to keep the driver-sweep rotation sustainable; see
    tests/test_rotation.py).

    The explicit GROUPING SETS list covers all four surfaces at once:
    ``(status, priority), (status), ()`` is exactly
    ``ROLLUP(status, priority)``; adding ``(priority)`` completes
    ``CUBE(status, priority)``; ``(year, month), (year), ()`` is
    exactly ``ROLLUP(year, month)`` — the calendar drill-down the
    retired agg_time_rollup carried (the time-series "by month, by
    year, total" the reference's cumulative tables feed); and the
    heterogeneous mix is what neither rollup nor cube alone can
    express. The ``GROUPING()`` marker (``gid``, now 4 bits)
    disambiguates grouping-null from data-null, so the 'ALL' coalesce
    is hash-safe even if a group key is NULL in the data — 'unknown
    date' and 'all dates' never collide.

    Scale: Catalyst plans this as ONE Expand (6 replicas of each row)
    feeding a partial+final hash aggregate — a single scan and a shuffle
    bounded by total group cardinality across all sets, not data size.
    At 100 TB the 6x Expand inflation happens map-side before the partial
    aggregate collapses it; no per-level re-scan.
    """
    t = load_tables(spark, sf_dir, "orders")
    t.orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT COALESCE(CAST(year(o_orderdate) AS STRING), 'ALL') AS order_year,
               COALESCE(CAST(month(o_orderdate) AS STRING), 'ALL') AS order_month,
               COALESCE(o_orderstatus, 'ALL')   AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(grouping(year(o_orderdate)) * 8
                    + grouping(month(o_orderdate)) * 4
                    + grouping(o_orderstatus) * 2
                    + grouping(o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY GROUPING SETS (
          (o_orderstatus, o_orderpriority),
          (o_orderstatus),
          (o_orderpriority),
          (year(o_orderdate), month(o_orderdate)),
          (year(o_orderdate)),
          ()
        )
        """
    )


def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns. Pivot values are given explicitly —
    letting Spark discover them costs an extra distinct scan at 100 TB.
    Registered through `reshape_pivot_surface` since r11 (pivot mode)."""
    t = load_tables(spark, sf_dir, "lineitem")
    pivoted = (
        t.lineitem.groupBy(F.col("l_returnflag").alias("returnflag"))
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            money(F.sum("l_quantity")).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return pivoted.select(
        "returnflag",
        F.col("O_qty").alias("qty_open"),
        F.col("F_qty").alias("qty_filled"),
        F.col("O_n").alias("n_open"),
        F.col("F_n").alias("n_filled"),
    )


@query(
    "filter_like_in_patterns",
    tables=("part",),
    oracle="""
SELECT p_partkey, p_name, p_brand, p_type
FROM part
WHERE p_name LIKE '%t'
  AND p_type ILIKE '%dar%'
  AND p_brand IN ('Brand#12', 'Brand#23', 'Brand#34', 'Brand#45',
                  'Brand#5', 'Brand#15', 'Brand#25')
  AND p_name NOT LIKE 'red%'
""",
)
def filter_like_in_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / ILIKE / NOT LIKE / IN-list predicate family. Suffix and
    infix patterns can't prune parquet row groups (no leading literal),
    but StringEndsWith/Contains still push to the scan as data filters;
    the IN-list pushes fully.

    Predicates are calibrated to the driver fixture (names are
    "<color> <noun>", types ECONOMY/STANDARD/...) so the conjunction is
    selective but NON-EMPTY at every fixture SF (1 row at sf0.001, 13 at
    sf0.01, 162 at sf0.1) — a 0-row result would pass the oracle
    vacuously (the r2 verdict's trap)."""
    t = load_tables(spark, sf_dir, "part")
    return t.part.filter(
        F.col("p_name").like("%t")
        & F.col("p_type").ilike("%dar%")
        & F.col("p_brand").isin(
            "Brand#12", "Brand#23", "Brand#34", "Brand#45",
            "Brand#5", "Brand#15", "Brand#25",
        )
        & ~F.col("p_name").like("red%")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@query(
    "join_null_safe_eq",
    tables=("customer", "supplier"),
    oracle="""
WITH c AS (
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE CAST(c_nationkey % 5 AS INT) END AS grp
    FROM customer
),
s AS (
    SELECT s_suppkey,
           CASE WHEN s_acctbal < 0 THEN NULL ELSE CAST(s_nationkey % 5 AS INT) END AS grp
    FROM supplier
)
SELECT c.grp                                        AS grp,
       CAST(COUNT(*) AS BIGINT)                     AS n_pairs,
       CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT)  AS n_customers,
       CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT)  AS n_suppliers
FROM c JOIN s ON c.grp IS NOT DISTINCT FROM s.grp
GROUP BY c.grp
""",
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    MATCH each other — the semantics behind the reference's fips
    sentinel (P5): Postgres unique indexes treat NULLs as distinct, so
    it wrote -1; an engine with null-safe equality joins the NULL group
    directly. Still a hash join: <=> is an equi-comparison, not a theta
    residual."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    grp_c = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(
        (F.col("c_nationkey") % 5).cast("int")
    )
    grp_s = F.when(F.col("s_acctbal") < 0, F.lit(None)).otherwise(
        (F.col("s_nationkey") % 5).cast("int")
    )
    c = t.customer.select("c_custkey", grp_c.alias("cg"))
    s = t.supplier.select("s_suppkey", grp_s.alias("sg"))
    return (
        c.join(s, F.col("cg").eqNullSafe(F.col("sg")))
        .groupBy(F.col("cg").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("c_custkey").alias("n_customers"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
    )


@query(
    "join_cross_grid",
    tables=("region", "nation"),
    oracle="""
SELECT r.r_name                                  AS region,
       n.n_name                                  AS nation,
       n.n_regionkey = r.r_regionkey             AS is_home
FROM region r CROSS JOIN nation n
""",
)
def join_cross_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS join (every region x every nation, 5x25) with a
    post-hoc membership flag. Cartesian products are only ever legal
    between bounded inputs — Spark plans this as BroadcastNestedLoopJoin,
    which is correct HERE because both sides are dimension-sized; the
    same plan on two fact tables is the anti-pattern the LSH operators
    exist to avoid."""
    t = load_tables(spark, sf_dir, "region", "nation")
    return t.region.crossJoin(t.nation).select(
        F.col("r_name").alias("region"),
        F.col("n_name").alias("nation"),
        (F.col("n_regionkey") == F.col("r_regionkey")).alias("is_home"),
    )


@query(
    "join_interval_window",
    tables=("events",),
    oracle="""
SELECT c.event_id                                AS click_event_id,
       CAST(COUNT(p.event_id) AS BIGINT)         AS n_purchases_within_1h,
       CAST(ROUND(SUM(CAST(p.value AS DECIMAL(18,2))), 2) AS DOUBLE) AS purchase_value_1h
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id
 AND p.ts > c.ts
 AND p.ts <= c.ts + INTERVAL 1 HOUR
GROUP BY c.event_id
""",
)
def join_interval_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (two-sided range residual on an equi key): purchases
    attributed to a click if they land in the hour after it. The equi
    component (user_id) drives the hash join; the interval evaluates as
    a residual — never a pure-range nested loop. At 100 TB, bucketing
    both sides by user_id co-locates the join."""
    t = load_tables(spark, sf_dir, "events")
    clicks = t.events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"), F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pe"), F.col("user_id").alias("pu"), F.col("ts").alias("pts"), "value"
    )
    joined = clicks.join(
        purchases,
        (F.col("pu") == F.col("cu"))
        & (F.col("pts") > F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return joined.groupBy("click_event_id").agg(
        F.count("pe").alias("n_purchases_within_1h"),
        msum("value").alias("purchase_value_1h"),
    )


def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (argmin/argmax aggregates): the orderkey carrying
    the extreme price, without a self-join or window — one hash
    aggregate. Unique extremes in this fixture; with ties, pair the
    value with a tie-breaker struct to pin the winner. Registered
    through `agg_stats_minmax_surface` since r10 (min_max_by path)."""
    t = load_tables(spark, sf_dir, "orders")
    return t.orders.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_orderkey"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_orderkey"),
        money(F.min("o_totalprice")).alias("min_price"),
        money(F.max("o_totalprice")).alias("max_price"),
    )


@query(
    "sort_nulls_ordering",
    tables=("supplier",),
    oracle="""
SELECT s_suppkey,
       CASE WHEN s_acctbal < 0 THEN NULL ELSE ROUND(s_acctbal, 2) END AS bal_or_null
FROM supplier
ORDER BY bal_or_null ASC NULLS FIRST, s_suppkey ASC
LIMIT 40
""",
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit null ordering. Engine-portability trap made visible:
    Spark's ASC default is NULLS FIRST, DuckDB's is NULLS LAST — a bare
    ORDER BY on a nullable key silently disagrees across engines, so the
    engine's policy is to ALWAYS spell the null position at a sort that
    feeds a limit."""
    t = load_tables(spark, sf_dir, "supplier")
    bal = F.when(F.col("s_acctbal") < 0, F.lit(None)).otherwise(money("s_acctbal"))
    return (
        t.supplier.select("s_suppkey", bal.alias("bal_or_null"))
        .orderBy(F.col("bal_or_null").asc_nulls_first(), F.col("s_suppkey").asc())
        .limit(40)
    )


def unpivot_measures_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide measures -> long (measure, value) rows) + aggregate
    — the inverse of pivot_status_by_flag. Spark's unpivot/melt is a
    map-only Expand (3 rows out per row in), so the only shuffle is the
    final bounded groupBy.
    Registered through `reshape_pivot_surface` since r11 (unpivot mode)."""
    t = load_tables(spark, sf_dir, "lineitem")
    long = t.lineitem.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return long.groupBy(F.col("l_returnflag").alias("returnflag"), "measure").agg(
        F.round(F.sum(dec2("val")), 2).cast("double").alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "reshape_pivot_surface",
    tables=("lineitem",),
    oracle="""
WITH p AS (
    SELECT l_returnflag                                                    AS returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_open,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_filled,
           CAST(COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT)  AS n_open,
           CAST(COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT)  AS n_filled
    FROM lineitem
    GROUP BY l_returnflag
)
SELECT 'pivot' AS mode, returnflag, 'open' AS key, qty_open AS total, n_open AS n FROM p
UNION ALL
SELECT 'pivot', returnflag, 'filled', qty_filled, n_filled FROM p
UNION ALL
SELECT 'unpivot', l_returnflag, measure,
       CAST(ROUND(SUM(CAST(val AS DECIMAL(18,2))), 2) AS DOUBLE),
       CAST(COUNT(*) AS BIGINT)
FROM (
    UNPIVOT (SELECT l_returnflag, l_quantity, l_extendedprice, l_tax FROM lineitem)
    ON l_quantity, l_extendedprice, l_tax
    INTO NAME measure VALUE val
)
GROUP BY l_returnflag, measure
""",
)
def reshape_pivot_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged consolidation of the reshape inverses (late r11, the
    r8-r11 surface pattern): BOTH reshape paths execute and land in ONE
    driver hash, each branch tagged by `mode`. The pivot branch runs
    the full wide plan — groupBy().pivot(explicit values).agg() — and
    every wide cell (qty_open/qty_filled/n_open/n_filled) re-enters the
    hash keyed by `key`, so a pivot fault (wrong bucket, dropped
    value column, value-discovery regression) still flips it; the
    unpivot branch keeps its map-only Expand + bounded groupBy shape
    unchanged. The retired `pivot_status_by_flag` /
    `unpivot_measures_long` callables remain the public per-shape API
    (and carry the per-shape scale notes)."""
    # Re-keying the wide row by `key` via explode-of-structs keeps the
    # pivot subplan executed ONCE (a union of two selects from the wide
    # frame would plan the pivot aggregate twice absent exchange reuse).
    p = pivot_status_by_flag(spark, sf_dir)
    cell = F.explode(
        F.array(
            F.struct(
                F.lit("open").alias("key"),
                F.col("qty_open").alias("total"),
                F.col("n_open").alias("n"),
            ),
            F.struct(
                F.lit("filled").alias("key"),
                F.col("qty_filled").alias("total"),
                F.col("n_filled").alias("n"),
            ),
        )
    )
    pivot_long = p.select("returnflag", cell.alias("c")).select(
        F.lit("pivot").alias("mode"),
        "returnflag",
        F.col("c.key").alias("key"),
        F.col("c.total").alias("total"),
        F.col("c.n").alias("n"),
    )
    unpivot = unpivot_measures_long(spark, sf_dir).select(
        F.lit("unpivot").alias("mode"),
        "returnflag",
        F.col("measure").alias("key"),
        "total",
        "n",
    )
    return pivot_long.unionByName(unpivot)


_SPINE_GAPFILL_ORACLE = """
WITH b AS (
    SELECT MIN(CAST(o_orderdate AS DATE)) AS lo, MAX(CAST(o_orderdate AS DATE)) AS hi
    FROM orders
),
spine AS (
    SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b
),
daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS rev
    FROM orders GROUP BY 1
)
SELECT s.day,
       CAST(COALESCE(d.n, 0) AS BIGINT)       AS n_orders,
       COALESCE(d.rev, 0.0)                   AS revenue,
       d.n IS NULL                            AS is_gap
FROM spine s LEFT JOIN daily d ON d.day = s.day
"""


def spine_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap fill: generate every day in the data's range
    (sequence + explode — Spark's idiom for what DuckDB does with a
    recursive/generate_series spine) and left-join daily totals so
    missing days appear as explicit zeros. The reference-domain need:
    cumulative COVID series must not silently skip days.

    Scale: the spine is |days| rows built from a 1-row aggregate —
    broadcast side of the join; the daily aggregate is bounded by
    calendar size, so the whole query's post-scan cost is O(days).
    Registered through `spine_fill_surface` since r10 (zero_fill path).
    """
    t = load_tables(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    bounds = t.orders.agg(F.min(d).alias("lo"), F.max(d).alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    daily = t.orders.groupBy(d.alias("day")).agg(
        F.count(F.lit(1)).alias("n"), msum("o_totalprice").alias("rev")
    )
    return spine.join(daily, "day", "left").select(
        "day",
        F.coalesce("n", F.lit(0)).alias("n_orders"),
        F.coalesce("rev", F.lit(0.0)).alias("revenue"),
        F.col("n").isNull().alias("is_gap"),
    )


@query(
    "agg_histogram_fixed_bins",
    tables=("orders",),
    oracle="""
SELECT CAST(LEAST(FLOOR(o_totalprice / 60000), 9) AS INT) AS bin,
       CAST(LEAST(FLOOR(o_totalprice / 60000), 9) * 60000 AS DOUBLE) AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 6) AS pct
FROM orders
GROUP BY 1, 2
""",
)
def agg_histogram_fixed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (10 x 60k bins over order totals,
    top bin open-ended): floor-divide bucketing + one aggregate + a
    pct-of-total window over the 10-row result. Bin assignment is
    exact integer arithmetic, so the oracle needs no rounding slack on
    the keys. Scale: the shuffle carries one row per (bin, partition)
    thanks to partial aggregation — histogram cost is scan-bound at any
    corpus size; the window runs over |bins| rows post-agg."""
    t = load_tables(spark, sf_dir, "orders")
    bin_ = F.least(F.floor(F.col("o_totalprice") / 60000), F.lit(9)).cast("int")
    agged = t.orders.groupBy(
        bin_.alias("bin"), (bin_ * 60000).cast("double").alias("bin_lo")
    ).agg(F.count(F.lit(1)).alias("n"))
    return agged.select(
        "bin",
        "bin_lo",
        "n",
        F.round(F.col("n") * 100.0 / F.sum("n").over(W.partitionBy()), 6).alias("pct"),
    )


_SPINE_INTERP_ORACLE = """
WITH obs AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           ROUND(SUM(value), 6) AS v
    FROM events WHERE user_id < 3
    GROUP BY user_id, CAST(ts AS DATE)
),
bounds AS (
    SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM obs GROUP BY user_id
),
spine AS (
    SELECT user_id, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
    FROM bounds
),
joined AS (
    SELECT s.user_id, s.day, o.v FROM spine s
    LEFT JOIN obs o ON o.user_id = s.user_id AND o.day = s.day
),
bracketed AS (
    SELECT user_id, day, v,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
           last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
           first_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
           first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
    FROM joined
)
SELECT user_id, day,
       ROUND(CASE WHEN v IS NOT NULL THEN v
                  ELSE pv + (nv - pv) * (CAST(date_diff('day', pd, day) AS DOUBLE)
                                         / date_diff('day', pd, nd))
             END, 6) AS v_filled,
       v IS NULL AS is_interpolated
FROM bracketed
"""


def spine_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over time-series gaps: per-entity calendar
    spine (min..max observed day), then every missing day gets
    pv + (nv - pv) * elapsed/gap_width from its bracketing observed
    days (IGNORE NULLS last_value/first_value windows — the same
    mechanism as forward-fill, run in both directions). Spine edges are
    observed by construction, so no extrapolation case exists. The
    time-series twin of spine_gap_fill_daily's zero-fill and the third
    member of the fill family next to window_ignore_nulls_ffill.

    Scale: two sorted windows per entity partition — one shuffle by
    entity, frames O(row) via running state; the spine join is the
    broadcast-spine shape. Observed sums round to 6dp BEFORE
    interpolation so both engines interpolate identical inputs.
    Registered through `spine_fill_surface` since r10 (interpolate
    path)."""
    t = load_tables(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    obs = (
        t.events.filter(F.col("user_id") < 3)
        .groupBy("user_id", d.alias("day"))
        .agg(ratio(F.sum("value")).alias("v"))
    )
    bounds = obs.groupBy("user_id").agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select("user_id", F.explode(F.sequence("lo", "hi")).alias("day"))
    joined = spine.join(obs, ["user_id", "day"], "left")
    back = W.partitionBy("user_id").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    fwd = W.partitionBy("user_id").orderBy("day").rowsBetween(0, W.unboundedFollowing)
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    pv = F.last("v", ignorenulls=True).over(back)
    pd_ = F.last(obs_day, ignorenulls=True).over(back)
    nv = F.first("v", ignorenulls=True).over(fwd)
    nd = F.first(obs_day, ignorenulls=True).over(fwd)
    frac = F.datediff(F.col("day"), F.col("pd")).cast("double") / F.datediff(
        F.col("nd"), F.col("pd")
    )
    return (
        joined.select(
            "user_id", "day", "v",
            pv.alias("pv"), pd_.alias("pd"), nv.alias("nv"), nd.alias("nd"),
        )
        .select(
            "user_id",
            "day",
            ratio(
                F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
                    F.col("pv") + (F.col("nv") - F.col("pv")) * frac
                )
            ).alias("v_filled"),
            F.col("v").isNull().alias("is_interpolated"),
        )
    )


@query(
    "spine_fill_surface",
    tables=("orders", "events"),
    oracle=f"""
SELECT 'zero_fill'              AS path,
       CAST(NULL AS BIGINT)     AS user_id,
       day,
       revenue                  AS v,
       n_orders                 AS n,
       is_gap                   AS is_filled
FROM ({_SPINE_GAPFILL_ORACLE})
UNION ALL
SELECT 'interpolate'            AS path,
       user_id,
       day,
       v_filled                 AS v,
       CAST(NULL AS BIGINT)     AS n,
       is_interpolated          AS is_filled
FROM ({_SPINE_INTERP_ORACLE})
""",
)
def spine_fill_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consolidated calendar-spine fill surface (r10 rotation-
    capacity consolidation of spine_gap_fill_daily +
    spine_linear_interpolate — VERDICT r9 item 3), path-tagged into one
    hashed result:

    'zero_fill' rows: every day in the orders date range with missing
    days as explicit zeros (is_filled marks the gaps) — the
    reference-domain guarantee that cumulative series never silently
    skip days.
    'interpolate' rows: per-user daily event values with missing days
    linearly interpolated from their bracketing observations
    (is_filled marks interpolated rows).

    Both docstrings' scale analyses hold unchanged: spines are built
    from O(1)/O(entities) aggregates and broadcast; windows run per
    entity; the union is shuffle-free."""
    zero = spine_gap_fill_daily(spark, sf_dir).select(
        F.lit("zero_fill").alias("path"),
        F.lit(None).cast("long").alias("user_id"),
        "day",
        F.col("revenue").alias("v"),
        F.col("n_orders").alias("n"),
        F.col("is_gap").alias("is_filled"),
    )
    interp = spine_linear_interpolate(spark, sf_dir).select(
        F.lit("interpolate").alias("path"),
        F.col("user_id").cast("long").alias("user_id"),
        "day",
        F.col("v_filled").alias("v"),
        F.lit(None).cast("long").alias("n"),
        F.col("is_interpolated").alias("is_filled"),
    )
    return zero.unionByName(interp)


@query(
    "agg_string_agg_sorted",
    tables=("orders",),
    oracle="""
SELECT o_orderpriority                        AS priority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
       CAST(COUNT(*) AS BIGINT)               AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_string_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_set -> sort_array ->
    concat_ws. collect_list/collect_set order is nondeterministic across
    partitions — ALWAYS sort before serializing (the only way a
    collected aggregate can be hash-compared or diffed at all)."""
    t = load_tables(spark, sf_dir, "orders")
    return t.orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.concat_ws(",", F.sort_array(F.collect_set("o_orderstatus"))).alias("statuses"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def window_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total: an unpartitioned window over the AGGREGATED
    rows (|nation| = 25), not the fact table — the single-partition
    window is bounded by group cardinality, so it's safe at any fact
    size (same decomposition as the day-level windows, windows.py).
    Registered through `window_agg_surface` since r10 (pct_of_total
    path)."""
    t = load_tables(spark, sf_dir, "orders", "customer", "nation")
    per_nation = (
        t.orders.join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(dec2("o_totalprice")).alias("rev"))
    )
    from pyspark.sql import Window as W

    total = F.sum("rev").over(W.partitionBy())
    return per_nation.select(
        "nation",
        F.round("rev", 2).cast("double").alias("revenue"),
        F.round(F.col("rev").cast("double") / total.cast("double"), 6).alias("share"),
    )


@query(
    "sort_global_topk",
    tables=("orders",),
    oracle="""
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS totalprice,
       CAST(o_orderdate AS DATE) AS order_date
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
""",
)
def sort_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY ... LIMIT k.

    Spark executes this as TakeOrderedAndProject — each partition keeps a
    k-row heap, the driver merges P*k rows. No global sort materializes,
    so it scales to any input size for small k. Tie-broken on o_orderkey
    so the cut line is deterministic.
    """
    t = load_tables(spark, sf_dir, "orders")
    return (
        t.orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select(
            "o_orderkey",
            "o_custkey",
            money("o_totalprice").alias("totalprice"),
            F.col("o_orderdate").cast("date").alias("order_date"),
        )
    )


def agg_stats_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr / covar_samp / stddev_samp / var_pop)
    — the moments layer a data-quality or feature-drift monitor runs over
    a training corpus.

    Spark computes all four in a single hash-aggregate pass (partial
    moment merge is associative, so map-side combine applies — the same
    one-shuffle shape as SUM at 100 TB). Magnitudes here are O(1) or
    smaller (corr in [-1,1], discount/tax in [0, 0.1]) so 6dp rounding is
    safely inside the double-merge jitter margin; large-magnitude
    covariances would need the decimal-sum treatment instead
    (functions/__init__ docstring)."""
    t = load_tables(spark, sf_dir, "lineitem")
    return t.lineitem.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        ratio(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
        ratio(F.covar_samp("l_quantity", "l_discount")).alias("covar_qty_disc"),
        ratio(F.stddev_samp("l_discount")).alias("sd_discount"),
        ratio(F.var_pop("l_tax")).alias("var_tax"),
    )


@query(
    "agg_stats_minmax_surface",
    tables=("orders", "lineitem"),
    oracle="""
SELECT 'min_max_by'                                      AS path,
       o_orderstatus                                     AS k,
       CAST(arg_min(o_orderkey, o_totalprice) AS BIGINT) AS id_min,
       CAST(arg_max(o_orderkey, o_totalprice) AS BIGINT) AS id_max,
       ROUND(MIN(o_totalprice), 2)                       AS m1,
       ROUND(MAX(o_totalprice), 2)                       AS m2,
       CAST(NULL AS DOUBLE)                              AS m3,
       CAST(NULL AS DOUBLE)                              AS m4
FROM orders
GROUP BY o_orderstatus
UNION ALL
SELECT 'moments'                                         AS path,
       l_returnflag                                      AS k,
       CAST(NULL AS BIGINT)                              AS id_min,
       CAST(NULL AS BIGINT)                              AS id_max,
       ROUND(corr(l_quantity, l_extendedprice), 6)       AS m1,
       ROUND(covar_samp(l_quantity, l_discount), 6)      AS m2,
       ROUND(stddev_samp(l_discount), 6)                 AS m3,
       ROUND(var_pop(l_tax), 6)                          AS m4
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_stats_minmax_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consolidated statistical-aggregate surface (r10 rotation-
    capacity consolidation of agg_min_max_by + agg_stats_surface —
    VERDICT r9 item 3), path-tagged into one hashed result:

    'min_max_by' rows: argmin/argmax aggregates per order status (the
    orderkey carrying the extreme price — no self-join, no window) plus
    the extremes themselves (m1/m2 = min/max price).
    'moments' rows: corr / covar_samp / stddev_samp / var_pop per
    return flag (m1..m4) — the moments layer a data-quality or
    feature-drift monitor runs over a training corpus.

    Scale notes: both branches are single hash-aggregate passes whose
    partial states merge associatively (map-side combine applies — the
    same one-shuffle shape as SUM at 100 TB); the union is free."""
    minmax = agg_min_max_by(spark, sf_dir).select(
        F.lit("min_max_by").alias("path"),
        F.col("status").alias("k"),
        F.col("cheapest_orderkey").alias("id_min"),
        F.col("priciest_orderkey").alias("id_max"),
        F.col("min_price").alias("m1"),
        F.col("max_price").alias("m2"),
        F.lit(None).cast("double").alias("m3"),
        F.lit(None).cast("double").alias("m4"),
    )
    moments = agg_stats_surface(spark, sf_dir).select(
        F.lit("moments").alias("path"),
        F.col("returnflag").alias("k"),
        F.lit(None).cast("long").alias("id_min"),
        F.lit(None).cast("long").alias("id_max"),
        F.col("corr_qty_price").alias("m1"),
        F.col("covar_qty_disc").alias("m2"),
        F.col("sd_discount").alias("m3"),
        F.col("var_tax").alias("m4"),
    )
    return minmax.unionByName(moments)


@query(
    "q3_shipping_priority",
    tables=("customer", "orders", "lineitem"),
    oracle="""
SELECT l.l_orderkey                                     AS orderkey,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l.l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       CAST(o.o_orderdate AS DATE)                      AS orderdate,
       o.o_orderpriority                                AS priority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND CAST(o.o_orderdate AS DATE) < DATE '1998-01-01'
  AND CAST(l.l_shipdate AS DATE)  > DATE '1996-01-01'
GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
ORDER BY revenue DESC, orderkey ASC
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped integration query (segment filter -> 3-way join ->
    revenue agg -> top-10): the canonical 'does the whole relational
    stack compose' probe.

    Plan shape at scale: both filters push to the parquet scans; the
    filtered BUILDING customer slice is dimension-sized so Catalyst
    broadcasts it into the orders join; the orders->lineitem join
    shuffles on orderkey (both fact-sized); the LIMIT 10 runs as
    TakeOrderedAndProject (never a global sort). Revenue is an exact
    decimal sum -> 2dp, with orderkey as the deterministic tie-break."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    c = t.customer.filter(F.col("c_mktsegment") == "BUILDING")
    o = t.orders.filter(F.col("o_orderdate").cast("date") < F.lit("1998-01-01").cast("date"))
    l = t.lineitem.filter(F.col("l_shipdate").cast("date") > F.lit("1996-01-01").cast("date"))
    rev = F.sum(dec2("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,6)"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.round(rev, 2).cast("double").alias("revenue"))
        .select("orderkey", "revenue", "orderdate", "priority")
        .orderBy(F.col("revenue").desc(), F.col("orderkey").asc())
        .limit(10)
    )


@query(
    "agg_incremental_merge",
    tables=("orders",),
    oracle="""
SELECT o_orderpriority                               AS priority,
       CAST(COUNT(*) AS BIGINT)                      AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
       ROUND(MIN(o_totalprice), 2)                   AS min_price,
       ROUND(MAX(o_totalprice), 2)                   AS max_price,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: partial aggregation states
    computed per batch, merged WITHOUT rescanning history — the
    analytical counterpart of the reference's 15-minute re-ingest loop
    (O4): a day's new partition re-aggregates alone and merges into the
    running state in O(groups), not O(history).

    The fact table is split into two 'batches' (orderdate halves); each
    produces (count, decimal-sum, min, max) partials per group; the
    merge is sum-of-counts / sum-of-sums / min-of-mins / max-of-maxs,
    with AVG derived at read time (sum/count) — the only formulation
    that merges associatively. The oracle is the ONE-PASS aggregate over
    everything: merged partials must be indistinguishable from a full
    rescan."""
    t = load_tables(spark, sf_dir, "orders")
    # coalesce pins three-valued logic: a NULL orderdate must land in
    # exactly one batch (filter(cut)/filter(~cut) would drop it from
    # BOTH — undercounting vs the one-pass oracle on real data)
    cut = F.coalesce(
        F.col("o_orderdate").cast("date") < F.lit("1998-01-01").cast("date"),
        F.lit(False),
    )

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_orderpriority").alias("priority")).agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(dec2("o_totalprice")).alias("_sum"),
            F.min("o_totalprice").alias("_min"),
            F.max("o_totalprice").alias("_max"),
        )

    batch1 = partials(t.orders.filter(cut))
    batch2 = partials(t.orders.filter(~cut))
    merged = (
        batch1.unionByName(batch2)
        .groupBy("priority")
        .agg(
            F.sum("_n").alias("n_orders"),
            F.sum("_sum").alias("_sum"),
            F.min("_min").alias("_min"),
            F.max("_max").alias("_max"),
        )
    )
    return merged.select(
        "priority",
        "n_orders",
        F.round("_sum", 2).cast("double").alias("revenue"),
        F.round("_min", 2).alias("min_price"),
        F.round("_max", 2).alias("max_price"),
        F.round(F.col("_sum").cast("double") / F.col("n_orders"), 6).alias("avg_price"),
    )


@query(
    "subquery_correlated_scalar",
    tables=("customer",),
    oracle="""
SELECT c_custkey,
       CAST(c_nationkey AS INT)   AS nationkey,
       CAST(ROUND(CAST(c_acctbal AS DECIMAL(18,2)), 2) AS DOUBLE) AS acctbal
FROM customer c
WHERE CAST(c_acctbal AS DECIMAL(18,2))
      * (SELECT COUNT(*) FROM customer c2
         WHERE c2.c_nationkey = c.c_nationkey)
      > (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(18,2))) FROM customer c3
         WHERE c3.c_nationkey = c.c_nationkey)
""",
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated SCALAR subqueries ("customers above their nation's
    average balance") — the query surface Catalyst DECORRELATES into an
    aggregate + join instead of executing per-row (check .explain: no
    per-row subplan, one hash aggregate on c_nationkey joined back).
    Declared in SQL because that is the decorrelation path users hit.

    Determinism: the predicate is the cross-multiplied exact-decimal
    form ``bal * n > sum`` — comparing against a floating AVG would let
    a last-ulp parallel-summation difference flip membership for a
    boundary row between engines; decimal sums are order-independent
    and identical in both. Scale shape after decorrelation: one
    |nations|-row aggregate, broadcast back over the fact — map-side
    predicate, no per-row subquery execution."""
    load_tables(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey,
               CAST(c_nationkey AS INT) AS nationkey,
               CAST(ROUND(CAST(c_acctbal AS DECIMAL(18,2)), 2) AS DOUBLE) AS acctbal
        FROM customer c
        WHERE CAST(c_acctbal AS DECIMAL(18,2))
              * (SELECT COUNT(*) FROM customer c2
                 WHERE c2.c_nationkey = c.c_nationkey)
              > (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(18,2))) FROM customer c3
                 WHERE c3.c_nationkey = c.c_nationkey)
        """
    )


@query(
    "join_lateral_topk_per_key",
    tables=("customer", "orders"),
    oracle="""
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
         WHERE o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
""",
)
def join_lateral_topk_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each customer's top-2 orders by
    price — the per-key-top-k idiom written the way an analyst writes
    it (a dependent subquery in the FROM clause) rather than the
    window-function decomposition `window_rank_topk_per_group` uses.
    Both forms exist in the catalog because they exercise DIFFERENT
    planner paths: Catalyst decorrelates the lateral into a
    rank-window over the join (no per-row re-execution of the inner
    query), which is exactly what must happen at scale — a naive
    nested-loop evaluation would re-sort the orders table once per
    customer. Tie-break by o_orderkey makes the LIMIT deterministic;
    o_totalprice passes through bit-identical from the shared parquet
    fixture, so no rounding is needed."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    t.customer.createOrReplaceTempView("lateral_customer")
    t.orders.createOrReplaceTempView("lateral_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM lateral_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM lateral_orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        """
    )


# Shared SCD2 change-set derivation: merge_scd2_dimension (the producer)
# and join_scd2_temporal_lookup (its canonical consumer) must agree on
# the change event per key BY CONSTRUCTION — one Spark helper and one
# SQL CTE constant, referenced by both, so editing the derivation in
# one place cannot silently desynchronize the pair.
_SCD2_CHANGES_CTE = """WITH changes AS (
    SELECT o_custkey                                   AS c_custkey,
           CAST(MAX(o_orderdate) AS DATE)              AS change_date,
           CONCAT('SEG_', CAST(SUM(o_orderkey) % 5 AS VARCHAR)) AS new_segment
    FROM orders
    GROUP BY o_custkey
)"""


def _scd2_changes(orders: DataFrame) -> DataFrame:
    """One change event per customer: latest order date + an
    integer-exact new segment attribute (engine-portable)."""
    return orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("change_date"),
        F.concat(F.lit("SEG_"), (F.sum("o_orderkey") % 5).cast("string")).alias(
            "new_segment"
        ),
    )


_SCD2_DIM_ORACLE = f"""
{_SCD2_CHANGES_CTE}
SELECT c.c_custkey,
       c.c_mktsegment                 AS segment,
       CAST('1990-01-01' AS DATE)     AS valid_from,
       ch.change_date                 AS valid_to,
       ch.c_custkey IS NULL           AS is_current,
       CAST(1 AS INT)                 AS version
FROM customer c LEFT JOIN changes ch USING (c_custkey)
UNION ALL
SELECT c.c_custkey,
       ch.new_segment                 AS segment,
       ch.change_date                 AS valid_from,
       CAST(NULL AS DATE)             AS valid_to,
       TRUE                           AS is_current,
       CAST(2 AS INT)                 AS version
FROM customer c JOIN changes ch USING (c_custkey)
"""


def merge_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension merge — the warehouse pattern behind every
    versioned dimension: an incoming change per key CLOSES the current
    row (valid_to = change date, is_current = false) and INSERTS a new
    version open-ended. Without a MERGE-capable table format in the
    sandbox (no Delta/Iceberg — SURVEY §2.1 W3), the merge is expressed
    as the set algebra MERGE compiles to anyway: one left join against
    the change-set, each matched key exploding into its closed row and
    its open-ended successor. Change
    events derive from orders (latest order date per customer; the new
    segment attribute is an integer-exact function of SUM(o_orderkey) so
    both engines agree bit-for-bit).

    Scale notes: the whole merge is ONE join on c_custkey (dim scanned
    once, change-set aggregated once — see the plan note below) plus a
    per-row explode of 1-or-2 version structs, and the output is
    exactly |dim| + |changed keys| rows, append-computed:
    nothing rewrites unchanged history, which is what makes SCD2 viable
    on a billion-row dimension (the alternative — recomputing validity
    windows over all history — is a window over the full table). With a
    MERGE-capable format the identical change-set feeds
    `foreachBatch` + MERGE; the derivation here is the format-neutral
    core. Reference parity: the reference keeps no history at all
    (ON CONFLICT DO NOTHING keeps the FIRST version forever,
    kt:140/177); SCD2 is the general form of that idempotent-write
    policy with the history retained. Registered through
    `scd2_surface` since r10 (the dimension branch)."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    changes = _scd2_changes(t.orders)
    # ONE left join + explode, not a union of two joins: the naive
    # two-branch form scans customer AND re-aggregates orders twice
    # (measured: 4 FileScans, 4 HashAggregates, no exchange reuse under
    # AQE); emitting each key's 1-or-2 version rows as an exploded
    # array halves both. The closed row and its successor are built
    # from the same joined row, which is also what guarantees their
    # validity windows meet exactly at change_date.
    version_schema = (
        "segment string, valid_from date, valid_to date, "
        "is_current boolean, version int"
    )
    v_current = F.struct(
        F.col("c_mktsegment").alias("segment"),
        F.lit("1990-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
        F.lit(1).cast("int").alias("version"),
    )
    v_closed = F.struct(
        F.col("c_mktsegment").alias("segment"),
        F.lit("1990-01-01").cast("date").alias("valid_from"),
        F.col("change_date").alias("valid_to"),
        F.lit(False).alias("is_current"),
        F.lit(1).cast("int").alias("version"),
    )
    v_new = F.struct(
        F.col("new_segment").alias("segment"),
        F.col("change_date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
        F.lit(2).cast("int").alias("version"),
    )
    versions = F.when(
        F.col("change_date").isNull(), F.array(v_current)
    ).otherwise(F.array(v_closed, v_new))
    return (
        t.customer.join(changes, "c_custkey", "left")
        .select("c_custkey", F.explode(versions.cast(f"array<struct<{version_schema}>>")).alias("_v"))
        .select("c_custkey", "_v.*")
    )


_SCD2_LOOKUP_ORACLE = f"""
{_SCD2_CHANGES_CTE},
dim AS (
    SELECT c.c_custkey,
           c.c_mktsegment             AS segment,
           CAST('1990-01-01' AS DATE) AS valid_from,
           COALESCE(ch.change_date, CAST('9999-12-31' AS DATE)) AS valid_to,
           CAST(1 AS INT)             AS version
    FROM customer c LEFT JOIN changes ch USING (c_custkey)
    UNION ALL
    SELECT c.c_custkey, ch.new_segment, ch.change_date,
           CAST('9999-12-31' AS DATE), CAST(2 AS INT)
    FROM customer c JOIN changes ch USING (c_custkey)
)
SELECT d.segment,
       d.version,
       CAST(COUNT(*) AS BIGINT)        AS n_orders,
       CAST(SUM(o.o_orderkey) AS BIGINT) AS key_checksum
FROM orders o
JOIN dim d ON d.c_custkey = o.o_custkey
          AND CAST(o.o_orderdate AS DATE) >= d.valid_from
          AND CAST(o.o_orderdate AS DATE) <  d.valid_to
GROUP BY d.segment, d.version
"""


def join_scd2_temporal_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical consumer of an SCD2 dimension: a temporal (AS-OF
    date) fact lookup — each order joins the dimension version that was
    CURRENT on its order date (`valid_from <= d < valid_to`, half-open
    so a version change on the order's own date resolves to the NEW
    version, never both). Built on `merge_scd2_dimension`'s exact
    algebra with open-ended windows closed at a DATE'9999-12-31'
    sentinel, which turns the NULL-checking interval predicate into a
    plain range band — the form range-join optimizers and partition
    pruning actually use.

    Scale notes: the join is an equi-join on c_custkey with a residual
    date-band predicate — Catalyst plans the same shuffle
    hash-partitioning as any dim lookup (the band filters post-match
    rows, never widens the join), so at 100 TB this costs exactly one
    fact shuffle, or zero with the dim and fact bucketed on the key.
    Versions per key are bounded (2 here; tens in practice), so the
    per-key match fan-out is O(1) — the reason SCD2 lookups stay
    join-shaped instead of needing an interval index. Registered
    through `scd2_surface` since r10 (the lookup branch)."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    changes = _scd2_changes(t.orders)
    open_end = F.lit("9999-12-31").cast("date")
    v1 = F.struct(
        F.col("c_mktsegment").alias("segment"),
        F.lit("1990-01-01").cast("date").alias("valid_from"),
        F.coalesce(F.col("change_date"), open_end).alias("valid_to"),
        F.lit(1).cast("int").alias("version"),
    )
    v2 = F.struct(
        F.col("new_segment").alias("segment"),
        F.col("change_date").alias("valid_from"),
        open_end.alias("valid_to"),
        F.lit(2).cast("int").alias("version"),
    )
    dim = (
        t.customer.join(changes, "c_custkey", "left")
        .select(
            "c_custkey",
            F.explode(
                F.when(F.col("change_date").isNull(), F.array(v1)).otherwise(
                    F.array(v1, v2)
                )
            ).alias("_v"),
        )
        .select("c_custkey", "_v.*")
    )
    o = t.orders.select(
        "o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("o_date")
    )
    return (
        o.join(
            dim,
            (o["o_custkey"] == dim["c_custkey"])
            & (o["o_date"] >= dim["valid_from"])
            & (o["o_date"] < dim["valid_to"]),
        )
        .groupBy("segment", "version")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_checksum"),
        )
    )


@query(
    "scd2_surface",
    tables=("customer", "orders"),
    oracle=f"""
SELECT 'dimension'                    AS path,
       c_custkey,
       segment,
       valid_from,
       valid_to,
       is_current,
       version,
       CAST(NULL AS BIGINT)           AS n_orders,
       CAST(NULL AS BIGINT)           AS key_checksum
FROM ({_SCD2_DIM_ORACLE})
UNION ALL
SELECT 'lookup'                       AS path,
       CAST(NULL AS BIGINT)           AS c_custkey,
       segment,
       CAST(NULL AS DATE)             AS valid_from,
       CAST(NULL AS DATE)             AS valid_to,
       CAST(NULL AS BOOLEAN)          AS is_current,
       version,
       n_orders,
       key_checksum
FROM ({_SCD2_LOOKUP_ORACLE})
""",
)
def scd2_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consolidated SCD2 temporal surface (r10 rotation-capacity
    consolidation of merge_scd2_dimension + join_scd2_temporal_lookup —
    the two halves of ONE story: build the versioned dimension, then
    consume it as-of each fact's date), path-tagged into one hashed
    result:

    'dimension' rows: the full Type-2 dimension — per key, the closed
    v1 and open-ended v2 (or a single current v1 where no change
    exists), validity windows meeting exactly at change_date.
    'lookup' rows: every order joined to the version current on its
    order date (half-open band against the 9999-12-31-closed windows),
    aggregated per (segment, version) with key checksums.

    Both source docstrings' plan/scale analyses hold unchanged (one
    join + explode for the build; one equi-join with a residual band
    for the lookup); the shared `_SCD2_CHANGES_CTE`/`_scd2_changes`
    derivation still guarantees the pair cannot desynchronize — and
    the union now puts producer-consumer consistency itself inside one
    driver hash."""
    dim = merge_scd2_dimension(spark, sf_dir).select(
        F.lit("dimension").alias("path"),
        "c_custkey",
        "segment",
        "valid_from",
        "valid_to",
        "is_current",
        "version",
        F.lit(None).cast("long").alias("n_orders"),
        F.lit(None).cast("long").alias("key_checksum"),
    )
    lookup = join_scd2_temporal_lookup(spark, sf_dir).select(
        F.lit("lookup").alias("path"),
        F.lit(None).cast("long").alias("c_custkey"),
        "segment",
        F.lit(None).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(None).cast("boolean").alias("is_current"),
        "version",
        "n_orders",
        "key_checksum",
    )
    return dim.unionByName(lookup)
