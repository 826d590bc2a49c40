"""Set operations: union / intersect / except.

Absent from the reference (SURVEY.md §2.2); the closest relative is its
state-vs-county reconciliation surface. One catalog query exercises all
three, tagging each branch so a single DataFrame carries the result.

Scale notes: UNION ALL is a free concatenation (no shuffle); INTERSECT /
EXCEPT plan as aggregate + join on all columns — at scale express them
over key columns (as here) so the shuffle key is narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import query
from ..sources import load_tables


@query(
    "setops_surface",
    tables=("customer", "orders"),
    oracle="""
WITH urgent_buyers AS (
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
),
high_balance AS (
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
),
a AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderkey % 3 = 0),
b AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderkey % 2 = 0)
SELECT 'union' AS op, CAST(custkey AS VARCHAR) AS k, CAST(1 AS BIGINT) AS n FROM (
    SELECT custkey FROM urgent_buyers UNION SELECT custkey FROM high_balance
)
UNION ALL
SELECT 'intersect' AS op, CAST(custkey AS VARCHAR) AS k, CAST(1 AS BIGINT) AS n FROM (
    SELECT custkey FROM urgent_buyers INTERSECT SELECT custkey FROM high_balance
)
UNION ALL
SELECT 'except' AS op, CAST(custkey AS VARCHAR) AS k, CAST(1 AS BIGINT) AS n FROM (
    SELECT custkey FROM high_balance EXCEPT SELECT custkey FROM urgent_buyers
)
UNION ALL
SELECT 'except_all' AS op, p AS k, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT p FROM a EXCEPT ALL SELECT p FROM b
) GROUP BY p
UNION ALL
SELECT 'intersect_all' AS op, p AS k, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT p FROM a INTERSECT ALL SELECT p FROM b
) GROUP BY p
""",
)
def setops_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consolidated set-operation surface (r9 rotation-capacity
    consolidation of setops_customer_cohorts + setops_multiset_all —
    VERDICT r8 item 2). DISTINCT semantics over two customer cohorts
    (union / intersect / except, one row per surviving key, n=1) and
    MULTISET semantics over two overlapping order extracts
    (exceptAll keeps max(m-n, 0) copies per value, intersectAll keeps
    min(m, n) — row multiplicity IS the signal), all five branches
    tagged and hashed in one result.

    Scale notes: UNION ALL is a free concatenation (no shuffle);
    INTERSECT / EXCEPT plan as aggregate + join on the (narrow) key
    column; the ALL variants plan as a single hash aggregate computing
    per-value counts on each side — one shuffle each,
    group-cardinality-bounded, no pairwise explosion."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    urgent = (
        t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    high_bal = t.customer.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )

    def keyed(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("op"),
            F.col("custkey").cast("string").alias("k"),
            F.lit(1).cast("long").alias("n"),
        )

    a = t.orders.filter(F.col("o_orderkey") % 3 == 0).select(F.col("o_orderpriority").alias("p"))
    b = t.orders.filter(F.col("o_orderkey") % 2 == 0).select(F.col("o_orderpriority").alias("p"))

    def counted(name: str, df: DataFrame) -> DataFrame:
        return df.groupBy("p").agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("op"), F.col("p").alias("k"), "n"
        )

    return (
        keyed("union", urgent.union(high_bal).distinct())
        .unionByName(keyed("intersect", urgent.intersect(high_bal)))
        .unionByName(keyed("except", high_bal.exceptAll(urgent)))
        .unionByName(counted("except_all", a.exceptAll(b)))
        .unionByName(counted("intersect_all", a.intersectAll(b)))
    )
