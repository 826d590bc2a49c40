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
    "setops_customer_cohorts",
    tables=("customer", "orders"),
    oracle="""
WITH urgent_buyers AS (
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
),
high_balance AS (
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
)
SELECT 'union' AS cohort, custkey FROM (
    SELECT custkey FROM urgent_buyers UNION SELECT custkey FROM high_balance
)
UNION ALL
SELECT 'intersect' AS cohort, custkey FROM (
    SELECT custkey FROM urgent_buyers INTERSECT SELECT custkey FROM high_balance
)
UNION ALL
SELECT 'except' AS cohort, custkey FROM (
    SELECT custkey FROM high_balance EXCEPT SELECT custkey FROM urgent_buyers
)
""",
)
def setops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except over two customer cohorts, each branch
    tagged with its operator name."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    urgent = (
        t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    high_bal = t.customer.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    tagged = lambda name, df: df.select(F.lit(name).alias("cohort"), "custkey")  # noqa: E731
    return (
        tagged("union", urgent.union(high_bal).distinct())
        .unionByName(tagged("intersect", urgent.intersect(high_bal)))
        .unionByName(tagged("except", high_bal.exceptAll(urgent)))
    )
