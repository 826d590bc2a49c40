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


@query(
    "setops_multiset_all",
    tables=("orders",),
    oracle="""
WITH a AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderkey % 3 = 0),
     b AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderkey % 2 = 0)
SELECT 'except_all' AS op, p, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT p FROM a EXCEPT ALL SELECT p FROM b
) GROUP BY p
UNION ALL
SELECT 'intersect_all' AS op, p, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT p FROM a INTERSECT ALL SELECT p FROM b
) GROUP BY p
""",
)
def setops_multiset_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set ops (exceptAll / intersectAll): duplicates count —
    EXCEPT ALL keeps max(m-n, 0) copies per value, INTERSECT ALL keeps
    min(m, n) — the bag semantics reconciliation jobs need when row
    multiplicity IS the signal (e.g. per-priority order counts across
    two overlapping extracts). Spark plans both as a single hash
    aggregate computing per-value counts on each side — one shuffle,
    group-cardinality-bounded, no pairwise explosion."""
    t = load_tables(spark, sf_dir, "orders")
    a = t.orders.filter(F.col("o_orderkey") % 3 == 0).select(F.col("o_orderpriority").alias("p"))
    b = t.orders.filter(F.col("o_orderkey") % 2 == 0).select(F.col("o_orderpriority").alias("p"))
    ex = a.exceptAll(b).groupBy("p").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except_all").alias("op"), "p", "n"
    )
    it = a.intersectAll(b).groupBy("p").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect_all").alias("op"), "p", "n"
    )
    return ex.unionByName(it)
