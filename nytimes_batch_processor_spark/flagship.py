"""Flagship end-to-end query (driver smoke check, SURVEY.md §7 phase 1).

One chain exercising the engine's spine: scan -> exact dedup ->
broadcast-dim join -> daily aggregate -> 7-day rolling window -> top-k.
This is the fixture-form of the reference-domain question "top days by
7-day-averaged activity" over its cumulative time series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from .functions import money, ratio
from .sources import load_tables


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "orders")
    # 1. idempotent exact dedup on the fact key (reference W3 semantics)
    lines = t.lineitem.dropDuplicates(["l_orderkey", "l_linenumber"])
    # 2. join fact->orders on the shuffle key; revenue per line
    revenue = (
        lines.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("l_shipdate").cast("date").alias("ship_date"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )
    # 3. aggregate first (shrinks to |days| rows), then window the result
    daily = revenue.groupBy("ship_date").agg(F.sum("rev").alias("day_revenue"))
    daily = daily.withColumn(
        "day_no", F.datediff("ship_date", F.lit("1970-01-01").cast("date")).cast("long")
    )
    w7 = W.orderBy("day_no").rangeBetween(-6, 0)
    rolled = daily.select(
        "ship_date",
        money("day_revenue").alias("day_revenue"),
        ratio(F.avg("day_revenue").over(w7)).alias("avg_7d"),
    )
    # 4. top-20 days by rolling average, deterministically tie-broken
    return rolled.orderBy(F.col("avg_7d").desc(), F.col("ship_date").asc()).limit(20)
