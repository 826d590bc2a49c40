"""Mergeable sketches for the approx-aggregate family (L2, SURVEY.md
§2.3), via Spark 4's Apache DataSketches functions: HLL (distinct),
KLL (quantiles), theta (distinct with set semantics). The load-bearing
property at 100 TB is MERGEABILITY: per-partition/per-day sketches
combine into the global answer without rescanning history — the same
incremental shape as agg_incremental_merge, for the approximate layer.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_sketch_estimate_tracks_count_distinct(spark, sf_dir):
    from nytimes_batch_processor_spark.sources import load_tables

    t = load_tables(spark, sf_dir, "events")
    got = (
        t.events.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    for r in got:
        assert abs(r["est"] - r["exact"]) <= 0.05 * r["exact"] + 1, (
            r["event_type"], r["est"], r["exact"],
        )


def test_kll_quantile_sketch_merges_across_batches(spark, sf_dir):
    """KLL quantile sketches built per 'batch' and MERGED must estimate
    the global median within the sketch's rank error — the no-rescan
    path to percentiles over a growing 100 TB table."""
    from nytimes_batch_processor_spark.sources import load_tables

    t = load_tables(spark, sf_dir, "orders")
    batched = t.orders.withColumn("batch", (F.col("o_orderkey") % 4).cast("int"))
    per_batch = batched.groupBy("batch").agg(
        F.expr("kll_sketch_agg_double(o_totalprice, 400)").alias("sk")
    )
    # kll_sketch_merge_double is a BINARY scalar merge: fold it over the
    # per-batch sketches (exactly how a daily-rollup job merges yesterday's
    # sketch with today's — associative, so any fold order works)
    merged = (
        per_batch.agg(F.collect_list("sk").alias("sks"))
        .select(
            F.expr(
                """
                kll_sketch_get_quantile_double(
                    aggregate(slice(sks, 2, size(sks) - 1), element_at(sks, 1),
                              (acc, x) -> kll_sketch_merge_double(acc, x)),
                    0.5)
                """
            ).alias("median_est")
        )
        .collect()[0]["median_est"]
    )
    exact = t.orders.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("m")
    ).collect()[0]["m"]
    lo, hi = (
        t.orders.agg(
            F.expr("percentile(o_totalprice, 0.45)").alias("lo"),
            F.expr("percentile(o_totalprice, 0.55)").alias("hi"),
        )
        .collect()[0]
    )
    assert lo <= merged <= hi, f"merged median {merged} outside p45..p55 [{lo},{hi}] (exact {exact})"


def test_theta_sketch_distinct_estimate(spark, sf_dir):
    from nytimes_batch_processor_spark.sources import load_tables

    t = load_tables(spark, sf_dir, "events")
    r = t.events.agg(
        F.theta_sketch_estimate(F.theta_sketch_agg("user_id")).alias("est"),
        F.countDistinct("user_id").alias("exact"),
    ).collect()[0]
    assert abs(r["est"] - r["exact"]) <= 0.05 * r["exact"] + 1
