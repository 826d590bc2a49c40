"""100 TB posture tests: assert the *physical plans* are the ones a
large cluster needs — pushdown reached the scan, dimensions broadcast,
top-k never global-sorts — not merely that answers match."""

from __future__ import annotations

from nytimes_batch_processor_spark.plans import (
    has_broadcast_join,
    physical_plan,
    pushed_filters,
    read_schema,
)


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    from nytimes_batch_processor_spark.operators.relational import filter_project_revenue

    df = filter_project_revenue(spark, sf_dir)
    pf = pushed_filters(df)
    assert "l_quantity" in pf or "l_discount" in pf, f"no pushed filters:\n{pf}"


def test_column_pruning_reaches_parquet(spark, sf_dir):
    from nytimes_batch_processor_spark.operators.relational import filter_project_revenue

    rs = read_schema(filter_project_revenue(spark, sf_dir))
    assert "l_partkey" not in rs and "l_returnflag" not in rs, (
        f"scan reads columns the query never uses:\n{rs}"
    )


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    from nytimes_batch_processor_spark.operators.relational import join_broadcast_star

    assert has_broadcast_join(join_broadcast_star(spark, sf_dir))


def test_global_topk_avoids_total_sort(spark, sf_dir):
    from nytimes_batch_processor_spark.operators.relational import sort_global_topk

    plan = physical_plan(sort_global_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_semi_join_plans_as_semi(spark, sf_dir):
    from nytimes_batch_processor_spark.operators.relational import join_left_semi

    plan = physical_plan(join_left_semi(spark, sf_dir))
    assert "LeftSemi" in plan, plan


def test_pricing_summary_partial_aggregation(spark, sf_dir):
    """Map-side (partial) aggregation must appear: the shuffle carries
    one row per group per partition, not raw data."""
    from nytimes_batch_processor_spark.operators.relational import agg_pricing_summary

    plan = physical_plan(agg_pricing_summary(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2, plan


def test_scalar_udf_is_arrow_vectorized(spark, sf_dir):
    """The Pandas UDF surface must plan as ArrowEvalPython (vectorized
    batch transfer), never BatchEvalPython (pickled row-at-a-time) —
    the 10-100x difference at 100 TB."""
    from nytimes_batch_processor_spark.functions.udfs import udf_pandas_scalar

    plan = physical_plan(udf_pandas_scalar(spark, sf_dir))
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_scalar_udf_filter_still_pushes_down(spark, sf_dir):
    """A projection-only UDF must not block predicate pushdown."""
    from nytimes_batch_processor_spark.functions.udfs import udf_pandas_scalar

    assert "p_size" in pushed_filters(udf_pandas_scalar(spark, sf_dir))


def test_whole_stage_codegen_present(spark, sf_dir):
    """Both aggregate stages (partial + final) must run inside
    whole-stage codegen — visible only in the AQE final plan."""
    from nytimes_batch_processor_spark.operators.relational import agg_pricing_summary
    from nytimes_batch_processor_spark.plans import codegen_stage_count

    assert codegen_stage_count(agg_pricing_summary(spark, sf_dir)) >= 2
