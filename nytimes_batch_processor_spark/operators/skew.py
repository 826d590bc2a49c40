"""Skew mitigation: salted equi-join (100 TB posture, SURVEY.md §2.3).

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but it only splits *partitions*, not a single hot KEY whose
rows all hash to one reducer. Salting fixes the hot-key case
structurally: the probe side scatters each key across ``n_salts``
sub-keys, the build side is replicated once per salt, and the join key
becomes (key, salt) — a hot key's rows now spread over ``n_salts``
reducers. Cost: build side x n_salts (only acceptable for dimension-
sized builds) — which is why this is an explicit operator, not a
default.

The catalog entry proves the rewrite is semantics-preserving: the
DuckDB oracle runs the UNSALTED join, and the hash-compare shows the
salted plan produces identical results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..catalog import query
from ..functions import msum
from ..sources import load_tables


def salted_equi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    n_salts: int,
    scatter: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side scattered over ``n_salts`` salts and
    the build side replicated per salt.

    ``scatter`` must be a deterministic expression over probe columns
    (e.g. pmod(xxhash64(<unique cols>), n_salts)) — row-random salts
    would break retry idempotency and re-run comparisons. Result is
    row-identical to ``probe.join(build, probe_key == build_key, how)``.

    Only probe-preserving join types are accepted: the build side is
    replicated once per salt, so under right/full-outer a build row with
    NO probe match would be emitted ``n_salts`` times (each salt replica
    is separately unmatched) — silently wrong results, so those ``how``
    values raise. (Right-side skew: swap the inputs and salt the other
    way.)
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_equi_join: how={how!r} would replicate unmatched build "
            f"rows x{n_salts}; only probe-preserving joins are valid: "
            f"{sorted(allowed)}"
        )
    salted_probe = probe.withColumn("_salt", scatter.cast("int"))
    salted_build = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    cond = (F.col(probe_key) == F.col(build_key)) & (
        salted_probe["_salt"] == salted_build["_salt"]
    )
    return salted_probe.join(salted_build, cond, how).drop("_salt")


@query(
    "join_skew_salted",
    tables=("lineitem", "part"),
    oracle="""
SELECT p.p_brand                                  AS brand,
       CAST(COUNT(*) AS BIGINT)                   AS n_lines,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-dim join vs the plain-join oracle: lineitem scattered
    over 8 salts (deterministic hash of its unique key), part replicated
    x8, joined on (partkey, salt) — the exact rewrite you'd deploy when
    one part id dominates the fact table and AQE's partition splitting
    isn't enough."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    scatter = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(8))
    joined = salted_equi_join(
        t.lineitem, t.part, "l_partkey", "p_partkey", 8, scatter
    )
    return joined.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        msum("l_extendedprice").alias("revenue"),
    )


def salted_agg_sum_count(
    df: DataFrame,
    key: str,
    n_salts: int,
    sums: dict[str, str],
    scatter: Column | None = None,
) -> DataFrame:
    """Two-level aggregation for skewed GROUP BY keys: partial aggregate
    on (key, salt) — spreading one hot key over ``n_salts`` reducers —
    then merge partials per key. Only decomposable aggregates belong
    here (sum/count/min/max); avg = merged sum / merged count.

    AQE splits skewed JOIN partitions but a hash aggregate's hot key
    still lands on one reducer; salting is the structural fix. Cost: a
    second (tiny) shuffle over n_salts rows per key.

    ``scatter`` must be DETERMINISTIC over row content (same rule as
    salted_equi_join: partition-id / row-id salts change on task retry,
    re-routing recomputed rows into different (key, salt) groups than
    the partials already fetched — lost/duplicated sums under
    stage-retry). Default: xxhash64 over all hashable input columns
    (MapType is unhashable and skipped). Pass an explicit hash of a
    unique key when the input contains exact DUPLICATE rows on the hot
    key — identical rows hash to one salt, so the default cannot
    spread them.

    ``sums`` maps output column -> input column to SUM. A row count is
    always emitted as ``n_rows``.
    """
    if scatter is None:
        from pyspark.sql import types as T

        hashable = [
            f.name for f in df.schema.fields if not isinstance(f.dataType, T.MapType)
        ]
        if not hashable:
            raise ValueError(
                "salted_agg_sum_count: no hashable columns for the default "
                "scatter (all MapType) — pass an explicit scatter expression"
            )
        scatter = F.xxhash64(*[F.col(c) for c in hashable])
    salt = F.pmod(scatter, F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.sum(src).alias(f"_s_{out}") for out, src in sums.items()],
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n_rows"),
        *[F.sum(f"_s_{out}").alias(out) for out in sums],
    )


@query(
    "agg_skew_salted_sum",
    tables=("lineitem",),
    oracle="""
SELECT l_returnflag                                   AS returnflag,
       CAST(COUNT(*) AS BIGINT)                      AS n_rows,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
       ROUND(SUM(l_quantity), 2)                     AS total_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_skew_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-level aggregate vs the direct-GROUP-BY oracle:
    l_returnflag has only 3 values (every group is a hot key — the
    worst case for a single-level hash agg at scale), so each partial
    aggregates (flag, salt) over 8 salts and the merge touches 24 rows.
    Result must be row-identical to the plain aggregate."""
    from ..functions import dec2

    t = load_tables(spark, sf_dir, "lineitem")
    merged = salted_agg_sum_count(
        t.lineitem.withColumn("_p2", dec2("l_extendedprice")),
        "l_returnflag",
        8,
        {"revenue": "_p2", "total_qty": "l_quantity"},
        scatter=F.xxhash64("l_orderkey", "l_linenumber"),
    )
    return merged.select(
        F.col("l_returnflag").alias("returnflag"),
        "n_rows",
        F.round("revenue", 2).cast("double").alias("revenue"),
        F.round("total_qty", 2).alias("total_qty"),
    )
