"""Data-quality constraint audit (L2, SURVEY.md §2.3): the pre-export
validation pass every production pipeline runs — key uniqueness,
referential integrity, domain/range invariants, JSON well-formedness —
emitted as one small constraint-result table a gate job can assert on
(`bool_and(ok)`).

Reference parity: the reference's only data-quality mechanism is the
UNIQUE key + `ON CONFLICT DO NOTHING` pair (schema.sql:8,20,
NytimesBatchProcessorApplication.kt:138-141) — uniqueness enforced as a
side effect of the sink. This operator generalizes that to a declared,
queryable constraint suite over every table.

Scale shape at 100 TB: every row-local constraint family over one table
folds into a SINGLE partial-aggregated scan (conditional counts are
map-side combined; nothing is moved but one row per partition), and the
result reshape explodes a literal struct array — no second scan, no
driver collect. Key-uniqueness adds the one distinct-aggregate
(Catalyst's Expand) per audited key; referential checks are left-anti
equi-joins that shuffle on the FK (the parent side broadcasts when
small, e.g. nation). Output is O(#constraints) rows regardless of
input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import query
from ..sources import load_tables

# (constraint, table) -> the fixture genuinely violates exactly one of
# these (lineitem's composite line key is non-unique in the generator),
# so the audit's pass/fail split is real, not vacuous.


def _result_rows(tbl: str, agg: DataFrame, constraints: list[tuple[str, str, str]]):
    """Reshape a 1-row aggregate into one row per constraint via a
    literal struct-array explode (stays on the executors; no collect)."""
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.lit(tbl).alias("tbl"),
                F.col(checked).cast("long").alias("n_checked"),
                F.col(viol).cast("long").alias("n_violations"),
            )
            for name, checked, viol in constraints
        ]
    )
    return agg.select(F.explode(entries).alias("e")).select("e.*")


def _fk_row(
    name: str, tbl: str, table_agg: DataFrame, child: DataFrame, parent: DataFrame, on
) -> DataFrame:
    """Referential-integrity row: violations = child rows with no parent
    (left-anti equi-join, shuffles on the FK; Catalyst broadcasts the
    parent when it is under the broadcast threshold). NULL FKs count as
    violations on both sides: left_anti never matches a NULL key, and
    the oracle uses NOT EXISTS (not NOT IN, whose three-valued logic
    would report ZERO violations the moment one parent key is NULL).

    n_checked comes from the table's row-local aggregate; column
    pruning then cuts that branch to a ZERO-column parquet scan
    (ReadSchema struct<>, plan-verified) — parquet answers a bare
    count(*) from footer row counts without reading data, so at 100 TB
    the audit's per-table cost is one data scan for the row-local
    rules, key-only scans for the FK joins, and metadata-only counts.
    (ReuseExchange does NOT dedupe the agg here — pruning makes the
    two branches' exchanges non-identical — which is fine because the
    pruned branch is already free.)"""
    orphans = child.join(parent, on, "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("n_violations")
    )
    return (
        table_agg.select(F.col("n").cast("long").alias("n_checked"))
        .crossJoin(orphans)
        .select(
            F.lit(name).alias("rule"),
            F.lit(tbl).alias("tbl"),
            "n_checked",
            "n_violations",
        )
    )


@query(
    "quality_constraint_audit",
    tables=("orders", "lineitem", "customer", "nation", "events"),
    oracle="""
WITH o AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS dup_key,
           CAST(COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT) AS bad_price,
           CAST(COUNT(CASE WHEN o_orderstatus NOT IN ('P','O','F') THEN 1 END)
                AS BIGINT) AS bad_status
    FROM orders
),
l AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
               AS dup_key,
           CAST(COUNT(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END)
                AS BIGINT) AS bad_qty,
           CAST(COUNT(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END)
                AS BIGINT) AS bad_disc
    FROM lineitem
),
c AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT) AS dup_key
    FROM customer
),
e AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS dup_key,
           CAST(COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS BIGINT) AS null_user,
           CAST(COUNT(CASE WHEN props IS NOT NULL AND NOT json_valid(props) THEN 1 END)
                AS BIGINT) AS bad_json
    FROM events
),
fk AS (
    SELECT 'orders.o_custkey fk customer' AS rule, 'orders' AS tbl,
           (SELECT n FROM o) AS n_checked,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders ord
            WHERE NOT EXISTS (SELECT 1 FROM customer c2
                              WHERE c2.c_custkey = ord.o_custkey)) AS n_violations
    UNION ALL
    SELECT 'lineitem.l_orderkey fk orders', 'lineitem',
           (SELECT n FROM l),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem li
            WHERE NOT EXISTS (SELECT 1 FROM orders o2
                              WHERE o2.o_orderkey = li.l_orderkey))
    UNION ALL
    SELECT 'customer.c_nationkey fk nation', 'customer',
           (SELECT n FROM c),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer cu
            WHERE NOT EXISTS (SELECT 1 FROM nation n2
                              WHERE n2.n_nationkey = cu.c_nationkey))
),
rows_local AS (
    SELECT 'orders.o_orderkey unique' AS rule, 'orders' AS tbl,
           n AS n_checked, dup_key AS n_violations FROM o
    UNION ALL
    SELECT 'orders.o_totalprice positive', 'orders', n, bad_price FROM o
    UNION ALL
    SELECT 'orders.o_orderstatus in domain', 'orders', n, bad_status FROM o
    UNION ALL
    SELECT 'lineitem.line key unique', 'lineitem', n, dup_key FROM l
    UNION ALL
    SELECT 'lineitem.l_quantity in [1,50]', 'lineitem', n, bad_qty FROM l
    UNION ALL
    SELECT 'lineitem.l_discount in [0,1]', 'lineitem', n, bad_disc FROM l
    UNION ALL
    SELECT 'customer.c_custkey unique', 'customer', n, dup_key FROM c
    UNION ALL
    SELECT 'events.event_id unique', 'events', n, dup_key FROM e
    UNION ALL
    SELECT 'events.user_id not null', 'events', n, null_user FROM e
    UNION ALL
    SELECT 'events.props valid json', 'events', n, bad_json FROM e
)
SELECT rule, tbl, n_checked, n_violations,
       n_violations = 0 AS ok
FROM (SELECT * FROM rows_local UNION ALL SELECT * FROM fk)
ORDER BY rule
""",
)
def quality_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit over the warehouse tables: key
    uniqueness, FK coverage, domain/range rules, null contracts, and
    JSON well-formedness, one result row per constraint with checked /
    violation counts and an `ok` verdict. The fixture genuinely fails
    exactly one constraint (lineitem's composite line key), so the
    audit's verdict column carries real signal under the driver hash.

    Each table's row-local rules fold into one partial-aggregated scan
    (plus Catalyst's Expand for the distinct key count); FK rules are
    left-anti joins; the reshape explodes a literal struct array.
    See the module docstring for the 100 TB posture."""
    t = load_tables(spark, sf_dir, "orders", "lineitem", "customer", "nation", "events")

    o = t.orders.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_key"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("bad_price"),
        F.count(F.when(~F.col("o_orderstatus").isin("P", "O", "F"), 1)).alias(
            "bad_status"
        ),
    )
    li = t.lineitem.agg(
        F.count(F.lit(1)).alias("n"),
        # distinct over a STRUCT, not countDistinct(a, b): the latter
        # drops rows with any NULL component while DuckDB's row-value
        # COUNT(DISTINCT (a, b)) keeps them — a struct with a NULL
        # field is itself non-NULL in both engines, so they agree.
        (
            F.count(F.lit(1))
            - F.countDistinct(F.struct("l_orderkey", "l_linenumber"))
        ).alias("dup_key"),
        F.count(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
        ).alias("bad_qty"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
        ).alias("bad_disc"),
    )
    c = t.customer.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.countDistinct("c_custkey")).alias("dup_key"),
    )
    e = t.events.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias("dup_key"),
        F.count(F.when(F.col("user_id").isNull(), 1)).alias("null_user"),
        F.count(
            F.when(
                F.col("props").isNotNull() & F.try_parse_json("props").isNull(), 1
            )
        ).alias("bad_json"),
    )

    parts = [
        _result_rows(
            "orders",
            o,
            [
                ("orders.o_orderkey unique", "n", "dup_key"),
                ("orders.o_totalprice positive", "n", "bad_price"),
                ("orders.o_orderstatus in domain", "n", "bad_status"),
            ],
        ),
        _result_rows(
            "lineitem",
            li,
            [
                ("lineitem.line key unique", "n", "dup_key"),
                ("lineitem.l_quantity in [1,50]", "n", "bad_qty"),
                ("lineitem.l_discount in [0,1]", "n", "bad_disc"),
            ],
        ),
        _result_rows("customer", c, [("customer.c_custkey unique", "n", "dup_key")]),
        _result_rows(
            "events",
            e,
            [
                ("events.event_id unique", "n", "dup_key"),
                ("events.user_id not null", "n", "null_user"),
                ("events.props valid json", "n", "bad_json"),
            ],
        ),
        _fk_row(
            "orders.o_custkey fk customer",
            "orders",
            o,
            t.orders.select("o_custkey"),
            t.customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
        ),
        _fk_row(
            "lineitem.l_orderkey fk orders",
            "lineitem",
            li,
            t.lineitem.select("l_orderkey"),
            t.orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
        ),
        _fk_row(
            "customer.c_nationkey fk nation",
            "customer",
            c,
            t.customer.select("c_nationkey"),
            t.nation.select(F.col("n_nationkey").alias("c_nationkey")),
            "c_nationkey",
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule",
        "tbl",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("ok"),
    ).orderBy("rule")
