"""Scalar function surface: string / date / math / JSON / array /
conditional expressions (SURVEY.md §2.2 row "Scalar functions").

The reference's only scalar op is an ISO date parse (P4,
``NytimesBatchProcessorApplication.kt:52-61`` — with a month-off bug this
engine deliberately does not replicate, SURVEY.md §1.2) and a null-safe
int parse (P3, ``…kt:49-50``). Everything here is built-in
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd; no Python
UDF appears anywhere on this surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import query
from ..functions import dec2, dec_rate, money, ratio
from ..sources import load_tables


@query(
    "fn_string_cond_surface",
    tables=("part",),
    oracle="""
SELECT p_partkey,
       UPPER(p_brand)                                        AS brand_upper,
       LOWER(p_type)                                         AS type_lower,
       CAST(LENGTH(p_name) AS INT)                           AS name_len,
       SUBSTRING(p_type, 1, 3)                               AS type_prefix,
       CONCAT_WS('|', p_brand, p_type)                       AS brand_type,
       REGEXP_EXTRACT(p_brand, '([0-9]+)', 1)                AS brand_num,
       REPLACE(p_name, ' ', '_')                             AS name_snake,
       TRIM(p_name)                                          AS name_trim,
       CAST(LENGTH(p_name) - LENGTH(REPLACE(p_name, ' ', '')) + 1 AS INT) AS n_tokens,
       CASE WHEN p_retailprice < 1000 THEN 'budget'
            WHEN p_retailprice < 1500 THEN 'mid'
            ELSE 'premium' END                               AS price_tier,
       COALESCE(NULLIF(SUBSTRING(p_type, 1, 3), 'ECO'), 'STD') AS type_renamed,
       CAST(p_size > 25 AS BOOLEAN)                          AS is_large,
       ROUND(IF(p_retailprice > 1000, p_retailprice, 1000), 2) AS floored_price
FROM part
""",
)
def fn_string_cond_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consolidated string + conditional/null scalar surface (r9
    rotation-capacity consolidation of fn_string_surface +
    fn_conditional_null — VERDICT r8 item 2): upper/lower/length/
    substring/concat_ws/regexp_extract/replace/trim + a split-based
    token count, plus CASE WHEN tiers, coalesce∘nullif renaming, a
    boolean projection, and a conditional clamp — one hash, one table,
    all codegen'd built-ins (reference P3/P5 null handling
    generalized)."""
    t = load_tables(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    return t.part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 3).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.trim("p_name").alias("name_trim"),
        F.size(F.split("p_name", " ")).alias("n_tokens"),
        F.when(price < 1000, "budget")
        .when(price < 1500, "mid")
        .otherwise("premium")
        .alias("price_tier"),
        F.coalesce(
            F.nullif(F.substring("p_type", 1, 3), F.lit("ECO")), F.lit("STD")
        ).alias("type_renamed"),
        (F.col("p_size") > 25).alias("is_large"),
        money(F.when(price > 1000, price).otherwise(1000)).alias("floored_price"),
    )


@query(
    "fn_date_surface",
    tables=("orders",),
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE)                              AS order_date,
       CAST(EXTRACT(year FROM o_orderdate) AS INT)            AS order_year,
       CAST(EXTRACT(month FROM o_orderdate) AS INT)           AS order_month,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INT)         AS order_quarter,
       CAST(EXTRACT(dow FROM CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow_1_7,
       CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)      AS month_end,
       CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS INT) AS days_since_epoch0,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS DATE)  AS due_date
FROM orders
WHERE o_orderkey < 1000
""",
)
def fn_date_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/quarter/dayofweek/date_trunc/last_day/datediff/date_add
    — the P4 intent (ISO date handling) done right, plus arithmetic."""
    t = load_tables(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return t.orders.filter(F.col("o_orderkey") < 1000).select(
        "o_orderkey",
        d.alias("order_date"),
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.quarter(d).alias("order_quarter"),
        F.dayofweek(d).alias("dow_1_7"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_epoch0"),
        F.date_add(d, 90).alias("due_date"),
    )


@query(
    "fn_math_surface",
    tables=("lineitem",),
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT)                                   AS n,
       CAST(ROUND(SUM(ABS(CAST(l_extendedprice AS DECIMAL(18,2)) - 40000)), 2) AS DOUBLE) AS sum_abs_dev,
       CAST(SUM(CAST(ROUND(SQRT(l_quantity), 6) AS DECIMAL(28,6))) AS DOUBLE)      AS sum_sqrt_qty,
       CAST(SUM(CAST(ROUND(LN(l_extendedprice), 6) AS DECIMAL(28,6))) AS DOUBLE)   AS sum_ln_price,
       CAST(SUM(CAST(ROUND(LOG10(l_extendedprice), 6) AS DECIMAL(28,6))) AS DOUBLE) AS sum_log10_price,
       CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(4,2)) * CAST(l_discount AS DECIMAL(4,2))), 6) AS DOUBLE) AS sum_disc_sq,
       CAST(SUM(CAST(l_orderkey % 7 AS BIGINT)) AS BIGINT)        AS sum_mod7,
       CAST(SUM(CEIL(l_quantity / 3)) AS BIGINT)                  AS sum_ceil,
       CAST(SUM(FLOOR(l_quantity / 3)) AS BIGINT)                 AS sum_floor,
       CAST(ROUND(SUM(GREATEST(CAST(l_tax AS DECIMAL(4,2)), CAST(l_discount AS DECIMAL(4,2)))), 6) AS DOUBLE) AS sum_greatest,
       CAST(ROUND(SUM(LEAST(CAST(l_tax AS DECIMAL(4,2)), CAST(l_discount AS DECIMAL(4,2)))), 6) AS DOUBLE) AS sum_least
FROM lineitem
""",
)
def fn_math_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/sqrt/ln/log10/pow/mod/ceil/floor/greatest/least folded into
    checksum aggregates (single-row result keeps the oracle compact)."""
    t = load_tables(spark, sf_dir, "lineitem")
    li = t.lineitem
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.abs(dec2("l_extendedprice") - 40000)), 2)
        .cast("double")
        .alias("sum_abs_dev"),
        # Round each continuous term to 6dp THEN sum as exact decimal:
        # decimal addition is order-independent, so the 32-way-parallel
        # sum can't flip low bits run-to-run (a double SUM here is flaky).
        F.sum(F.round(F.sqrt("l_quantity"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("sum_sqrt_qty"),
        F.sum(F.round(F.log(F.col("l_extendedprice")), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("sum_ln_price"),
        F.sum(F.round(F.log10("l_extendedprice"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("sum_log10_price"),
        F.round(F.sum(dec_rate("l_discount") * dec_rate("l_discount")), 6)
        .cast("double")
        .alias("sum_disc_sq"),
        F.sum(F.col("l_orderkey") % 7).alias("sum_mod7"),
        # ceil/floor of qty/3 are integral: keep BIGINT on BOTH sides.
        # (r2's money() round left Spark LONG vs the oracle's ROUND(...)
        # DOUBLE — numerically equal, type-hash different. r3 red row.)
        F.sum(F.ceil(F.col("l_quantity") / 3)).cast("bigint").alias("sum_ceil"),
        F.sum(F.floor(F.col("l_quantity") / 3)).cast("bigint").alias("sum_floor"),
        F.round(F.sum(F.greatest(dec_rate("l_tax"), dec_rate("l_discount"))), 6)
        .cast("double")
        .alias("sum_greatest"),
        F.round(F.sum(F.least(dec_rate("l_tax"), dec_rate("l_discount"))), 6)
        .cast("double")
        .alias("sum_least"),
    )


@query(
    "fn_json_surface",
    tables=("events",),
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10) AS BIGINT) AS n_k_buckets,
       CAST(COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS BIGINT) AS n_high_k,
       CAST(COUNT(*) FILTER (WHERE json_extract_string(props, '$.k') IS NULL) AS BIGINT) AS n_missing,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type
""",
)
def fn_json_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JSON surface in one entry — consolidated ``get_json_object``
    (path extraction) + ``from_json`` (schema-full typed struct) over
    ``events.props`` (r8: replaces the separate ``fn_json_extract`` /
    ``fn_json_struct`` entries to keep the driver-sweep rotation
    sustainable; see tests/test_rotation.py).

    Both APIs run in the SAME query against the same column: ``from_json``
    feeds sum/min/max/high-count (the at-scale path — one codegen'd
    JacksonParser parse per row into a typed struct), while
    ``get_json_object`` feeds the bucket-distinct and null counts (the
    ad-hoc path-walk API). Malformed/missing fields become NULL
    (PERMISSIVE), counted explicitly so the null path is verified; any
    divergence between the two APIs' reads of the same field breaks the
    hash."""
    t = load_tables(spark, sf_dir, "events")
    parsed = t.events.withColumn("p", F.from_json("props", "struct<k: bigint>"))
    k = F.col("p.k")  # schema-full path
    k_path = F.get_json_object("props", "$.k").cast("long")  # path-walk API
    return parsed.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.countDistinct(k_path % 10).alias("n_k_buckets"),
        F.count(F.when(k > 50, 1)).alias("n_high_k"),
        F.count(F.when(k_path.isNull(), 1)).alias("n_missing"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "fn_array_surface",
    tables=("embeddings",),
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INT)                            AS dim,
       ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS vec_sum,
       ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS vec_sq_norm,
       ROUND(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS vec_max,
       ROUND(CAST(embedding[1] AS DOUBLE), 6)                 AS first_component,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT)   AS n_positive
FROM embeddings
""",
)
def fn_array_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform/aggregate/filter) over the
    embedding column — all JVM-side, no UDF; this is the codegen'd path
    used by the similarity operators."""
    t = load_tables(spark, sf_dir, "embeddings")
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dbl_sum = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    return t.embeddings.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        ratio(dbl_sum(emb)).alias("vec_sum"),
        ratio(dbl_sum(F.transform(emb, lambda x: x * x))).alias("vec_sq_norm"),
        ratio(F.array_max(emb)).alias("vec_max"),
        ratio(F.col("embedding").getItem(0).cast("double")).alias("first_component"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "fn_map_surface",
    tables=("events",),
    oracle="""
SELECT event_type,
       CAST(COUNT(*) FILTER (WHERE json_extract_string(props, '$.k') IS NOT NULL) AS BIGINT) AS n_with_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)  AS sum_k,
       CAST(MAX(len(json_keys(props))) AS INT)                                 AS max_n_keys
FROM events
GROUP BY event_type
""",
)
def fn_map_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed access: props parsed once to map<string,bigint>, probed
    with element_at / map_keys — the schema-free sibling of
    fn_json_surface for payloads whose key set isn't fixed."""
    t = load_tables(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    parsed = t.events.select("event_type", m.alias("m"))
    k = F.element_at("m", "k")
    return parsed.groupBy("event_type").agg(
        F.count(k).alias("n_with_k"),
        F.sum(k).alias("sum_k"),
        F.max(F.size(F.map_keys("m"))).alias("max_n_keys"),
    )


@query(
    "fn_regexp_surface",
    tables=("part",),
    oracle="""
SELECT p_partkey,
       regexp_extract(p_name, '^(?:red|blue) (\\w+)$', 1) AS noun,
       regexp_replace(p_brand, '[0-9]', '', 'g')          AS brand_family,
       CAST(regexp_matches(p_type, '^(ECONOMY|PROMO)') AS BOOLEAN) AS is_value_tier
FROM part
WHERE regexp_matches(p_name, '^(red|blue) ')
""",
)
def fn_regexp_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface: rlike predicate, group extraction, global
    replacement — the text-wrangling trio every ingest normalization
    pass uses. All JVM-side built-ins (codegen'd java.util.regex);
    the rlike filter is evaluated at the scan, and at 100 TB a
    leading-literal pattern additionally prunes via a derived
    StartsWith data filter. Dialect note: DuckDB regexp_replace
    needs the explicit 'g' flag to match Spark's replace-all
    default."""
    t = load_tables(spark, sf_dir, "part")
    return t.part.filter(F.col("p_name").rlike("^(red|blue) ")).select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(?:red|blue) (\w+)$", 1).alias("noun"),
        F.regexp_replace("p_brand", "[0-9]", "").alias("brand_family"),
        F.col("p_type").rlike("^(ECONOMY|PROMO)").alias("is_value_tier"),
    )


@query(
    "fn_higher_order_surface",
    tables=("embeddings",),
    oracle="""
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.1)) AS INT) AS n_above,
       list_bool_or(list_transform(embedding, x -> CAST(x AS DOUBLE) < -0.5)) AS any_strong_neg,
       list_bool_and(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)) < 10)) AS all_bounded,
       CAST(ROUND(list_sum(list_transform(embedding,
                      x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12)))), 6) AS DOUBLE) AS sum_sq
FROM embeddings
WHERE vec_id < 300
""",
)
def fn_higher_order_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — filter / exists / forall /
    aggregate with lambdas, all JVM-side (codegen'd, no Python): the
    vector-column toolkit used by every embedding operator in this
    engine. The fold uses per-term decimal terms so parallel summation
    order can't flip the 6dp rounding (the fn_math_surface lesson)."""
    t = load_tables(spark, sf_dir, "embeddings")
    e = F.transform("embedding", lambda x: x.cast("double"))
    return t.embeddings.filter(F.col("vec_id") < 300).select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0.1)).alias("n_above"),
        F.exists(e, lambda x: x < -0.5).alias("any_strong_neg"),
        F.forall(e, lambda x: F.abs(x) < 10).alias("all_bounded"),
        F.round(
            F.aggregate(
                F.transform(e, lambda x: (x * x).cast("decimal(28,12)")),
                F.lit(0).cast("decimal(38,12)"),
                # decimal + widens then caps at precision 38 scale 11;
                # re-cast keeps the accumulator type fixed across steps
                lambda acc, x: (acc + x).cast("decimal(38,12)"),
            ),
            6,
        ).cast("double").alias("sum_sq"),
    )


@query(
    "fn_variant_json",
    tables=("events",),
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) >= 50
                       THEN 1 END) AS BIGINT)                              AS n_high,
       CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS n_distinct_k
FROM events
GROUP BY event_type
""",
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4 VariantType: parse_json once
    into a variant column, then variant_get path extraction — the
    modern engine path for sparse JSON (binary-encoded, no full struct
    schema, ~order-of-magnitude faster than from_json when queries
    touch few paths of wide documents). Oracle is DuckDB's JSON
    extraction over the same strings; fn_json_surface /
    covers the schema-full alternatives."""
    t = load_tables(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        t.events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.when(F.col("k") >= 50, 1)).alias("n_high"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
    )


@query(
    "fn_sql_udf_surface",
    tables=("lineitem",),
    oracle="""
WITH r AS (
    SELECT CASE WHEN l_discount >= 0.07 THEN 'deep'
                WHEN l_discount >= 0.03 THEN 'mid'
                ELSE 'shallow' END AS discount_class,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
           l_quantity
    FROM lineitem
)
SELECT discount_class,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(ROUND(SUM(CAST(revenue AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_revenue,
       ROUND(AVG(CAST(l_quantity AS DOUBLE)), 6) AS avg_qty
FROM r GROUP BY discount_class
""",
)
def fn_sql_udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL UDFs (CREATE TEMPORARY FUNCTION ... RETURN expr) —
    reusable scalar logic defined IN SQL, resolved by Catalyst by
    inlining the body into the plan: unlike any Python UDF path these
    stay inside whole-stage codegen with working predicate pushdown, so
    a shared business rule (revenue net of discount, discount banding)
    costs nothing at 100 TB. The oracle inlines the same bodies, which
    is exactly what Catalyst does under the hood.

    Determinism: the revenue UDF quantizes per-row to exact 2dp via the
    engine's money-decimal policy (functions/__init__), and the
    aggregate re-enters decimal before summation (msum shape) so
    parallel order can't flip cents."""
    load_tables(spark, sf_dir, "lineitem")  # registers the lineitem view
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION eng_revenue(price DOUBLE, disc DOUBLE) "
        "RETURNS DOUBLE RETURN CAST(ROUND(CAST(price AS DECIMAL(18,2)) "
        "* (1 - CAST(disc AS DECIMAL(4,2))), 2) AS DOUBLE)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION eng_discount_class(disc DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN disc >= 0.07 THEN 'deep' "
        "WHEN disc >= 0.03 THEN 'mid' ELSE 'shallow' END"
    )
    return spark.sql(
        """
        SELECT eng_discount_class(l_discount) AS discount_class,
               COUNT(*) AS n_items,
               CAST(ROUND(SUM(CAST(eng_revenue(l_extendedprice, l_discount)
                                   AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_revenue,
               ROUND(AVG(CAST(l_quantity AS DOUBLE)), 6) AS avg_qty
        FROM lineitem
        GROUP BY eng_discount_class(l_discount)
        """
    )


@query(
    "fn_url_surface",
    tables=("orders",),
    oracle="""
WITH u AS (
    SELECT o_orderkey,
           CONCAT('https://shop-', CAST(o_custkey % 50 AS VARCHAR),
                  '.example.com/orders/', CAST(o_orderkey AS VARCHAR),
                  '?status=', o_orderstatus,
                  '&page=', CAST(o_orderkey % 7 AS VARCHAR)) AS url
    FROM orders
)
SELECT o_orderkey,
       url,
       regexp_extract(url, '^([a-z]+)://', 1)            AS url_proto,
       regexp_extract(url, '^[a-z]+://([^/]+)', 1)       AS url_host,
       regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS url_path,
       regexp_extract(url, '\\?(.*)$', 1)                 AS url_query,
       regexp_extract(url, '[?&]status=([^&]*)', 1)      AS url_status
FROM u
""",
)
def fn_url_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing — the scraped-corpus staple (domain-level dedup,
    per-site quality priors, robots/takedown filtering all start with
    "what host/path/param is this"). Spark side uses the JVM built-in
    `parse_url` (PROTOCOL/HOST/PATH/QUERY and keyed QUERY extraction —
    codegen, no UDF); DuckDB has no parse_url, so the oracle re-derives
    each component with anchored regexes over the same deterministically
    constructed URLs — a cross-engine check that parse_url's component
    semantics match their regex definitions.

    Scale notes: pure map-side scalar work over the scan, zero shuffle;
    at 100 TB this is the same whole-stage-codegen shape as every other
    fn_* surface. Domain-level rollups downstream group on url_host —
    the skew case (one mega-domain) is `agg_skew_salted_sum`'s."""
    t = load_tables(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("https://shop-"),
        (F.col("o_custkey") % 50).cast("string"),
        F.lit(".example.com/orders/"),
        F.col("o_orderkey").cast("string"),
        F.lit("?status="),
        F.col("o_orderstatus"),
        F.lit("&page="),
        (F.col("o_orderkey") % 7).cast("string"),
    )
    return t.orders.select(
        "o_orderkey",
        url.alias("url"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("url_proto"),
        F.parse_url(url, F.lit("HOST")).alias("url_host"),
        F.parse_url(url, F.lit("PATH")).alias("url_path"),
        F.parse_url(url, F.lit("QUERY")).alias("url_query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("status")).alias("url_status"),
    )


@query(
    "fn_mask_redact",
    tables=("customer",),
    oracle="""
WITH p AS (
    SELECT c_custkey,
           c_name,
           CONCAT(c_name, ' <', LOWER(REPLACE(c_name, '#', '')),
                  '@example.com> tel 555-',
                  LPAD(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')) AS profile
    FROM customer
)
SELECT c_custkey,
       regexp_replace(regexp_replace(regexp_replace(c_name,
           '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
                                                          AS masked_name,
       regexp_replace(regexp_replace(profile,
           '[A-Za-z0-9.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
           '555-[0-9]{4}', '<PHONE>', 'g')                AS redacted,
       regexp_extract(profile, '@([A-Za-z0-9.]+)>', 1)    AS email_domain
FROM p
""",
)
def fn_mask_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking/redaction — the scrub step every training-data
    pipeline runs before a corpus ships: `mask()` (Spark 3.4+ built-in:
    upper->X, lower->x, digit->n, punctuation kept — format-preserving,
    so downstream length/shape features survive) plus pattern redaction
    of emails and phone numbers via regexp_replace, and domain
    extraction for the allow/deny-list join. DuckDB has no mask(), so
    the oracle derives it from first principles as an ordered
    regexp_replace chain (upper first — the introduced 'X' must not be
    re-matched by the later classes) — a cross-engine check that
    mask()'s character-class semantics are exactly their regex
    definition.

    Scale notes: map-side scalar work, zero shuffle, whole-stage
    codegen; at 100 TB redaction cost is the scan itself. Real
    deployments chain more patterns (SSN, IP, credit card) — same
    shape, same cost model."""
    t = load_tables(spark, sf_dir, "customer")
    profile = F.concat(
        F.col("c_name"),
        F.lit(" <"),
        F.lower(F.regexp_replace("c_name", "#", "")),
        F.lit("@example.com> tel 555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
    )
    return t.customer.select(
        "c_custkey",
        F.mask("c_name").alias("masked_name"),
        F.regexp_replace(
            F.regexp_replace(profile, r"[A-Za-z0-9.]+@[A-Za-z0-9.]+", "<EMAIL>"),
            r"555-[0-9]{4}",
            "<PHONE>",
        ).alias("redacted"),
        F.regexp_extract(profile, r"@([A-Za-z0-9.]+)>", 1).alias("email_domain"),
    )


@query(
    "fn_try_ansi_surface",
    tables=("orders",),
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_custkey % 7 = 0 THEN NULL
            ELSE CAST(o_orderkey AS DOUBLE) / (o_custkey % 7) END AS td,
       TRY_CAST(CASE WHEN o_custkey % 3 = 0 THEN CONCAT('x', CAST(o_custkey AS VARCHAR))
                     ELSE CAST(o_custkey AS VARCHAR) END AS INT)  AS c_int,
       TRY_CAST(CASE WHEN o_custkey % 5 = 0 THEN '2021-13-40'
                     ELSE strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') END
                AS DATE)                                          AS c_date,
       (['a','b','c'])[CAST(o_custkey % 4 AS INT) + 1]            AS e_at,
       CASE WHEN o_custkey % 2 = 1 THEN NULL
            ELSE 9223372036854775807 END                          AS t_add
FROM orders
""",
)
def fn_try_ansi_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI-mode safety surface: Spark 4 runs with
    `spark.sql.ansi.enabled=true`, where division by zero, bad casts,
    arithmetic overflow and out-of-range array access are ERRORS — the
    `try_*` family (`try_divide`, `try_cast`, `try_add`,
    `try_element_at`) is the production idiom for dirty data: NULL on
    failure instead of a job-killing exception, composable with
    null-handling downstream. Each column here manufactures a
    deterministic failure subset from orders (every 7th key divides by
    zero, every 3rd carries a non-numeric string, every 5th an invalid
    date, every odd key an int64 overflow, every key = 3 mod 4 an
    out-of-range array access; index 0 stays an ERROR even under try —
    invalid usage, not dirty data). DuckDB expresses the same semantics natively
    (TRY_CAST, NULL-on-out-of-range list index) or via explicit CASE
    guards — the oracle is the executable statement of WHICH inputs
    must null out.

    Scale notes: pure codegen scalar work over the scan, zero shuffle;
    the point at 100 TB is operational, not computational — one
    malformed row in a trillion must cost a NULL, not the job."""
    t = load_tables(spark, sf_dir, "orders")
    num_str = F.when(
        F.col("o_custkey") % 3 == 0,
        F.concat(F.lit("x"), F.col("o_custkey").cast("string")),
    ).otherwise(F.col("o_custkey").cast("string"))
    date_str = F.when(F.col("o_custkey") % 5 == 0, F.lit("2021-13-40")).otherwise(
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd")
    )
    return t.orders.select(
        "o_orderkey",
        F.try_divide(
            F.col("o_orderkey").cast("double"), (F.col("o_custkey") % 7)
        ).alias("td"),
        num_str.try_cast("int").alias("c_int"),
        date_str.try_cast("date").alias("c_date"),
        F.try_element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            ((F.col("o_custkey") % 4) + 1).cast("int"),
        ).alias("e_at"),
        F.try_add(
            F.lit(9223372036854775806), (F.col("o_custkey") % 2) + F.lit(1)
        ).alias("t_add"),
    )
