"""Explicit schemas for every table the engine touches.

The reference declares its sink schema as DDL
(``/root/reference/src/main/resources/schema.sql:1-21``) and maps CSV
ordinals positionally (``NytimesBatchProcessorApplication.kt:126-128,
164-166``). The engine keeps that discipline: **never inferSchema** — at
100 TB an inference pass is a full extra scan of the data.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Family A — the reference's COVID tables (schema.sql:1-9 and :12-21).
# CSV layout (positional): date, state, fips, cases, deaths
# and               date, county, state, fips, cases, deaths.
# fips is nullable AND part of the unique key; the reference writes -1 for
# null at the sink (…kt:133,171) so Postgres' unique index dedups it.
# ---------------------------------------------------------------------------

COVID_STATES_CSV = T.StructType(
    [
        T.StructField("date", T.StringType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("fips", T.StringType(), True),
        T.StructField("cases", T.LongType(), False),
        T.StructField("deaths", T.LongType(), False),
    ]
)

COVID_COUNTIES_CSV = T.StructType(
    [
        T.StructField("date", T.StringType(), False),
        T.StructField("county", T.StringType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("fips", T.StringType(), True),
        T.StructField("cases", T.LongType(), False),
        T.StructField("deaths", T.LongType(), False),
    ]
)

# Typed (post-ingest) shapes — mirror schema.sql types: timestamp->date
# intent (see SURVEY.md §1.2 on the reference's date bug), bigint counters.
COVID_STATES = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("fips", T.IntegerType(), True),
        T.StructField("cases", T.LongType(), False),
        T.StructField("deaths", T.LongType(), False),
    ]
)

COVID_COUNTIES = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("county", T.StringType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("fips", T.IntegerType(), True),
        T.StructField("cases", T.LongType(), False),
        T.StructField("deaths", T.LongType(), False),
    ]
)

COVID_STATES_KEYS = ["date", "state", "fips"]
COVID_COUNTIES_KEYS = ["date", "county", "state", "fips"]

# ---------------------------------------------------------------------------
# Family B — driver fixture star schema (/root/repo/TESTDATA.md). Parquet
# carries its own schema; these StructTypes document the expected shapes and
# back schema assertions in tests. `events.ts` is TIMESTAMP(NANOS) on disk,
# read as LongType (nanos) and converted by sources/readers.py.
# ---------------------------------------------------------------------------

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

EXPECTED_COLUMNS: dict[str, list[str]] = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ],
    "lineitem": [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}
