"""Canary for the DuckDB semantics the oracles LEAN ON.

The driver's DuckDB is the hard oracle, and version drift between it
and the local DuckDB is the one divergence class local parity cannot
see until the driver sweep goes red (it happened twice: r3
fn_math_surface, r4 fn_higher_order_surface). Every engine-specific
behavior an oracle assumes is therefore pinned HERE as an explicit,
named expectation — if a DuckDB upgrade flips one, this file points at
exactly which oracles are at risk instead of leaving a red driver row
to be reverse-engineered."""

from __future__ import annotations

import duckdb
import pytest


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def q(con, sql):
    return con.execute(sql).fetchall()[0]


def test_integer_division_truncates(con):
    """`//` truncates toward zero (NOT Python floor) — the centroid
    update in ivf_kmeans_int_train mirrors this via _ikm_tdiv."""
    assert q(con, "SELECT -7 // 2, 7 // 2, -1 // 3") == (-3, 3, 0)


def test_md5_hex_is_lowercase_and_conv_parses(con):
    """The portable token hashes (MinHash 15 hex chars, SimHash 12)
    parse md5 prefixes as hex BIGINTs; DuckDB's md5 + CAST('0x'||...)
    must equal Python's hashlib (which Spark's md5/conv also equals —
    pinned on the Spark side by the hash-green minhash entries)."""
    import hashlib

    digest = hashlib.md5(b"tok").hexdigest()
    assert q(con, "SELECT md5('tok')") == (digest,)
    assert q(
        con, "SELECT CAST(concat('0x', substr(md5('tok'), 1, 15)) AS BIGINT)"
    ) == (int(digest[:15], 16),)


def test_grouping_marker_bits(con):
    """GROUPING(col) is 1 when the column is aggregated away — the gid
    encoding in agg_grouping_multi weights year*8 + month*4 + status*2 +
    priority."""
    rows = con.execute(
        """
        SELECT COALESCE(g, 'ALL') AS g, GROUPING(g) AS m, COUNT(*)
        FROM (VALUES ('a'), ('b')) t(g)
        GROUP BY GROUPING SETS ((g), ())
        ORDER BY 1
        """
    ).fetchall()
    assert [(r[0], r[1]) for r in rows] == [("ALL", 1), ("a", 0), ("b", 0)]


def test_bit_count_xor_and_shifts(con):
    """dedup_simhash's Hamming distance: bit_count(xor(a, b)), and the
    band slices' shift/mod arithmetic."""
    assert q(con, "SELECT bit_count(xor(12, 10))") == (2,)
    assert q(con, "SELECT (CAST(5 AS BIGINT) >> 1) % 4") == (2,)


def test_list_semantics(con):
    """1-based list indexing, list_distinct, list_intersect-free exact
    |A∩B| via unnest joins, list_slice bounds — the shingle/minhash/
    kmeans oracles all assume these."""
    assert q(con, "SELECT [10, 20, 30][1], [10, 20, 30][3]") == (10, 30)
    assert q(con, "SELECT list_slice([1, 2, 3, 4], 2, 3)") == ([2, 3],)
    assert q(con, "SELECT list_min(list_transform([3, 1, 2], x -> x * 2))") == (2,)
    assert q(con, "SELECT len(list_distinct(['a', 'a', 'b']))") == (2,)


def test_qualify_and_row_number_ties(con):
    """ivf_kmeans_int_train's assignment uses QUALIFY ROW_NUMBER()
    OVER (... ORDER BY dist, k) = 1 — deterministic lowest-k tie-break."""
    rows = con.execute(
        """
        SELECT v, k FROM (
            SELECT * FROM (VALUES (1, 0, 5), (1, 1, 5), (2, 1, 3)) t(v, k, dist))
        QUALIFY ROW_NUMBER() OVER (PARTITION BY v ORDER BY dist, k) = 1
        ORDER BY v
        """
    ).fetchall()
    assert rows == [(1, 0), (2, 1)]


def test_count_filter_and_distinct_skip_nulls(con):
    """fn_json_surface: COUNT(*) FILTER and COUNT(DISTINCT expr) with
    NULLs — NULL rows counted only by the explicit IS NULL filter."""
    assert q(
        con,
        """
        SELECT COUNT(DISTINCT x % 10),
               COUNT(*) FILTER (WHERE x IS NULL),
               CAST(SUM(x) AS BIGINT)
        FROM (VALUES (11), (21), (NULL)) t(x)
        """,
    ) == (1, 1, 32)


def test_floor_of_scaled_double(con):
    """floor(x * 1e4) on DOUBLE is the single IEEE op both engines run
    for the kmeans quantization and the cents folds — pinned against
    Python's identical IEEE arithmetic, including a value whose product
    lands just below the integer (0.3 * 1e4 = 2999.9999...)."""
    import math

    for x in (0.1, -0.1, 0.3, -0.3, 0.5252062082290649):
        assert q(
            con,
            f"SELECT CAST(floor(CAST({x!r} AS DOUBLE) * 10000) AS BIGINT)",
        ) == (math.floor(x * 10000),)


def test_sum_widens_but_casts_back(con):
    """SUM(BIGINT) widens to HUGEINT; every oracle casts aggregate
    sums back to BIGINT — the cast must be lossless in-range."""
    assert q(
        con,
        "SELECT CAST(SUM(x) AS BIGINT) FROM (VALUES (9223372036854775806), (1)) t(x)",
    ) == (9223372036854775807,)


def test_strict_window_frame_defaults(con):
    """The gaps-and-islands oracles write explicit ROWS frames; LAG and
    prefix MAX over 1 PRECEDING behave as the twins assume (empty frame
    -> NULL, not 0)."""
    rows = con.execute(
        """
        SELECT x,
               LAG(x) OVER w,
               MAX(x) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        FROM (VALUES (1), (2), (3)) t(x)
        WINDOW w AS (ORDER BY x)
        ORDER BY x
        """
    ).fetchall()
    assert rows == [(1, None, None), (2, 1, 1), (3, 2, 2)]


def test_series_bounds_and_subscripts(con):
    """range() is EXCLUSIVE of the upper bound, generate_series
    INCLUSIVE, generate_subscripts 1-based — the shingle/spine/packing
    oracles mix all three and a flipped bound shifts every window."""
    assert q(con, "SELECT range(0, 3)") == ([0, 1, 2],)
    assert q(con, "SELECT generate_series(0, 3)") == ([0, 1, 2, 3],)
    assert con.execute("SELECT generate_subscripts([10, 20], 1)").fetchall() == [
        (1,),
        (2,),
    ]


def test_date_diff_sign_and_strftime(con):
    """date_diff('day', a, b) = b - a (the spine/rollup oracles), and
    strftime's ISO day format."""
    assert q(
        con, "SELECT date_diff('day', DATE '2021-01-01', DATE '2021-01-04')"
    ) == (3,)
    assert q(con, "SELECT strftime(DATE '2021-01-05', '%Y-%m-%d')") == (
        "2021-01-05",
    )


def test_split_regex_and_list_aggregate(con):
    """string_split_regex collapses runs under \\s+ without emitting
    empty strings mid-list (the tokenizer twin of Spark's split), and
    list_aggregate dispatches by function NAME string."""
    assert q(con, "SELECT string_split_regex('a  b c', '\\s+')") == (
        ["a", "b", "c"],
    )
    assert q(con, "SELECT list_aggregate([3, 1, 2], 'min')") == (1,)


def test_encode_utf8_bytes_and_epoch_us(con):
    """octet_length(encode(s)) is UTF-8 BYTES (not chars) — the
    binaryFile metadata oracle; epoch_us is integer microseconds."""
    assert q(con, "SELECT octet_length(encode('héllo'))") == (6,)
    assert q(
        con,
        "SELECT CAST(epoch_us(TIMESTAMP '1970-01-01 00:00:01') AS BIGINT)",
    ) == (1_000_000,)


def test_tdiv_matches_duckdb_division(con):
    """_ikm_tdiv (the Python side of the k-means centroid update) must
    equal DuckDB's `//` on every sign combination and magnitude the
    update can see — fuzzed here rather than trusted."""
    import random

    from nytimes_batch_processor_spark.operators.similarity import _ikm_tdiv

    rng = random.Random(8)
    cases = [(a, b) for a in (-7, -1, 0, 1, 7) for b in (1, 2, 3, 64)]
    cases += [
        (rng.randint(-10**7, 10**7), rng.randint(1, 2000)) for _ in range(200)
    ]
    for a, b in cases:
        assert _ikm_tdiv(a, b) == con.execute(f"SELECT {a} // {b}").fetchall()[0][0], (a, b)
