"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For each left event, find the latest right event with ts <= left.ts per
key. Implemented as a composition of existing DataFrame ops (SURVEY.md
§2.2 strategy (a)): union both sides with a side marker, then a window
`last(right_value, ignorenulls=True)` ordered by (ts, side) carries the
most recent right row forward onto each left row. One shuffle on the key,
no range explosion.

Scale notes: the union-window formulation shuffles each side once on the
join key — same cost as a sort-merge join — and state per key is O(1)
(the carried last value). The naive alternative (range join + groupBy max)
explodes to O(pairs). Skewed keys (one user with millions of events)
split via AQE; a salted two-level variant is the documented fallback.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from ..catalog import query
from ..functions import epoch_us
from ..sources import load_tables


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    tie_breaker: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Generic as-of join: attach to each `left` row the `right_values`
    of the nearest `right` row per `on` key — the most recent with
    right_ts <= left_ts (``direction="backward"``, the default) or the
    earliest with right_ts >= left_ts (``direction="forward"``). Both
    directions are the SAME one-shuffle union-window plan; forward just
    flips the window order, so the scale properties are identical.

    Rows tie on timestamp: the right side wins (inclusive), matching
    DuckDB's ASOF JOIN semantics used as the oracle. Among right rows
    sharing (key, ts), `tie_breaker` (a unique right column) pins the
    winner — the largest tie_breaker value in either direction (ordering
    within an equal-ts group is unaffected by the ts sort flip, and the
    carried row is always the last right row before the left one) — so
    results are deterministic (catalog.py's tie-break policy).

    The right values travel as ONE struct carried by a single
    last(ignorenulls=True), so all attached columns always come from the
    same right row — per-column lasts could mix rows when a right row
    holds a NULL in one value column.
    """
    lcols = left.columns
    rv_type = right.select(F.struct(*right_values).alias("_rv")).schema[0].dataType
    tie_type = right.schema[tie_breaker].dataType if tie_breaker is not None else None
    marked_left = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_left"),
        F.lit(None).cast(rv_type).alias("_rv"),
        (F.lit(None).cast(tie_type) if tie_type is not None else F.lit(0)).alias("_tie"),
    )
    marked_right = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(F.struct(*lcols)).schema[0].dataType).alias("_left"),
        F.struct(*right_values).alias("_rv"),
        (F.col(tie_breaker) if tie_breaker is not None else F.lit(0)).alias("_tie"),
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # NULL-timestamp contract: a NULL ts satisfies no inequality, so a
    # NULL-ts LEFT row matches nothing (it still appears, null-extended)
    # and a NULL-ts RIGHT row is never a match candidate. Right rows are
    # filtered; left rows sort FIRST in BOTH directions (nulls-first on
    # asc and desc alike) so the carried value at their position is
    # still NULL — without the explicit desc_nulls_first, forward's
    # default nulls-LAST ordering silently matched NULL-ts left rows to
    # the globally earliest right row.
    marked_right = marked_right.filter(F.col("_ts").isNotNull())
    # Left rows carry _tie = NULL; nulls_last keeps them after any tied
    # right rows (they carry no value anyway — _rv is NULL on the left).
    # Forward scans time in reverse: the "last carried" right row is then
    # the EARLIEST one at-or-after the left row.
    ts_ord = (
        F.col("_ts").asc_nulls_first()
        if direction == "backward"
        else F.col("_ts").desc_nulls_first()
    )
    order: list[Column] = [
        ts_ord,
        F.col("_side").asc(),
        F.col("_tie").asc_nulls_last(),
    ]
    w = W.partitionBy("_k").orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    carried = marked_left.unionByName(marked_right).select(
        "_side",
        "_left",
        F.last("_rv", ignorenulls=True).over(w).alias("_rv"),
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_left.{c}").alias(c) for c in lcols],
        *[F.col(f"_rv.{c}").alias(f"asof_{c}") for c in right_values],
    )
    return out


@query(
    "join_asof_surface",
    tables=("events",),
    oracle="""
WITH purchases AS (
    SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
),
clicks AS (
    -- DuckDB's ASOF JOIN leaves the winner among right rows tied on
    -- (key, ts) unspecified; pre-dedupe to the max event_id per
    -- (user_id, ts) so the oracle pins the same tie policy as
    -- asof_join's tie_breaker (largest wins) instead of relying on
    -- tie-free fixtures.
    SELECT user_id, ts AS click_ts, event_id AS click_event_id
    FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, ts ORDER BY event_id DESC
               ) AS rn
        FROM events WHERE event_type = 'click'
    ) WHERE rn = 1
),
signups AS (
    SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup'
),
purchases_dedup AS (
    -- same explicit tie policy for the forward direction: max event_id
    -- wins among purchases tied on (user_id, ts)
    SELECT user_id, ts AS p_ts, event_id AS p_event_id,
           ROUND(value, 2) AS p_value
    FROM (
        SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, ts ORDER BY event_id DESC
               ) AS rn
        FROM events WHERE event_type = 'purchase'
    ) WHERE rn = 1
)
SELECT 'backward' AS direction,
       p.event_id,
       p.user_id,
       epoch_us(p.ts)                                 AS anchor_epoch_us,
       ROUND(p.value, 2)                              AS anchor_value,
       epoch_us(c.click_ts)                           AS matched_epoch_us,
       c.click_event_id                               AS matched_event_id,
       CAST(NULL AS DOUBLE)                           AS matched_value
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.click_ts
UNION ALL
SELECT 'forward' AS direction,
       s.event_id,
       s.user_id,
       epoch_us(s.ts)                                 AS anchor_epoch_us,
       CAST(NULL AS DOUBLE)                           AS anchor_value,
       epoch_us(pd.p_ts)                              AS matched_epoch_us,
       pd.p_event_id                                  AS matched_event_id,
       pd.p_value                                     AS matched_value
FROM signups s
ASOF LEFT JOIN purchases_dedup pd
  ON s.user_id = pd.user_id AND s.ts <= pd.p_ts
""",
)
def join_asof_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consolidated as-of join surface (r10 rotation-capacity
    consolidation of join_asof_purchase_click + join_asof_forward_
    activation — VERDICT r9 item 3): BOTH directions of asof_join over
    the same events table, direction-tagged into one hashed result.

    'backward': for every purchase, the most recent prior (or
    simultaneous) click by the same user — the attribution query.
    'forward': for every signup, the EARLIEST purchase at or after it —
    the activation/conversion query. The oracle replays both against
    DuckDB's native ASOF JOIN (>= for backward, <= for forward), so the
    union-window plan's equivalence to a real as-of operator is in the
    driver hash for both time orders, including the NULL-ts contract
    and the largest-tie-breaker-wins policy (pre-deduped on the oracle
    side because DuckDB leaves ties unspecified).

    Scale notes: each direction is ONE shuffle on user_id (union both
    sides, window-carry the last right struct) — same cost as a
    sort-merge join, O(1) state per key, no range explosion; the two
    directions union for free (no extra shuffle). Skewed users split
    via AQE; a salted two-level variant is the documented fallback."""
    t = load_tables(spark, sf_dir, "events")
    null_d = F.lit(None).cast("double")

    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = t.events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_event_id"),
    )
    backward = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_values=["click_ts", "click_event_id"],
        tie_breaker="click_event_id",
    ).select(
        F.lit("backward").alias("direction"),
        "event_id",
        "user_id",
        epoch_us("ts").alias("anchor_epoch_us"),
        F.round("value", 2).alias("anchor_value"),
        epoch_us("asof_click_ts").alias("matched_epoch_us"),
        F.col("asof_click_event_id").alias("matched_event_id"),
        null_d.alias("matched_value"),
    )

    signups = t.events.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", "event_id"
    )
    p_right = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_event_id"),
        F.round("value", 2).alias("p_value"),
    )
    forward = asof_join(
        signups,
        p_right,
        on="user_id",
        left_ts="ts",
        right_ts="p_ts",
        right_values=["p_ts", "p_event_id", "p_value"],
        tie_breaker="p_event_id",
        direction="forward",
    ).select(
        F.lit("forward").alias("direction"),
        "event_id",
        "user_id",
        epoch_us("ts").alias("anchor_epoch_us"),
        null_d.alias("anchor_value"),
        epoch_us("asof_p_ts").alias("matched_epoch_us"),
        F.col("asof_p_event_id").alias("matched_event_id"),
        F.col("asof_p_value").alias("matched_value"),
    )
    return backward.unionByName(forward)
