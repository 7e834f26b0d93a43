"""Temporal-join queries: as-of join and bounded range join over the
events stream table. Backed by operators/temporal.py; oracles use
DuckDB's native ASOF JOIN / inequality joins — semantics parity between
our shuffle-efficient compositions and a reference implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, range_join
from ..sources import load_table
from .registry import register


# ---------------------------------------------------------------------------
# a01 — as-of join: each purchase matched to the user's latest prior view
# ---------------------------------------------------------------------------
@register(
    "a01_asof_purchase_view",
    oracle="""
WITH p AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase'),
     v AS (SELECT user_id, ts, event_id AS view_event_id, value AS view_value
           FROM events WHERE event_type = 'view')
SELECT p.user_id, p.event_id, p.ts,
       v.view_event_id, v.view_value, v.ts AS matched_ts
FROM p ASOF LEFT JOIN v
  ON p.user_id = v.user_id AND v.ts <= p.ts
ORDER BY p.user_id, p.event_id
""",
    tags=("asof", "join", "temporal"),
    doc="union+window as-of join (one shuffle per key) vs DuckDB's "
    "native ASOF JOIN. Ties on ts: duplicate view timestamps per user "
    "do not occur in the fixture (ts has us precision).",
)
def a01_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = e.where(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_event_id"),
        F.col("value").alias("view_value"),
    )
    joined = asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["view_event_id", "view_value"],
    )
    return joined.select(
        "user_id", "event_id", "ts", "view_event_id", "view_value", "matched_ts"
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# a02 — bounded range join: signup/error pairs within 10 minutes
# ---------------------------------------------------------------------------
@register(
    "a02_range_join_bursts",
    oracle="""
SELECT s.user_id,
       s.event_id AS signup_event_id,
       e.event_id AS error_event_id,
       epoch_us(e.ts) - epoch_us(s.ts) AS delta_us
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'signup') s
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error') e
  ON s.user_id = e.user_id
 AND abs(epoch_us(e.ts) - epoch_us(s.ts)) <= 600 * 1000000
ORDER BY s.user_id, signup_event_id, error_event_id
""",
    tags=("range_join", "join", "temporal"),
    doc="Bucketed interval join (bucket width = bound, probe adjacent "
    "buckets) vs DuckDB's inequality join — same pairs, but the Spark "
    "plan is a hash equi-join on (user, bucket), no cartesian.",
)
def a02_range_join_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    signups = e.where(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("signup_event_id"), F.col("ts").alias("s_ts")
    )
    errors = e.where(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_event_id"), F.col("ts").alias("e_ts")
    )
    pairs = range_join(
        signups,
        errors,
        on="user_id",
        left_ts="s_ts",
        right_ts="e_ts",
        bound="10 minutes",
        bound_seconds=600,
    )
    return (
        pairs.select(
            "user_id",
            "signup_event_id",
            "error_event_id",
            (
                F.unix_micros(F.col("e_ts").cast("timestamp"))
                - F.unix_micros(F.col("s_ts").cast("timestamp"))
            ).alias("delta_us"),
        )
        .orderBy("user_id", "signup_event_id", "error_event_id")
    )


# ---------------------------------------------------------------------------
# a03 — forward as-of join: each view matched to the user's NEXT purchase
# ---------------------------------------------------------------------------
@register(
    "a03_next_purchase_after_view",
    oracle="""
WITH v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
     p AS (SELECT user_id, ts, event_id AS purchase_event_id, value AS purchase_value
           FROM events WHERE event_type = 'purchase')
SELECT v.user_id, v.event_id, v.ts,
       p.purchase_event_id, p.purchase_value, p.ts AS matched_ts,
       CASE WHEN p.ts IS NULL THEN NULL
            ELSE epoch_us(p.ts) - epoch_us(v.ts) END AS lag_us
FROM v ASOF LEFT JOIN p
  ON v.user_id = p.user_id AND p.ts >= v.ts
ORDER BY v.user_id, v.event_id
""",
    tags=("asof", "join", "temporal"),
    doc="FORWARD as-of (view -> next purchase conversion lag): same "
    "single-shuffle union+window composition as a01 but with a "
    "following-rows frame and left-before-right exact-ts ordering, vs "
    "DuckDB's native forward ASOF (p.ts >= v.ts).",
)
def a03_next_purchase_after_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    views = e.where(F.col("event_type") == "view").select("user_id", "event_id", "ts")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    joined = asof_join(
        views,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["purchase_event_id", "purchase_value"],
        direction="forward",
    )
    return joined.select(
        "user_id",
        "event_id",
        "ts",
        "purchase_event_id",
        "purchase_value",
        "matched_ts",
        (
            F.unix_micros(F.col("matched_ts").cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("lag_us"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# a04 — nearest as-of join: each error matched to the closest click in time
# ---------------------------------------------------------------------------
@register(
    "a04_nearest_click_to_error",
    oracle="""
WITH err AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
     clk AS (SELECT user_id, event_id AS click_event_id, ts AS click_ts
             FROM events WHERE event_type = 'click')
SELECT user_id, event_id, ts, click_event_id, matched_ts, dist_us
FROM (
  SELECT err.user_id, err.event_id, err.ts,
         clk.click_event_id, clk.click_ts AS matched_ts,
         abs(epoch_us(clk.click_ts) - epoch_us(err.ts)) AS dist_us,
         row_number() OVER (
           PARTITION BY err.event_id
           -- nearest wins; exact-distance ties resolve BACKWARD (the
           -- earlier click has the smaller ts) to match the engine
           ORDER BY abs(epoch_us(clk.click_ts) - epoch_us(err.ts)) ASC NULLS LAST,
                    clk.click_ts ASC
         ) AS rn
  FROM err LEFT JOIN clk ON err.user_id = clk.user_id
)
WHERE rn = 1
ORDER BY user_id, event_id
""",
    tags=("asof", "join", "temporal"),
    doc="NEAREST as-of (error -> closest click either direction, ties "
    "backward): ONE shuffle — both window frames share the key "
    "partitioning — vs the oracle's per-key argmin over a full "
    "LEFT JOIN (fine at oracle scale, quadratic in general).",
)
def a04_nearest_click_to_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    errors = e.where(F.col("event_type") == "error").select("user_id", "event_id", "ts")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    joined = asof_join(
        errors,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["click_event_id"],
        direction="nearest",
    )
    return joined.select(
        "user_id",
        "event_id",
        "ts",
        "click_event_id",
        "matched_ts",
        F.abs(
            F.unix_micros(F.col("matched_ts").cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("dist_us"),
    ).orderBy("user_id", "event_id")
