"""Time-window queries shared by the batch and streaming surfaces.

Spark's window()/session_window() operators are mode-agnostic; these
entries run them in batch (oracle-checkable), and tests/test_streaming.py
re-runs the same builders as streams and asserts identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from ..streaming.windows import (
    run_stream_to_memory,
    session_windows,
    sliding_counts,
    stream_events,
)
from .registry import register


# ---------------------------------------------------------------------------
# w01 — sliding windows (1h window, 15min slide)
# ---------------------------------------------------------------------------
@register(
    "w01_sliding_event_rates",
    oracle="""
SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS window_start,
       event_type,
       count(*) AS n
FROM events, UNNEST(generate_series(0, 3)) AS t(k)
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
    tags=("window_time", "sliding", "streaming_batch"),
    doc="Each event lands in 4 overlapping 1h windows on a 15-min grid; "
    "the oracle replays the assignment with time_bucket + generate_series "
    "(both engines align the grid to an epoch multiple of 15 min).",
)
def w01_sliding_event_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# w02 — session windows (30-min gap) via native session_window
# ---------------------------------------------------------------------------
@register(
    "w02_session_windows",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL THEN 0
              WHEN ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1
              ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, max(ts) AS last_ts,
       count(*) AS n_events
FROM sessions
GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
    tags=("window_time", "session", "streaming_batch"),
    doc="Native session_window (gap merge) equals the lag+cumsum "
    "sessionization — the oracle proves the equivalence the streaming "
    "tests rely on.",
)
def w02_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return session_windows(e).orderBy("user_id", "session_start")


# ---------------------------------------------------------------------------
# w03 — custom stateful operator (applyInPandasWithState), run as a stream
# ---------------------------------------------------------------------------
@register(
    "w03_stateful_user_totals",
    oracle="""
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value,
       max(ts) AS last_ts
FROM events
GROUP BY user_id
ORDER BY user_id
""",
    tags=("streaming", "stateful", "applyInPandasWithState"),
    doc="Runs a REAL streaming query (availableNow) through the custom "
    "applyInPandasWithState operator; the converged running state must "
    "equal the plain batch aggregate the oracle computes.",
)
def w03_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import user_running_totals

    name = "w03_totals_mem"
    spark.catalog.dropTempView(name)  # stale-sink guard across calls
    stream = stream_events(spark, sf_dir)
    run_stream_to_memory(user_running_totals(stream), name, mode="update")
    out = spark.table(name)
    # update-mode sink emits one row per (user, micro-batch); n_events is
    # strictly increasing per user, so max_by picks the converged state.
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
            F.timestamp_micros(F.max("last_us")).cast("timestamp_ntz").alias("last_ts"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q40 — daily served from a materialized hourly rollup
# ---------------------------------------------------------------------------
@register(
    "q40_daily_from_hourly_rollup",
    oracle="""
SELECT date_trunc('day', ts) AS day,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
""",
    tags=("rollup", "materialized", "agg"),
    doc="Two-level aggregation (raw -> hourly rollup -> daily) must equal "
    "the direct daily aggregate — the decomposability proof behind the "
    "materialized serving layer at 100 TB.",
)
def q40_daily_from_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..warehouse.rollup import daily_from_hourly, hourly_rollup

    e = load_table(spark, sf_dir, "events")
    # approx_users (the mergeable HLL distinct carried by the rollup) is
    # projected away here: it has no exact SQL replay by construction —
    # its accuracy and merge-stability are gated in pytest instead
    # (test_streaming.py, test_properties.py).
    return daily_from_hourly(hourly_rollup(e)).drop("approx_users")


# ---------------------------------------------------------------------------
# q41 — click→purchase attribution (the stream-stream join, batch-run)
# ---------------------------------------------------------------------------
@register(
    "q41_click_purchase_attribution",
    oracle="""
SELECT c.user_id AS user_id,
       c.event_id AS c_id,
       p.event_id AS p_id,
       c.ts AS c_ts,
       p.ts AS p_ts,
       p.value AS purchase_value
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
ORDER BY user_id, c_id, p_id
""",
    tags=("join", "temporal", "streaming_batch"),
    doc="The same builder runs as a watermarked stream-stream join in "
    "tests/test_streaming.py; here it runs in batch so the oracle can "
    "verify the time-bounded attribution semantics.",
)
def q41_click_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.joins import click_purchase_attribution

    e = load_table(spark, sf_dir, "events")
    return click_purchase_attribution(e).orderBy("user_id", "c_id", "p_id")


# ---------------------------------------------------------------------------
# q49 — calendar gap-filling: dense daily series with zero-filled days
# ---------------------------------------------------------------------------
@register(
    "q49_calendar_gap_fill",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('day', min(ts)) AS lo, date_trunc('day', max(ts)) AS hi
  FROM events
), cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
), daily AS (
  SELECT date_trunc('day', ts) AS day, count(*) AS n FROM events GROUP BY 1
)
SELECT cal.day AS day,
       CAST(coalesce(daily.n, 0) AS BIGINT) AS n_events,
       coalesce(daily.n, 0) = 0 AS is_gap
FROM cal LEFT JOIN daily ON cal.day = daily.day
ORDER BY day
""",
    tags=("calendar", "gap-fill", "sequence"),
    doc="Dense time series from a sparse fact table: sequence() builds "
    "the calendar spine (a few rows — broadcastable at any scale), the "
    "fact side aggregates BEFORE the join so the left join touches one "
    "row per day, not per event.",
)
def q49_calendar_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("timestamp_ntz")
    bounds = e.agg(
        F.min(day).alias("lo"), F.max(day).alias("hi")
    )
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    daily = e.groupBy(day.alias("day")).agg(F.count("*").alias("n"))
    return (
        cal.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            (F.coalesce("n", F.lit(0)) == 0).alias("is_gap"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# q54 — SCD Type-2 history build (order-status validity intervals)
# ---------------------------------------------------------------------------
@register(
    "q54_scd2_order_status",
    oracle="""
WITH seq AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
         lag(o_orderstatus) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders
),
changes AS (
  SELECT o_custkey, o_orderstatus AS status,
         o_orderdate AS valid_from, o_orderkey
  FROM seq
  WHERE prev IS NULL OR prev <> o_orderstatus
)
SELECT o_custkey AS custkey, status, valid_from,
       lead(valid_from) OVER (PARTITION BY o_custkey
                              ORDER BY valid_from, o_orderkey) AS valid_to,
       CAST(lead(valid_from) OVER (PARTITION BY o_custkey
                                   ORDER BY valid_from, o_orderkey) IS NULL
            AS INT) AS is_current
FROM changes
ORDER BY custkey, valid_from, status
""",
    tags=("warehouse", "scd2", "window"),
    doc="Slowly-changing-dimension (type 2) build from a change stream: "
    "per customer, collapse the order-status sequence to its change "
    "points and emit [valid_from, valid_to) validity intervals with a "
    "current-row flag — the merge-free way to derive a dimension "
    "history table. Two window passes sharing one hash partitioning on "
    "custkey (Catalyst plans a single Exchange); ties on the change "
    "date break deterministically by order key. At 100 TB the state is "
    "one partition per customer hash — no skew beyond the per-customer "
    "order count.",
)
def q54_scd2_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w_seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        o.select(
            "o_custkey",
            "o_orderstatus",
            "o_orderdate",
            "o_orderkey",
            F.lag("o_orderstatus").over(w_seq).alias("prev"),
        )
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("o_orderstatus")))
        .select(
            "o_custkey",
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderdate").alias("valid_from"),
            "o_orderkey",
        )
    )
    w_iv = Window.partitionBy("o_custkey").orderBy("valid_from", "o_orderkey")
    valid_to = F.lead("valid_from").over(w_iv)
    return (
        changes.select(
            F.col("o_custkey").alias("custkey"),
            "status",
            "valid_from",
            valid_to.alias("valid_to"),
            valid_to.isNull().cast("int").alias("is_current"),
        )
        .orderBy("custkey", "valid_from", "status")
    )


# ---------------------------------------------------------------------------
# q56 — funnel conversion (ordered view -> click -> purchase per user)
# ---------------------------------------------------------------------------
@register(
    "q56_funnel_stages",
    oracle="""
WITH v AS (
  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS tv
  FROM events GROUP BY user_id
),
c AS (
  SELECT v.user_id, v.tv, min(e.ts) AS tc
  FROM v LEFT JOIN events e
    ON e.user_id = v.user_id AND e.event_type = 'click' AND e.ts >= v.tv
  GROUP BY v.user_id, v.tv
),
p AS (
  SELECT c.user_id, c.tv, c.tc, min(e.ts) AS tp
  FROM c LEFT JOIN events e
    ON e.user_id = c.user_id AND e.event_type = 'purchase' AND e.ts >= c.tc
  GROUP BY c.user_id, c.tv, c.tc
)
SELECT count(*) AS n_users,
       count(tv) AS n_viewed,
       count(tc) AS n_clicked_after_view,
       count(tp) AS n_purchased_after_click,
       CAST(coalesce(sum(epoch_us(tp) - epoch_us(tv)), 0) AS BIGINT)
         AS total_view_to_purchase_us
FROM p
""",
    tags=("funnel", "window", "behavioral"),
    doc="Ordered-sequence funnel: first view, first click at-or-after "
    "it, first purchase at-or-after that — each stage a conditional min "
    "over the SAME user-partitioned window (unordered full-partition "
    "frames chain without re-sorting), so the whole funnel costs ONE "
    "user-key shuffle + a per-user reduce + a tiny global roll-up; the "
    "oracle replays it with three chained LEFT-JOIN aggregations. "
    "Deltas are integer epoch-us — no float in the hash.",
)
def q56_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    tv = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    e2 = e.withColumn("_tv", tv)
    tc = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") >= F.col("_tv")),
            F.col("ts"),
        )
    ).over(w)
    e3 = e2.withColumn("_tc", tc)
    tp = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("_tc")),
            F.col("ts"),
        )
    ).over(w)
    per_user = (
        e3.withColumn("_tp", tp)
        .groupBy("user_id")
        .agg(
            F.first("_tv").alias("tv"),
            F.first("_tc").alias("tc"),
            F.first("_tp").alias("tp"),
        )
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("tv").alias("n_viewed"),
        F.count("tc").alias("n_clicked_after_view"),
        F.count("tp").alias("n_purchased_after_click"),
        F.coalesce(F.sum(us("tp") - us("tv")), F.lit(0))
        .cast("long")
        .alias("total_view_to_purchase_us"),
    )


# ---------------------------------------------------------------------------
# q57 — weekly cohort retention (first-activity cohort x week offset)
# ---------------------------------------------------------------------------
@register(
    "q57_cohort_retention",
    oracle="""
WITH wk AS (
  SELECT user_id, date_trunc('week', ts) AS week
  FROM events GROUP BY user_id, date_trunc('week', ts)
),
cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id
)
SELECT c.cohort_week,
       CAST(datediff('week', c.cohort_week, wk.week) AS BIGINT) AS week_offset,
       count(*) AS n_active_users
FROM wk JOIN cohort c USING (user_id)
GROUP BY 1, 2
ORDER BY cohort_week, week_offset
""",
    tags=("cohort", "behavioral", "agg"),
    doc="Cohort retention grid: users bucketed by first-activity week, "
    "counted in each later week they return. Plan: the raw scan "
    "partial-aggregates to (user, week) pairs BEFORE its shuffle (the "
    "volume-collapsing step at 100 TB), the cohort min is a window over "
    "those pairs (pair-sized shuffle, no self-join back to raw), then "
    "one tiny shuffle on the (cohort, offset) grid. (user, week) rows "
    "are already distinct, so count(*) == distinct users.",
)
def q57_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    wk = (
        e.select("user_id", F.date_trunc("week", "ts").alias("week"))
        .distinct()
    )
    cohort_week = F.min("week").over(Window.partitionBy("user_id"))
    return (
        wk.withColumn("cohort_week", cohort_week)
        .groupBy(
            "cohort_week",
            (
                F.floor(
                    (
                        F.unix_micros(F.col("week").cast("timestamp"))
                        - F.unix_micros(F.col("cohort_week").cast("timestamp"))
                    )
                    / F.lit(7 * 24 * 3600 * 1_000_000)
                )
            ).alias("week_offset"),
        )
        .agg(F.count("*").alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )
