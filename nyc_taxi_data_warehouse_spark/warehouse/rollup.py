"""Materialized time rollups: the warehouse serving-layer pattern.

A 100 TB events table can't be re-scanned for every dashboard query; the
scalable pattern is a small materialized hourly aggregate that coarser
queries (daily/weekly) re-aggregate. Correctness rests on the aggregates
being decomposable (count→sum, sum→sum, min→min, max→max) — q40 proves
hourly→daily equals direct-from-raw against the DuckDB oracle. Distinct
users, NOT decomposable exactly, are carried as a mergeable HLL sketch
column (binary partial; union at re-aggregation) — the only way a
distinct count survives a rollup without re-scanning raw data.

Money is summed as integer cents (exact, associative) so the two-level
aggregation is bit-identical to the one-level one regardless of
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """The materialization: one row per (hour, event_type)."""
    return events.groupBy(
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hour"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.hll_sketch_agg("user_id").alias("users_sketch"),
    )


def daily_from_hourly(hourly: DataFrame) -> DataFrame:
    """Serve a daily query from the hourly rollup — touches rollup rows
    only, never the raw events."""
    return (
        hourly.groupBy(
            F.date_trunc("day", "hour").cast("timestamp_ntz").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n"),
            (F.sum("value_cents").cast("double") / 100.0).alias("total_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.hll_sketch_estimate(F.hll_union_agg("users_sketch")).alias(
                "approx_users"
            ),
        )
        .orderBy("day", "event_type")
    )
