"""Incrementally-maintained rollup: streaming events → hourly aggregate
table, merged per micro-batch.

The batch rollup (warehouse/rollup.py) re-scans raw events; at 100 TB a
dashboard table must instead absorb each micro-batch incrementally. The
merge relies on the same decomposability the batch path proves
(count→sum, cents→sum, min→min, max→max), plus partition surgery:

1. aggregate the micro-batch to hourly partials (tiny),
2. read ONLY the (day) partitions those hours touch from the existing
   rollup — partition pruning, not a table scan,
3. re-aggregate old ⊎ new and dynamic-partition-overwrite just those
   days. Untouched days are never read or written.

State lives in the table itself, so the sink restarts from the
checkpoint with no rebuild.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_KEYS = ["day", "hour", "event_type"]


def _merge_aggs():
    # built lazily: Column construction needs an active SparkContext
    return [
        F.sum("n").alias("n"),
        F.sum("value_cents").alias("value_cents"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
        # mergeable distinct: sketch-union partials — the union of the
        # per-batch sketches equals the flat sketch over all raw rows
        # (proven in tests/test_properties.py), so incremental merges
        # never drift from the batch rollup
        F.hll_union_agg("users_sketch").alias("users_sketch"),
    ]


def _hourly_partials(events: DataFrame) -> DataFrame:
    hour = F.date_trunc("hour", "ts").cast("timestamp_ntz")
    return events.groupBy(
        F.to_date(hour).alias("day"), hour.alias("hour"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.hll_sketch_agg("user_id").alias("users_sketch"),
    )


MAX_DAY_LIST = 1000  # cap on the driver-side partition list / isin expr


def merge_batch_into_rollup(spark: SparkSession, batch: DataFrame, path: str) -> None:
    """One micro-batch merge (also usable for batch backfill).

    The distinct-day collect is metadata-sized (days touched by one
    micro-batch) and feeds the partition-pruning filter — but it is
    BOUNDED: past ``MAX_DAY_LIST`` days the exact isin list degrades to
    a min/max day range (still prunes partitions, constant driver
    memory), so a pathological backfill batch spanning decades cannot
    grow the driver or the filter expression.
    """
    # The day-partition overwrite below is only safe under
    # partitionOverwriteMode=dynamic — on an untuned session Spark's
    # static default would truncate the whole rollup directory. Scoped
    # (set/restore) so the sink never permanently mutates the caller's
    # session confs.
    from ..session import dynamic_partition_overwrite

    partials = _hourly_partials(batch).cache()
    try:
        days = [
            r["day"]
            for r in partials.select("day").distinct().limit(MAX_DAY_LIST + 1).collect()
        ]
        if not days:
            return
        if len(days) > MAX_DAY_LIST:
            lo_hi = partials.agg(
                F.min("day").alias("lo"), F.max("day").alias("hi")
            ).collect()[0]
            day_filter = F.col("day").between(lo_hi["lo"], lo_hi["hi"])
        else:
            day_filter = F.col("day").isin(days)
        merged = partials
        if os.path.isdir(path):
            existing = spark.read.parquet(path).where(day_filter)
            merged = existing.unionByName(partials)
        out = merged.groupBy(*ROLLUP_KEYS).agg(*_merge_aggs())
        # Dynamic overwrite (scoped): replaces exactly the day
        # partitions present in `out`, leaves the rest untouched.
        with dynamic_partition_overwrite(spark):
            out.write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        partials.unpersist()


def stream_events_into_rollup(
    spark: SparkSession, events_stream: DataFrame, path: str, checkpoint: str
) -> None:
    """Drain the stream (availableNow) through the incremental merge."""
    q = (
        events_stream.writeStream.foreachBatch(
            lambda batch, _epoch: merge_batch_into_rollup(spark, batch, path)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
