"""Event-time windowed aggregations over a stream: tumbling, sliding,
session windows, with watermark-based late-data handling.

Entirely absent from the reference (strictly monthly batch); these are
the Structured Streaming counterparts of q20/q21. Each builder takes any
events DataFrame — batch or streaming — because Spark's window operators
are mode-agnostic; tests exploit that to assert stream == batch.

Late data: ``withWatermark`` bounds state. At 100 TB-rate streams the
watermark delay is THE memory knob — state for windows older than
(max event time - delay) is dropped, so state size tracks the window
span, not the stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events fixture as a file stream (one-file-per-trigger to make
    incremental processing observable in tests).

    events.parquet stores TIMESTAMP(NANOS); the stream reads the raw
    nanos (schema pins ts as long) and converts exactly like the batch
    source does.
    """
    from ..session import tune

    tune(spark)
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    schema = batch.schema  # ts is bigint under nanosAsLong
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        # file streams take a directory; select just the events file
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return raw


def _watermarked(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Watermark only applies on the streaming path (and requires
    TIMESTAMP, not NTZ — cast is an identity under the UTC session tz);
    batch runs keep NTZ so results stay tz-independent."""
    if events.isStreaming:
        return events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", delay
        )
    return events


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    return (
        _watermarked(events)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    return (
        _watermarked(events)
        .groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessions per user (Spark's native session_window)."""
    return (
        _watermarked(events)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "last_ts",
            "n_events",
        )
    )


def run_stream_to_memory(df: DataFrame, name: str, mode: str = "complete"):
    """Drain a stream into an in-memory table (availableNow) and block."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
