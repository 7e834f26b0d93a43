"""Streaming ingest: the reference's file-level idempotency, done right.

The reference guards re-ingestion with a per-file S3 HEAD check inside an
Airflow branch (``/root/reference/data/airflow/dags/
save_nyc_data_to_s3.py:58-78``). Structured Streaming's file source +
checkpoint IS that guarantee, engine-native: every file is processed
exactly once across restarts, with ``availableNow`` draining whatever is
present and terminating — a batch-cadence pipeline on streaming
machinery. New monthly files appearing in the raw zone are picked up by
simply re-running the job with the same checkpoint.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..schema import FHVHV_RAW_SCHEMA
from ..warehouse.load import transform_raw


def stream_ingest_raw(
    spark: SparkSession,
    raw_glob: str,
    out_path: str,
    checkpoint: str,
) -> None:
    """Exactly-once ingest of raw monthly files → partitioned parquet.

    Partition values derive from pickup_datetime (the data), not the
    filename — unlike the reference, a misplaced file still lands in the
    right partition.
    """
    raw = (
        spark.readStream.schema(FHVHV_RAW_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        # raw months may be single files or Spark-written directories
        .option("recursiveFileLookup", "true")
        .parquet(raw_glob)
    )
    out = transform_raw(raw).withColumns(
        {
            "year": F.year("pickup_datetime").cast("int"),
            "month": F.month("pickup_datetime").cast("int"),
        }
    )
    (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("year", "month")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def dedup_stream(events, keys: list[str] | None = None, delay: str = "2 hours"):
    """Streaming exact dedup: drop re-deliveries of the same key arriving
    within the watermark horizon (`dropDuplicatesWithinWatermark`,
    Spark 3.5+). State holds one entry per key seen in the last `delay`
    of event time — bounded, unlike a plain dropDuplicates whose state
    grows with the stream. The at-least-once file/queue source plus this
    operator yields effectively-exactly-once rows downstream.
    """
    from pyspark.sql import functions as F

    keys = keys or ["event_id"]
    watermarked = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", delay
    )
    return watermarked.dropDuplicatesWithinWatermark(keys)
