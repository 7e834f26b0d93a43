"""Stream-stream joins: click→purchase attribution within a time bound.

Both sides are unbounded, so Spark buffers each side in the state store;
the watermark + the time-bound join condition are what let it EVICT
state — without them the buffers grow forever. That pair of constraints
is the entire 100 TB story for stream-stream joins:

- ``withWatermark`` on both sides bounds how late a row can arrive;
- the inequality ``click.ts <= purchase.ts <= click.ts + horizon`` tells
  Spark a click older than (watermark - horizon) can never match again
  and is dropped from state.

The join itself is mode-agnostic logic, so the batch run of the same
builder is the oracle (tests assert stream == batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_attribution(events: DataFrame, horizon: str = "1 hour") -> DataFrame:
    """Pairs (user, click, purchase) with purchase within ``horizon``
    after the click. Works on a batch OR streaming events frame."""
    is_stream = events.isStreaming

    def side(evt_type: str, prefix: str) -> DataFrame:
        df = events.where(F.col("event_type") == evt_type).select(
            F.col("user_id").alias(f"{prefix}_user"),
            F.col("event_id").alias(f"{prefix}_id"),
            F.col("ts").cast("timestamp").alias(f"{prefix}_ts"),
            F.col("value").alias(f"{prefix}_value"),
        )
        if is_stream:
            df = df.withWatermark(f"{prefix}_ts", "2 hours")
        return df

    clicks = side("click", "c")
    purchases = side("purchase", "p")
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select(
        F.col("c_user").alias("user_id"),
        "c_id",
        "p_id",
        # back to NTZ so batch/stream/oracle all print identical wall-clock
        F.col("c_ts").cast("timestamp_ntz").alias("c_ts"),
        F.col("p_ts").cast("timestamp_ntz").alias("p_ts"),
        F.col("p_value").alias("purchase_value"),
    )
