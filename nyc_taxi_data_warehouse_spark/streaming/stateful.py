"""Custom stateful streaming operator: per-user running totals via
``applyInPandasWithState`` (arbitrary stateful processing).

The reference has no streaming at all; this is the extension point for
operators Spark's built-in windowed aggregations can't express (running
state that survives across micro-batches with user-defined merge logic).

Scale design:
- State is one tiny tuple (3 ints) per user_id — state size tracks key
  cardinality, not stream length, and lives in the state store
  (RocksDB-backed on a real cluster), partitioned by the grouping key.
- Money is accumulated in integer cents, so the result is exact and
  independent of row order / batch boundaries — required for the
  stream == batch equivalence guarantee this module is tested against.
- Arrow batches cross the Python boundary once per (key, micro-batch);
  the per-row loop below is pandas-vectorized.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_us bigint"
STATE_SCHEMA = "n bigint, n_vals bigint, cents bigint, last_us bigint"


def _update_user_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, n_vals, cents, last_us = state.get if state.exists else (0, 0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # SQL SUM semantics: null values contribute nothing, and a user
        # whose values are ALL null has a NULL total (n_vals tracks
        # whether any non-null value was ever seen).
        v = pdf["value"].dropna()
        n_vals += len(v)
        cents += int(v.mul(100).round().astype("int64").sum())
        if len(pdf):
            # normalize to µs regardless of the datetime64 unit pandas picked
            us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            last_us = max(last_us, int(us.max()))
    state.update((n, n_vals, cents, last_us))
    yield pd.DataFrame(
        [
            {
                "user_id": key[0],
                "n_events": n,
                "total_value": cents / 100.0 if n_vals else None,
                "last_us": last_us,
            }
        ]
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Running (count, total value, last-seen time) per user, updated
    every micro-batch. `events` must be a streaming DataFrame with
    columns (user_id, value, ts:timestamp)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUT = (
    "user_id bigint, session_start_us bigint, last_us bigint, n_events bigint"
)
SESSION_STATE = "start_us bigint, last_us bigint, n bigint"


def _to_us(ts: pd.Series) -> "pd.Series":
    return pd.Series(ts.to_numpy().astype("datetime64[us]").astype("int64"))


def make_session_fn(gap_us: int):
    """Custom gap-sessionization with user-defined close logic — the
    operator shape for session rules session_window() can't express
    (here: plain gap, so tests can verify against the native operator).

    Closed sessions are emitted as they close; the open session rides in
    the state store. An event-time timeout (watermark passing last+gap)
    also closes — so sessions end even for users who go silent."""

    def fn(key, pdfs, state: GroupState):
        out = []
        cur = list(state.get) if state.exists else None
        if state.hasTimedOut:
            if cur is not None:
                out.append((key[0], cur[0], cur[1], cur[2]))
            state.remove()
        else:
            times: list[int] = []
            for pdf in pdfs:
                if len(pdf):
                    times.extend(_to_us(pdf["ts"]).tolist())
            for t in sorted(times):
                if cur is None:
                    cur = [t, t, 0]
                elif t - cur[1] > gap_us:
                    out.append((key[0], cur[0], cur[1], cur[2]))
                    cur = [t, t, 0]
                cur[1] = max(cur[1], t)
                cur[2] += 1
            if cur is not None:
                state.update(tuple(cur))
                # close via timeout once the watermark passes last + gap;
                # if the watermark is already past that, fire next batch
                due_ms = (cur[1] + gap_us) // 1000
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(due_ms, wm_ms + 1))
        yield pd.DataFrame(
            out, columns=["user_id", "session_start_us", "last_us", "n_events"]
        )

    return fn


def sessionize_stateful(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming gap-sessionization over (user_id, ts). Emits CLOSED
    sessions only; requires an event-time watermark on `ts`."""
    gap_us = gap_minutes * 60 * 1_000_000
    watermarked = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", "2 hours"
    )
    return watermarked.groupBy("user_id").applyInPandasWithState(
        make_session_fn(gap_us),
        outputStructType=SESSION_OUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
