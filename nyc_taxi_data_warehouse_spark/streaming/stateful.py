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
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_us bigint"
STATE_SCHEMA = "n bigint, cents bigint, last_us bigint"


def _update_user_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        if len(pdf):
            # normalize to µs regardless of the datetime64 unit pandas picked
            us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            last_us = max(last_us, int(us.max()))
    state.update((n, cents, last_us))
    yield pd.DataFrame(
        [
            {
                "user_id": key[0],
                "n_events": n,
                "total_value": cents / 100.0,
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
