"""Deep-backlog drain meter for the snapshot change-feed source.

The source deliberately has NO per-batch rate limit
(``snapshot_source.py`` — ``latestOffset`` in the Python Data Source
API receives no checkpointed position, so a process-local cap either
stalls after restart or regresses offsets). The cost of that stance is
a first drain that takes the WHOLE backlog in one micro-batch; this
test puts numbers on it so the documented limit carries a measurement:

- planning-side memory is bounded by the manifest DELTAS, not rows —
  a 200-commit backlog plans in well under 64 MB of Python heap;
- the plan fans out to exactly ONE input partition per ADDED FILE
  (never per version², never per row), so executor parallelism scales
  with the real work;
- the drain really is one batch (availableNow + fresh checkpoint),
  and delivers every row exactly once.
"""

from __future__ import annotations

import pytest

import tracemalloc

from nyc_taxi_data_warehouse_spark.warehouse.snapshots import (
    read_snapshot,
    snapshot_write,
)
from nyc_taxi_data_warehouse_spark.streaming.snapshot_source import (
    SnapshotFeedStreamReader,
)

N_COMMITS = 200
ROWS_PER = 2


def _build_backlog(spark, table: str) -> None:
    for i in range(N_COMMITS):
        df = spark.createDataFrame(
            [(ROWS_PER * i + j, f"v{ROWS_PER * i + j}") for j in range(ROWS_PER)],
            "id long, v string",
        ).coalesce(1)  # exactly one data file per commit
        snapshot_write(
            df, table, mode="append" if i else "overwrite"
        )


@pytest.mark.slowproof
def test_deep_backlog_plans_bounded_and_drains_in_one_batch(
    spark, tmp_path
):
    table = str(tmp_path / "backlog")
    _build_backlog(spark, table)

    # ---- planning meter: direct reader, no Spark in the loop
    schema = read_snapshot(spark, table).schema
    reader = SnapshotFeedStreamReader(schema, {"path": table})
    start = reader.initialOffset()
    end = reader.latestOffset()
    assert end["version"] - start["version"] == N_COMMITS
    tracemalloc.start()
    parts = reader.partitions(start, end)
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # one partition per ADDED FILE — the whole backlog's plan
    assert len(parts) == N_COMMITS
    # planning memory ∝ manifest deltas, not rows: a generous pin that
    # still catches an O(files²) or rows-materializing regression
    assert peak < 64 * 2**20, f"planning peak {peak / 2**20:.1f} MiB"
    # each partition carries its version (ordering metadata for
    # downstream exactly-once accounting)
    versions = sorted(p.version for p in parts)
    assert versions[0] == start["version"] + 1
    assert versions[-1] == end["version"]

    # ---- the drain: one availableNow batch takes the whole backlog
    from nyc_taxi_data_warehouse_spark.streaming.snapshot_source import (
        read_snapshot_stream,
    )

    batches: list[int] = []
    rows: list = []

    def sink(b, _e):
        batches.append(b.count())
        rows.extend(b.select("id").collect())

    q = (
        read_snapshot_stream(spark, table)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    nonempty = [n for n in batches if n]
    assert len(nonempty) == 1, f"expected ONE drain batch, got {batches}"
    assert nonempty[0] == N_COMMITS * ROWS_PER
    assert sorted(r.id for r in rows) == list(range(N_COMMITS * ROWS_PER))
