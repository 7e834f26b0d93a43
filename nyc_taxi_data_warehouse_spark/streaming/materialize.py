"""Incrementally-maintained derived snapshot tables (materialized
views over the snapshot change feed).

Composes the two exactly-once ends this package already has:

  snapshot table A --(snapshot_feed source: offsets = versions)-->
  stateless transform --(stream_snapshot_append: one commit per
  micro-batch, epoch-keyed idempotent)--> snapshot table B

so ``B == transform(A)`` stays true as A grows, while each refresh
costs only the files appended to A since the last run — the classic
incremental-view-maintenance contract for append-only sources, with
BOTH the read position (checkpointed offsets) and the write
(manifest-recorded epochs) surviving crashes and replays.

Scope: ``transform`` must be STATELESS and row-monotone (filter /
project / enrich / explode — anything where transform(A ∪ ΔA) ==
transform(A) ∪ transform(ΔA)). Aggregating views belong to
``streaming/rollup_sink.py`` (incremental partial-agg merge), and
row-level updates/deletes to the source are not expressible as an
append feed — the source fails loudly on non-append commits
(``onNonAppend='fail'`` is deliberately not exposed here; a rewritten
source invalidates a derived table, which should be rebuilt or
re-pointed, never silently skipped).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..warehouse.snapshots import stream_snapshot_append
from .snapshot_source import read_snapshot_stream


def materialize_incremental(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    transform: Callable[[DataFrame], DataFrame],
    checkpoint: str,
    stream_id: str = "mv",
    partition_cols: list[str] | None = None,
    starting_version: int | str = 0,
) -> None:
    """One incremental refresh: consume src versions appended since the
    checkpoint, apply ``transform``, append the result to ``dst_path``
    as one new version per micro-batch. Re-running with no new source
    commits is a no-op (no empty version is published)."""
    feed = read_snapshot_stream(
        spark, src_path, starting_version=starting_version,
        on_non_append="fail",
    )
    stream_snapshot_append(
        spark,
        transform(feed),
        dst_path,
        checkpoint,
        stream_id,
        partition_cols=partition_cols,
    )
