"""Deterministic global corpus shuffle — the "randomize example order
before training" step, done so the SAME permutation comes out on any
cluster size, partitioning, or re-run.

Training pipelines must not feed documents in crawl/source order
(adjacent examples correlate; curriculum accidents follow). The naive
``orderBy(rand())`` is partition-order dependent and unreproducible;
this operator orders by ``xxhash64(id, seed)`` — a pure function of
the row — with the id as tie-break, so:

- the permutation is a deterministic function of (ids, seed): re-runs,
  retries after stage failures, and different cluster layouts all
  produce byte-identical output order;
- a different ``seed`` gives an unrelated permutation (epoch reshuffle
  = seed+1, no state carried);
- the plan is ONE range exchange + in-partition sort (Spark samples
  hash bounds, then each output partition sorts locally — no global
  single-node sort), exactly what ``orderBy`` on a uniform key costs.

Writing the result with ``df.write`` preserves in-partition order and
names files by partition index, so file order == permutation order —
the standard contract for sharded training input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shuffle_corpus(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` in deterministic pseudo-random order (stable under
    re-partitioning and re-runs). ``num_partitions`` pins the output
    shard count (e.g. the training job's reader parallelism);
    otherwise ``spark.sql.shuffle.partitions`` decides."""
    key = F.xxhash64(F.col(id_col), F.lit(seed))
    if num_partitions is not None:
        return df.repartitionByRange(
            num_partitions, key, F.col(id_col)
        ).sortWithinPartitions(key, F.col(id_col))
    return df.orderBy(key, F.col(id_col))


def shard_assignments(
    df: DataFrame, id_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """(row columns, shard) — deterministic hash split into exactly
    ``n_shards`` roughly-equal groups WITHOUT a global sort: shard =
    pmod(xxhash64(id, seed), n). Use when downstream only needs
    which-shard (distributed writers, k-fold splits), not a total
    order; it is a narrow map, zero shuffle."""
    return df.withColumn(
        "shard",
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_shards)).cast(
            "int"
        ),
    )
