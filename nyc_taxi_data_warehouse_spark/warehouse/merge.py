"""Keyed MERGE/upsert onto a plain partitioned parquet table.

The reference's warehouse is append-only (``/root/reference/data/emr/
etl.py:53-55``); corrections to already-loaded rows would require a
Redshift-side ``MERGE``. Here the warehouse is Spark-managed parquet with
no transaction log, so MERGE is expressed with the two primitives the
engine already relies on: an anti-join and a dynamic partition overwrite.

Scale shape (the reason this works at 100 TB):
- Only the partitions the updates touch are read or rewritten. The
  touched-partition set is metadata-sized (distinct partition keys of
  the updates) and is broadcast into a semi-join against the target, so
  partition pruning reaches the parquet scan — an update to one month
  never scans the other 119.
- The surviving-rows anti-join shuffles only the touched partitions'
  rows, keyed by the merge key.

Contract: the merge keys must be partition-stable — an update row lands
in the same partition as the target row it replaces (true for any key
that determines the partition column, e.g. a trip id that embeds the
month). Keys that migrate across partitions need a full-table merge
(pass ``all_partitions=True``), which scans everything — the honest cost
of a cross-partition key move without a transaction log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    keys: list[str],
    partition_cols: list[str],
    version_col: str | None = None,
    all_partitions: bool = False,
    staging_path: str | None = None,
) -> int:
    """Upsert ``updates`` into managed ``table``; returns rows written.

    Without ``version_col``, matched rows (same ``keys``) are replaced
    and unmatched inserted — arrival order IS the ordering.

    With ``version_col`` (a column persisted in the table, e.g. a CDC
    LSN or source timestamp), the merge keeps the MAX-version row per
    key across the existing target row AND every update row — so an
    out-of-order feed converges: replaying batches in any order yields
    the same table, and re-delivering an already-applied version is a
    no-op (ties keep the target row). This is the cross-batch ordering
    guarantee plain arrival order cannot give. It assumes the standard
    CDC invariant that a (key, version) pair identifies ONE row state —
    two DIFFERENT payloads sharing a key and version have no defined
    winner under any ordering scheme (the tie rule then picks whichever
    arrived first).
    """
    # The touched-partition overwrite below is only safe under
    # partitionOverwriteMode=dynamic — on an untuned session Spark's
    # static default would drop every UNTOUCHED partition. Scoped (set/
    # restore) rather than a session-wide tune(): a merge must not
    # permanently mutate the caller's session confs.
    from ..session import dynamic_partition_overwrite

    target = spark.table(table)

    if all_partitions:
        current = target
    else:
        # Metadata-sized distinct partition keys of the batch, broadcast
        # so the semi-join prunes the target scan to touched partitions.
        touched = updates.select(*partition_cols).distinct()
        current = target.join(F.broadcast(touched), partition_cols, "left_semi")

    # insertInto writes by POSITION — project everything to the table's
    # column order before the write.
    if version_col is not None:
        # One window over (target's touched rows) ∪ (updates) keeps the
        # highest version per key; on version ties the target row wins
        # (_src 0 sorts first), making redelivery idempotent. Same
        # shuffle shape as the anti-join path: one exchange on the keys
        # over touched partitions + the batch.
        tagged = (
            current.select(*target.columns)
            .withColumn("_src", F.lit(0))
            .unionByName(
                updates.select(*target.columns).withColumn("_src", F.lit(1))
            )
        )
        w = Window.partitionBy(*keys).orderBy(
            F.col(version_col).desc(), F.col("_src").asc()
        )
        merged = (
            tagged.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(*target.columns)
        )
    else:
        survivors = current.join(
            updates.select(*keys).distinct(), keys, "left_anti"
        ).select(*target.columns)
        merged = survivors.unionByName(updates.select(*target.columns))

    # A table cannot be overwritten while the plan still reads from it,
    # so the merged partitions must be materialized off-table first.
    # Two ways to cut the lineage, same rewritten volume (touched
    # partitions only):
    if staging_path is None:
        # localCheckpoint: executor-memory blocks. Cheapest locally, but
        # the blocks are not durable — an executor loss mid-write fails
        # the job (fine: the overwrite is all-or-nothing per partition
        # and re-runnable).
        merged = merged.localCheckpoint(eager=True)
        n = merged.count()
        with dynamic_partition_overwrite(spark):
            merged.write.mode("overwrite").insertInto(table)
    else:
        # Staging write + swap — the cluster-scale pattern: stage the
        # merged partitions as durable parquet, then the dynamic
        # partition overwrite swaps them in while reading only the
        # staging copy. Survives executor loss, never pins the merge in
        # executor storage memory.
        merged.write.mode("overwrite").parquet(staging_path)
        staged = spark.read.parquet(staging_path).select(*target.columns)
        n = staged.count()
        with dynamic_partition_overwrite(spark):
            staged.write.mode("overwrite").insertInto(table)
    return n
