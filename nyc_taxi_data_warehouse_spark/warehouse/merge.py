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
) -> int:
    """Upsert ``updates`` into managed ``table``; returns rows written.

    Matched rows (same ``keys``) are replaced, unmatched are inserted.
    If ``version_col`` is given and the updates batch contains several
    rows per key, only the highest-version row is applied
    (deterministic last-writer-wins within the batch).
    """
    target = spark.table(table)

    if version_col is not None:
        w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc(), *keys)
        updates = (
            updates.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    if all_partitions:
        current = target
    else:
        # Metadata-sized distinct partition keys of the batch, broadcast
        # so the semi-join prunes the target scan to touched partitions.
        touched = updates.select(*partition_cols).distinct()
        current = target.join(F.broadcast(touched), partition_cols, "left_semi")

    # Joins on a column-name list move the join keys to the front of the
    # output, and insertInto writes by POSITION — re-project both sides
    # to the table's column order before the write.
    survivors = current.join(
        updates.select(*keys).distinct(), keys, "left_anti"
    ).select(*target.columns)
    merged = survivors.unionByName(updates.select(*target.columns))

    # A table cannot be overwritten while the plan still reads from it;
    # localCheckpoint materializes the merged partitions and cuts the
    # lineage back to the table. At cluster scale the same role is
    # played by a staging write + partition swap; the rewritten volume
    # is identical (touched partitions only).
    merged = merged.localCheckpoint(eager=True)
    n = merged.count()
    merged.write.mode("overwrite").insertInto(table)
    return n
