"""Storage layout for shuffle-free joins and healthy file sizes.

At 100 TB the dominant costs are (a) the shuffle a big fact-fact join
forces, and (b) small-file explosion on the write side. Both are layout
problems, solved at write time:

- ``write_bucketed``: hash-bucket (and bucket-sort) a managed table on
  its join key. Two tables co-bucketed on the same key with the same
  bucket count join with ZERO Exchange — the join degenerates to a
  per-bucket merge (asserted mechanically in the layout test).
  This is the Spark-native replacement for Redshift DISTKEY (which the
  reference's DDL never set, `setup.py:78-96` — plain `CREATE TABLE`).
- ``file_stats``: post-write audit of file count / size distribution so
  compaction targets (128–512 MB per file) are checked, not assumed.
- ``compacted``: repartition helper sizing output files from measured
  input bytes rather than a guessed partition count.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
    fmt: str = "parquet",
) -> None:
    """Persist as a managed bucketed table (hash(key) % n_buckets files
    per write task; bucket-sorted so merge joins skip the sort too)."""
    w = df.write.mode("overwrite").format(fmt).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def file_stats(spark: SparkSession, table: str) -> dict:
    """File-size audit for a managed table: count, bytes, avg MB."""
    location = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
        .where("col_name = 'Location'")
        .collect()[0]["data_type"]
    )
    path = location.removeprefix("file:")
    sizes = [
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if not f.startswith(("_", "."))
    ]
    total = sum(sizes)
    return {
        "n_files": len(sizes),
        "total_bytes": total,
        "avg_mb": round(total / len(sizes) / 2**20, 3) if sizes else 0.0,
    }


def compacted(df: DataFrame, total_bytes: int, target_bytes: int = 256 * 2**20) -> DataFrame:
    """Repartition so output files land near target_bytes each, given the
    measured input size (e.g. from file_stats of the source)."""
    n = max(1, round(total_bytes / target_bytes))
    return df.repartition(n)


def table_location(spark: SparkSession, table: str) -> str:
    """Filesystem location of a managed table (catalog metadata only)."""
    location = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
        .where("col_name = 'Location'")
        .collect()[0]["data_type"]
    )
    return location.removeprefix("file:")


def partition_file_stats(
    spark: SparkSession, table: str, partition: dict[str, object]
) -> dict:
    """File-size audit for ONE Hive-layout partition directory —
    metadata-only (a directory listing, no data read). Partition values
    must be filesystem-plain (ints, dates, simple strings): values Hive
    percent-escapes in directory names are out of scope for this
    local-listing helper."""
    base = table_location(spark, table)
    part_dir = os.path.join(base, *(f"{k}={v}" for k, v in partition.items()))
    sizes = [
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(part_dir)
        for f in files
        if not f.startswith(("_", "."))
    ]
    total = sum(sizes)
    return {
        "path": part_dir,
        "n_files": len(sizes),
        "total_bytes": total,
        "avg_mb": round(total / len(sizes) / 2**20, 3) if sizes else 0.0,
    }


def compact_partition(
    spark: SparkSession,
    table: str,
    partition: dict[str, object],
    target_bytes: int = 256 * 2**20,
) -> dict:
    """Rewrite ONE fragmented partition of a managed table in place so
    its file count drops to ``ceil(bytes / target_bytes)``.

    Monthly appends and keyed merges each add files to the partitions
    they touch; at 100 TB the accumulated small files throttle every
    scan (one task + one open per file, tiny row groups, no effective
    min/max skipping). Compaction is the standing repair job: measure
    the partition's on-disk bytes (directory listing only), read JUST
    that partition (the literal partition predicate prunes the scan to
    its directory), coalesce to the target file count, and swap it back
    via dynamic partition overwrite — all other partitions are never
    read or written. Row content is byte-identical; only the file
    layout changes.

    Returns ``{"before": stats, "after": stats, "target_files": n}``.
    """
    from ..session import dynamic_partition_overwrite

    before = partition_file_stats(spark, table, partition)
    if before["n_files"] <= 1:
        return {"before": before, "after": before, "target_files": before["n_files"]}
    n_target = max(1, math.ceil(before["total_bytes"] / target_bytes))

    target = spark.table(table)
    pred = None
    for k, v in partition.items():
        cond = target[k] == v
        pred = cond if pred is None else pred & cond
    one_part = target.where(pred).select(*target.columns)

    # repartition (round-robin), not coalesce: the rewrite must produce
    # EXACTLY n_target evenly-sized files — coalesce is bounded by the
    # scan's split count, which file-packing can make smaller than
    # n_target, yielding fewer, oversized files. The shuffle moves only
    # this one partition's rows, a rounding error next to the rewrite IO.
    compacted_df = one_part.repartition(n_target)
    # The write replaces the partition the plan reads from — cut the
    # lineage first (same reasoning as merge_upsert's no-staging path).
    compacted_df = compacted_df.localCheckpoint(eager=True)
    with dynamic_partition_overwrite(spark):
        compacted_df.write.mode("overwrite").insertInto(table)

    after = partition_file_stats(spark, table, partition)
    return {"before": before, "after": after, "target_files": n_target}


def compact_table(
    spark: SparkSession,
    table: str,
    target_bytes: int = 256 * 2**20,
    min_files: int = 2,
) -> list[dict]:
    """Compaction sweep over a partitioned managed table: find every
    partition whose file count exceeds both ``min_files`` and its
    ceil(bytes/target) healthy count, and ``compact_partition`` each.

    Partition discovery is catalog metadata (``SHOW PARTITIONS``) plus
    directory listings — no data is read for healthy partitions, so the
    standing repair job costs O(fragmented partitions), not O(table).
    The per-partition rewrites are sequential by design: each is its own
    all-or-nothing dynamic overwrite, so a failure mid-sweep leaves
    every other partition either untouched or fully compacted — safe to
    re-run.

    Returns one ``compact_partition`` result dict per rewritten
    partition (empty list = table already healthy). Note the sweep may
    take one extra round to quiesce: rewriting changes the compressed
    size slightly, which can lower a partition's healthy file count by
    one — each round strictly reduces file counts, so repeated sweeps
    converge (and a converged table returns []).
    """
    results = []
    for row in spark.sql(f"SHOW PARTITIONS {table}").collect():
        # 'year=2025/month=1' → {'year': '2025', 'month': '1'} (values
        # are passed back verbatim into the partition predicate; Spark
        # casts string literals to the partition column types).
        partition = dict(kv.split("=", 1) for kv in row[0].split("/"))
        stats = partition_file_stats(spark, table, partition)
        healthy = max(1, math.ceil(stats["total_bytes"] / target_bytes))
        if stats["n_files"] > max(healthy, min_files - 1):
            results.append(
                compact_partition(spark, table, partition, target_bytes)
            )
    return results


def analyze(spark: SparkSession, table: str, columns: list[str] | None = None) -> None:
    """Feed the cost-based optimizer: table stats (row count, size) and
    optional per-column min/max/NDV. At scale, join reordering and
    broadcast decisions on managed tables are only as good as these."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")


def write_sorted(
    df: DataFrame, path: str, key: str, n_files: int = 8
) -> None:
    """Range-cluster on ``key`` at write time: repartitionByRange gives
    each output file a disjoint key range, sortWithinPartitions orders
    rows inside it — so every parquet row group carries tight, mutually
    disjoint min/max stats and a pushed-down range predicate skips all
    but the matching files' row groups at scan time. The poor man's
    Z-order for the single-dimension access pattern (time-range scans of
    a fact table); verified with footer statistics in the layout test,
    not assumed."""
    (
        df.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_value(df: DataFrame, keys: list[str], bits: int = 8):
    """Z-order (Morton) key column over ``keys``: each key is mapped to a
    ``2**bits``-bucket rank via its own quantile boundaries, and the
    bucket ids are bit-interleaved. Rows close in z-value are close in
    EVERY key dimension, so clustering files by z-value gives each file
    a tight min/max footer range on ALL keys at once — the layout that
    makes multi-dimension predicates skip files, where a plain sort only
    serves its leading column.

    Quantile bucketing (not linear min/max scaling): boundaries come
    from ``approxQuantile`` — driver-side metadata, ``2**bits - 1``
    doubles per key — so skewed distributions still fill all buckets
    instead of collapsing into one hot cell. Bucket lookup runs JVM-side
    as an O(2**bits) aggregate over the broadcast boundary literal; at
    the default 8 bits that is 255 comparisons per row per key, a
    write-time cost only.

    Returns ``(df_with_column, "_zorder")`` — callers needing only the
    expression can drop the column after clustering.
    """
    n_buckets = 1 << bits
    from pyspark.sql import functions as F

    def _numeric_image(k: str, dtype: str):
        # ANSI mode forbids timestamp/date → numeric CASTs; use the
        # explicit epoch functions so time keys cluster like ints.
        col = F.col(k)
        if dtype == "date":
            return F.unix_date(col).cast("double")
        if dtype == "timestamp_ntz":
            return F.unix_micros(col.cast("timestamp_ltz")).cast("double")
        if dtype.startswith("timestamp"):
            return F.unix_micros(col).cast("double")
        return col.cast("double")

    dtypes = dict(df.dtypes)
    with_z = df
    bucket_cols = []
    for k in keys:
        img = _numeric_image(k, dtypes[k])
        bounds = df.select(img.alias("_q")).approxQuantile(
            "_q", [i / n_buckets for i in range(1, n_buckets)], 0.001
        )
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket = F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc + F.when(img >= b, 1).otherwise(0),
        )
        name = f"_zb_{k}"
        with_z = with_z.withColumn(name, bucket)
        bucket_cols.append(name)

    ndims = len(keys)
    z = F.lit(0)
    for i in range(bits):
        for d, name in enumerate(bucket_cols):
            bit = F.shiftright(F.col(name), i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * ndims + d)
    return with_z.withColumn("_zorder", z).drop(*bucket_cols), "_zorder"


def write_zordered(
    df: DataFrame, path: str, keys: list[str], n_files: int = 8, bits: int = 8
) -> None:
    """Multi-dimension file clustering: range-partition and sort on the
    interleaved ``zorder_value`` so each output file covers a compact
    region of the key space — a range or point predicate on ANY of
    ``keys`` skips most files via footer min/max, not just predicates on
    a sort leader. The write shape is identical to ``write_sorted`` (one
    range exchange + in-partition sort); only the clustering key is
    smarter. Verified measured (scan numOutputRows vs footer
    intersections) in the layout tests, per-dimension."""
    zdf, zcol = zorder_value(df, keys, bits)
    (
        zdf.repartitionByRange(n_files, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )


def export_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    order_col: str | None = None,
) -> None:
    """Deterministic sharded export for trainer consumption.

    Shard assignment is ``md5(id) % n_shards`` — a pure function of the
    row, so re-running the export (or running it on a different cluster
    size / partitioning) yields byte-identical shard membership; trainers
    that resume mid-epoch depend on that. One output directory per shard
    (``shard=k/``, Hive-partitioned so a trainer reads exactly its
    shards), rows sorted inside each shard by ``order_col`` (default the
    id) so iteration order is reproducible too.

    Scale shape: one hash-partition exchange on the shard key + an
    in-partition sort — no global sort, no collect. ``n_shards`` is the
    unit of trainer parallelism, chosen independently of Spark's own
    partitioning.
    """
    from pyspark.sql import functions as F

    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    )
    (
        df.withColumn("shard", shard)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", order_col or id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
