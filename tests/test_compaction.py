"""In-place partition compaction: fragmented partitions (monthly appends
+ keyed merges each add files) are rewritten to ceil(bytes/target) files
with byte-identical row content, touching no other partition.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.warehouse.layout import (
    compact_partition,
    partition_file_stats,
)

TABLE = "compact_probe"


def _build_fragmented(spark, table):
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # 3 partitions; 25 writer tasks per partition → 25 small files each.
    df = (
        spark.range(0, 30_000)
        .select(
            F.col("id"),
            (F.col("id") % 3).cast("int").alias("part"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        .repartition(25)
    )
    df.write.mode("overwrite").partitionBy("part").saveAsTable(table)


@pytest.fixture(scope="module")
def fragmented_table(spark):
    _build_fragmented(spark, TABLE)
    yield TABLE
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")


def _content_digest(spark, pred: str):
    row = (
        spark.table(TABLE)
        .where(pred)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("id", "payload").cast("decimal(38,0)")).alias("digest"),
        )
        .collect()[0]
    )
    return row["n"], row["digest"]


def test_compact_partition_hits_target_and_preserves_content(
    spark, fragmented_table
):
    before = partition_file_stats(spark, TABLE, {"part": 1})
    assert before["n_files"] > 5, "fixture not fragmented"
    n_before, digest_before = _content_digest(spark, "part = 1")
    other_before = _content_digest(spark, "part != 1")

    # Pick a target that forces a multi-file result strictly smaller
    # than the fragment count.
    target = before["total_bytes"] // 3 + 1
    expected = max(1, math.ceil(before["total_bytes"] / target))
    assert 1 < expected < before["n_files"]

    # Files of an untouched partition must survive unrenamed (dynamic
    # overwrite swaps only the compacted partition).
    part0_dir = partition_file_stats(spark, TABLE, {"part": 0})["path"]
    part0_files = sorted(os.listdir(part0_dir))

    result = compact_partition(spark, TABLE, {"part": 1}, target_bytes=target)

    assert result["target_files"] == expected
    assert result["after"]["n_files"] == expected
    assert _content_digest(spark, "part = 1") == (n_before, digest_before)
    assert _content_digest(spark, "part != 1") == other_before
    assert sorted(os.listdir(part0_dir)) == part0_files


def test_compact_partition_single_file_noop(spark, fragmented_table):
    """An already-healthy partition (<=1 file) is returned untouched —
    no read, no rewrite."""
    big_target = 10 * 2**30
    r1 = compact_partition(spark, TABLE, {"part": 2}, target_bytes=big_target)
    assert r1["after"]["n_files"] == 1
    files = sorted(os.listdir(r1["after"]["path"]))
    r2 = compact_partition(spark, TABLE, {"part": 2}, target_bytes=big_target)
    assert r2["before"] == r2["after"]
    assert sorted(os.listdir(r2["after"]["path"])) == files


def test_compact_table_sweeps_only_fragmented_partitions(spark):
    """compact_table finds fragmented partitions from metadata alone and
    repairs each; a second sweep is a no-op (already healthy)."""
    from nyc_taxi_data_warehouse_spark.warehouse.layout import compact_table

    table = "compact_sweep_probe"
    _build_fragmented(spark, table)  # fresh: all 3 partitions fragmented
    try:
        stats = partition_file_stats(spark, table, {"part": 0})
        target = stats["total_bytes"] // 3 + 1  # healthy ≈ 3 files per part

        def digest():
            row = (
                spark.table(table)
                .agg(
                    F.count("*").alias("n"),
                    F.sum(
                        F.xxhash64("id", "payload").cast("decimal(38,0)")
                    ).alias("digest"),
                )
                .collect()[0]
            )
            return row["n"], row["digest"]

        before = digest()
        results = compact_table(spark, table, target_bytes=target)
        assert len(results) == 3  # every fragmented partition swept
        for r in results:
            assert r["after"]["n_files"] == r["target_files"]
            assert r["after"]["n_files"] < r["before"]["n_files"]
        assert digest() == before

        # recompression can shift a partition's healthy count by one —
        # repeated sweeps must strictly shrink and quiesce to []
        for _ in range(3):
            again = compact_table(spark, table, target_bytes=target)
            if not again:
                break
            for r in again:
                assert r["after"]["n_files"] < r["before"]["n_files"]
        assert compact_table(spark, table, target_bytes=target) == []
        assert digest() == before
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_compact_index_minhash_two_subtables(spark, tmp_path):
    """compact_index on a minhash index must compact buckets/ and
    shingles/ INDEPENDENTLY — a root-level rewrite would merge the two
    schemas and flatten the layout. Lookups identical, sidecar intact,
    file counts drop."""
    from nyc_taxi_data_warehouse_spark.operators.dedup import (
        append_to_minhash_index,
        incremental_minhash_pairs,
        write_minhash_index,
    )
    from nyc_taxi_data_warehouse_spark.operators.indexmeta import (
        compact_index,
        read_index_meta,
    )
    from nyc_taxi_data_warehouse_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    idx = str(tmp_path / "mh_idx")
    write_minhash_index(
        spark, docs.where("doc_id % 4 = 0"), "text", "doc_id", idx
    )
    # fragment with several incremental appends
    for k in (1, 2, 3):
        append_to_minhash_index(
            spark, docs.where(f"doc_id % 4 = {k}"), "text", "doc_id", idx
        )
    probe = docs.limit(30).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    before = sorted(
        map(tuple, incremental_minhash_pairs(
            spark, probe, "text", "doc_id", idx, jaccard_threshold=0.3
        ).collect())
    )
    meta_before = read_index_meta(spark, idx)
    stats = compact_index(spark, idx, target_mb=64)
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] == 2  # one file per subtable at this size
    assert read_index_meta(spark, idx) == meta_before
    after = sorted(
        map(tuple, incremental_minhash_pairs(
            spark, probe, "text", "doc_id", idx, jaccard_threshold=0.3
        ).collect())
    )
    assert after == before and len(before) > 0


def test_compact_index_cli(spark, tmp_path, capsys):
    import json as _json

    from nyc_taxi_data_warehouse_spark.__main__ import main
    from nyc_taxi_data_warehouse_spark.operators.similarity import (
        append_to_ann_index,
        write_ann_index,
    )
    from nyc_taxi_data_warehouse_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    idx = str(tmp_path / "cli_idx")
    write_ann_index(
        emb.where("vec_id < 300"), idx, n_planes=8, dim=64, n_tables=2
    )
    for lo in (300, 350, 400):
        append_to_ann_index(
            emb.where(f"vec_id >= {lo} and vec_id < {lo + 50}"), idx
        )
    assert main(
        ["compact-index", "--index-path", idx], spark=spark
    ) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["files_after"] < out["files_before"]
    assert spark.read.parquet(idx).count() == 2 * emb.where(
        "vec_id < 450"
    ).count()
