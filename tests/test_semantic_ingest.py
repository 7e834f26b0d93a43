"""Streaming semantic dedup-on-ingest (streaming/semantic_ingest.py):
each micro-batch's embeddings are gated against the accumulated kept
corpus via the persisted ANN index, then within-batch."""

from __future__ import annotations

import pytest


import os
import random

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.similarity import (
    embedding_near_dup,
)
from nyc_taxi_data_warehouse_spark.streaming.semantic_ingest import (
    init_semantic_index,
    stream_semantic_dedup_ingest,
)

DIM = 16
THRESHOLD = 0.95
DIALS = dict(n_planes=8, dim=DIM, n_tables=4)


def _vec(rng):
    return [rng.uniform(-1, 1) for _ in range(DIM)]


def _mk_batches():
    """Three batches with planted duplicates across and within batches.
    Returns (batches, expected_kept_ids)."""
    rng = random.Random(42)
    base = {i: _vec(rng) for i in range(10)}  # batch 0: all unique
    b0 = [(i, base[i]) for i in range(10)]
    # batch 1: copies of 0..4 (ids 100..104) + new uniques 110..114
    new1 = {110 + j: _vec(rng) for j in range(5)}
    b1 = [(100 + j, base[j]) for j in range(5)] + sorted(new1.items())
    # batch 2: copies of batch-1 newcomers (ids 200,201) + one new pair
    # of identical vectors (210, 211) -> within-batch dedup keeps 210
    v_twin = _vec(rng)
    b2 = [(200, new1[110]), (201, new1[111]), (210, v_twin), (211, v_twin)]
    expected = set(range(10)) | set(new1) | {210}
    return [b0, b1, b2], expected


def _write_batches(spark, src_dir, batches):
    os.makedirs(src_dir, exist_ok=True)
    schema = "vec_id long, embedding array<float>"
    for i, rows in enumerate(batches):
        d = f"{src_dir}/b{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        os.rename(
            os.path.join(d, part), os.path.join(src_dir, f"batch_{i}.parquet")
        )
    return spark.createDataFrame([], schema).schema


def _stream(spark, src_dir, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )


@pytest.mark.slowproof
def test_semantic_ingest_gates_across_and_within_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    kept = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")
    batches, expected = _mk_batches()
    schema = _write_batches(spark, src, batches)

    init_semantic_index(spark, idx, **DIALS)
    stream_semantic_dedup_ingest(
        spark, _stream(spark, src, schema), idx, kept,
        threshold=THRESHOLD, checkpoint=ckpt,
    )

    kept_df = spark.read.parquet(kept).select("vec_id", "embedding")
    got = {r["vec_id"] for r in kept_df.collect()}
    assert got == expected  # every duplicate dropped, nothing else

    # kept corpus is internally near-dup free at the threshold
    residual = embedding_near_dup(
        kept_df, threshold=THRESHOLD, **DIALS
    )
    assert residual.count() == 0

    # index agrees with the kept corpus (ids once per LSH table)
    idx_ids = {
        r["cid"]
        for r in spark.read.parquet(idx).where("tbl = 0").select("cid").collect()
    }
    assert idx_ids == expected

    # restart on the same checkpoint with no new files: a no-op
    stream_semantic_dedup_ingest(
        spark, _stream(spark, src, schema), idx, kept,
        threshold=THRESHOLD, checkpoint=ckpt,
    )
    again = {r["vec_id"] for r in spark.read.parquet(kept).collect()}
    assert again == expected


@pytest.mark.slowproof
def test_semantic_ingest_equals_sequential_batches(spark, tmp_path):
    """Stream ≡ a hand-rolled batch-at-a-time reference run over the
    same batch partitioning (same dials, same thresholds)."""
    from nyc_taxi_data_warehouse_spark.operators.dedup import dup_clusters
    from nyc_taxi_data_warehouse_spark.operators.similarity import (
        ann_topk_from_index,
        append_to_ann_index,
    )

    batches, _ = _mk_batches()
    src = str(tmp_path / "src2")
    schema = _write_batches(spark, src, batches)

    # reference: sequential batches against a second index
    idx_ref = str(tmp_path / "idx_ref")
    init_semantic_index(spark, idx_ref, **DIALS)
    ref_kept: set = set()
    for rows in batches:
        b = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        hits = (
            ann_topk_from_index(
                spark, idx_ref, b, k=1, probe_radius=2, **DIALS
            )
            .where(F.col("sim") >= THRESHOLD)
            .select(F.col("qid").alias("vec_id"))
            .distinct()
        )
        surv = b.join(hits, "vec_id", "left_anti")
        pairs = embedding_near_dup(
            surv, threshold=THRESHOLD, **DIALS
        ).select("id_a", "id_b")
        losers = (
            dup_clusters(pairs)
            .where(F.col("id") != F.col("cluster_id"))
            .select(F.col("id").alias("vec_id"))
        )
        surv = surv.join(losers, "vec_id", "left_anti").localCheckpoint(
            eager=True
        )
        ref_kept |= {r["vec_id"] for r in surv.collect()}
        append_to_ann_index(surv, idx_ref)

    # stream over the same files
    idx_s = str(tmp_path / "idx_s")
    kept_s = str(tmp_path / "kept_s")
    init_semantic_index(spark, idx_s, **DIALS)
    stream_semantic_dedup_ingest(
        spark, _stream(spark, src, schema), idx_s, kept_s,
        threshold=THRESHOLD, checkpoint=str(tmp_path / "ckpt2"),
    )
    got = {r["vec_id"] for r in spark.read.parquet(kept_s).collect()}
    assert got == ref_kept


@pytest.mark.slowproof
def test_boilerplate_flood_within_one_batch_is_still_deduped(spark, tmp_path):
    """The within-batch gate defaults to EXACT pair generation
    (max_bucket_size=None): a single batch flooding one LSH bucket with
    >1000 near-identical vectors must collapse to one kept vector, not
    sail through a capped pair generator."""
    rng = random.Random(7)
    v = _vec(rng)
    rows = [(i, v) for i in range(1200)] + [(5000, _vec(rng))]
    src = str(tmp_path / "src_flood")
    schema = _write_batches(spark, src, [rows])
    idx = str(tmp_path / "idx_flood")
    kept = str(tmp_path / "kept_flood")
    init_semantic_index(spark, idx, **DIALS)
    stream_semantic_dedup_ingest(
        spark, _stream(spark, src, schema), idx, kept,
        threshold=THRESHOLD, checkpoint=str(tmp_path / "ck_flood"),
    )
    got = sorted(r["vec_id"] for r in spark.read.parquet(kept).collect())
    assert got == [0, 5000]  # 1200 clones -> min id kept
