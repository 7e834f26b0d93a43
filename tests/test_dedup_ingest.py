"""Streaming dedup-on-ingest: each micro-batch near-dup-filtered
against the accumulated kept corpus via the persisted MinHash index."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.dedup import minhash_lsh_pairs
from nyc_taxi_data_warehouse_spark.sources import load_table
from nyc_taxi_data_warehouse_spark.streaming.dedup_ingest import (
    init_dedup_index,
    stream_dedup_ingest,
)

SF = "/root/testdata/sf0.001"
THRESHOLD = 0.3


def _write_batches(spark, src_dir):
    """Three single-file batches of documents; later batches contain
    near-dups of earlier ones (the sf fixture's documents include
    mutated copies, so id-range splits share near-dup content)."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    for i, pred in enumerate(["doc_id % 3 = 0", "doc_id % 3 = 1", "doc_id % 3 = 2"]):
        docs.where(pred).coalesce(1).write.mode("overwrite").parquet(
            f"{src_dir}/b{i}"
        )
        # file source watches ONE directory; move the part file up
        bdir = f"{src_dir}/b{i}"
        part = next(f for f in os.listdir(bdir) if f.endswith(".parquet"))
        os.rename(os.path.join(bdir, part), os.path.join(src_dir, f"batch_{i}.parquet"))
    return docs.schema


def _stream(spark, src_dir, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )


@pytest.mark.slowproof
def test_stream_dedup_ingest_converges_and_is_restart_safe(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = _write_batches(spark, src)
    idx = str(tmp_path / "index")
    kept = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")

    init_dedup_index(spark, idx, "text", "doc_id")
    stream_dedup_ingest(
        spark, _stream(spark, src, schema), idx, kept, "text", "doc_id",
        jaccard_threshold=THRESHOLD, checkpoint=ckpt,
    )

    kept_df = spark.read.parquet(kept).select("doc_id", "text")
    n_kept = kept_df.count()
    n_all = load_table(spark, SF, "documents").count()
    assert 0 < n_kept < n_all, "ingest dropped nothing — fixture has near-dups"

    # the kept corpus is internally near-dup free at the threshold
    residual = minhash_lsh_pairs(
        kept_df, "text", "doc_id", jaccard_threshold=THRESHOLD
    )
    assert residual.count() == 0

    # ids are unique (no batch double-landed)
    assert kept_df.select("doc_id").distinct().count() == n_kept

    # index and kept corpus agree
    n_indexed = spark.read.parquet(f"{idx}/shingles").count()
    assert n_indexed == n_kept

    # restart on the same checkpoint with no new files: nothing changes
    before = sorted(r.doc_id for r in kept_df.collect())
    stream_dedup_ingest(
        spark, _stream(spark, src, schema), idx, kept, "text", "doc_id",
        jaccard_threshold=THRESHOLD, checkpoint=ckpt,
    )
    after = sorted(r.doc_id for r in spark.read.parquet(kept).collect())
    assert after == before


@pytest.mark.slowproof
def test_stream_dedup_ingest_equals_sequential_batch_mode(spark, tmp_path):
    """The stream must land exactly what a hand-rolled sequential
    (batch-at-a-time, index-between) run lands — foreachBatch adds
    delivery semantics, never selection semantics."""
    from nyc_taxi_data_warehouse_spark.operators.dedup import (
        append_to_minhash_index,
        dup_clusters,
        incremental_minhash_pairs,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = _write_batches(spark, src)

    # streaming run
    idx_s = str(tmp_path / "idx_s")
    kept_s = str(tmp_path / "kept_s")
    init_dedup_index(spark, idx_s, "text", "doc_id")
    stream_dedup_ingest(
        spark, _stream(spark, src, schema), idx_s, kept_s, "text", "doc_id",
        jaccard_threshold=THRESHOLD, checkpoint=str(tmp_path / "ck_s"),
    )

    # sequential reference run over the same three batches in the same
    # (filename) order the file source uses
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx_b = str(tmp_path / "idx_b")
    init_dedup_index(spark, idx_b, "text", "doc_id")
    kept_ids: list[int] = []
    for pred in ["doc_id % 3 = 0", "doc_id % 3 = 1", "doc_id % 3 = 2"]:
        batch = docs.where(pred)
        hits = incremental_minhash_pairs(
            spark, batch, "text", "doc_id", idx_b, THRESHOLD
        ).select(F.col("new_id").alias("doc_id"))
        surv = batch.join(hits, "doc_id", "left_anti")
        pairs = minhash_lsh_pairs(
            surv, "text", "doc_id", jaccard_threshold=THRESHOLD
        )
        losers = (
            dup_clusters(pairs)
            .where(F.col("id") != F.col("cluster_id"))
            .select(F.col("id").alias("doc_id"))
        )
        surv = surv.join(losers, "doc_id", "left_anti").localCheckpoint(eager=True)
        append_to_minhash_index(spark, surv, "text", "doc_id", idx_b)
        kept_ids.extend(r.doc_id for r in surv.collect())

    got = sorted(r.doc_id for r in spark.read.parquet(kept_s).collect())
    assert got == sorted(kept_ids)


@pytest.mark.slowproof
def test_cli_dedup_ingest_and_sample(spark, tmp_path):
    """The two curation subcommands end-to-end: dedup-ingest bootstraps
    its index, drains the watched dir, and is re-runnable; sample
    materializes the exact mixture."""
    import json as _json

    from nyc_taxi_data_warehouse_spark.__main__ import main

    cli = lambda *a: main(list(a), spark=spark)  # noqa: E731

    src = str(tmp_path / "watch")
    os.makedirs(src)
    schema = _write_batches(spark, src)
    assert schema is not None
    idx, kept, ckpt = (str(tmp_path / d) for d in ("idx", "kept", "ckpt"))
    assert cli(
        "dedup-ingest", "--src", src, "--index", idx, "--kept", kept,
        "--checkpoint", ckpt, "--threshold", str(THRESHOLD),
    ) == 0
    n_kept = spark.read.parquet(kept).count()
    assert n_kept > 0
    # re-run: checkpoint makes it a no-op
    assert cli(
        "dedup-ingest", "--src", src, "--index", idx, "--kept", kept,
        "--checkpoint", ckpt, "--threshold", str(THRESHOLD),
    ) == 0
    assert spark.read.parquet(kept).count() == n_kept

    out = str(tmp_path / "mix")
    assert cli(
        "sample", "--src", f"{SF}/documents.parquet", "--out", out,
        "--domain-col", "lang", "--weights", _json.dumps({"en": 5, "es": 5}),
        "--n", "40", "--id-col", "doc_id",
    ) == 0
    got = {
        r.lang: r.n
        for r in spark.read.parquet(out).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == {"en": 20, "es": 20}


@pytest.mark.slowproof
def test_crash_between_kept_write_and_index_append_recovers(
    spark, tmp_path, monkeypatch
):
    """The claimed exactly-once semantics under the worst crash point:
    the kept epoch directory committed but the index append did not.
    The replayed batch must complete the index append WITHOUT
    duplicating kept rows, converging to the single-run state."""
    import nyc_taxi_data_warehouse_spark.streaming.dedup_ingest as di

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = _write_batches(spark, src)
    idx = str(tmp_path / "index")
    kept = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")
    init_dedup_index(spark, idx, "text", "doc_id")

    # reference single-run state on separate paths
    idx_ref, kept_ref = str(tmp_path / "idx_ref"), str(tmp_path / "kept_ref")
    init_dedup_index(spark, idx_ref, "text", "doc_id")
    stream_dedup_ingest(
        spark, _stream(spark, src, schema), idx_ref, kept_ref, "text", "doc_id",
        jaccard_threshold=THRESHOLD, checkpoint=str(tmp_path / "ck_ref"),
    )

    # crash the SECOND batch after its kept write, before its index write
    real_append = di.append_to_minhash_index
    calls = {"n": 0}

    def failing_append(spark_, df, text_col, id_col, path):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash before index append")
        return real_append(spark_, df, text_col, id_col, path)

    monkeypatch.setattr(di, "append_to_minhash_index", failing_append)
    with pytest.raises(Exception):
        stream_dedup_ingest(
            spark, _stream(spark, src, schema), idx, kept, "text", "doc_id",
            jaccard_threshold=THRESHOLD, checkpoint=ckpt,
        )
    monkeypatch.setattr(di, "append_to_minhash_index", real_append)

    # restart from the same checkpoint: replays the failed batch, runs on
    stream_dedup_ingest(
        spark, _stream(spark, src, schema), idx, kept, "text", "doc_id",
        jaccard_threshold=THRESHOLD, checkpoint=ckpt,
    )

    got = sorted(r.doc_id for r in spark.read.parquet(kept).collect())
    want = sorted(r.doc_id for r in spark.read.parquet(kept_ref).collect())
    assert got == want
    assert len(got) == len(set(got)), "kept rows duplicated by the replay"
    n_idx = spark.read.parquet(f"{idx}/shingles").count()
    assert n_idx == len(got)


def test_multi_file_batches_and_no_within_batch_dedup(spark, tmp_path):
    """Robustness dials: all files in ONE micro-batch (no
    maxFilesPerTrigger) must keep the corpus-filter semantics, and
    dedup_within_batch=False lands within-batch near-dups but still
    blocks corpus near-dups on the NEXT run."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = _write_batches(spark, src)
    idx, kept = str(tmp_path / "idx"), str(tmp_path / "kept")
    init_dedup_index(spark, idx, "text", "doc_id")

    one_batch = spark.readStream.schema(schema).parquet(src)  # all 3 files at once
    stream_dedup_ingest(
        spark, one_batch, idx, kept, "text", "doc_id",
        jaccard_threshold=THRESHOLD, checkpoint=str(tmp_path / "ck"),
        dedup_within_batch=False,
    )
    kept_df = spark.read.parquet(kept).select("doc_id", "text")
    # corpus was empty, within-batch dedup off -> everything lands
    from nyc_taxi_data_warehouse_spark.sources import load_table

    assert kept_df.count() == load_table(spark, SF, "documents").count()

    # a redelivered copy of the same docs under NEW ids must now be
    # blocked by the corpus filter (near-dup of kept content)
    clones = kept_df.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    ).limit(50)
    src2 = str(tmp_path / "src2")
    os.makedirs(src2)
    clones.coalesce(1).write.mode("overwrite").parquet(f"{src2}/b")
    part = next(
        f for f in os.listdir(f"{src2}/b") if f.endswith(".parquet")
    )
    os.rename(os.path.join(src2, "b", part), os.path.join(src2, "clones.parquet"))
    stream_dedup_ingest(
        spark,
        spark.readStream.schema(schema).parquet(src2),
        idx, kept, "text", "doc_id",
        jaccard_threshold=THRESHOLD, checkpoint=str(tmp_path / "ck2"),
    )
    landed_clones = spark.read.parquet(kept).where("doc_id >= 1000000").count()
    assert landed_clones == 0  # exact copies are Jaccard-1.0 near-dups
