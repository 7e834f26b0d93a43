"""Per-file Bloom skipping index (warehouse/bloomindex.py): zero false
negatives vs a full scan, measured file pruning on selective keys,
dial-sidecar validation, and the empty-candidate short-circuit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.indexmeta import IndexMetaError
from nyc_taxi_data_warehouse_spark.sources import load_table
from nyc_taxi_data_warehouse_spark.warehouse.bloomindex import (
    bloom_candidate_files,
    build_bloom_index,
    read_with_bloom,
)

SF = "/root/testdata/sf0.001"
M, K = 8192, 5


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    """events spread over many files keyed by time, so user_id (the
    lookup key) is scattered — the layout the index exists for."""
    d = str(tmp_path_factory.mktemp("bloom_tbl"))
    events = load_table(spark, SF, "events").withColumn(
        "day", F.dayofmonth("ts")
    )
    events.repartition(16, "day").write.mode("overwrite").parquet(d)
    return d


@pytest.fixture(scope="module")
def index(spark, table, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bloom_idx"))
    n = build_bloom_index(spark, table, "event_id", d, m_bits=M, k=K)
    assert n >= 8  # really indexed many files
    return d


def test_no_false_negatives_and_exact_rows(spark, table, index):
    full = spark.read.parquet(table)
    ids = [r.event_id for r in full.select("event_id").limit(5).collect()]
    got = read_with_bloom(spark, table, index, "event_id", ids, m_bits=M, k=K)
    want = full.where(F.col("event_id").isin(ids))
    assert got.count() == want.count()
    chk = lambda df: df.select(  # noqa: E731
        F.sum(F.xxhash64(*sorted(df.columns)).cast("decimal(38,0)")).alias("h")
    ).collect()
    assert chk(got) == chk(want)


def test_candidate_files_actually_prune(spark, table, index):
    full = spark.read.parquet(table)
    n_files = full.select(F.col("_metadata.file_path")).distinct().count()
    one_id = [full.select("event_id").first().event_id]
    cand = bloom_candidate_files(spark, index, "event_id", one_id, m_bits=M, k=K)
    # a unique event lives in exactly one file; Bloom must prune to a
    # handful of candidates (false positives allowed), not everything
    assert 0 < len(cand) <= max(2, n_files // 4)
    true_files = {
        r.f
        for r in full.where(F.col("event_id").isin(one_id))
        .select(F.col("_metadata.file_path").alias("f"))
        .distinct()
        .collect()
    }
    assert true_files <= set(cand)  # NEVER misses a real file


def test_absent_key_short_circuits_empty(spark, table, index):
    got = read_with_bloom(
        spark, table, index, "event_id", [10_000_000_017], m_bits=M, k=K
    )
    assert got.count() == 0
    assert "event_id" in got.columns  # typed empty frame


def test_dial_mismatch_fails_fast(spark, table, index):
    with pytest.raises(IndexMetaError):
        bloom_candidate_files(
            spark, index, "event_id", [1], m_bits=M * 2, k=K
        )
    with pytest.raises(IndexMetaError):
        bloom_candidate_files(
            spark, index, "user_id", [1], m_bits=M, k=K
        )


def test_string_keys_supported(spark, tmp_path):
    tbl = str(tmp_path / "t")
    idx = str(tmp_path / "i")
    df = spark.createDataFrame(
        [(f"u{i % 7}", i) for i in range(200)], "name string, v long"
    )
    df.repartition(8, "v").write.parquet(tbl)
    build_bloom_index(spark, tbl, "name", idx, m_bits=1024, k=4)
    got = read_with_bloom(
        spark, tbl, idx, "name", ["u3"], m_bits=1024, k=4
    )
    assert got.count() == len([i for i in range(200) if i % 7 == 3])


def test_incremental_append_equals_rebuild(spark, tmp_path):
    tbl = str(tmp_path / "t")
    idx_inc = str(tmp_path / "inc")
    idx_full = str(tmp_path / "full")
    from nyc_taxi_data_warehouse_spark.warehouse.bloomindex import (
        append_to_bloom_index,
    )

    d1 = spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], "id long, v string"
    )
    d1.repartition(4).write.mode("append").parquet(tbl)
    build_bloom_index(spark, tbl, "id", idx_inc, m_bits=1024, k=4)

    d2 = spark.createDataFrame(
        [(i, f"v{i}") for i in range(50, 90)], "id long, v string"
    )
    d2.repartition(3).write.mode("append").parquet(tbl)
    n_new = append_to_bloom_index(spark, tbl, idx_inc, "id", m_bits=1024, k=4)
    assert n_new == 3
    # idempotent: nothing new on a re-run (partial-failure recovery)
    assert append_to_bloom_index(spark, tbl, idx_inc, "id", m_bits=1024, k=4) == 0

    build_bloom_index(spark, tbl, "id", idx_full, m_bits=1024, k=4)
    inc = spark.read.parquet(idx_inc)
    full = spark.read.parquet(idx_full)
    diff = inc.join(full, ["file", "word"], "full").where(
        F.coalesce(inc.bits, F.lit(0)) != F.coalesce(full.bits, F.lit(0))
    )
    assert diff.count() == 0
    got = read_with_bloom(spark, tbl, idx_inc, "id", [75], m_bits=1024, k=4)
    assert [r.v for r in got.collect()] == ["v75"]


def test_bloom_cli_build_and_append(spark, tmp_path, capsys):
    import json as _json

    from nyc_taxi_data_warehouse_spark.__main__ import main

    cli = lambda *a: main(list(a), spark=spark)  # noqa: E731
    tbl = str(tmp_path / "t")
    idx = str(tmp_path / "i")
    spark.range(100).withColumnRenamed("id", "k").repartition(4).write.parquet(tbl)
    assert cli(
        "bloom-index", "--table-path", tbl, "--index-path", idx,
        "--key-col", "k", "--m-bits", "1024", "--k", "4",
    ) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["files_indexed"] == 4
    spark.range(100, 150).withColumnRenamed("id", "k").repartition(2).write.mode(
        "append"
    ).parquet(tbl)
    assert cli(
        "bloom-index", "--table-path", tbl, "--index-path", idx,
        "--key-col", "k", "--m-bits", "1024", "--k", "4", "--append",
    ) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["files_indexed"] == 2
    got = read_with_bloom(spark, tbl, idx, "k", [120], m_bits=1024, k=4)
    assert got.count() == 1


def test_int_typed_key_probes_match(spark, tmp_path):
    """xxhash64 hashes int and long DIFFERENTLY, so the probe must cast
    to the indexed column's exact recorded type (ADVICE r4) — an
    int-keyed table probed with python ints must still find its rows."""
    d, x = str(tmp_path / "int_tbl"), str(tmp_path / "int_idx")
    spark.range(0, 500).select(
        F.col("id").cast("int").alias("key"),
        (F.col("id") % 7).alias("grp"),
    ).repartition(6).write.parquet(d)
    build_bloom_index(spark, d, "key", x, m_bits=M, k=K)
    got = read_with_bloom(spark, d, x, "key", [3, 250, 499], m_bits=M, k=K)
    assert sorted(r.key for r in got.collect()) == [3, 250, 499]
    # and candidate files are a real subset, not everything
    cand = bloom_candidate_files(spark, x, "key", [3], m_bits=M, k=K)
    assert 1 <= len(cand) < 6


def test_duplicate_probe_values_not_false_negative(spark, table, index):
    """Duplicated entries in values used to double the per-(file,key)
    probe rows and fail the n==k cover test (ADVICE r4): [v, v] must
    return the same candidates as [v]."""
    full = spark.read.parquet(table)
    v = full.select("event_id").first().event_id
    once = bloom_candidate_files(spark, index, "event_id", [v], m_bits=M, k=K)
    twice = bloom_candidate_files(
        spark, index, "event_id", [v, v], m_bits=M, k=K
    )
    assert once and once == twice


def test_probe_type_mismatch_fails_fast(spark, table, index):
    """A probe value that cannot cast to the recorded key type raises
    instead of silently returning no candidates."""
    with pytest.raises(Exception):
        bloom_candidate_files(
            spark, index, "event_id", ["not-a-number"], m_bits=M, k=K
        )
