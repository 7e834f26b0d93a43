"""Cluster-aware splitting (operators/split.py): no near-dup pair ever
straddles a split; determinism; fraction sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.dedup import minhash_lsh_pairs
from nyc_taxi_data_warehouse_spark.operators.split import cluster_aware_split
from nyc_taxi_data_warehouse_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_no_near_dup_pair_straddles_splits(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    pairs = minhash_lsh_pairs(docs, "text", "doc_id", jaccard_threshold=0.3)
    assert pairs.count() > 0, "fixture has no near-dups — vacuous"
    assigned = cluster_aware_split(docs, pairs, "doc_id").persist()

    a = assigned.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
    b = assigned.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
    straddlers = (
        pairs.join(a, "id_a").join(b, "id_b").where(F.col("sa") != F.col("sb"))
    )
    assert straddlers.count() == 0

    # naive per-doc hashing DOES straddle on this corpus — the leak the
    # operator exists to close (guards against a vacuous fixture)
    naive_bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    naive = docs.select(
        "doc_id", F.when(naive_bucket < 80, "train").otherwise("eval").alias("split")
    )
    na = naive.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
    nb = naive.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
    naive_straddlers = (
        pairs.join(na, "id_a").join(nb, "id_b").where(F.col("sa") != F.col("sb"))
    )
    assert naive_straddlers.count() > 0

    # every doc assigned exactly one split; deterministic across reruns
    assert assigned.where(F.col("split").isNull()).count() == 0
    again = cluster_aware_split(docs.repartition(7), pairs, "doc_id")
    diff = (
        assigned.select("doc_id", "split")
        .exceptAll(again.select("doc_id", "split"))
        .count()
    )
    assert diff == 0
    # fractions land near targets (split keys are md5-uniform)
    counts = {r.split: r.n for r in assigned.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert 0.6 < counts.get("train", 0) / n < 0.95
    assigned.unpersist()


def test_fraction_validation(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(5)
    pairs = docs.select(
        F.col("doc_id").alias("id_a"), F.col("doc_id").alias("id_b")
    ).limit(0)
    with pytest.raises(ValueError):
        cluster_aware_split(docs, pairs, "doc_id", fractions={"train": 50})


def test_split_with_no_pairs_degrades_to_per_doc_hash(spark):
    """Empty pair set: every doc is its own singleton cluster, so the
    assignment equals a plain per-doc hash split — and still covers
    every document exactly once."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assigned = cluster_aware_split(docs, pairs, "doc_id")
    assert assigned.count() == docs.count()
    assert assigned.where(F.col("split").isNull()).count() == 0
    assert assigned.where(F.col("split_key") != F.col("doc_id")).count() == 0


def test_temporal_split_boundaries_and_purge(spark):
    from datetime import datetime

    from nyc_taxi_data_warehouse_spark.operators.split import temporal_split

    rows = [
        (i, datetime(2025, 1, 1, hour)) for i, hour in enumerate(range(24))
    ] + [(99, None)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = temporal_split(
        df, "ts",
        val_start=datetime(2025, 1, 1, 12),
        test_start=datetime(2025, 1, 1, 18),
        purge_gap="INTERVAL 2 HOURS",
    )
    got = {r["id"]: r["split"] for r in out.collect()}
    # purged: hours 10,11 (before val) and 16,17 (before test); null out
    assert set(got) == set(range(24)) - {10, 11, 16, 17}
    assert all(got[i] == "train" for i in range(0, 10))
    assert all(got[i] == "val" for i in range(12, 16))
    assert all(got[i] == "test" for i in range(18, 24))
    # boundary rows land in the LATER split (half-open intervals)
    assert got[12] == "val" and got[18] == "test"
    # numeric time column + numeric gap
    ndf = spark.createDataFrame([(i, i) for i in range(10)], "id long, t long")
    ngot = {
        r["id"]: r["split"]
        for r in temporal_split(ndf, "t", 5, 8, purge_gap=1).collect()
    }
    assert ngot == {0: "train", 1: "train", 2: "train", 3: "train",
                    5: "val", 6: "val", 8: "test", 9: "test"}
    # no purge: everything labeled
    allg = temporal_split(ndf, "t", 5, 8)
    assert allg.count() == 10


def test_temporal_split_zero_shuffle(spark):
    from nyc_taxi_data_warehouse_spark.operators.split import temporal_split
    from nyc_taxi_data_warehouse_spark.plans.audit import assert_no_exchange

    df = spark.createDataFrame([(i, i) for i in range(100)], "id long, t long")
    assert_no_exchange(temporal_split(df, "t", 50, 80, purge_gap=5))


def test_temporal_split_rejects_swapped_boundaries(spark):
    import pytest

    from nyc_taxi_data_warehouse_spark.operators.split import temporal_split

    df = spark.createDataFrame([(1, 5)], "id long, t long")
    with pytest.raises(ValueError, match="val_start"):
        temporal_split(df, "t", val_start=8, test_start=5)


def test_temporal_split_property_vs_reference(spark):
    """Property (numeric time axis): labels and purges match a direct
    python evaluation of the half-open interval rules for arbitrary
    boundaries and gaps."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from nyc_taxi_data_warehouse_spark.operators.split import temporal_split

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        v=st.integers(10, 40),
        gap_after=st.integers(1, 30),
        gap=st.integers(0, 8),
    )
    def run(v, gap_after, gap):
        s = v + gap_after
        df = spark.createDataFrame([(i, i) for i in range(60)], "id long, t long")
        got = {
            r["id"]: r["split"]
            for r in temporal_split(
                df, "t", v, s, purge_gap=gap or None
            ).collect()
        }
        for t in range(60):
            purged = gap and (v - gap <= t < v or s - gap <= t < s)
            if purged:
                assert t not in got, (t, v, s, gap)
            else:
                want = "train" if t < v else "val" if t < s else "test"
                assert got[t] == want, (t, v, s, gap)

    run()
