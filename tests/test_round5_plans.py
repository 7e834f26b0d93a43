"""Mechanical plan/shuffle assertions for the round-5 operators — the
same style as tests/test_shuffle_metrics.py: claims about scale shape
("one range exchange", "distributions broadcast", "vectors shuffle
once") are measured from the executed plan, not asserted in prose.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.dsir import importance_weights
from nyc_taxi_data_warehouse_spark.operators.semdedup import semantic_dedup
from nyc_taxi_data_warehouse_spark.operators.shuffle import (
    shard_assignments,
    shuffle_corpus,
)
from nyc_taxi_data_warehouse_spark.plans.audit import (
    assert_no_exchange,
    collect_with_metrics,
    formatted_plan,
)


def _docs(spark, n=60):
    return spark.createDataFrame(
        [(i, f"tok{i % 7} alpha common word{i % 5} beta") for i in range(n)],
        "doc_id long, body string",
    )


def test_shuffle_corpus_is_one_range_exchange(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = shuffle_corpus(df, "doc_id", seed=1)
    plan = formatted_plan(out)
    assert "rangepartitioning" in plan
    assert "hashpartitioning" not in plan
    m = collect_with_metrics(out)
    assert m["n_shuffles"] == 1


def test_shard_assignments_zero_shuffle(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    assert_no_exchange(shard_assignments(df, "doc_id", 8))


def test_dsir_distributions_broadcast_not_shuffled(spark):
    """The m-row bucket distributions must reach the weight join as
    broadcasts: the only hash exchanges in the whole weight plan are
    the feature aggregations (ints-only), never a join-side shuffle of
    the corpus against a distribution table."""
    raw, target = _docs(spark, 60), _docs(spark, 10)
    lw = importance_weights(raw, target, buckets=64)
    plan = formatted_plan(lw)
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    m = collect_with_metrics(lw)
    # calibrated cap: feature/dist/grand aggregations (several are
    # 1-row exchanges) — a corpus-vs-distribution shuffle JOIN would
    # blow past it; the join-free claim above is the structural check
    assert m["n_shuffles"] <= 13, m


def test_semdedup_vectors_shuffle_bounded(spark):
    """The quadratic sweep is applyInPandas over groupBy(cell): the
    corpus' vectors cross the wire for the cluster grouping and the
    argmax window — a bounded constant number of exchanges, not one
    per k-means round (centroids broadcast)."""
    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 5) for j in range(8)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    out = semantic_dedup(emb, k=4, n_iter=2, threshold=0.95)
    plan = formatted_plan(out)
    # centroid assignment joins are broadcasts (tiny centroid table)
    assert "BroadcastExchange" in plan
    m = collect_with_metrics(out)
    assert m["n_shuffles"] <= 8, m
    assert m["spill_bytes"] == 0
