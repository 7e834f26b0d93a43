"""Quality classifier (operators/classifier.py): exact parity with a
local numpy trainer on the same sparse features, cross-runtime hash
agreement, bit-identical determinism across partitionings, learning on
held-out docs, and the zero-shuffle scoring plan."""

from __future__ import annotations

import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.classifier import (
    hashed_features,
    score_quality,
    train_quality_classifier,
)

DIM = 64
GOOD = ["clear", "concise", "prose", "reads", "well", "edited"]
BAD = ["spam", "click", "buy", "now", "free", "winner"]
NOISE = ["the", "and", "some", "words", "here", "there"]


def _doc(rng, vocab):
    return " ".join(rng.choice(vocab + NOISE) for _ in range(30))


def _corpus(seed, n):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        label = i % 2
        rows.append((i, _doc(rng, GOOD if label else BAD), label))
    return rows


@pytest.fixture(scope="module")
def train_df(spark):
    return spark.createDataFrame(
        _corpus(7, 40), "doc_id long, text string, label int"
    )


@pytest.fixture(scope="module")
def model(train_df):
    return train_quality_classifier(
        train_df, "text", "label", "doc_id", dim=DIM, n_iters=20, lr=1.0
    )


def test_bucket_hash_matches_python_crc32(spark, train_df):
    rows = (
        train_df.select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .distinct()
        .select(
            "t",
            F.pmod(F.crc32(F.encode("t", "UTF-8")), F.lit(DIM))
            .cast("int")
            .alias("b"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert r.b == zlib.crc32(r.t.encode()) % DIM


def test_matches_local_numpy_trainer(spark, train_df, model):
    """Same sparse features + same full-batch GD locally -> same
    weights. Gradient sums are decimal-exact in Spark, float64-ordered
    locally; agreement bound reflects only that rounding."""
    feats = hashed_features(train_df, "text", "doc_id", DIM).collect()
    labels = {r.doc_id: r.label for r in train_df.collect()}
    ids = sorted(labels)
    X = np.zeros((len(ids), DIM + 1))
    idx = {d: i for i, d in enumerate(ids)}
    for r in feats:
        X[idx[r.doc_id], r.bucket] = r.cnt
    X[:, DIM] = 1.0
    y = np.array([labels[d] for d in ids], dtype=np.float64)
    w = np.zeros(DIM + 1)
    mask = np.ones(DIM + 1)
    mask[DIM] = 0.0
    for _ in range(20):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w -= 1.0 * ((X.T @ (p - y)) / len(ids) + 1e-4 * w * mask)
    got = np.array(model["weights"] + [model["bias"]])
    np.testing.assert_allclose(got, w, atol=1e-6)


@pytest.mark.slowproof
def test_training_bit_identical_across_partitionings(train_df, model):
    again = train_quality_classifier(
        train_df.repartition(7, "doc_id"),
        "text",
        "label",
        "doc_id",
        dim=DIM,
        n_iters=20,
        lr=1.0,
    )
    assert again["weights"] == model["weights"]
    assert again["bias"] == model["bias"]


def test_separates_held_out_documents(spark, model):
    held = spark.createDataFrame(
        _corpus(99, 20), "doc_id long, text string, label int"
    )
    scored = score_quality(held, "text", "doc_id", model).join(held, "doc_id")
    rows = scored.collect()
    good = [r.quality_score for r in rows if r.label == 1]
    bad = [r.quality_score for r in rows if r.label == 0]
    assert min(good) > max(bad)


def test_scoring_agrees_with_join_path(spark, train_df, model):
    """The Arrow scoring UDF and an explicit join+sigmoid over
    hashed_features produce the same probabilities."""
    w = model["weights"]
    wdf = spark.createDataFrame(
        [(b, x) for b, x in enumerate(w) if x != 0.0], "bucket int, w double"
    )
    joined = (
        hashed_features(train_df, "text", "doc_id", DIM)
        .join(F.broadcast(wdf), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.coalesce("w", F.lit(0.0))).alias("m")
        )
        .select(
            "doc_id",
            (
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-(F.col("m") + F.lit(model["bias"]))))
            ).alias("p_join"),
        )
    )
    udf_scores = score_quality(train_df, "text", "doc_id", model)
    diff = (
        udf_scores.join(joined, "doc_id")
        .select(F.max(F.abs(F.col("quality_score") - F.col("p_join"))).alias("d"))
        .collect()[0]["d"]
    )
    assert diff < 1e-9


def test_scoring_plans_zero_shuffle(spark, train_df, model):
    plan = (
        score_quality(train_df, "text", "doc_id", model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_empty_labeled_set_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, text string, label int")
    with pytest.raises(ValueError):
        train_quality_classifier(
            empty, "text", "label", "doc_id", dim=8, n_iters=1
        )
