"""Degenerate-input gate for the newest operators (span dedup, BPE,
classifier, sketches) — the same empty/single/all-null bar the catalog
and earlier round-4 operators already pass: no errors, and pinned,
SQL-consistent semantics on the edges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.bpe import apply_bpe, train_bpe
from nyc_taxi_data_warehouse_spark.operators.classifier import (
    score_quality,
    train_quality_classifier,
)
from nyc_taxi_data_warehouse_spark.operators.sketches import (
    cms_build,
    cms_lookup,
    loghist_build,
    loghist_quantiles,
)
from nyc_taxi_data_warehouse_spark.operators.spandedup import (
    remove_duplicated_spans,
)


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


@pytest.fixture(scope="module")
def null_docs(spark):
    return spark.createDataFrame(
        [(1, None), (2, None), (3, "real text here three words")],
        "doc_id long, text string",
    )


def test_spandedup_empty_single_null(spark, empty_docs, null_docs):
    assert remove_duplicated_spans(empty_docs, "text", "doc_id", n=3).count() == 0
    one = spark.createDataFrame([(1, "only doc")], "doc_id long, text string")
    got = remove_duplicated_spans(one, "text", "doc_id", n=3).collect()[0]
    assert got.clean_text == "only doc" and got.n_removed == 0
    # null text propagates as null (SQL semantics), never errors, and
    # is never counted as a removable span
    rows = {r.doc_id: r for r in
            remove_duplicated_spans(null_docs, "text", "doc_id", n=2).collect()}
    assert rows[1].clean_text is None and rows[1].n_removed == 0
    assert rows[3].clean_text == "real text here three words"


def test_bpe_empty_single_null(spark, empty_docs, null_docs):
    assert train_bpe(empty_docs, "text", n_merges=4) == []
    assert train_bpe(
        spark.createDataFrame([(1, "x")], "doc_id long, text string"),
        "text",
        n_merges=4,
    ) == []  # one 1-char word: no pairs
    merges = train_bpe(null_docs, "text", n_merges=2)
    out = {r.doc_id: r for r in
           apply_bpe(null_docs, "text", "doc_id", merges).collect()}
    assert out[1].bpe_tokens == [] and out[1].n_bpe_tokens == 0
    assert "".join(out[3].bpe_tokens) == "realtextherethreewords"
    # empty merge table degrades to character tokens
    chars = apply_bpe(
        spark.createDataFrame([(1, "ab")], "doc_id long, text string"),
        "text",
        "doc_id",
        [],
    ).collect()[0]
    assert chars.bpe_tokens == ["a", "b"]


def test_classifier_empty_single_null(spark, empty_docs, null_docs):
    with pytest.raises(ValueError):
        train_quality_classifier(
            empty_docs.withColumn("label", F.lit(0)),
            "text", "label", "doc_id", dim=8, n_iters=1,
        )
    one = spark.createDataFrame(
        [(1, "good text", 1)], "doc_id long, text string, label int"
    )
    m = train_quality_classifier(one, "text", "label", "doc_id", dim=8, n_iters=3)
    s = score_quality(one, "text", "doc_id", m).collect()[0]
    assert 0.5 < s.quality_score <= 1.0  # pulled toward its only label
    labeled_nulls = null_docs.withColumn(
        "label", (F.col("doc_id") % 2).cast("int")
    )
    m2 = train_quality_classifier(
        labeled_nulls, "text", "label", "doc_id", dim=8, n_iters=2
    )
    scores = score_quality(labeled_nulls, "text", "doc_id", m2).collect()
    assert len(scores) == 3
    assert all(0.0 < r.quality_score < 1.0 for r in scores)


def test_sketches_empty_single_null(spark):
    empty = spark.createDataFrame([], "item string, value double")
    sk = cms_build(empty, "item", depth=3, width=16)
    assert sk.count() == 0
    probe = spark.createDataFrame([("x",)], "item string")
    est = cms_lookup(sk, probe, "item", depth=3, width=16).collect()
    assert est[0].est == 0  # absent counters read as zero
    hist = loghist_build(empty, "value")
    assert hist.count() == 0
    assert loghist_quantiles(hist, [0.5]).count() == 0
    one = spark.createDataFrame([("a", 5.0)], "item string, value double")
    q = loghist_quantiles(loghist_build(one, "value"), [0.5]).collect()[0]
    assert abs(q.value - 5.0) / 5.0 < 0.05
    nulls = spark.createDataFrame(
        [("a", None), ("b", None)], "item string, value double"
    )
    h = loghist_build(nulls, "value")
    assert {r.bucket for r in h.collect()} == {-2}
    # all-null: no rankable rows -> no quantile rows, no error
    assert loghist_quantiles(h, [0.5]).count() == 0
