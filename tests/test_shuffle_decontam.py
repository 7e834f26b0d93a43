"""Deterministic corpus shuffle (operators/shuffle.py) and cross-corpus
span decontamination (operators/spandedup.decontaminate_spans)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.shuffle import (
    shard_assignments,
    shuffle_corpus,
)
from nyc_taxi_data_warehouse_spark.operators.spandedup import (
    decontaminate_spans,
)


# ---------------------------------------------------------------- shuffle


def test_shuffle_is_deterministic_permutation(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, body string"
    )
    a = [r["doc_id"] for r in shuffle_corpus(df, "doc_id", seed=7).collect()]
    b = [
        r["doc_id"]
        for r in shuffle_corpus(df.repartition(17), "doc_id", seed=7).collect()
    ]
    assert a == b  # partition-layout independent
    assert sorted(a) == list(range(200))  # a permutation, nothing lost
    assert a != list(range(200))  # actually shuffled
    c = [r["doc_id"] for r in shuffle_corpus(df, "doc_id", seed=8).collect()]
    assert c != a  # different seed, different permutation
    # python replay of the ordering key
    hs = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", F.xxhash64("doc_id", F.lit(7)).alias("h")
        ).collect()
    }
    assert a == sorted(hs, key=lambda d: (hs[d], d))


def test_shuffle_pinned_partitions_preserve_order(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(100)], "doc_id long"
    )
    out = shuffle_corpus(df, "doc_id", seed=3, num_partitions=5)
    assert out.rdd.getNumPartitions() == 5
    # concatenating partitions in index order == the global permutation
    per_part = out.rdd.glom().collect()
    flat = [r["doc_id"] for part in per_part for r in part]
    want = [
        r["doc_id"] for r in shuffle_corpus(df, "doc_id", seed=3).collect()
    ]
    assert flat == want


def test_shard_assignments_cover_and_balance(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    out = shard_assignments(df, "doc_id", n_shards=8, seed=0)
    counts = {
        r["shard"]: r["c"]
        for r in out.groupBy("shard").agg(F.count("*").alias("c")).collect()
    }
    assert set(counts) == set(range(8))
    assert sum(counts.values()) == 1000
    assert max(counts.values()) < 2 * min(counts.values())  # rough balance
    # deterministic
    again = shard_assignments(df.repartition(9), "doc_id", n_shards=8, seed=0)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )


# ---------------------------------------------------------- decontamination


def _norm_tokens(text):
    t = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", "", text.lower())).strip()
    return [x for x in t.split(" ") if x]


def _ref_decontaminate(train_rows, test_rows, n):
    """Pure-python reference: remove every n-token window of train that
    appears as an n-token window of test."""
    test_grams = set()
    for _tid, text in test_rows:
        tk = _norm_tokens(text)
        for i in range(len(tk) - n + 1):
            test_grams.add(tuple(tk[i : i + n]))
    out = {}
    for did, text in train_rows:
        tk = _norm_tokens(text)
        masked = [False] * len(tk)
        starts = [
            i
            for i in range(len(tk) - n + 1)
            if tuple(tk[i : i + n]) in test_grams
        ]
        for i in starts:
            for j in range(i, i + n):
                masked[j] = True
        # merged spans count: contiguous-or-overlapping start runs
        spans = 0
        prev_end = -1
        for i in sorted(starts):
            if i > prev_end:
                spans += 1
            prev_end = max(prev_end, i + n)
        out[did] = (
            " ".join(t for t, m in zip(tk, masked) if not m),
            len(tk),
            sum(masked),
            spans,
        )
    return out


@pytest.mark.parametrize("broadcast_test", [True, False])
def test_decontaminate_matches_reference(spark, broadcast_test):
    leak = "the quick brown fox jumps over the lazy dog today"
    train_rows = [
        (1, f"intro words here {leak} and a long unique tail of text one"),
        (2, "completely clean document with no overlap at all whatsoever"),
        (3, f"{leak} {leak} doubled leak document"),  # overlapping windows
        (4, "short doc"),  # shorter than n: untouched
    ]
    test_rows = [(900, f"benchmark question: {leak}?")]
    train = spark.createDataFrame(train_rows, "doc_id long, body string")
    test = spark.createDataFrame(test_rows, "qid long, body string")
    got = {
        r["doc_id"]: (
            r["clean_text"],
            r["n_tokens"],
            r["n_removed"],
            r["n_dup_spans"],
        )
        for r in decontaminate_spans(
            train,
            test,
            "body",
            "doc_id",
            n=5,
            test_id_col="qid",
            broadcast_test=broadcast_test,
        ).collect()
    }
    want = _ref_decontaminate(train_rows, test_rows, n=5)
    assert got == want
    assert got[2][2] == 0  # clean doc untouched
    assert got[1][2] > 0  # leaked doc scrubbed
    assert got[4][2] == 0  # short doc passes through


def test_decontaminate_degenerate(spark):
    train = spark.createDataFrame(
        [(1, "some ordinary text body here okay"), (2, None)],
        "doc_id long, body string",
    )
    empty_test = spark.createDataFrame([], "doc_id long, body string")
    out = {
        r["doc_id"]: r["n_removed"]
        for r in decontaminate_spans(
            train, empty_test, "body", "doc_id", n=3
        ).collect()
    }
    assert out == {1: 0, 2: 0}  # nothing removed, null body survives
    empty_train = spark.createDataFrame([], "doc_id long, body string")
    assert (
        decontaminate_spans(empty_train, train, "body", "doc_id", n=3).count()
        == 0
    )


def test_shuffle_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, body string")
    assert shuffle_corpus(df, "doc_id").count() == 0
    assert shard_assignments(df, "doc_id", 4).count() == 0
