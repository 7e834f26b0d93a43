"""Distributed BPE (operators/bpe.py): learned merges match a
hand-rolled local trainer exactly, apply() round-trips and agrees with
training's own symbol state, and determinism across partitionings."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.bpe import apply_bpe, train_bpe
from nyc_taxi_data_warehouse_spark.sources import load_table

SF = "/root/testdata/sf0.001"
N_MERGES = 24


def _norm_words(text: str) -> list[str]:
    t = re.sub(r"[^a-z0-9 ]", "", text.lower())
    t = re.sub(r" +", " ", t).strip()
    return [w for w in t.split(" ") if w]


def _local_train(texts: list[str], n_merges: int, min_count: int = 2):
    """Reference trainer: word counts -> iterative best-pair merges with
    the same (count desc, pair asc) tie-break."""
    words = Counter(w for t in texts for w in _norm_words(t))
    syms = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, cnt in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (left, right), _ = best
        merges.append((left, right))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text")


@pytest.fixture(scope="module")
def trained(spark, docs):
    texts = [r.text for r in docs.collect()]
    want_merges, want_syms = _local_train(texts, N_MERGES)
    got_merges = train_bpe(docs, "text", n_merges=N_MERGES)
    return texts, want_merges, want_syms, got_merges


def test_learned_merges_match_local_trainer(trained):
    _, want_merges, _, got_merges = trained
    assert got_merges == want_merges


def test_apply_matches_training_symbol_state(spark, docs, trained):
    """Tokenizing the training corpus reproduces exactly the per-word
    symbol arrays training ended with — train/apply consistency."""
    _, _, want_syms, merges = trained
    got = apply_bpe(docs, "text", "doc_id", merges).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    for r in got:
        expect = [t for w in _norm_words(texts[r.doc_id]) for t in want_syms[w]]
        assert r.bpe_tokens == expect
        assert r.n_bpe_tokens == len(expect)


def test_round_trip_and_compression(spark, docs, trained):
    """concat(tokens) == normalized text with spaces dropped, and the
    learned merges compress: fewer BPE tokens than characters."""
    _, _, _, merges = trained
    out = apply_bpe(docs, "text", "doc_id", merges)
    joined = out.join(docs, "doc_id").select(
        F.array_join("bpe_tokens", "").alias("rebuilt"),
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " ", ""
        ).alias("chars"),
        F.col("n_bpe_tokens"),
        F.length(
            F.regexp_replace(
                F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " ", ""
            )
        ).alias("n_chars"),
    )
    assert joined.where(F.col("rebuilt") != F.col("chars")).count() == 0
    tot = joined.agg(
        F.sum("n_bpe_tokens").alias("tok"), F.sum("n_chars").alias("ch")
    ).collect()[0]
    assert tot.tok < tot.ch


def test_training_deterministic_across_partitionings(spark, docs, trained):
    _, _, _, merges = trained
    again = train_bpe(docs.repartition(7, "doc_id"), "text", n_merges=N_MERGES)
    assert again == merges


def test_min_pair_count_stops_early(spark):
    df = spark.createDataFrame(
        [(1, "ab ab ab"), (2, "cd")], "doc_id long, text string"
    )
    merges = train_bpe(df, "text", n_merges=10, min_pair_count=2)
    # only (a,b) clears the floor: cd occurs once
    assert merges == [("a", "b")]


def test_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "xy xy")], "doc_id long, text string"
    )
    merges = train_bpe(df, "text", n_merges=4)
    assert merges == [("x", "y")]
    out = {r.doc_id: r for r in apply_bpe(df, "text", "doc_id", merges).collect()}
    assert out[1].bpe_tokens == [] and out[2].bpe_tokens == []
    assert out[3].bpe_tokens == ["xy", "xy"]
