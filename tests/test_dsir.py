"""DSIR importance resampling (operators/dsir.py).

The only Spark-native primitive in the pipeline is xxhash64 (bucket
hashing + Gumbel draws); everything downstream — smoothed bucket
distributions, decimal-exact weight sums, Gumbel top-k selection — is
replayed in pure Python from the collected features/hashes and must
match exactly (weights to 1e-9, the selected set exactly).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.dsir import (
    _M,
    fit_bucket_dist,
    hashed_ngram_features,
    importance_resample,
    importance_weights,
)

BUCKETS = 64


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, body string")


def _spark_buckets(spark, grams, m=BUCKETS):
    rows = spark.createDataFrame([(g,) for g in grams], "g string").select(
        "g", F.pmod(F.xxhash64("g"), F.lit(m)).alias("b")
    )
    return {r["g"]: r["b"] for r in rows.collect()}


def _py_ngrams(text):
    # mirror functions.text.normalize: lowercase, STRIP non-[a-z0-9 ],
    # collapse spaces
    import re

    t = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", "", text.lower())).strip()
    toks = [x for x in t.split(" ") if x]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_dist(features_by_doc, m=BUCKETS):
    c: dict[int, int] = {}
    for buckets in features_by_doc.values():
        for b, n in buckets.items():
            c[b] = c.get(b, 0) + n
    C = sum(c.values())
    return c, C


def _py_logp(c, C, b, m=BUCKETS):
    return math.log((c.get(b, 0) + 1.0) / (C + m))


def test_features_are_hashed_unigrams_and_bigrams(spark):
    df = _docs(spark, [(1, "Alpha beta beta")])
    feats = {
        (r["_id"], r["bucket"]): r["cnt"]
        for r in hashed_ngram_features(df, "body", "doc_id", BUCKETS).collect()
    }
    grams = _py_ngrams("Alpha beta beta")
    assert grams == ["alpha", "beta", "beta", "alpha beta", "beta beta"]
    hb = _spark_buckets(spark, set(grams))
    want: dict = {}
    for g in grams:
        key = (1, hb[g])
        want[key] = want.get(key, 0) + 1
    assert feats == want


def test_weights_match_python_reference(spark):
    raw = _docs(
        spark,
        [
            (1, "alpha alpha beta"),
            (2, "gamma delta epsilon zeta"),
            (3, "alpha beta alpha beta"),
            (4, ""),
            (5, "solo"),
        ],
    )
    target = _docs(spark, [(100, "alpha beta alpha"), (101, "alpha gamma")])
    got = {
        r["doc_id"]: r["log_w"]
        for r in importance_weights(raw, target, buckets=BUCKETS).collect()
    }
    assert 4 not in got  # tokenless doc has no features

    def feats_of(df):
        out = {}
        for r in df.collect():
            grams = _py_ngrams(r["body"])
            if not grams:
                continue
            hb = _spark_buckets(spark, set(grams))
            d: dict = {}
            for g in grams:
                d[hb[g]] = d.get(hb[g], 0) + 1
            out[r["doc_id"]] = d
        return out

    raw_f, tgt_f = feats_of(raw), feats_of(target)
    q, Cq = _py_dist(raw_f)
    p, Cp = _py_dist(tgt_f)
    for did, d in raw_f.items():
        want = sum(
            n * (_py_logp(p, Cp, b) - _py_logp(q, Cq, b)) for b, n in d.items()
        )
        assert math.isclose(got[did], want, rel_tol=0, abs_tol=1e-9), did
    assert set(got) == set(raw_f)


def test_resample_matches_gumbel_topk_and_is_deterministic(spark):
    raw = _docs(
        spark, [(i, f"tok{i % 7} alpha common word{i % 3}") for i in range(40)]
    )
    target = _docs(spark, [(900, "alpha common alpha common")])
    picked = importance_resample(raw, target, k=10, buckets=BUCKETS, seed=3)
    ids = sorted(r["doc_id"] for r in picked.collect())
    assert len(ids) == 10
    # python replay: gumbel(u from xxhash64(id, seed)) + log_w, top-10
    lw = {
        r["doc_id"]: r["log_w"]
        for r in importance_weights(raw, target, buckets=BUCKETS).collect()
    }
    hs = {
        r["doc_id"]: r["h"]
        for r in raw.select(
            "doc_id", F.abs(F.xxhash64("doc_id", F.lit(3))).alias("h")
        ).collect()
    }
    scores = {}
    for did, w in lw.items():
        u = (hs[did] + 1.0) / (_M + 2.0)
        scores[did] = (w + (-math.log(-math.log(u))), -did)
    want = sorted(sorted(scores, key=lambda d: scores[d], reverse=True)[:10])
    assert ids == want
    # deterministic under repartitioning
    again = importance_resample(
        raw.repartition(11), target, k=10, buckets=BUCKETS, seed=3
    )
    assert sorted(r["doc_id"] for r in again.collect()) == ids
    # selected rows carry the raw columns + log_w
    assert set(picked.columns) == {"doc_id", "body", "log_w"}


def test_resample_directional_and_degenerate(spark):
    raw = _docs(
        spark,
        [(i, "alpha beta alpha") for i in range(10)]
        + [(100 + i, "zulu yankee xray") for i in range(10)],
    )
    target = _docs(spark, [(900, "alpha beta alpha beta")])
    picked = importance_resample(raw, target, k=8, buckets=BUCKETS, seed=1)
    ids = [r["doc_id"] for r in picked.collect()]
    # target-like docs dominate the sample
    assert sum(1 for i in ids if i < 100) >= 6
    # k >= corpus: everything with features is returned
    all_rows = importance_resample(raw, target, k=100, buckets=BUCKETS)
    assert all_rows.count() == 20
    # empty raw / empty target stay finite and error-free
    empty = _docs(spark, [])
    assert importance_resample(empty, target, k=5, buckets=BUCKETS).count() == 0
    got = importance_resample(raw, empty, k=5, buckets=BUCKETS)
    assert got.count() == 5
    assert all(math.isfinite(r["log_w"]) for r in got.collect())
