"""Search-operator tests: float BM25 against a pure-Python reference
(the ln-based idf cannot go through the cross-engine hash oracle, so it
gets its own exactness gate here), plus index-shape invariants.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

QUERY_TERMS = ["spark", "merge", "window", "slow"]


def _tokenize(text: str) -> list[str]:
    norm = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", "", text.lower())).strip()
    return [t for t in norm.split(" ") if t]


def _bm25_reference(rows, terms, k1=1.2, b=0.75):
    """Plain-Python BM25 over (doc_id, text) rows — the spec the Spark
    operator must match."""
    docs = {doc_id: _tokenize(text) for doc_id, text in rows}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = Counter(t for toks in docs.values() for t in set(toks) if t in terms)
    scores = {}
    for doc_id, toks in docs.items():
        tf = Counter(toks)
        s, matched = 0.0, 0
        for t in terms:
            if tf[t] == 0:
                continue
            matched += 1
            idf = math.log1p((n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf[t] * (k1 + 1)) / (tf[t] + k1 * (1 - b + b * len(toks) / avgdl))
        if matched:
            scores[doc_id] = (s, matched)
    return scores


def test_bm25_matches_python_reference(spark, sf_dir):
    from nyc_taxi_data_warehouse_spark.operators.search import bm25_topk
    from nyc_taxi_data_warehouse_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: (r["score"], r["n_terms_matched"])
        for r in bm25_topk(docs, QUERY_TERMS, k=20).collect()
    }
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    ref = _bm25_reference(rows, QUERY_TERMS)
    top_ref = sorted(ref.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    assert set(got) == {doc_id for doc_id, _ in top_ref}
    for doc_id, (score, matched) in top_ref:
        assert got[doc_id][1] == matched
        assert got[doc_id][0] == pytest.approx(score, rel=1e-12)


def test_postings_shape_invariants(spark, sf_dir):
    """df == number of postings rows per term; sum(dl) == sum(tf)."""
    from nyc_taxi_data_warehouse_spark.operators.search import (
        doc_lengths,
        postings,
        term_stats,
    )
    from nyc_taxi_data_warehouse_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    p = postings(docs)
    stats = term_stats(p)
    assert p.count() == stats.agg(F.sum("df")).collect()[0][0]
    total_tokens = doc_lengths(docs).agg(F.sum("dl")).collect()[0][0]
    assert stats.agg(F.sum("total_tf")).collect()[0][0] == total_tokens
    # a (term, doc) key appears exactly once
    assert p.groupBy("term", "doc_id").count().where("count > 1").count() == 0


def test_postings_index_partition_prunes(spark, sf_dir, tmp_path):
    """The postings written via write_postings_index ARE the index: a
    keyword lookup must reach the scan as PartitionFilters (directory
    pruning), not a post-scan Filter over the whole corpus — in both
    the term-per-directory and the hash-bucket layouts."""
    from nyc_taxi_data_warehouse_spark.operators.search import (
        lookup_postings,
        postings,
        write_postings_index,
    )
    from nyc_taxi_data_warehouse_spark.sources import load_table

    post = postings(load_table(spark, sf_dir, "documents"))
    want = sorted(
        (r["doc_id"], r["tf"])
        for r in post.where(F.col("term") == "spark").collect()
    )
    assert want  # the fixture corpus mentions spark

    # Layout 1: one directory per term — exact pruning on the term.
    p1 = str(tmp_path / "idx_term")
    write_postings_index(post, p1)
    hit = lookup_postings(spark, p1, ["spark"])
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "term" in plan, plan[:2000]
    m = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("spark" in ln for ln in m), m
    assert sorted((r["doc_id"], r["tf"]) for r in hit.collect()) == want

    # Layout 2: N hash-bucket directories — prune to the term's bucket,
    # residual term predicate pushes into the parquet row-group filter.
    p2 = str(tmp_path / "idx_bkt")
    write_postings_index(post, p2, hash_partitions=16)
    hit2 = lookup_postings(spark, p2, ["spark"], hash_partitions=16)
    plan2 = hit2._jdf.queryExecution().executedPlan().toString()
    m2 = [ln for ln in plan2.splitlines() if "PartitionFilters" in ln]
    assert any("term_bkt" in ln for ln in m2), plan2[:2000]
    assert "PushedFilters" in plan2 and "term" in plan2
    assert sorted(
        (r["doc_id"], r["tf"]) for r in hit2.select("doc_id", "tf").collect()
    ) == want
