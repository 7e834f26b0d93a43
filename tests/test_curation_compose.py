"""End-to-end composition gate for the round-5 curation operators:

  documents --decontaminate_spans(vs eval set)--> scrubbed
            --semantic_dedup(embeddings)--------> pruned
            --importance_resample(vs target)----> selected
            --shuffle_corpus--------------------> training order

Each stage's contract is re-checked at the seams (the same style as
``tests/test_rag_compose.py``): no rows invented or silently lost, the
scrubbed corpus contains no eval n-gram, the selection is a subset of
the pruned corpus, and the whole chain is deterministic end to end.
"""

from __future__ import annotations

import pytest

import re

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.dsir import importance_resample
from nyc_taxi_data_warehouse_spark.operators.semdedup import semantic_dedup
from nyc_taxi_data_warehouse_spark.operators.shuffle import shuffle_corpus
from nyc_taxi_data_warehouse_spark.operators.spandedup import (
    decontaminate_spans,
)
from nyc_taxi_data_warehouse_spark.sources import load_table

SF = "/root/testdata/sf0.01"
N_GRAM = 6


def _norm_tokens(text):
    t = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", "", (text or "").lower()))
    return [x for x in t.strip().split(" ") if x]


def _run_chain(spark):
    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    # eval set: every 50th document plays the benchmark suite
    eval_set = docs.where(F.col("doc_id") % 50 == 0)
    train = docs.where(F.col("doc_id") % 50 != 0)

    scrubbed = decontaminate_spans(train, eval_set, "text", "doc_id", n=N_GRAM)

    kept_ids = (
        semantic_dedup(emb, k=6, n_iter=2, threshold=0.40)
        .where("kept")
        .select(F.col("vec_id").alias("doc_id"))
    )
    pruned = scrubbed.join(kept_ids, "doc_id", "left_semi")

    # target domain: the longest documents stand in for "high quality"
    target = docs.orderBy(F.desc("n_chars"), "doc_id").limit(30)
    selected = importance_resample(
        pruned.withColumnRenamed("clean_text", "body"),
        target.withColumnRenamed("text", "body"),
        k=50,
        buckets=512,
        seed=11,
    )
    ordered = shuffle_corpus(selected, "doc_id", seed=5)
    return docs, eval_set, train, scrubbed, pruned, selected, ordered


@pytest.mark.slowproof
def test_curation_chain_contracts(spark):
    docs, eval_set, train, scrubbed, pruned, selected, ordered = _run_chain(
        spark
    )

    # --- decontamination: row-preserving, and actually clean
    assert scrubbed.count() == train.count()
    eval_grams = set()
    for r in eval_set.select("text").collect():
        tk = _norm_tokens(r["text"])
        for i in range(len(tk) - N_GRAM + 1):
            eval_grams.add(tuple(tk[i : i + N_GRAM]))
    n_scrubbed_docs = 0
    for r in scrubbed.collect():
        tk = _norm_tokens(r["clean_text"])
        for i in range(len(tk) - N_GRAM + 1):
            assert tuple(tk[i : i + N_GRAM]) not in eval_grams, r["doc_id"]
        if r["n_removed"] > 0:
            n_scrubbed_docs += 1
    # the fixture shares at least one 6-gram across the eval split, so
    # the scrub demonstrably fired
    assert n_scrubbed_docs >= 1

    # --- dedup: pruned is a subset of scrubbed
    assert pruned.count() <= scrubbed.count()
    assert (
        pruned.join(scrubbed, "doc_id", "left_anti").count() == 0
    )

    # --- selection: exactly k rows, every one from the pruned corpus
    sel_rows = selected.collect()
    assert len(sel_rows) == 50
    sel_ids = {r["doc_id"] for r in sel_rows}
    pruned_ids = {r["doc_id"] for r in pruned.collect()}
    assert sel_ids <= pruned_ids
    eval_ids = {r["doc_id"] for r in eval_set.collect()}
    assert not (sel_ids & eval_ids)  # eval never leaks into training

    # --- ordering: a permutation of the selection
    order = [r["doc_id"] for r in ordered.collect()]
    assert sorted(order) == sorted(sel_ids)

    # --- whole chain deterministic
    _, _, _, _, _, _, ordered2 = _run_chain(spark)
    assert [r["doc_id"] for r in ordered2.collect()] == order
