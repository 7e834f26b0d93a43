"""Semantic dedup (operators/semdedup.py).

The greedy within-cluster sweep is replayed against an independent
pure-python reference (not the operator's own helper) for exact kept-set
parity; the end-to-end pipeline is checked on the embeddings fixture for
its defining invariants: no kept pair above threshold inside a cluster,
every dropped row has a kept witness, determinism across partitioning,
identical-vector collapse, and NULL passthrough (no silent erasure).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.semdedup import (
    cluster_greedy_dedup,
    semantic_dedup,
)
from nyc_taxi_data_warehouse_spark.sources import load_table


def _ref_greedy(rows, threshold, chunk):
    """Independent reference: rows = [(id, cell, sim, vec)] of ONE
    cluster; returns kept id set."""

    def cos(a, b):
        da = math.sqrt(sum(x * x for x in a)) or 1.0
        db = math.sqrt(sum(x * x for x in b)) or 1.0
        return sum(x * y for x, y in zip(a, b)) / (da * db)

    rows = sorted(rows, key=lambda r: (-r[2], r[0]))
    kept = set()
    for lo in range(0, len(rows), chunk):
        kept_vecs = []
        for rid, _cell, _sim, vec in rows[lo : lo + chunk]:
            if all(cos(vec, kv) < threshold for kv in kept_vecs):
                kept.add(rid)
                kept_vecs.append(vec)
    return kept


@pytest.mark.parametrize("chunk", [100, 3])
def test_sweep_matches_reference(spark, chunk):
    rows = [
        # cluster 0: a tight pair + an outlier
        (1, 0, 0.99, [1.0, 0.0, 0.0]),
        (2, 0, 0.98, [0.999, 0.01, 0.0]),
        (3, 0, 0.50, [0.0, 1.0, 0.0]),
        # cluster 1: chain a~b, b~c but a!~c — greedy keeps a and c
        (10, 1, 0.97, [1.0, 0.30, 0.0]),
        (11, 1, 0.96, [1.0, 0.52, 0.0]),
        (12, 1, 0.95, [1.0, 0.75, 0.0]),
        # tie on sim broken by id
        (20, 2, 0.90, [0.5, 0.5, 0.1]),
        (21, 2, 0.90, [0.5, 0.5, 0.1]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, cell long, sim double, _v array<double>"
    ).repartition(5)
    got = {
        r["vec_id"]: r["kept"]
        for r in cluster_greedy_dedup(
            df, "vec_id", threshold=0.95, max_cluster_size=chunk
        ).collect()
    }
    want_kept = set()
    for cell in (0, 1, 2):
        want_kept |= _ref_greedy(
            [r for r in rows if r[1] == cell], 0.95, chunk
        )
    assert {i for i, k in got.items() if k} == want_kept
    assert set(got) == {r[0] for r in rows}  # nothing lost or invented


def test_end_to_end_invariants(spark):
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    out = semantic_dedup(emb, k=6, n_iter=2, threshold=0.40)
    rows = out.collect()
    assert len(rows) == emb.count()
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in emb.select("vec_id", "embedding").collect()
    }

    def cos(a, b):
        da = math.sqrt(sum(x * x for x in a)) or 1.0
        db = math.sqrt(sum(x * x for x in b)) or 1.0
        return sum(float(x) * float(y) for x, y in zip(a, b)) / (da * db)

    by_cell: dict = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    dropped_total = 0
    for cell, members in by_cell.items():
        kept = [r for r in members if r["kept"]]
        dropped = [r for r in members if not r["kept"]]
        dropped_total += len(dropped)
        # no kept pair above threshold
        for i in range(len(kept)):
            for j in range(i + 1, len(kept)):
                assert (
                    cos(vecs[kept[i]["vec_id"]], vecs[kept[j]["vec_id"]])
                    < 0.40 + 1e-9
                )
        # every dropped row has a kept witness in its cluster
        for d in dropped:
            assert any(
                cos(vecs[d["vec_id"]], vecs[k["vec_id"]]) >= 0.40 - 1e-9
                for k in kept
            )
    # threshold sits below the fixture's pair density (max pairwise
    # cosine ~0.51), so the sweep demonstrably drops rows
    assert dropped_total > 0

    # determinism across partitioning
    again = semantic_dedup(emb.repartition(13), k=6, n_iter=2, threshold=0.40)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_identical_vectors_collapse_and_high_threshold(spark):
    df = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(10)]
        + [(100 + i, [float(i), 1.0, 0.0]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    out = semantic_dedup(df, k=2, n_iter=2, threshold=0.999)
    clones = [r for r in out.collect() if r["vec_id"] < 100]
    assert sum(r["kept"] for r in clones) == 1  # 10 identical -> 1 kept
    # threshold > 1: nothing can be dropped
    all_kept = semantic_dedup(df, k=2, n_iter=2, threshold=1.01)
    assert all(r["kept"] for r in all_kept.collect())


def test_null_and_empty_vectors_pass_through(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),
            (3, None),
            (4, []),
            (None, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = semantic_dedup(df, k=1, n_iter=1, threshold=0.9).collect()
    assert len(out) == 5  # no silent erasure
    unjudged = [r for r in out if r["cell"] is None]
    assert len(unjudged) == 3 and all(r["kept"] for r in unjudged)
    judged = [r for r in out if r["cell"] is not None]
    assert sum(r["kept"] for r in judged) == 1  # the identical pair collapsed


def test_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert semantic_dedup(df, k=2).count() == 0
