"""PageRank (operators/graph.py) vs a local numpy power iteration."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.graph import pagerank


def _local_pagerank(edge_list, damping=0.85, iters=100):
    nodes = sorted({u for e in edge_list for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edge_list:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        inflow = np.zeros(n)
        for s, d in edge_list:
            inflow[idx[d]] += r[idx[s]] / out[idx[s]]
        dangling = r[out == 0].sum()
        r = (1 - damping) / n + damping * (inflow + dangling / n)
    return {u: r[idx[u]] for u in nodes}


def test_pagerank_matches_local_power_iteration(spark):
    # a small web: hub (1) pointed at by everyone, a cycle, a dangler (5)
    edge_list = [(2, 1), (3, 1), (4, 1), (1, 2), (2, 3), (3, 4), (4, 2), (1, 5)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r.id: r.rank for r in pagerank(edges, max_iter=100, tol=1e-12).collect()}
    want = _local_pagerank(edge_list)
    assert set(got) == set(want)
    for u in want:
        assert abs(got[u] - want[u]) < 1e-6, (u, got[u], want[u])
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # the hub outranks every cycle node
    assert got[1] == max(got.values())


def test_pagerank_degenerate_graphs(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty).count() == 0
    # single edge: two nodes, one dangling
    two = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r.id: r.rank for r in pagerank(two, max_iter=50).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[2] > got[1]
