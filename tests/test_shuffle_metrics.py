"""Measured shuffle-volume audits over executed plans.

The plan-shape tests (test_formats_and_plans.py) assert what the plan
LOOKS like; these assert what a query actually MOVED, read from the
executed plan's SQLMetrics via ``plans.audit.collect_with_metrics``:

- a dimension join broadcasts → ZERO shuffle bytes, measured;
- partial aggregation (map-side combine) works → the shuffle carries
  orders of magnitude fewer records than the scan produced;
- hot catalog queries stay under calibrated shuffle-count caps, so an
  accidental extra Exchange (a lost broadcast, a misaligned
  partitioning) fails a test instead of shipping as a silent 100 TB
  regression.

Caveat (documented, inherent): a query that internally materializes via
``localCheckpoint``/``persist`` (d03, d07, p01) executes part of its
work during the checkpoint action; only the post-checkpoint plan is
metered here. Their internal shuffle structure is covered by the
plan-shape tests instead.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.plans.audit import (
    collect_with_metrics,
    executed_metrics,
)
from nyc_taxi_data_warehouse_spark.queries import QUERIES


def _run(spark, sf_dir, name):
    return collect_with_metrics(QUERIES[name].spark(spark, sf_dir))


def test_broadcast_dim_join_moves_zero_shuffle_bytes(spark, sf_dir):
    """lineitem ⋈ broadcast(orders-keys) must not shuffle either side —
    measured on the executed plan, not inferred from its text."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    j = li.join(
        F.broadcast(orders.select("o_orderkey")),
        li.l_orderkey == F.col("o_orderkey"),
    ).select("l_orderkey")
    m = collect_with_metrics(j)
    assert m["n_shuffles"] == 0
    assert m["shuffle_bytes_written"] == 0


def test_partial_aggregation_collapses_shuffle_records(spark, sf_dir):
    """q01's groupBy must combine map-side: the shuffle carries one
    partial row per (partition × group), not one per input row. At
    sf0.001 the scan produces 6000 lineitem rows; anything near that
    count in the shuffle means partial aggregation silently vanished."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_input = li.count()
    m = _run(spark, sf_dir, "q01_pricing_summary")
    assert m["shuffle_records_written"] > 0
    assert m["shuffle_records_written"] < n_input / 10


# Calibrated on local[4], shuffle_partitions=4, sf0.001 (see the audit
# tool's SHUFFLES.json for the full catalog). Caps are the measured
# shuffle COUNT — byte caps at this scale would be noise-brittle, while
# an extra Exchange is exactly the regression class worth catching.
SHUFFLE_COUNT_CAPS = {
    "q01_pricing_summary": 2,  # partial+final agg pair after AQE
    "q05_local_supplier_volume": 1,  # every dim join broadcasts; 1 agg
    "q38_salted_supplier_revenue": 2,  # salted partial + unsalted final
    "t02_quality_scores": 1,  # per-doc scoring: 1 ranking exchange
    "e01_cosine_topk": 3,  # EXACTLY: corpus spread() round-robin (r11;
    #   fires only on the single-row-group fixture, no-op at scale) +
    #   top-k rank + output merge — the +1 over the r10 cap of 2 is the
    #   spread exchange and nothing else; a 4th exchange is a regression
    "e05_ann_topk_probe": 3,  # corpus spread() + bucket-join + top-k
    #   merge — same +1-for-spread accounting as e01
    "d06_embedding_near_dup": 2,  # LSH bucket self-join + the scalar
    #   hot-bucket-count aggregation of the skew guard (bucket ids and
    #   partial counts only — vectors never enter the guard's shuffle)
    "p03_sequence_packing": 3,  # ints-only plan + group shuffle + order
    "a01_asof_purchase_view": 2,  # ONE key shuffle for the as-of + output sort
    "q56_funnel_stages": 2,  # one user hash exchange + tiny global rollup
    "q21_sessionize": 2,  # one user-window exchange + output sort
    "d07_dup_clusters": 2,  # post-checkpoint label join (internal rounds
    #                          are plan-audited; see module docstring)
    "q40_daily_from_hourly_rollup": 3,  # hourly agg + daily agg + sort
}


@pytest.mark.parametrize("name", sorted(SHUFFLE_COUNT_CAPS))
def test_hot_query_shuffle_count_capped(spark, sf_dir, name):
    m = _run(spark, sf_dir, name)
    cap = SHUFFLE_COUNT_CAPS[name]
    assert m["n_shuffles"] <= cap, (
        f"{name} executed {m['n_shuffles']} shuffles (cap {cap}) — "
        f"an Exchange crept into the plan; metrics: {m}"
    )
    assert m["spill_bytes"] == 0, f"{name} spilled at sf0.001: {m}"


def test_executed_metrics_requires_no_rerun(spark, sf_dir):
    """executed_metrics reads metrics populated by a prior collect() on
    the SAME DataFrame — the zero-cost path for tests that already ran
    the query."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    d = li.groupBy("l_linestatus").count()
    d.collect()
    m = executed_metrics(d)
    assert m["n_shuffles"] == 1
    assert m["shuffle_records_written"] > 0


def test_window_spill_path_is_correct_and_metered(spark, sf_dir):
    """Spill-awareness, measured: force the window operator onto its
    spill path (4-row in-memory buffer) and prove (a) the executed plan
    reports spill activity, (b) the spilled execution returns exactly
    the no-spill answer. At 100 TB spills WILL happen; correctness must
    not depend on staying in memory. Raw spillSize magnitudes are not
    asserted — per-task sentinel offsets inflate the raw accumulator —
    only presence."""
    from pyspark.sql.window import Window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")

    def run():
        return (
            orders.withColumn("rn", F.row_number().over(w))
            .groupBy()
            .agg(F.sum("rn").alias("s"))
        )

    base = run().collect()[0]["s"]
    prior = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.windowExec.buffer.spill.threshold",
            "spark.sql.windowExec.buffer.in.memory.threshold",
        )
    }
    try:
        spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", "4")
        spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "4")
        q = run()
        assert q.collect()[0]["s"] == base
        m = executed_metrics(q)
        assert m["spill_bytes"] > 0, f"window never spilled: {m}"
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_scaling_claim_is_generated_and_adjudicated():
    """The SURVEY/README scaling claim is GENERATED from the checked-in
    audit artifacts, never hand-maintained (r4 worklist: the prose went
    stale). This pins the adjudication: no GENUINE super-linear
    shuffle-byte growth across scale factors, every flagged delta
    carries a mechanical classification, and the committed SCALING.json
    claim text matches what the classifier derives from the committed
    artifacts — a regression flips this test, not just the prose."""
    import json
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "tools"))
    try:
        from shuffle_audit import classify_scaling
    finally:
        sys.path.pop(0)

    small = json.load(open(os.path.join(root, "SHUFFLES.json")))["queries"]
    big = json.load(open(os.path.join(root, "SHUFFLES_sf01.json")))["queries"]
    res = classify_scaling(small, big, factor=10.0)
    assert res["per_query"], "no comparable queries — artifacts broken"
    genuine = {
        q: r for q, r in res["super_linear"].items() if r["class"] == "genuine"
    }
    assert not genuine, f"genuine super-linear shuffle growth: {genuine}"
    assert not res["spills"], f"spills appeared: {res['spills']}"
    committed = json.load(open(os.path.join(root, "SCALING.json")))
    assert committed["claim"] == res["claim"], (
        "SCALING.json is stale — regenerate with "
        "`python tools/shuffle_audit.py --scaling SHUFFLES.json "
        "SHUFFLES_sf01.json --factor 10 --claim-out SCALING.json`"
    )


def test_classify_scaling_handles_vanished_shuffle():
    """A query whose shuffle exists at the small SF but disappears at
    the big one (AQE broadcast crossover eliminating the exchange)
    yields ratio 0.0 — the worst-linear tracker must not TypeError on
    the tie against its seed, and the query classifies as linear."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "shuffle_audit",
        os.path.join(os.path.dirname(__file__), "..", "tools", "shuffle_audit.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    small = {
        "q_gone": {"shuffle_bytes_written": 8192, "n_shuffles": 1,
                   "shuffle_records_written": 10},
        "q_live": {"shuffle_bytes_written": 8192, "n_shuffles": 1,
                   "shuffle_records_written": 10},
    }
    big = {
        "q_gone": {"shuffle_bytes_written": 0, "n_shuffles": 0,
                   "shuffle_records_written": 0},
        "q_live": {"shuffle_bytes_written": 40960, "n_shuffles": 1,
                   "shuffle_records_written": 50},
    }
    res = mod.classify_scaling(small, big, factor=10)
    assert res["worst_linear"]["query"] == "q_live"
    assert res["super_linear"] == {}
    assert "q_gone" in res["per_query"]
