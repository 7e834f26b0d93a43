"""Mergeable row-form sketches (operators/sketches.py): CMS guarantees
(never under-counts, bounded over-count, exact merge), log-histogram
quantile relative-error bounds, and rollup-style merge parity on the
events fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.sketches import (
    cms_build,
    cms_lookup,
    cms_merge,
    loghist_build,
    loghist_merge,
    loghist_quantiles,
)
from nyc_taxi_data_warehouse_spark.sources import load_table

SF = "/root/testdata/sf0.001"
DEPTH, WIDTH = 5, 256


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events")


def test_cms_never_undercounts_and_bounds_overcount(spark, events):
    sketch = cms_build(events, "user_id", depth=DEPTH, width=WIDTH)
    truth = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = cms_lookup(sketch, truth.select("user_id"), "user_id",
                     depth=DEPTH, width=WIDTH)
    joined = est.join(truth, "user_id").collect()
    assert joined
    n_total = events.count()
    eps_bound = 2.72 * n_total / WIDTH  # e/width * N
    for r in joined:
        assert r.est >= r.true_cnt, (r.user_id, r.est, r.true_cnt)
        assert r.est - r.true_cnt <= eps_bound


def test_cms_absent_item_estimates_small(spark, events):
    sketch = cms_build(events, "user_id", depth=DEPTH, width=WIDTH)
    ghosts = spark.createDataFrame(
        [(10_000_000 + i,) for i in range(20)], "user_id long"
    )
    n_total = events.count()
    est = cms_lookup(sketch, ghosts, "user_id", depth=DEPTH, width=WIDTH)
    for r in est.collect():
        assert r.est <= 2.72 * n_total / WIDTH


def test_cms_hourly_merge_equals_direct_build(spark, events):
    """The rollup contract: per-hour sketches summed into one sketch
    are EXACTLY the sketch built from all rows at once (integer sums,
    associative) — not just approximately."""
    hourly = cms_build(
        events.withColumn("hour", F.date_trunc("hour", "ts")),
        "user_id",
        group_cols=["hour"],
        depth=DEPTH,
        width=WIDTH,
    )
    merged = cms_merge(hourly.drop("hour"))
    direct = cms_build(events, "user_id", depth=DEPTH, width=WIDTH)
    diff = merged.join(direct, ["row", "col"], "full").where(
        F.coalesce(merged.cnt, F.lit(0)) != F.coalesce(direct.cnt, F.lit(0))
    )
    assert diff.count() == 0


def test_cms_weighted_counts(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 2), ("b", 7)], "item string, w int"
    )
    sketch = cms_build(df, "item", depth=DEPTH, width=WIDTH, weight_col="w")
    est = {
        r.item: r.est
        for r in cms_lookup(
            sketch, df.select("item").distinct(), "item",
            depth=DEPTH, width=WIDTH,
        ).collect()
    }
    assert est["a"] >= 5 and est["b"] >= 7
    assert est["a"] + est["b"] <= 12 + 2 * 2.72 * 12 / WIDTH


def test_loghist_quantiles_within_relative_error(spark, events):
    gamma = 1.02
    hist = loghist_build(events.where("value > 0"), "value", gamma=gamma)
    got = {
        r.p: r.value
        for r in loghist_quantiles(hist, [0.5, 0.9, 0.99], gamma=gamma).collect()
    }
    exact = (
        events.where("value > 0")
        .agg(
            F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("q")
        )
        .collect()[0]["q"]
    )
    for p, true_v in zip([0.5, 0.9, 0.99], exact):
        # bucket upper edge is within one gamma step above a value <=
        # the true quantile neighborhood: relative error <= ~2*gamma-1
        assert got[p] / true_v < gamma**2, (p, got[p], true_v)
        assert got[p] / true_v > 1 / gamma**2, (p, got[p], true_v)


def test_loghist_merge_equals_direct_and_handles_sentinels(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (1, -5.0), (1, None), (2, 1000.0), (2, 0.0)],
        "g int, value double",
    )
    per_g = loghist_build(df, "value", group_cols=["g"])
    merged = loghist_merge(per_g.drop("g"))
    direct = loghist_build(df, "value")
    diff = merged.join(direct, ["bucket"], "full").where(
        F.coalesce(merged.cnt, F.lit(0)) != F.coalesce(direct.cnt, F.lit(0))
    )
    assert diff.count() == 0
    buckets = {r.bucket: r.cnt for r in direct.collect()}
    assert buckets[-2] == 1  # null
    assert buckets[-1] == 2  # non-positive
    # nulls excluded from ranks; p=1.0 lands on the largest value bucket
    q = loghist_quantiles(direct, [1.0]).collect()[0]
    assert abs(q.value - 1000.0) / 1000.0 < 0.03


def test_loghist_grouped_quantiles(spark, events):
    gamma = 1.02
    hourly = loghist_build(
        events.where("value > 0").withColumn(
            "day", F.date_trunc("day", "ts")
        ),
        "value",
        group_cols=["day"],
        gamma=gamma,
    )
    q = loghist_quantiles(hourly, [0.5], group_cols=["day"], gamma=gamma)
    rows = q.collect()
    days = events.where("value > 0").select(
        F.date_trunc("day", "ts").alias("day")
    ).distinct().count()
    assert len(rows) == days
    assert all(r.value > 0 for r in rows)
