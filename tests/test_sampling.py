"""Deterministic weighted / mixture sampling (operators/sampling.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.sampling import (
    apportion,
    mixture_sample,
    weighted_sample,
)
from nyc_taxi_data_warehouse_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "lang", "n_chars")


def test_weighted_sample_exact_k_and_deterministic(spark):
    d = _docs(spark).withColumn("w", F.col("n_chars").cast("double"))
    s1 = weighted_sample(d, 50, "w", "doc_id", seed=7)
    ids1 = sorted(r.doc_id for r in s1.collect())
    assert len(ids1) == 50
    assert len(set(ids1)) == 50
    # same seed, different partitioning -> identical selection
    s2 = weighted_sample(d.repartition(13), 50, "w", "doc_id", seed=7)
    assert sorted(r.doc_id for r in s2.collect()) == ids1
    # different seed -> different selection
    s3 = weighted_sample(d, 50, "w", "doc_id", seed=8)
    assert sorted(r.doc_id for r in s3.collect()) != ids1


def test_weighted_sample_matches_local_top_k(spark):
    """The distributed TakeOrdered selection equals a local recompute of
    the same A-ES scores — proves limit() really takes the top-k of the
    score, not an arbitrary k."""
    d = _docs(spark).withColumn("w", (F.col("doc_id") % 7 + 1).cast("double"))
    picked = sorted(
        r.doc_id for r in weighted_sample(d, 30, "w", "doc_id", seed=3).collect()
    )
    rows = d.withColumn(
        "u",
        (F.abs(F.xxhash64("doc_id", F.lit(3))).cast("double") + 1.0)
        / float((1 << 63) + 2),
    ).collect()
    local = sorted(
        (r.doc_id for r in rows), key=lambda i: -next(
            math.log(r.u) / r.w for r in rows if r.doc_id == i
        )
    )[:30]
    assert picked == sorted(local)


def test_weighted_sample_respects_weights(spark):
    """Rows weighted 50x are (deterministically, for this seed) far
    overrepresented vs weight-1 rows in a half-size sample."""
    d = _docs(spark).withColumn(
        "w", F.when(F.col("doc_id") % 10 == 0, 50.0).otherwise(1.0)
    )
    n = d.count()
    heavy_total = d.where("doc_id % 10 = 0").count()
    s = weighted_sample(d, n // 2, "w", "doc_id", seed=1)
    heavy_sampled = s.where("doc_id % 10 = 0").count()
    # heavy rows are 10% of the population; with 50x weight they must
    # nearly all be selected, far above their population share
    assert heavy_sampled > 0.9 * heavy_total
    assert s.count() == n // 2


def test_weighted_sample_excludes_nonpositive_weights(spark):
    d = _docs(spark).withColumn(
        "w", F.when(F.col("doc_id") % 2 == 0, 1.0).otherwise(0.0)
    )
    s = weighted_sample(d, 1000000, "w", "doc_id", seed=0)
    assert s.where("doc_id % 2 = 1").count() == 0


def test_apportion_sums_exactly():
    counts = apportion({"web": 6, "code": 3, "books": 1}, 100)
    assert counts == {"web": 60, "code": 30, "books": 10}
    counts = apportion({"a": 1, "b": 1, "c": 1}, 100)
    assert sum(counts.values()) == 100
    assert sorted(counts.values()) == [33, 33, 34]
    with pytest.raises(ValueError):
        apportion({"a": 0.0}, 10)


def test_mixture_sample_exact_quotas_and_deterministic(spark):
    d = _docs(spark)
    weights = {"en": 5, "es": 3, "de": 2}
    n = 100
    s = mixture_sample(d, "lang", weights, n, "doc_id", seed=11)
    got = {r.lang: r.n for r in s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == apportion(weights, n)
    # deterministic under repartitioning and salt granularity
    s2 = mixture_sample(
        d.repartition(17), "lang", weights, n, "doc_id", seed=11, salt_partitions=8
    )
    assert sorted(r.doc_id for r in s2.collect()) == sorted(
        r.doc_id for r in s.collect()
    )
    # excluded domain never appears
    assert s.where(~F.col("lang").isin(*weights)).count() == 0


def test_mixture_sample_caps_at_domain_size_without_redistribution(spark):
    d = _docs(spark)
    n_de = d.where("lang = 'de'").count()
    weights = {"en": 1, "de": 99}  # demands far more 'de' than exists
    n = n_de * 10
    s = mixture_sample(d, "lang", weights, n, "doc_id", seed=0)
    got = {r.lang: r.n for r in s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    quotas = apportion(weights, n)
    assert got["de"] == n_de  # everything it has
    assert got["en"] == quotas["en"]  # quota honored, shortfall NOT moved


def test_weighted_sample_plans_take_ordered(spark):
    """The selection must plan TakeOrderedAndProject (per-partition
    top-k + driver merge of partitions x k rows) — a global Sort+Limit
    here would be a 100 TB scale-killer."""
    d = _docs(spark).withColumn("w", F.col("n_chars").cast("double"))
    plan = (
        weighted_sample(d, 50, "w", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


# pure-python property tests (no Spark session needed)
from hypothesis import given, strategies as st  # noqa: E402


@given(
    st.dictionaries(
        st.text(min_size=1, max_size=8),
        st.floats(min_value=0.001, max_value=1000.0, allow_nan=False),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=0, max_value=10_000_000),
)
def test_apportion_properties(weights, n):
    counts = apportion(weights, n)
    assert sum(counts.values()) == n
    assert set(counts) == set(weights)
    assert all(c >= 0 for c in counts.values())
    # each count within 1 of its exact quota (largest-remainder bound)
    total_w = sum(weights.values())
    for d, c in counts.items():
        assert abs(c - n * weights[d] / total_w) < 1 + 1e-9


def test_samplers_on_degenerate_inputs(spark):
    """Empty and single-row corpora: exact shapes, no errors — the same
    degenerate gate the catalog queries pass."""
    empty = spark.createDataFrame([], "doc_id long, lang string, w double")
    assert weighted_sample(empty, 5, "w", "doc_id").count() == 0
    assert mixture_sample(empty, "lang", {"en": 1}, 5, "doc_id").count() == 0

    one = spark.createDataFrame([(1, "en", 2.0)], "doc_id long, lang string, w double")
    got = weighted_sample(one, 5, "w", "doc_id").collect()
    assert [r.doc_id for r in got] == [1]
    got = mixture_sample(one, "lang", {"en": 1}, 5, "doc_id").collect()
    assert [r.doc_id for r in got] == [1]


def test_weighted_sample_large_k_path_equals_take_ordered(spark):
    """The threshold-band path (forced via a tiny take_ordered_limit)
    must select the exact same rows as the TakeOrdered path — same
    scores, same tie-break, different physical strategy only."""
    d = _docs(spark).withColumn("w", (F.col("doc_id") % 9 + 1).cast("double"))
    for k in (50, 200, 400):
        small = weighted_sample(d, k, "w", "doc_id", seed=5)
        large = weighted_sample(
            d, k, "w", "doc_id", seed=5, take_ordered_limit=10
        )
        assert sorted(r.doc_id for r in large.collect()) == sorted(
            r.doc_id for r in small.collect()
        )
        assert large.count() == k


def test_weighted_sample_large_k_exceeding_population(spark):
    d = _docs(spark).withColumn("w", F.lit(1.0))
    n = d.count()
    s = weighted_sample(d, n + 100, "w", "doc_id", take_ordered_limit=10)
    assert s.count() == n


def test_mixture_sample_large_quota_path_equals_window_path(spark):
    """The per-domain threshold path (forced via window_quota_limit=1)
    must select exactly the rows the one-pass window path selects."""
    d = _docs(spark)
    weights = {"en": 5, "es": 3, "de": 2}
    a = mixture_sample(d, "lang", weights, 100, "doc_id", seed=11)
    b = mixture_sample(
        d, "lang", weights, 100, "doc_id", seed=11, window_quota_limit=1
    )
    assert sorted(r.doc_id for r in b.collect()) == sorted(
        r.doc_id for r in a.collect()
    )
    assert b.columns == a.columns
    # shortfall cap behaves identically on the large path
    n_de = d.where("lang = 'de'").count()
    big = mixture_sample(
        d, "lang", {"de": 1}, n_de * 5, "doc_id", window_quota_limit=1
    )
    assert big.count() == n_de
