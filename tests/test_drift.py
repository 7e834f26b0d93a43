"""Distribution-drift reporting (operators/drift.py): PSI agrees with
a local recompute; identical snapshots score ~0; a shifted column is
flagged above the standard threshold while a stable one stays below."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.drift import drift_report
from nyc_taxi_data_warehouse_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_identical_snapshots_score_zero(spark):
    ev = load_table(spark, SF, "events").select("value", "user_id")
    rep = drift_report(ev, ev, ["value", "user_id"])
    for r in rep:
        assert r["psi"] < 1e-9, r


def test_shift_flagged_stable_not(spark):
    ev = load_table(spark, SF, "events").select("event_id", "value", "user_id")
    ref = ev.where("event_id % 2 = 0")
    # current: value doubled (a decisive shift), user_id untouched
    cur = ev.where("event_id % 2 = 1").withColumn(
        "value", F.col("value") * 2.0
    )
    rep = {r["column"]: r for r in drift_report(ref, cur, ["value", "user_id"])}
    assert rep["value"]["psi"] > 0.25, rep["value"]["psi"]
    assert rep["user_id"]["psi"] < 0.1, rep["user_id"]["psi"]
    # report is sorted by descending PSI
    ordered = drift_report(ref, cur, ["user_id", "value"])
    assert ordered[0]["column"] == "value"


def test_psi_matches_local_recompute(spark):
    ev = load_table(spark, SF, "events").select("event_id", "value")
    ref = ev.where("event_id < 500")
    cur = ev.where("event_id >= 500")
    [rep] = drift_report(ref, cur, ["value"], n_buckets=5)

    bounds = sorted(
        set(
            ref.select(F.col("value").cast("double").alias("_q")).approxQuantile(
                "_q", [i / 5 for i in range(1, 5)], 0.001
            )
        )
    )

    def bucketize(rows):
        counts: dict[int, int] = {}
        for (v,) in rows:
            b = -1 if v is None else sum(1 for x in bounds if v >= x)
            counts[b] = counts.get(b, 0) + 1
        return counts

    rc = bucketize(ref.select("value").collect())
    cc = bucketize(cur.select("value").collect())
    n_r, n_c = sum(rc.values()), sum(cc.values())
    psi = 0.0
    for b in sorted(set(rc) | set(cc)):
        rf = max(rc.get(b, 0) / n_r, 1e-6)
        cf = max(cc.get(b, 0) / n_c, 1e-6)
        psi += (cf - rf) * math.log(cf / rf)
    assert abs(rep["psi"] - psi) < 1e-6


def test_null_rate_shift_is_drift(spark):
    base = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 100).cast("double").alias("x")
    )
    ref = base
    cur = base.withColumn(
        "x", F.when(F.col("id") % 3 == 0, None).otherwise(F.col("x"))
    )
    [rep] = drift_report(ref, cur, ["x"])
    assert rep["psi"] > 0.25
    null_bucket = next(b for b in rep["buckets"] if b["bucket"] == -1)
    assert null_bucket["cur_frac"] > 0.3 and null_bucket["ref_frac"] <= 1e-6


def test_cli_drift_exit_codes(spark, tmp_path):
    """drift exits 0 when stable, 1 when any column crosses PSI 0.25 —
    the scheduler-friendly gate shape."""
    from nyc_taxi_data_warehouse_spark.__main__ import main

    cli = lambda *a: main(list(a), spark=spark)  # noqa: E731
    ev = load_table(spark, SF, "events").select("event_id", "value")
    ref_p, cur_ok, cur_bad = (str(tmp_path / d) for d in ("ref", "ok", "bad"))
    ev.where("event_id % 2 = 0").write.parquet(ref_p)
    ev.where("event_id % 2 = 1").write.parquet(cur_ok)
    ev.where("event_id % 2 = 1").withColumn(
        "value", F.col("value") * 2.0
    ).write.parquet(cur_bad)
    assert cli("drift", "--reference", ref_p, "--current", cur_ok, "--columns", "value") == 0
    assert cli("drift", "--reference", ref_p, "--current", cur_bad, "--columns", "value") == 1
