"""Table profiling (operators/profile.py): stat correctness vs direct
per-column queries, top-value exactness and determinism, one-scan plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.profile import (
    profile_table,
    top_values,
)
from nyc_taxi_data_warehouse_spark.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents")


def test_profile_matches_direct_queries(spark, docs):
    prof = {r.column: r for r in profile_table(docs).collect()}
    n = docs.count()
    assert set(prof) == set(docs.columns)
    for c in docs.columns:
        assert prof[c].n_rows == n
        direct_nulls = docs.where(F.col(c).isNull()).count()
        assert prof[c].n_nulls == direct_nulls
        assert prof[c].null_frac == round(direct_nulls / n, 4)
        mn, mx = docs.agg(
            F.min(F.col(c).cast("string")), F.max(F.col(c).cast("string"))
        ).collect()[0]
        assert (prof[c].min_value, prof[c].max_value) == (mn, mx)
    assert prof["doc_id"].dtype == "bigint"
    # approx ndv within HLL tolerance of the exact count
    exact = docs.select("lang").distinct().count()
    assert abs(prof["lang"].approx_ndv - exact) <= max(1, exact * 0.1)


def test_top_values_exact_and_deterministic(spark, docs):
    tv = top_values(docs, columns=["lang", "source"], k=3)
    rows = tv.collect()
    assert {r.column for r in rows} == {"lang", "source"}
    direct = {
        (r.lang, r.cnt)
        for r in docs.groupBy(F.col("lang")).agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("lang")).limit(3).collect()
    }
    got = {(r.value, r.cnt) for r in rows if r.column == "lang"}
    assert got == direct
    again = {(r.column, r.value, r.rank) for r in
             top_values(docs.repartition(7), columns=["lang", "source"], k=3).collect()}
    assert again == {(r.column, r.value, r.rank) for r in rows}


def test_single_scan_plan(spark, docs):
    plan = profile_table(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 1


def test_empty_and_null_columns(spark):
    empty = spark.createDataFrame([], "a int, b string")
    assert profile_table(empty).count() == 2
    assert top_values(empty).count() == 0
    nulls = spark.createDataFrame([(None,), (None,)], "a string")
    p = profile_table(nulls).collect()[0]
    assert (p.n_rows, p.n_nulls, p.null_frac) == (2, 2, 1.0)
    assert p.min_value is None and p.approx_ndv == 0


def test_profile_cli(spark, tmp_path, capsys):
    import json as _json

    from nyc_taxi_data_warehouse_spark.__main__ import main

    src = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, None)], "id long, v string"
    ).write.parquet(src)
    assert main(["profile", "--src", src, "--top-k", "1"], spark=spark) == 0
    lines = [_json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    prof = {d["column"]: d for d in lines if "n_rows" in d}
    tops = [d for d in lines if "rank" in d]
    assert prof["v"]["n_nulls"] == 1 and prof["id"]["n_rows"] == 3
    assert any(d["column"] == "v" and d["value"] == "x" and d["cnt"] == 2 for d in tops)
