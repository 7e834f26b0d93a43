"""Format round-trips + physical-plan quality audits.

The plan audits encode the 100 TB design contract mechanically:
filters reach the parquet scan, projections prune the read schema,
dimension joins broadcast, LSH pair generation never degrades to a
cartesian product.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    pushed_filters,
    scan_columns,
)
from nyc_taxi_data_warehouse_spark.queries import QUERIES
from nyc_taxi_data_warehouse_spark.sources import load_table
from nyc_taxi_data_warehouse_spark.sources.formats import read_any, write_any

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_format_round_trip(spark, tmp_path, fmt):
    src = load_table(spark, SF, "orders")
    path = str(tmp_path / f"orders_{fmt}")
    write_any(src, path, fmt)
    back = read_any(spark, path, fmt, src.schema)
    assert back.schema == src.schema
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_filter_pushdown_reaches_scan(spark):
    li = load_table(spark, SF, "lineitem").where(F.col("l_quantity") < 5.0)
    filters = pushed_filters(li)
    assert any("l_quantity" in f for f in filters), filters


def test_projection_prunes_read_schema(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    cols = scan_columns(li)
    assert cols and set(cols[0]) == {"l_orderkey", "l_quantity"}, cols


def test_star_join_broadcasts_dims(spark):
    df = QUERIES["q05_local_supplier_volume"].spark(spark, SF)
    df.count()  # AQE finalizes the physical plan on execution
    assert_broadcast_join(df, n_expected=2)


def test_brand_join_broadcasts(spark):
    df = QUERIES["q07_brand_volume"].spark(spark, SF)
    df.count()
    assert_broadcast_join(df, n_expected=1)


def test_lsh_pair_generation_no_cartesian(spark):
    df = QUERIES["d03_minhash_lsh_pairs"].spark(spark, SF)
    assert_no_cartesian(df)


def test_range_join_no_cartesian(spark):
    df = QUERIES["a02_range_join_bursts"].spark(spark, SF)
    assert_no_cartesian(df)


def test_topk_uses_take_ordered(spark):
    df = QUERIES["q02_top_customers"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]
