"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query on sf0.001.
``queries()`` — every declared operator/query from SURVEY.md §2 as
``(spark, sf_dir) -> DataFrame`` callables.
``oracle_sql()`` — per-query ANSI SQL for the DuckDB oracle.

The real implementations live in ``nyc_taxi_data_warehouse_spark.queries``;
this module is a thin adapter so the registry stays importable/testable as
a package.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nyc_taxi_data_warehouse_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 6-table star join with broadcast dims (q05) on sf0.001."""
    return QUERIES["q05_local_supplier_volume"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.spark for q in QUERIES.values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in QUERIES.values() if q.oracle is not None}
