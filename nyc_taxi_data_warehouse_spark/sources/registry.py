"""Table loading + catalog registration for the synthetic test warehouse.

This is the engine's "source" layer over the driver-generated parquet
(``/root/testdata/sf*/``). One quirk is handled here so no query has to
care: ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
vectorized reader rejects outright. We read it as raw nanos
(``spark.sql.legacy.parquet.nanosAsLong``) and convert to a microsecond
TIMESTAMP_NTZ — the same truncation DuckDB applies, so both engines see
identical wall-clock values.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune
from ..schema import TESTDATA_TABLES


def _events(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        # nanos since epoch → microsecond timestamp, then reinterpret the
        # UTC instant as a wall-clock TIMESTAMP_NTZ (session tz is UTC).
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table; normalizes the events timestamp."""
    tune(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _events(spark, path)
    return spark.read.parquet(path)


def register_testdata(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """Register every synthetic table as a temp view (idempotent).

    Temp views keep the scan lazy — Catalyst still sees the parquet
    relation, so filter pushdown / column pruning reach the files.
    """
    for name in tables or TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
