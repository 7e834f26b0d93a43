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
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune
from ..schema import TESTDATA_TABLES

# Per-session cache of the LAZY scan DataFrame for each (sf_dir, table).
# Every spark.read.parquet() call costs a driver-side file listing plus a
# footer read for schema inference (~0.1 s against local parquet) — pure
# per-query fixed overhead when the same immutable fixture table is
# loaded by hundreds of query builds in one process (guide §1.2: reduce
# driver round-trips before touching the plans). This caches ONLY the
# unexecuted plan/schema handle — the exact metadata Spark's own catalog
# keeps for a registered table — never rows: every action on the
# returned DataFrame still scans the parquet files. Keyed weakly on the
# SparkSession so a stopped session's handles are dropped with it.
_SCAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


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
    """Load one synthetic table; normalizes the events timestamp.

    The scan handle is cached per (session, sf_dir, table) — see
    ``_SCAN_CACHE``; the fixture tables are immutable, so the cached
    plan can never go stale."""
    tune(spark)
    per = _SCAN_CACHE.setdefault(spark, {})
    key = (os.path.abspath(sf_dir), name)
    df = per.get(key)
    if df is None:
        path = os.path.join(sf_dir, f"{name}.parquet")
        df = _events(spark, path) if name == "events" else spark.read.parquet(path)
        per[key] = df
    return df


def register_testdata(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """Register every synthetic table as a temp view (idempotent).

    Temp views keep the scan lazy — Catalyst still sees the parquet
    relation, so filter pushdown / column pruning reach the files.
    """
    for name in tables or TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
