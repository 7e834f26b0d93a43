"""Warehouse DDL bootstrap.

Parity with the reference's ``create_db_tables`` (``/root/reference/
setup.py:63-99``), which issues ``CREATE TABLE IF NOT EXISTS fhvhv_tripdata``
against Redshift over psycopg2. Here the warehouse IS Spark: the fact table
is a Spark-managed parquet table partitioned by (year, month) — the
Spark-idiomatic replacement for both the reference's S3 key scheme
(``raw/fhvhv/{year}/...``, save_nyc_data_to_s3.py:36-48) and Redshift
distribution. Partition pruning makes the monthly access pattern a
metadata-only file selection at any scale.

An ``ingest_log`` table replaces the reference's per-file S3 HEAD
existence check (save_nyc_data_to_s3.py:58-78): O(n) API round-trips
become one anti-join.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

FACT_TABLE = "fhvhv_tripdata"
INGEST_LOG = "ingest_log"

_FACT_DDL = f"""
CREATE TABLE IF NOT EXISTS {FACT_TABLE} (
    hvfhs_license_num    STRING,
    dispatching_base_num STRING,
    request_datetime     TIMESTAMP,
    on_scene_datetime    TIMESTAMP,
    pickup_datetime      TIMESTAMP,
    dropoff_datetime     TIMESTAMP,
    pu_location_id       INT,
    do_location_id       INT,
    sales_tax            DOUBLE,
    congestion_surcharge DOUBLE,
    airport_fee          DOUBLE,
    tips                 DOUBLE,
    driver_pay           DOUBLE,
    year                 INT,
    month                INT
)
USING PARQUET
PARTITIONED BY (year, month)
"""

_LOG_DDL = f"""
CREATE TABLE IF NOT EXISTS {INGEST_LOG} (
    source_path STRING,
    year        INT,
    month       INT,
    row_count   BIGINT,
    loaded_at   TIMESTAMP
)
USING PARQUET
"""


def init_warehouse(spark: SparkSession, database: str = "nyc_taxi") -> None:
    """Create database + empty fact and ingest-log tables (idempotent)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    spark.catalog.setCurrentDatabase(database)
    spark.sql(_FACT_DDL)
    spark.sql(_LOG_DDL)
