"""Explicit schemas.

The reference infers the source schema from the parquet footer
(``/root/reference/data/emr/etl.py:20``) and fixes the warehouse schema in
Redshift DDL (``/root/reference/setup.py:78-96``). This engine pins BOTH
sides as StructTypes: trust-but-verify on read, fixed DDL on write.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# The 13-column warehouse schema — parity with the Redshift DDL at
# /root/reference/setup.py:80-95 (CHAR(6)→string, FLOAT→double).
FHVHV_WAREHOUSE_SCHEMA = StructType(
    [
        StructField("hvfhs_license_num", StringType()),
        StructField("dispatching_base_num", StringType()),
        StructField("request_datetime", TimestampType()),
        StructField("on_scene_datetime", TimestampType()),
        StructField("pickup_datetime", TimestampType()),
        StructField("dropoff_datetime", TimestampType()),
        StructField("pu_location_id", IntegerType()),
        StructField("do_location_id", IntegerType()),
        StructField("sales_tax", DoubleType()),
        StructField("congestion_surcharge", DoubleType()),
        StructField("airport_fee", DoubleType()),
        StructField("tips", DoubleType()),
        StructField("driver_pay", DoubleType()),
    ]
)

# Source→warehouse column renames (reference: data/emr/etl.py:21-26).
SOURCE_RENAMES: dict[str, str] = {
    "PULocationID": "pu_location_id",
    "DOLocationID": "do_location_id",
}

# Columns expected in the raw TLC file for the 13 we keep. Everything else
# in the (wider) raw file is dropped by projection (etl.py:28-43).
RAW_REQUIRED_COLUMNS = [
    "hvfhs_license_num",
    "dispatching_base_num",
    "request_datetime",
    "on_scene_datetime",
    "pickup_datetime",
    "dropoff_datetime",
    "PULocationID",
    "DOLocationID",
    "sales_tax",
    "congestion_surcharge",
    "airport_fee",
    "tips",
    "driver_pay",
]

# Minimal raw-side schema for the columns we consume (ints arrive as int64
# in the TLC files; the load casts them down — etl.py:23-24).
FHVHV_RAW_SCHEMA = StructType(
    [
        StructField("hvfhs_license_num", StringType()),
        StructField("dispatching_base_num", StringType()),
        StructField("request_datetime", TimestampType()),
        StructField("on_scene_datetime", TimestampType()),
        StructField("pickup_datetime", TimestampType()),
        StructField("dropoff_datetime", TimestampType()),
        StructField("PULocationID", LongType()),
        StructField("DOLocationID", LongType()),
        StructField("sales_tax", DoubleType()),
        StructField("congestion_surcharge", DoubleType()),
        StructField("airport_fee", DoubleType()),
        StructField("tips", DoubleType()),
        StructField("driver_pay", DoubleType()),
    ]
)

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
