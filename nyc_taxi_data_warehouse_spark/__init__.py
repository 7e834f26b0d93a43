"""nyc_taxi_data_warehouse_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
``diogovalentte/nyc_taxi_data_warehouse`` reference pipeline (Airflow + EMR
PySpark + Redshift), re-expressed Spark-first: Spark SQL is both the ETL
engine and the warehouse query surface.

Layout:
- ``session``    — SparkSession factory tuned for scale (AQE, shuffle sizing).
- ``schema``     — explicit StructTypes (FHVHV warehouse schema + testdata).
- ``sources``    — parquet readers, manifest discovery, table registry.
- ``warehouse``  — idempotent monthly load pipeline + DDL (replaces
  reference's ``data/emr/etl.py`` + ``setup.py`` + Redshift).
- ``queries``    — the declared query catalog (Spark callable + DuckDB
  oracle SQL per query) — the warehouse's SQL surface, testable.
- ``operators``  — dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard)
  and similarity search (cosine top-k, LSH ANN).
- ``functions``  — text analysis + vector math built on pyspark.sql.functions.
- ``streaming``  — Structured Streaming ingest + windowed aggregations.
- ``multimodal`` — binary-column plumbing (decode stubs, mapInPandas).
- ``plans``      — physical-plan audit helpers (pushdown/broadcast asserts).
"""

__version__ = "0.1.0"
