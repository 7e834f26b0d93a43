"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL over the same parquet, normalizes
both results (columns sorted by name, rows sorted by all columns), and
compares cell values strictly: exact for ints/strings/timestamps/decimals,
exact-or-1-ulp for floats (so a genuine semantic bug can't hide behind a
tolerance, while engine-level FP formatting noise can't cause flakes).
"""

from __future__ import annotations

import decimal
import math
import os

import duckdb
import pandas as pd

TABLES = [
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


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # array cells (numpy arrays / lists) are unhashable for sort
            df[c] = df[c].map(
                lambda v: tuple(v.tolist())
                if hasattr(v, "tolist") and not isinstance(v, (str, bytes))
                else tuple(v)
                if isinstance(v, list)
                else v
            )
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _cell_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and (b is None or (isinstance(b, float) and math.isnan(b))):
        return math.isnan(a) if b is None or math.isnan(b) else False
    if isinstance(a, decimal.Decimal) or isinstance(b, decimal.Decimal):
        try:
            return decimal.Decimal(str(a)) == decimal.Decimal(str(b))
        except Exception:
            return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-12)
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(spark_df, duck_df: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    errors: list[str] = []
    sp = normalize(spark_df.toPandas())
    du = normalize(duck_df)
    if list(sp.columns) != list(du.columns):
        return [f"{name}: column mismatch spark={list(sp.columns)} duck={list(du.columns)}"]
    if len(sp) != len(du):
        return [f"{name}: row count spark={len(sp)} duck={len(du)}"]
    for col in sp.columns:
        a_vals, b_vals = sp[col].tolist(), du[col].tolist()
        bad = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(a_vals, b_vals))
            if not _cell_equal(_norm_cell(a), _norm_cell(b))
        ]
        if bad:
            i, a, b = bad[0]
            errors.append(
                f"{name}.{col}: {len(bad)}/{len(a_vals)} cells differ; "
                f"first at row {i}: spark={a!r} duck={b!r}"
            )
    return errors


def _norm_cell(v):
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return v.item()
        if isinstance(v, np.ndarray):
            return tuple(_norm_cell(x) for x in v.tolist())
    except ImportError:
        pass
    return v


def run_pair(spark, sf_dir: str, name: str) -> list[str]:
    from nyc_taxi_data_warehouse_spark.queries import QUERIES

    q = QUERIES[name]
    spark_df = q.spark(spark, sf_dir)
    if q.oracle is None:
        n = spark_df.count()
        return [] if n >= 0 else [f"{name}: no rows"]
    con = duck_connection(sf_dir)
    try:
        duck_df = con.execute(q.oracle).df()
    finally:
        con.close()
    return compare(spark_df, duck_df, name)
