"""Data-quality surface: column profiling and constraint checks.

The reference has no validation at all — nulls flow into Redshift and
CHAR(6) silently truncates (`/root/reference/setup.py:81-82`). SURVEY
§1.2 pins the replacement: keep the permissive string type, enforce
domain rules as explicit checks. Both utilities are single-pass
aggregations (one job regardless of column count), so profiling a
100 TB table costs one scan, not one scan per column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format per-column stats: rows, nulls, distincts (exact),
    lexicographic min/max (as strings so one schema fits every type)."""
    cols = columns or [f.name for f in df.schema.fields]
    aggs = []
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(s).alias(f"{c}__min"),
            F.max(s).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"{c}__n").alias("n_rows"),
                        F.col(f"{c}__nulls").alias("n_nulls"),
                        F.col(f"{c}__distinct").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_value"),
                        F.col(f"{c}__max").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.*").orderBy("column")


# Domain rules for the FHVHV fact table (≙ the CHAR(6)/INTEGER domains the
# reference's DDL implies but never enforces). Built lazily — Column
# construction needs an active SparkContext.
def fhvhv_rules() -> dict[str, Column]:
    return {
        "license_num_is_hv_6char": F.col("hvfhs_license_num").rlike(r"^HV\d{4}$"),
        "base_num_is_b_6char": F.col("dispatching_base_num").rlike(r"^B\d{5}$"),
        "pickup_before_dropoff": F.col("pickup_datetime") <= F.col("dropoff_datetime"),
        "pu_zone_in_domain": F.col("pu_location_id").between(1, 265),
        "do_zone_in_domain": F.col("do_location_id").between(1, 265),
        "driver_pay_not_null": F.col("driver_pay").isNotNull(),
    }


def check_constraints(
    df: DataFrame, rules: dict[str, Column] | None = None
) -> DataFrame:
    """Violation counts per rule, one pass. A rule PASSES for a row when
    its predicate is true; null predicates count as violations (unknown
    is not proof of validity)."""
    rules = rules or fhvhv_rules()
    aggs = [
        F.sum((~F.coalesce(pred, F.lit(False))).cast("long")).alias(name)
        for name, pred in rules.items()
    ]
    wide = df.agg(F.count(F.lit(1)).alias("__total"), *aggs)
    return wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col(name).alias("n_violations"),
                        F.col("__total").alias("n_rows"),
                    )
                    for name in rules
                ]
            )
        ).alias("s")
    ).select("s.*").orderBy("rule")
