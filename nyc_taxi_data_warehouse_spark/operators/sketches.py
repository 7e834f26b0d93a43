"""Mergeable sketches in LONG-ROW form — count-min and log-histogram.

``warehouse/rollup.py`` carries distinct counts through rollups as HLL
binaries (Spark's built-in mergeable sketch). Two more rollup-survivable
quantities have no built-in mergeable form in Spark SQL:

- **item frequency** ("how often did THIS url/user/term appear") —
  ``count_min_sketch`` exists as an aggregate but its binary has no SQL
  merge or lookup function;
- **value quantiles** — ``percentile_approx`` merges internally but
  cannot be persisted per-hour and re-merged per-day.

Both are represented here as PLAIN ROWS instead of opaque binaries:

    CMS:        (row, col, cnt)      depth x width counters
    log-hist:   (bucket, cnt)        log-spaced value buckets

A sketch-as-rows is mergeable with ``groupBy().sum()`` — the most
battle-tested operation Spark has — so merging N partial sketches is
exact by construction (integer sums, associative), works in ANY SQL
engine, needs no UDF/UDAF, and the rollup tables stay queryable with
ordinary SQL. Size is bounded: depth*width rows per CMS group and
O(log(max/min)/log(1+eps)) buckets per histogram group — metadata-sized
next to the raw data, exactly like the HLL column.

Estimates carry the standard guarantees: CMS never under-counts and
over-counts by <= eps*N with probability 1-delta (eps = e/width,
delta = e^-depth); the log-histogram's quantiles have bounded RELATIVE
value error (each bucket spans a (1+2*gamma) value ratio).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cms_cols(item, depth: int, width: int):
    """depth (row, col) pairs per item: row i uses xxhash64 seeded by a
    distinct literal — the k-independent-hash stand-in Spark can
    evaluate JVM-side."""
    return [
        (i, F.pmod(F.xxhash64(F.lit(i), item), F.lit(width)).cast("int"))
        for i in range(depth)
    ]


def cms_build(
    df: DataFrame,
    item_col: str,
    group_cols: list[str] | None = None,
    depth: int = 5,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch rows ``(*group_cols, row, col, cnt)`` — one
    sketch per group (e.g. per hour for a rollup). ``weight_col`` counts
    each item that many times (default 1)."""
    group_cols = group_cols or []
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    pairs = F.array(
        *[
            F.struct(F.lit(i).alias("row"), c.alias("col"))
            for i, c in _cms_cols(F.col(item_col), depth, width)
        ]
    )
    return (
        df.select(*group_cols, F.explode(pairs).alias("p"), w.alias("_w"))
        .groupBy(*group_cols, F.col("p.row").alias("row"), F.col("p.col").alias("col"))
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(sketch: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge sketches (drop or coarsen group columns upstream, then
    call this): plain re-sum per counter — exact, associative."""
    group_cols = group_cols or []
    return sketch.groupBy(*group_cols, "row", "col").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_lookup(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 5,
    width: int = 256,
) -> DataFrame:
    """Frequency estimate per item: min over the depth counters the
    item hashes to (absent counter = 0). The sketch side is
    depth*width rows — broadcast — so lookups are one narrow join."""
    pairs = F.array(
        *[
            F.struct(F.lit(i).alias("row"), c.alias("col"))
            for i, c in _cms_cols(F.col(item_col), depth, width)
        ]
    )
    probes = items.select(item_col, F.explode(pairs).alias("p")).select(
        item_col, F.col("p.row").alias("row"), F.col("p.col").alias("col")
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


# ---------------------------------------------------------------------------
# Log-spaced histogram: mergeable value-distribution sketch
# ---------------------------------------------------------------------------


def _bucket(value, gamma: float):
    """Positive values -> log bucket; zero/negative and null -> sentinel
    buckets (-1, -2) so the distribution survives intact."""
    logg = math.log(gamma)
    return (
        F.when(value.isNull(), F.lit(-2))
        .when(value <= 0, F.lit(-1))
        .otherwise(F.ceil(F.log(value.cast("double")) / F.lit(logg)).cast("int"))
    )


def loghist_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    gamma: float = 1.02,
) -> DataFrame:
    """Histogram rows ``(*group_cols, bucket, cnt)``: bucket b covers
    (gamma^(b-1), gamma^b]. gamma=1.02 gives ~1% relative value error
    and ~1160 buckets per decade-spanning distribution."""
    group_cols = group_cols or []
    return (
        df.select(*group_cols, _bucket(F.col(value_col), gamma).alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def loghist_merge(
    hist: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    group_cols = group_cols or []
    return hist.groupBy(*group_cols, "bucket").agg(F.sum("cnt").alias("cnt"))


def loghist_quantiles(
    hist: DataFrame,
    probs: list[float],
    group_cols: list[str] | None = None,
    gamma: float = 1.02,
) -> DataFrame:
    """Quantile estimates from a (merged) histogram: walk the buckets
    in order per group, report the upper edge of the bucket where the
    cumulative count crosses p * total. Nulls are excluded from the
    rank (SQL percentile semantics); non-positive values report 0.

    One window pass over bucket rows (metadata-sized), never the raw
    data — the point of carrying the sketch through the rollup."""
    from pyspark.sql.window import Window

    group_cols = group_cols or []
    ranked = hist.where(F.col("bucket") != -2)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy(*group_cols)
    ranked = ranked.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "total", F.sum("cnt").over(wtot)
    )
    # bucket rows x probs (both metadata-sized): first bucket whose
    # cumulative count reaches ceil(p * total) per (group, p)
    crossed = ranked.select(
        *group_cols,
        "bucket",
        "cum",
        "total",
        F.explode(F.array(*[F.lit(p) for p in probs])).alias("p"),
    ).where(F.col("cum") >= F.ceil(F.col("p") * F.col("total")))
    return (
        crossed.groupBy(*group_cols, "p")
        .agg(F.min("bucket").alias("bucket"))
        .select(
            *group_cols,
            "p",
            F.when(F.col("bucket") == -1, F.lit(0.0))
            .otherwise(F.pow(F.lit(gamma), F.col("bucket")))
            .alias("value"),
        )
    )
