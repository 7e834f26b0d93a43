"""Reshaping + extensibility coverage: pivot/unpivot, explode (lateral),
correlated EXISTS subqueries, max_by/min_by ("argmax") aggregates, a
grouped-agg Pandas UDAF, and a Python UDTF — the remaining SURVEY §2.2
categories (UDF/UDAF/UDTF; lateral views; pivoted crosstabs).

Scale notes (100 TB):
- Pivot uses an *explicit* value list — without it Spark runs an extra
  collect-distinct job over the full table before planning.
- The explode query projects only the exploded column + grouping keys, so
  the Parquet scan stays 2 columns wide no matter how wide the table is.
- The UDAF is Arrow-batched (grouped-agg pandas_udf) and its per-group
  arithmetic is integer-exact (cents), so results don't depend on row
  order within a group — a requirement once groups span many partitions.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

from ..sources import load_table
from .registry import register


# ---------------------------------------------------------------------------
# q31 — pivot (crosstab): order counts by status across customer nations
# ---------------------------------------------------------------------------
@register(
    "q31_pivot_status_by_nation",
    oracle="""
SELECT n_name,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
    tags=("pivot", "agg", "join"),
)
def q31_pivot_status_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`groupBy().pivot(col, values).count()` — the explicit value list
    avoids the extra distinct-scan Spark otherwise runs to discover pivot
    columns (matters when the fact table is 100 TB)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    wide = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return wide.select(
        "n_name",
        F.coalesce("F", F.lit(0)).alias("status_f"),
        F.coalesce("O", F.lit(0)).alias("status_o"),
        F.coalesce("P", F.lit(0)).alias("status_p"),
    ).orderBy("n_name")


# ---------------------------------------------------------------------------
# q32 — unpivot (melt): wide per-segment stats back to long form
# ---------------------------------------------------------------------------
@register(
    "q32_unpivot_segment_stats",
    oracle="""
WITH wide AS (
  SELECT c_mktsegment,
         CAST(min(c_acctbal) AS DOUBLE) AS min_bal,
         CAST(max(c_acctbal) AS DOUBLE) AS max_bal,
         CAST(count(*) AS DOUBLE)       AS n_customers
  FROM customer GROUP BY c_mktsegment
)
SELECT c_mktsegment, 'min_bal' AS stat, min_bal AS value FROM wide
UNION ALL
SELECT c_mktsegment, 'max_bal', max_bal FROM wide
UNION ALL
SELECT c_mktsegment, 'n_customers', n_customers FROM wide
ORDER BY c_mktsegment, stat
""",
    tags=("unpivot", "agg"),
)
def q32_unpivot_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`DataFrame.unpivot` (SQL UNPIVOT / melt). min/max/count are exact,
    so the doubles compare bit-identically across engines."""
    c = load_table(spark, sf_dir, "customer")
    wide = c.groupBy("c_mktsegment").agg(
        F.min("c_acctbal").cast("double").alias("min_bal"),
        F.max("c_acctbal").cast("double").alias("max_bal"),
        F.count("*").cast("double").alias("n_customers"),
    )
    return wide.unpivot(
        ids=["c_mktsegment"],
        values=["min_bal", "max_bal", "n_customers"],
        variableColumnName="stat",
        valueColumnName="value",
    ).orderBy("c_mktsegment", "stat")


# ---------------------------------------------------------------------------
# q33 — explode / lateral view: word frequencies over part names
# ---------------------------------------------------------------------------
@register(
    "q33_explode_part_words",
    oracle="""
SELECT w AS word,
       count(*) AS n,
       count(DISTINCT p_brand) AS n_brands
FROM part, unnest(string_split(p_name, ' ')) AS t(w)
GROUP BY w
ORDER BY n DESC, word
""",
    tags=("explode", "lateral", "agg"),
)
def q33_explode_part_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`explode(split(...))` == SQL LATERAL VIEW. Only (p_name, p_brand)
    are projected, so the scan reads 2 of the table's 6 columns."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"), "p_brand")
        .groupBy("word")
        .agg(F.count("*").alias("n"), F.count_distinct("p_brand").alias("n_brands"))
        .orderBy(F.desc("n"), "word")
    )


# ---------------------------------------------------------------------------
# q34 — correlated EXISTS / NOT EXISTS subqueries (SQL surface)
# ---------------------------------------------------------------------------
_Q34_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
ORDER BY c_custkey
"""


@register(
    "q34_exists_subqueries",
    oracle=_Q34_SQL,
    tags=("subquery", "semi-join", "anti-join", "sql"),
)
def q34_exists_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS/NOT EXISTS via `spark.sql` — Catalyst decorrelates
    both into a left-semi and a left-anti hash join (no per-row subquery
    execution), which is exactly the plan you want at scale."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q34_SQL)


# ---------------------------------------------------------------------------
# q35 — max_by / min_by ("argmax") aggregates
# ---------------------------------------------------------------------------
@register(
    "q35_argmax_orders",
    oracle="""
SELECT c_nationkey,
       max_by(o_orderkey, o_totalprice) AS biggest_order,
       CAST(max(o_totalprice) AS DOUBLE) AS biggest_price,
       min_by(o_orderkey, o_totalprice) AS smallest_order,
       CAST(min(o_totalprice) AS DOUBLE) AS smallest_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
    tags=("agg", "argmax"),
)
def q35_argmax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`max_by`/`min_by`: one hash-agg pass instead of the window-rank
    idiom (no shuffle-sort, no second pass). Ties are impossible here —
    o_totalprice values are distinct doubles per nation group."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
            F.max("o_totalprice").cast("double").alias("biggest_price"),
            F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
            F.min("o_totalprice").cast("double").alias("smallest_price"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# q36 — grouped-agg Pandas UDAF: weighted average price per return flag
# ---------------------------------------------------------------------------
@F.pandas_udf(DoubleType())
def _wavg_cents(price: pd.Series, qty: pd.Series) -> float:
    # Integer-cent arithmetic → order-independent, engine-exact result.
    # Null-safe with SQL SUM semantics: the numerator skips rows where
    # EITHER input is null (a null product never enters SUM), the
    # denominator skips only null quantities; an empty numerator or a
    # zero denominator yields NULL (NaN), exactly like the oracle SQL.
    both = price.notna() & qty.notna()
    den = int(qty[qty.notna()].round().astype("int64").sum())
    if not bool(both.any()) or den == 0:
        return float("nan")
    cents = (price[both] * 100).round().astype("int64")
    q = qty[both].round().astype("int64")
    return float((cents * q).sum()) / 100.0 / den


@F.pandas_udf(LongType())
def _row_count(qty: pd.Series) -> int:
    # Spark disallows mixing grouped-agg pandas UDFs with built-in
    # aggregates in one agg(); a UDAF count keeps this a single pass.
    return len(qty)


@register(
    "q36_weighted_avg_udaf",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
             / 100.0 / sum(CAST(round(l_quantity) AS BIGINT)), 6) AS wavg_price,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    tags=("udaf", "pandas_udf", "agg"),
)
def q36_weighted_avg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average extended price via a grouped-agg
    `pandas_udf` (Arrow-batched UDAF). Demonstrates the sanctioned custom-
    aggregate path; the arithmetic is exact-integer so the value matches
    plain SQL digit-for-digit."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(_wavg_cents("l_extendedprice", "l_quantity"), 6).alias("wavg_price"),
            _row_count("l_quantity").alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q37 — Python UDTF: expand each order into monthly horizon rows
# ---------------------------------------------------------------------------
def _make_month_expand_udtf():
    from pyspark.sql.functions import udtf

    @udtf(returnType="month_offset int")
    class MonthExpand:
        """Emit one row per month in a fixed 3-month planning horizon."""

        def eval(self, horizon: int):
            for i in range(horizon):
                yield (i,)

    return MonthExpand


@register(
    "q37_udtf_month_expand",
    oracle="""
SELECT o_orderkey,
       t.m AS month_offset,
       date_trunc('month', o_orderdate) + to_months(t.m) AS horizon_month
FROM orders, unnest([0, 1, 2]) AS t(m)
WHERE o_orderkey < 200
ORDER BY o_orderkey, month_offset
""",
    tags=("udtf", "lateral"),
)
def q37_udtf_month_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 `@udtf`) lateral-joined against orders — the
    table-function extensibility point. The UDTF emits offsets; the
    date arithmetic stays JVM-side (`add_months`) so only tiny ints cross
    the Arrow boundary."""
    month_expand = _make_month_expand_udtf()
    spark.udtf.register("month_expand", month_expand)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    # The key filter sits INSIDE the lateral's left input: the optimizer
    # does not push predicates below BatchEvalPythonUDTF, so the
    # WHERE-after-lateral form ran the Python eval for EVERY orders row
    # and then discarded 99.9% of its output (plan-verified:
    # plans/r11/q37_*_before.txt has Filter above the UDTF node).
    # Result-identical — the filter references only left-side columns.
    return spark.sql(
        """
        SELECT o_orderkey,
               t.month_offset,
               CAST(add_months(date_trunc('month', o_orderdate), t.month_offset)
                    AS TIMESTAMP_NTZ) AS horizon_month
        FROM (SELECT * FROM orders WHERE o_orderkey < 200) o,
             LATERAL month_expand(3) t
        ORDER BY o_orderkey, t.month_offset
        """
    )


# ---------------------------------------------------------------------------
# q42 — scalar (vectorized) pandas UDF: digit-density text metric
# ---------------------------------------------------------------------------
@F.pandas_udf(LongType())
def _digit_ratio_ppm(text: pd.Series) -> pd.Series:
    # Arrow-batched, vectorized pandas string ops — no per-row Python.
    # Exact integer parts-per-million via floor division: numpy's .round
    # is half-to-even (DuckDB/Spark round half-away), so a ratio landing
    # exactly on a .5 decimal boundary would diverge — same latent-bug
    # class the sf0.1 strict compare caught in q43.
    n = text.str.len().clip(lower=1)
    return text.str.count(r"[0-9]") * 1_000_000 // n


@register(
    "q42_scalar_pandas_udf",
    oracle="""
SELECT doc_id,
       length(regexp_replace(text, '[^0-9]', '', 'g')) * 1000000
         // greatest(length(text), 1) AS digit_ppm,
       length(text) AS n_chars
FROM documents
WHERE doc_id < 200
ORDER BY doc_id
""",
    tags=("udf", "pandas_udf", "scalar", "text"),
    doc="Scalar pandas_udf (SCALAR flavor; q36 covers GROUPED_AGG, m02 "
    "mapInPandas, q43 grouped-map, w03 stateful). The oracle recomputes "
    "the metric with plain SQL string functions.",
)
def q42_scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return (
        d.select(
            "doc_id",
            _digit_ratio_ppm(F.col("text")).alias("digit_ppm"),
            F.length("text").alias("n_chars"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q43 — grouped-map applyInPandas: per-nation min-max price normalization
# ---------------------------------------------------------------------------
def _minmax_normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    # Integer cents end-to-end: scaling reported as exact parts-per-
    # million via floor division. No float rounding anywhere — numpy's
    # round() is half-to-even while DuckDB/Spark round half-away, and at
    # sf0.1 a real row landed exactly on a .5 boundary and split them.
    cents = (pdf["o_totalprice"] * 100).round().astype("int64")
    lo, hi = int(cents.min()), int(cents.max())
    span = (hi - lo) or 1
    return pd.DataFrame(
        {
            "c_nationkey": pdf["c_nationkey"],
            "o_orderkey": pdf["o_orderkey"],
            "price_scaled_ppm": (cents - lo) * 1_000_000 // span,
        }
    )


@register(
    "q43_grouped_map_normalize",
    oracle="""
WITH j AS (
  SELECT c_nationkey, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
), ext AS (
  SELECT c_nationkey, o_orderkey, cents,
         min(cents) OVER (PARTITION BY c_nationkey) AS lo,
         max(cents) OVER (PARTITION BY c_nationkey) AS hi
  FROM j
)
SELECT c_nationkey, o_orderkey,
       (cents - lo) * 1000000 // greatest(hi - lo, 1) AS price_scaled_ppm
FROM ext
ORDER BY c_nationkey, o_orderkey
""",
    tags=("udf", "applyInPandas", "grouped-map"),
    doc="Grouped-map applyInPandas: whole group as one pandas frame, "
    "min-max scaling in exact integer cents, reported as integer parts-"
    "per-million (floor division — no float rounding, so every engine "
    "and partition order produces identical digits). The oracle replays "
    "it with window min/max.",
)
def q43_grouped_map_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        "c_nationkey", "o_orderkey", "o_totalprice"
    )
    out = j.groupBy("c_nationkey").applyInPandas(
        _minmax_normalize,
        schema="c_nationkey int, o_orderkey long, price_scaled_ppm long",
    )
    return out.orderBy("c_nationkey", "o_orderkey")


# ---------------------------------------------------------------------------
# q46 — IN / NOT IN subqueries (three-valued null semantics)
# ---------------------------------------------------------------------------
_Q46_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                      WHERE n_regionkey IN (0, 1))
  AND s_suppkey NOT IN (SELECT l_suppkey FROM lineitem
                        WHERE l_quantity > 49 AND l_suppkey IS NOT NULL)
ORDER BY s_suppkey
"""


@register(
    "q46_in_subqueries",
    oracle=_Q46_SQL,
    tags=("subquery", "in", "null-semantics", "sql"),
    doc="IN → semi join; NOT IN → null-aware anti join (the IS NOT NULL "
    "guard documents the three-valued-logic trap: one NULL in the NOT IN "
    "list would empty the result).",
)
def q46_in_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("supplier", "nation", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q46_SQL)


# ---------------------------------------------------------------------------
# q47 — regexp gallery (extract / replace / match)
# ---------------------------------------------------------------------------
@register(
    "q47_regexp_gallery",
    oracle="""
SELECT c_custkey,
       regexp_extract(c_name, '([0-9]+)$', 1)              AS trailing_num,
       regexp_replace(c_name, '[0-9]', '#', 'g')           AS masked,
       CAST(regexp_matches(c_name, '^Customer#0*1') AS INT) AS starts_one,
       CAST(length(regexp_replace(c_mktsegment, '[AEIOU]', '', 'g')) AS INT)
                                                            AS consonants
FROM customer
WHERE c_custkey < 300
ORDER BY c_custkey
""",
    tags=("scalar", "regexp", "string"),
)
def q47_regexp_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 300)
    return (
        c.select(
            "c_custkey",
            F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("trailing_num"),
            F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
            F.col("c_name").rlike(r"^Customer#0*1").cast("int").alias("starts_one"),
            F.length(F.regexp_replace("c_mktsegment", r"[AEIOU]", "")).alias(
                "consonants"
            ),
        )
        .orderBy("c_custkey")
    )
