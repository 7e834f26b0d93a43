"""Core relational query surface: scans, filters, joins (broadcast / semi /
anti), hash aggregation, rollup/cube/grouping-sets, windows, set ops,
subqueries, scalar functions, approximate aggregates, top-k.

The reference delegates ALL of this to Redshift's ad-hoc SQL console
(``/root/reference/README.md:77`` — no queries are checked in); this module
is that capability made first-class and continuously verified. Shapes
follow the classic star-schema analytics patterns (TPC-H-like) over the
driver's synthetic tables.

Scale notes (100 TB):
- Dimension joins (region/nation/supplier/part) are explicitly
  ``F.broadcast`` — they must never shuffle the fact side.
- Aggregations rely on Catalyst partial aggregation (map-side combine);
  nothing here collects to the driver.
- Top-k uses orderBy+limit which Spark plans as TakeOrderedAndProject
  (per-partition heap + driver merge of k rows, not a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table, register_testdata
from .registry import register


def _dec(col, scale: int = 2):
    """Exact-decimal view of a double for order-insensitive sums."""
    return F.col(col).cast(f"decimal(18,{scale})") if isinstance(col, str) else col.cast(f"decimal(18,{scale})")


def _avg4(sum_col, cnt_col):
    """round(sum/cnt, 4) with the division done in double — deterministic
    given an exact decimal sum; identical formula on the oracle side."""
    return F.round(sum_col.cast("double") / cnt_col, 4)


# ---------------------------------------------------------------------------
# q01 — full-scan hash aggregation (TPC-H Q1 shape)
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)             AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)        AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4)      AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4)      AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    tags=("agg", "scan", "filter"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(18,6)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(18,6)")).cast("double").alias("sum_charge"),
            _avg4(F.sum(_dec("l_quantity")), F.count("*")).alias("avg_qty"),
            _avg4(F.sum(_dec("l_extendedprice")), F.count("*")).alias("avg_price"),
            _avg4(F.sum(_dec("l_discount", 4)), F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q02 — join + agg + deterministic top-k
# ---------------------------------------------------------------------------
@register(
    "q02_top_customers",
    oracle="""
SELECT c_custkey, c_name,
       count(*) AS order_cnt,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 10
""",
    tags=("join", "agg", "topk"),
)
def q02_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("*").alias("order_cnt"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q03 — 3-way join, filter both sides, top-k by aggregate (TPC-H Q3 shape)
# ---------------------------------------------------------------------------
@register(
    "q03_shipping_priority",
    oracle="""
SELECT l_orderkey,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("join", "agg", "topk", "filter"),
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp_ntz")
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")).cast("double").alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q04 — semi-join with non-equi condition (EXISTS)
# ---------------------------------------------------------------------------
@register(
    "q04_order_priority_check",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("join", "semi", "agg"),
)
def q04_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q05 — 6-table star join with broadcast dimensions (TPC-H Q5 shape)
# ---------------------------------------------------------------------------
@register(
    "q05_local_supplier_volume",
    oracle="""
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    tags=("join", "broadcast", "agg"),
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# q06 — selective scan, single-row aggregate (TPC-H Q6 shape)
# ---------------------------------------------------------------------------
@register(
    "q06_revenue_forecast",
    oracle="""
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 25
""",
    tags=("scan", "filter", "agg"),
)
def q06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 25)
    ).agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)")).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# q07 — broadcast dimension join + agg
# ---------------------------------------------------------------------------
@register(
    "q07_brand_volume",
    oracle="""
SELECT p_brand,
       count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
""",
    tags=("join", "broadcast", "agg"),
)
def q07_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")).cast("double").alias("revenue"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# q08 — left-semi join (IN subquery)
# ---------------------------------------------------------------------------
@register(
    "q08_nations_with_big_spenders",
    oracle="""
SELECT n_name, count(*) AS n_customers
FROM nation JOIN customer ON c_nationkey = n_nationkey
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400.0)
GROUP BY n_name
ORDER BY n_name
""",
    tags=("join", "semi", "agg"),
)
def q08_nations_with_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400.0)
    return (
        c.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q09 — left-anti join (NOT EXISTS)
# ---------------------------------------------------------------------------
@register(
    "q09_customers_without_orders",
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    tags=("join", "anti", "agg"),
)
def q09_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q10 — ranking window (top-N per group)
# ---------------------------------------------------------------------------
@register(
    "q10_top_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey,
       o_totalprice AS totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t
WHERE rn <= 3
ORDER BY o_custkey, rn
""",
    tags=("window", "rank"),
)
def q10_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            "rn",
        )
        .orderBy("o_custkey", "rn")
    )


# ---------------------------------------------------------------------------
# q11 — cumulative window frame (running total)
# ---------------------------------------------------------------------------
@register(
    "q11_running_revenue",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
WHERE o_custkey < 200
ORDER BY o_custkey, o_orderdate, o_orderkey
""",
    tags=("window", "frame"),
)
def q11_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# q12 — lag/lead analytics
# ---------------------------------------------------------------------------
@register(
    "q12_order_gaps",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       datediff('day',
                lag(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS days_since_prev
FROM orders
WHERE o_custkey < 100
ORDER BY o_custkey, o_orderdate, o_orderkey
""",
    tags=("window", "analytic"),
)
def q12_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.datediff(F.col("o_orderdate"), prev).alias("days_since_prev"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# q13 — ROLLUP
# ---------------------------------------------------------------------------
@register(
    "q13_rollup_returns",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
""",
    tags=("agg", "rollup"),
)
def q13_rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


# ---------------------------------------------------------------------------
# q14 — CUBE
# ---------------------------------------------------------------------------
@register(
    "q14_cube_orders",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
       coalesce(o_orderpriority, 'ALL') AS orderpriority,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY orderstatus, orderpriority
""",
    tags=("agg", "cube"),
)
def q14_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n",
            "revenue",
        )
        .orderBy("orderstatus", "orderpriority")
    )


# ---------------------------------------------------------------------------
# q15 — GROUPING SETS (via SQL surface)
# ---------------------------------------------------------------------------
@register(
    "q15_grouping_sets",
    oracle="""
SELECT coalesce(c_mktsegment, 'ALL') AS segment,
       CAST(coalesce(c_nationkey, -1) AS INT) AS nationkey,
       count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
ORDER BY segment, nationkey
""",
    tags=("agg", "grouping_sets", "sql"),
)
def q15_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_testdata(spark, sf_dir, ["customer"])
    return spark.sql(
        """
SELECT coalesce(c_mktsegment, 'ALL') AS segment,
       CAST(coalesce(c_nationkey, -1) AS INT) AS nationkey,
       count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
ORDER BY segment, nationkey
"""
    )


# ---------------------------------------------------------------------------
# q16 — set operations: INTERSECT / EXCEPT / UNION ALL
# ---------------------------------------------------------------------------
@register(
    "q16_nation_set_ops",
    oracle="""
WITH cust_n AS (SELECT DISTINCT c_nationkey AS k FROM customer),
     supp_n AS (SELECT DISTINCT s_nationkey AS k FROM supplier)
SELECT 'both' AS tag, k FROM (SELECT k FROM cust_n INTERSECT SELECT k FROM supp_n) a
UNION ALL
SELECT 'cust_only' AS tag, k FROM (SELECT k FROM cust_n EXCEPT SELECT k FROM supp_n) b
UNION ALL
SELECT 'supp_only' AS tag, k FROM (SELECT k FROM supp_n EXCEPT SELECT k FROM cust_n) c
ORDER BY tag, k
""",
    tags=("setops",),
)
def q16_nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k")).distinct()
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k")).distinct()
    both = cust.intersect(supp).select(F.lit("both").alias("tag"), "k")
    cust_only = cust.exceptAll(supp).select(F.lit("cust_only").alias("tag"), "k")
    supp_only = supp.exceptAll(cust).select(F.lit("supp_only").alias("tag"), "k")
    return both.unionByName(cust_only).unionByName(supp_only).orderBy("tag", "k")


# ---------------------------------------------------------------------------
# q17 — scalar function gallery (string/math/conditional)
# ---------------------------------------------------------------------------
@register(
    "q17_scalar_gallery",
    oracle="""
SELECT p_partkey,
       upper(p_name)                        AS uname,
       substr(p_name, 1, 4)                 AS pfx,
       length(p_name)                       AS name_len,
       concat_ws(':', p_brand, p_type)      AS brand_type,
       round(p_retailprice * 1.1, 2)        AS bumped_price,
       mod(p_partkey, 7)                    AS key_mod,
       abs(p_size - 25)                     AS size_dist,
       CASE WHEN p_size < 10 THEN 'small'
            WHEN p_size < 30 THEN 'medium'
            ELSE 'large' END                AS size_bucket
FROM part
ORDER BY p_partkey
""",
    tags=("scalar", "string", "math"),
)
def q17_scalar_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.upper("p_name").alias("uname"),
            F.substring("p_name", 1, 4).alias("pfx"),
            F.length("p_name").alias("name_len"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.round(F.col("p_retailprice") * 1.1, 2).alias("bumped_price"),
            (F.col("p_partkey") % 7).alias("key_mod"),
            F.abs(F.col("p_size") - 25).alias("size_dist"),
            F.when(F.col("p_size") < 10, "small")
            .when(F.col("p_size") < 30, "medium")
            .otherwise("large")
            .alias("size_bucket"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# q18 — date/time function gallery (via SQL surface)
# ---------------------------------------------------------------------------
@register(
    "q18_date_gallery",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate)                       AS yr,
       month(o_orderdate)                      AS mo,
       day(o_orderdate)                        AS dom,
       quarter(o_orderdate)                    AS qtr,
       strftime(o_orderdate, '%Y-%m')          AS ym,
       date_trunc('month', o_orderdate)        AS month_start,
       o_orderdate + INTERVAL 30 DAY           AS due_date,
       datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start
FROM orders
WHERE o_orderkey < 500
ORDER BY o_orderkey
""",
    tags=("scalar", "date", "sql"),
)
def q18_date_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_testdata(spark, sf_dir, ["orders"])
    return spark.sql(
        """
SELECT o_orderkey,
       year(o_orderdate)                       AS yr,
       month(o_orderdate)                      AS mo,
       day(o_orderdate)                        AS dom,
       quarter(o_orderdate)                    AS qtr,
       date_format(o_orderdate, 'yyyy-MM')     AS ym,
       date_trunc('month', o_orderdate)        AS month_start,
       o_orderdate + INTERVAL 30 DAYS          AS due_date,
       datediff(o_orderdate, TIMESTAMP_NTZ '1995-01-01 00:00:00') AS days_since_epoch_start
FROM orders
WHERE o_orderkey < 500
ORDER BY o_orderkey
"""
    )


# ---------------------------------------------------------------------------
# q19 — JSON extraction
# ---------------------------------------------------------------------------
@register(
    "q19_json_props",
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("json", "agg"),
)
def q19_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q20 — tumbling time window aggregation (batch form of the streaming op)
# ---------------------------------------------------------------------------
@register(
    "q20_hourly_events",
    oracle="""
SELECT date_trunc('hour', ts) AS hour_start,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY hour_start, event_type
""",
    tags=("window_time", "agg", "streaming_batch"),
)
def q20_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("hour_start", "event_type")
    )


# ---------------------------------------------------------------------------
# q21 — sessionization (gap > 30 min) via window functions
# ---------------------------------------------------------------------------
@register(
    "q21_sessionize",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL THEN 0
              WHEN ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1
              ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts, event_id,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       count(*) AS n_events,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
    tags=("window", "sessionization"),
)
def q21_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(prev_ts.isNull(), 0).when(
        F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES"), 1
    ).otherwise(0)
    return (
        e.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            # epoch-µs difference: tz-shift-invariant and unambiguous
            # (duckdb datediff('second') counts boundary crossings instead)
            F.expr(
                "unix_micros(cast(max(ts) as timestamp))"
                " - unix_micros(cast(min(ts) as timestamp))"
            ).alias("duration_us"),
        )
        .orderBy("user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# q22 — exact percentiles (+ approximate sanity bound)
# ---------------------------------------------------------------------------
@register(
    "q22_percentiles",
    oracle="""
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
       count(*) AS n
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    tags=("agg", "percentile"),
)
def q22_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# q23 — distinct counting, exact + approx-within-tolerance assertion
# ---------------------------------------------------------------------------
@register(
    "q23_distinct_counts",
    oracle="""
SELECT count(DISTINCT o_custkey)  AS n_customers,
       count(DISTINCT o_orderpriority) AS n_priorities,
       1 AS approx_custkey_ok
FROM orders
""",
    tags=("agg", "distinct", "approx"),
    doc="approx_count_distinct is asserted to land within 5% of the exact "
    "count (HLL sketches are engine-specific, so the oracle checks the "
    "tolerance flag, not the sketch value).",
)
def q23_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count_distinct("o_orderpriority").alias("n_priorities"),
        (
            (
                F.abs(
                    F.approx_count_distinct("o_custkey", rsd=0.01)
                    - F.count_distinct("o_custkey")
                )
                <= 0.05 * F.count_distinct("o_custkey")
            ).cast("int")
        ).alias("approx_custkey_ok"),
    )


# ---------------------------------------------------------------------------
# q24 — correlated scalar subquery (decorrelated by Catalyst)
# ---------------------------------------------------------------------------
@register(
    "q24_above_type_average",
    oracle="""
SELECT p_type, count(*) AS n_above
FROM part p
WHERE p_retailprice > (SELECT avg(p2.p_retailprice) FROM part p2
                       WHERE p2.p_type = p.p_type)
GROUP BY p_type
ORDER BY p_type
""",
    tags=("subquery", "agg", "sql"),
)
def q24_above_type_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_testdata(spark, sf_dir, ["part"])
    return spark.sql(
        """
SELECT p_type, count(*) AS n_above
FROM part p
WHERE p_retailprice > (SELECT avg(p2.p_retailprice) FROM part p2
                       WHERE p2.p_type = p.p_type)
GROUP BY p_type
ORDER BY p_type
"""
    )


# ---------------------------------------------------------------------------
# q25 — HAVING over aggregates (max vs mean ratio)
# ---------------------------------------------------------------------------
@register(
    "q25_spiky_customers",
    oracle="""
SELECT o_custkey,
       count(*) AS n_orders,
       round(CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / (CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)), 4) AS spike_ratio
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 5
   AND CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
       > 2.0 * (CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*))
ORDER BY o_custkey
""",
    tags=("agg", "having"),
)
def q25_spiky_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    mx = F.max(_dec("o_totalprice")).cast("double")
    mean = F.sum(_dec("o_totalprice")).cast("double") / F.count("*")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(mx / mean, 4).alias("spike_ratio"),
            (mx > 2.0 * mean).alias("_spiky"),
        )
        .where((F.col("n_orders") >= 5) & F.col("_spiky"))
        .drop("_spiky")
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# q38 — salted join (explicit hot-key skew mitigation)
# ---------------------------------------------------------------------------
@register(
    "q38_salted_supplier_revenue",
    oracle="""
SELECT s_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY s_name
""",
    tags=("join", "skew", "salting", "agg"),
    doc="Same rows as a plain lineitem-supplier join, but executed through "
    "the salted-join operator (deterministic 8-way salt on l_orderkey) — "
    "the explicit mitigation for a hot join key AQE can't split. The "
    "oracle proves salting is result-invariant.",
)
def q38_salted_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_suppkey", "s_suppkey")
    s = load_table(spark, sf_dir, "supplier")
    return (
        salted_join(li, s, on=["s_suppkey"], salt_from="l_orderkey", n_salts=8)
        .groupBy("s_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# q44 — time-RANGE window frame: trailing-90-day order activity
# ---------------------------------------------------------------------------
@register(
    "q44_trailing_window_frame",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(count(*) OVER w AS BIGINT) AS orders_90d,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_90d
FROM orders
WHERE o_custkey < 150
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderdate, o_orderkey
""",
    tags=("window", "range-frame", "temporal"),
    doc="RANGE frame keyed on event time (not row offsets) — trailing-"
    "90-day activity per customer. Decimal-summed so the frame result is "
    "order-independent within ties.",
)
def q44_trailing_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 150)
    # range frame over seconds since epoch — identical to the SQL INTERVAL
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-90 * 86400, 0)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.count("*").over(w).alias("orders_90d"),
            F.sum(_dec("o_totalprice")).over(w).cast("double").alias("spend_90d"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# q45 — ranking-function family
# ---------------------------------------------------------------------------
@register(
    "q45_ranking_family",
    oracle="""
SELECT c_mktsegment, c_custkey,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       ntile(4)       OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cdist,
       first_value(c_custkey) OVER w AS richest,
       nth_value(c_custkey, 2) OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_acctbal DESC, c_custkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING) AS second_richest
FROM customer
WHERE c_custkey < 400
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_mktsegment, rnk, c_custkey
""",
    tags=("window", "ranking"),
)
def q45_ranking_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 400)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
            F.first("c_custkey").over(w).alias("richest"),
            F.nth_value("c_custkey", 2).over(w_full).alias("second_richest"),
        )
        .orderBy("c_mktsegment", "rnk", "c_custkey")
    )


# ---------------------------------------------------------------------------
# q48 — single-pass column profiler (data-quality surface)
# ---------------------------------------------------------------------------
@register(
    "q48_profile_supplier",
    oracle="""
WITH w AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_nulls,
         count(DISTINCT s_suppkey) AS k_d,
         min(CAST(s_suppkey AS VARCHAR)) AS k_min,
         max(CAST(s_suppkey AS VARCHAR)) AS k_max,
         CAST(sum(CASE WHEN s_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nm_nulls,
         count(DISTINCT s_name) AS nm_d,
         min(s_name) AS nm_min,
         max(s_name) AS nm_max,
         CAST(sum(CASE WHEN s_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS b_nulls,
         count(DISTINCT s_acctbal) AS b_d,
         min(CAST(s_acctbal AS VARCHAR)) AS b_min,
         max(CAST(s_acctbal AS VARCHAR)) AS b_max
  FROM supplier
)
SELECT 's_acctbal' AS "column", n AS n_rows, b_nulls AS n_nulls,
       b_d AS n_distinct, b_min AS min_value, b_max AS max_value FROM w
UNION ALL
SELECT 's_name', n, nm_nulls, nm_d, nm_min, nm_max FROM w
UNION ALL
SELECT 's_suppkey', n, k_nulls, k_d, k_min, k_max FROM w
ORDER BY "column"
""",
    tags=("quality", "profiling", "agg"),
    doc="Single-pass profiler: one aggregation job yields rows/nulls/"
    "distincts/min/max for every column — one 100 TB scan total, not one "
    "per column. Min/max stringified; note Spark and DuckDB must agree on "
    "double->string formatting only through CAST AS VARCHAR of the same "
    "values (exact two-decimal doubles here).",
)
def q48_profile_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..warehouse.quality import profile

    s = load_table(spark, sf_dir, "supplier")
    return profile(s, ["s_suppkey", "s_name", "s_acctbal"])


# ---------------------------------------------------------------------------
# q50 — miscellaneous aggregate family (count_if, bool aggs, distinct sums)
# ---------------------------------------------------------------------------
@register(
    "q50_misc_aggregates",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_discounted,
       bool_and(l_quantity > 0)  AS all_positive_qty,
       bool_or(l_tax > 0.07)     AS any_high_tax,
       CAST(sum(DISTINCT CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_distinct_qty,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("agg", "count_if", "bool-agg", "distinct"),
)
def q50_misc_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
            F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
            F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
            F.sum_distinct(F.col("l_quantity").cast("bigint")).alias(
                "sum_distinct_qty"
            ),
            F.count_distinct("l_suppkey").alias("n_suppliers"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q51 — explicit cross join (enumeration grid)
# ---------------------------------------------------------------------------
@register(
    "q51_cross_join_grid",
    oracle="""
SELECT r_name, o_orderstatus,
       CAST(coalesce(cnt, 0) AS BIGINT) AS n_orders
FROM region
CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
LEFT JOIN (
  SELECT r2.r_regionkey, o_orderstatus AS st, count(*) AS cnt
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region r2 ON n_regionkey = r2.r_regionkey
  GROUP BY r2.r_regionkey, o_orderstatus
) f ON f.r_regionkey = region.r_regionkey AND f.st = s.o_orderstatus
ORDER BY r_name, o_orderstatus
""",
    tags=("join", "cross", "grid"),
    doc="Deliberate small-dimension cross join (5 regions x 3 statuses) "
    "building a dense grid, zero-filled from the fact aggregate — the "
    "sanctioned use of crossJoin: tiny enumerations, never fact tables.",
)
def q51_cross_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    statuses = o.select("o_orderstatus").distinct()
    grid = r.crossJoin(statuses)
    facts = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey", F.col("o_orderstatus").alias("st"))
        .agg(F.count("*").alias("cnt"))
    )
    return (
        grid.join(
            facts,
            (F.col("r_regionkey") == F.col("n_regionkey"))
            & (F.col("o_orderstatus") == F.col("st")),
            "left",
        )
        .select(
            "r_name",
            "o_orderstatus",
            F.coalesce("cnt", F.lit(0)).alias("n_orders"),
        )
        .orderBy("r_name", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# q52 — multiset set-ops (INTERSECT ALL / EXCEPT ALL with real duplicates)
# ---------------------------------------------------------------------------
@register(
    "q52_multiset_ops",
    oracle="""
WITH a AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'F'),
     b AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'O')
SELECT 'inter' AS tag, p, count(*) AS n
FROM (SELECT p FROM a INTERSECT ALL SELECT p FROM b) i GROUP BY p
UNION ALL
SELECT 'exc', p, count(*) FROM (SELECT p FROM a EXCEPT ALL SELECT p FROM b) e GROUP BY p
ORDER BY tag, p
""",
    tags=("setops", "multiset"),
    doc="intersectAll keeps min(multiplicity), exceptAll keeps the "
    "multiplicity difference — bag semantics q16's distinct inputs can't "
    "exercise.",
)
def q52_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select(F.col("o_orderpriority").alias("p"))
    b = o.where(F.col("o_orderstatus") == "O").select(F.col("o_orderpriority").alias("p"))
    inter = a.intersectAll(b).groupBy("p").agg(F.count("*").alias("n")).select(
        F.lit("inter").alias("tag"), "p", "n"
    )
    exc = a.exceptAll(b).groupBy("p").agg(F.count("*").alias("n")).select(
        F.lit("exc").alias("tag"), "p", "n"
    )
    return inter.unionByName(exc).orderBy("tag", "p")


# ---------------------------------------------------------------------------
# q53 — typed JSON parsing: from_json with explicit schema + to_json
# ---------------------------------------------------------------------------
@register(
    "q53_json_typed_parse",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INT) AS k,
       CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod,
       json_object('event', event_type, 'k2',
                   CAST(json_extract(props, '$.k') AS INT) * 2) AS reencoded
FROM events
WHERE event_id < 300
ORDER BY event_id
""",
    tags=("json", "from_json", "to_json"),
    doc="from_json with a pinned schema parses ONCE into a typed struct "
    "(vs get_json_object re-parsing per extraction — q19 shows that "
    "surface); to_json re-encodes a constructed struct. At 100 TB the "
    "single-parse struct form is the one to use for multi-field access.",
)
def q53_json_typed_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") < 300)
    parsed = e.withColumn("p", F.from_json("props", "k INT"))
    return (
        parsed.select(
            "event_id",
            F.col("p.k").alias("k"),
            (F.col("p.k") % 10).alias("k_mod"),
            # ignoreNullFields=false: emit "key":null like the oracle's
            # json_object does — the default silently drops null keys,
            # which diverges on rows whose extracted field is null.
            F.to_json(
                F.struct(
                    F.col("event_type").alias("event"),
                    (F.col("p.k") * 2).alias("k2"),
                ),
                {"ignoreNullFields": "false"},
            ).alias("reencoded"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# q55 — mergeable HLL sketch rollup (partial-aggregatable distinct counts)
# ---------------------------------------------------------------------------
@register(
    "q55_hll_sketch_rollup",
    oracle="""
SELECT r.r_name,
       count(DISTINCT o.o_custkey) AS exact_customers,
       count(DISTINCT c.c_nationkey) AS n_nations,
       1 AS est_within_5pct
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
""",
    tags=("agg", "sketch", "hll", "rollup"),
    doc="The re-aggregatable distinct-count pattern that matters at "
    "100 TB: per-nation Datasketches HLL sketches of ordering customers "
    "are rolled up to region level by SKETCH UNION — never re-touching "
    "the raw rows, the way daily sketch partitions roll into monthly "
    "distincts. Customers belong to exactly one nation, so summed "
    "per-nation exact distincts equal the region exact, which lets the "
    "SQL oracle verify the exact side; the sketch estimate is asserted "
    "within 5% (the sketch bytes themselves are engine-specific, as in "
    "q23). tests/test_properties.py additionally checks the union "
    "estimate equals the flat single-pass sketch estimate.",
)
def q55_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    per_nation = joined.groupBy("r_name", "n_nationkey").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count_distinct("o_custkey").alias("exact_n"),
    )
    per_region = per_nation.groupBy("r_name").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.sum("exact_n").cast("long").alias("exact_customers"),
        F.count("*").cast("long").alias("n_nations"),
    )
    within = (
        F.abs(F.col("est") - F.col("exact_customers"))
        / F.greatest(F.col("exact_customers"), F.lit(1))
        <= 0.05
    )
    return per_region.select(
        "r_name",
        "exact_customers",
        "n_nations",
        within.cast("int").alias("est_within_5pct"),
    ).orderBy("r_name")


# ---------------------------------------------------------------------------
# q58 — snapshot diff / reconciliation between two table versions
# ---------------------------------------------------------------------------
@register(
    "q58_snapshot_diff",
    oracle="""
WITH old AS (SELECT doc_id, text FROM documents),
new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 37 = 0 THEN text || ' [edited]' ELSE text END AS text
  FROM documents WHERE doc_id % 31 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, 'new row ' || CAST(doc_id AS VARCHAR) AS text
  FROM documents WHERE doc_id % 41 = 0
),
j AS (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN md5(o.text) <> md5(n.text) THEN 'changed'
              ELSE 'unchanged' END AS change_type
  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)
SELECT change_type, count(*) AS n_rows,
       CAST(sum(doc_id) AS BIGINT) AS sum_ids
FROM j
GROUP BY change_type
ORDER BY change_type
""",
    tags=("diff", "reconciliation", "join"),
    doc="Table-version reconciliation: FULL OUTER join on the key, "
    "row-hash compare for changed-ness, counts + id-sums per change "
    "class — the audit primitive for validating a migrated/backfilled "
    "table against its source (the 'new' snapshot is derived "
    "deterministically in-query: ~1/31 removed, ~1/37 edited, ~1/41 "
    "re-keyed as additions). Hash compare ships md5(text), never the "
    "payload, so the shuffle is key+digest-sized at 100 TB.",
)
def q58_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    old = d.select("doc_id", "text")
    new = (
        d.where(F.col("doc_id") % 31 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 37 == 0, F.concat(F.col("text"), F.lit(" [edited]"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            d.where(F.col("doc_id") % 41 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                F.concat(F.lit("new row "), F.col("doc_id").cast("string")).alias(
                    "text"
                ),
            )
        )
    )
    # Presence must be judged by a never-null marker, NOT by the text
    # hash: md5(NULL) is null, so a matched row whose text is null would
    # masquerade as 'added'/'removed' if the hash doubled as the
    # presence flag. The hash-null comparison for 'changed' then follows
    # the oracle's <> semantics (null comparison → not changed).
    o = old.select(
        "doc_id", F.md5("text").alias("_ho"), F.lit(True).alias("_in_old")
    )
    n = new.select(
        "doc_id", F.md5("text").alias("_hn"), F.lit(True).alias("_in_new")
    )
    j = o.join(n, "doc_id", "full_outer").select(
        "doc_id",
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(F.col("_ho") != F.col("_hn"), "changed")
        .otherwise("unchanged")
        .alias("change_type"),
    )
    return (
        j.groupBy("change_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("doc_id").cast("long").alias("sum_ids"),
        )
        .orderBy("change_type")
    )


# ---------------------------------------------------------------------------
# q59 — mergeable quantile-histogram rollup (re-aggregatable percentiles)
# ---------------------------------------------------------------------------
_Q59_W = 1000  # bucket width in price units


@register(
    "q59_quantile_histogram_rollup",
    oracle=f"""
WITH monthly AS (
  SELECT CAST(year(l_shipdate) AS VARCHAR) || '-Q'
           || CAST(quarter(l_shipdate) AS VARCHAR) AS qtr,
         strftime(l_shipdate, '%Y-%m') AS m,
         CAST(floor(l_extendedprice / {_Q59_W}) AS BIGINT) AS b,
         count(*) AS cnt
  FROM lineitem
  GROUP BY 1, 2, 3
),
merged AS (
  SELECT qtr, b, CAST(sum(cnt) AS BIGINT) AS cnt
  FROM monthly GROUP BY qtr, b
),
cum AS (
  SELECT qtr, b, cnt,
         sum(cnt) OVER (PARTITION BY qtr ORDER BY b) AS cum,
         sum(cnt) OVER (PARTITION BY qtr) AS tot
  FROM merged
)
SELECT qtr,
       CAST(max(tot) AS BIGINT) AS n_rows,
       CAST(min(CASE WHEN cum >= ceil(0.5 * tot) THEN b END) * {_Q59_W}
            AS BIGINT) AS p50_est,
       CAST(min(CASE WHEN cum >= ceil(0.9 * tot) THEN b END) * {_Q59_W}
            AS BIGINT) AS p90_est,
       CAST(min(CASE WHEN cum >= ceil(0.99 * tot) THEN b END) * {_Q59_W}
            AS BIGINT) AS p99_est
FROM cum
GROUP BY qtr
ORDER BY qtr
""",
    tags=("agg", "sketch", "quantile", "histogram", "rollup"),
    doc="The re-aggregatable quantile pattern (sketch-family sibling of "
    "q55's HLL and t09's heavy hitters): per-month fixed-width histograms "
    "of l_extendedprice are MERGED to quarter level by summing bucket "
    "counts — the raw rows are touched exactly once, the way daily "
    "histogram partitions roll into monthly dashboards at 100 TB. "
    "Percentiles come off the merged cumulative histogram (lower bucket "
    "edge at the crossing point), so unlike percentile_approx the whole "
    "path is deterministic integer math a SQL oracle replays exactly. "
    "Plan: two hash aggs (the first map-side partial on month+bucket), "
    "one bucket-ordered window per quarter — no sort of the fact table.",
)
def q59_quantile_histogram_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qtr = F.concat(
        F.year("l_shipdate").cast("string"),
        F.lit("-Q"),
        F.quarter("l_shipdate").cast("string"),
    )
    monthly = (
        li.groupBy(
            qtr.alias("qtr"),
            F.date_format("l_shipdate", "yyyy-MM").alias("m"),
            F.floor(F.col("l_extendedprice") / _Q59_W).alias("b"),
        ).agg(F.count("*").alias("cnt"))
    )
    merged = monthly.groupBy("qtr", "b").agg(F.sum("cnt").alias("cnt"))
    cum = merged.select(
        "qtr",
        "b",
        F.sum("cnt")
        .over(Window.partitionBy("qtr").orderBy("b"))
        .alias("cum"),
        F.sum("cnt").over(Window.partitionBy("qtr")).alias("tot"),
    )

    def edge_at(p: float) -> F.Column:
        crossing = F.when(
            F.col("cum") >= F.ceil(F.lit(p) * F.col("tot")), F.col("b")
        )
        return (F.min(crossing) * _Q59_W).cast("long")

    return (
        cum.groupBy("qtr")
        .agg(
            F.max("tot").cast("long").alias("n_rows"),
            edge_at(0.5).alias("p50_est"),
            edge_at(0.9).alias("p90_est"),
            edge_at(0.99).alias("p99_est"),
        )
        .orderBy("qtr")
    )
