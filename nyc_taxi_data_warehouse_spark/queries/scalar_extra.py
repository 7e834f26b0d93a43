"""Additional coverage: outer joins, array aggregation, extended
string/math/conditional scalar functions — rounding out the SURVEY §2.2
checklist categories beyond the core relational module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


# ---------------------------------------------------------------------------
# q26 — full outer join with matched/unmatched accounting
# ---------------------------------------------------------------------------
@register(
    "q26_outer_join_accounting",
    oracle="""
SELECT CASE WHEN c_custkey IS NULL THEN 'order_only'
            WHEN o_orderkey IS NULL THEN 'customer_only'
            ELSE 'matched' END AS side,
       count(*) AS n,
       count(DISTINCT coalesce(c_custkey, o_custkey)) AS n_keys
FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
GROUP BY 1
ORDER BY side
""",
    tags=("join", "outer", "agg"),
)
def q26_outer_join_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    side = (
        F.when(F.col("c_custkey").isNull(), "order_only")
        .when(F.col("o_orderkey").isNull(), "customer_only")
        .otherwise("matched")
    )
    return (
        joined.select(
            side.alias("side"),
            F.coalesce("c_custkey", "o_custkey").alias("k"),
        )
        .groupBy("side")
        .agg(F.count("*").alias("n"), F.count_distinct("k").alias("n_keys"))
        .orderBy("side")
    )


# ---------------------------------------------------------------------------
# q27 — array aggregation (sorted collect) per group
# ---------------------------------------------------------------------------
@register(
    "q27_array_agg_segments",
    oracle="""
SELECT n_nationkey,
       -- FILTER + coalesce mirror Spark collect_set semantics (null
       -- elements dropped; no elements -> empty set, not NULL)
       coalesce(array_to_string(list_sort(
           coalesce(list(DISTINCT c_mktsegment)
                        FILTER (WHERE c_mktsegment IS NOT NULL), [])
       ), ','), '') AS segments,
       coalesce(len(list(DISTINCT c_mktsegment)
                        FILTER (WHERE c_mktsegment IS NOT NULL)), 0) AS n_segments
FROM nation JOIN customer ON c_nationkey = n_nationkey
GROUP BY n_nationkey
ORDER BY n_nationkey
""",
    tags=("array", "agg"),
)
def q27_array_agg_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    return (
        n.join(c, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias("segments"),
            F.size(F.collect_set("c_mktsegment")).alias("n_segments"),
        )
        .orderBy("n_nationkey")
    )


# ---------------------------------------------------------------------------
# q28 — extended string functions
# ---------------------------------------------------------------------------
@register(
    "q28_string_funcs_extra",
    oracle="""
SELECT c_custkey,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0')      AS padded_key,
       replace(c_name, 'Customer#', 'C-')             AS short_name,
       -- DuckDB split_part(NULL, ...) returns '' where Spark (and the
       -- standard null-propagation rule) return NULL
       CASE WHEN c_name IS NULL THEN NULL
            ELSE split_part(c_name, '#', 2) END       AS name_num,
       reverse(c_mktsegment)                          AS rev_segment,
       repeat(left(c_mktsegment, 1), 3)               AS initials,
       strpos(c_name, '#')                            AS hash_pos,
       translate(c_mktsegment, 'AEIOU', 'aeiou')      AS lowered_vowels
FROM customer
WHERE c_custkey < 300
ORDER BY c_custkey
""",
    tags=("scalar", "string", "sql"),
)
def q28_string_funcs_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 300)
    return (
        c.select(
            "c_custkey",
            F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
            F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C-")).alias("short_name"),
            F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
            F.reverse("c_mktsegment").alias("rev_segment"),
            F.repeat(F.substring("c_mktsegment", 1, 1), 3).alias("initials"),
            F.instr("c_name", "#").alias("hash_pos"),
            F.translate("c_mktsegment", "AEIOU", "aeiou").alias("lowered_vowels"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# q29 — conditional / null-handling functions
# ---------------------------------------------------------------------------
@register(
    "q29_null_handling",
    oracle="""
SELECT s_suppkey,
       coalesce(nullif(s_acctbal, 0.0), -1.0)      AS bal_or_flag,
       least(s_acctbal, 5000.0)                    AS bal_capped,
       greatest(s_acctbal, 0.0)                    AS bal_floored,
       CAST(s_acctbal > 0 AS INT)                  AS is_positive,
       CASE WHEN s_acctbal IS NULL THEN 'null'
            WHEN s_acctbal < 0 THEN 'neg'
            ELSE 'pos' END                         AS bal_class
FROM supplier
ORDER BY s_suppkey
""",
    tags=("scalar", "conditional"),
)
def q29_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return (
        s.select(
            "s_suppkey",
            F.coalesce(F.nullif(bal, F.lit(0.0)), F.lit(-1.0)).alias("bal_or_flag"),
            F.least(bal, F.lit(5000.0)).alias("bal_capped"),
            F.greatest(bal, F.lit(0.0)).alias("bal_floored"),
            (bal > 0).cast("int").alias("is_positive"),
            F.when(bal.isNull(), "null").when(bal < 0, "neg").otherwise("pos").alias("bal_class"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q30 — math functions (round-6 guard for libm last-ulp divergence)
# ---------------------------------------------------------------------------
@register(
    "q30_math_funcs",
    oracle="""
SELECT p_partkey,
       round(sqrt(p_retailprice), 6)          AS sqrt_price,
       round(ln(p_retailprice + 1), 6)        AS ln_price,
       round(log10(p_retailprice + 1), 6)     AS log10_price,
       round(power(p_size, 2), 6)             AS size_sq,
       round(exp(p_size / 100.0), 6)          AS exp_scaled,
       CAST(floor(p_retailprice) AS BIGINT)   AS price_floor,
       CAST(ceil(p_retailprice) AS BIGINT)    AS price_ceil,
       CAST(sign(p_retailprice - 1000) AS INT) AS above_1000
FROM part
WHERE p_partkey < 400
ORDER BY p_partkey
""",
    tags=("scalar", "math"),
)
def q30_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 400)
    price = F.col("p_retailprice")
    return (
        p.select(
            "p_partkey",
            F.round(F.sqrt(price), 6).alias("sqrt_price"),
            F.round(F.log(price + 1), 6).alias("ln_price"),
            F.round(F.log10(price + 1), 6).alias("log10_price"),
            F.round(F.pow(F.col("p_size"), 2), 6).alias("size_sq"),
            F.round(F.exp(F.col("p_size") / 100.0), 6).alias("exp_scaled"),
            F.floor(price).alias("price_floor"),
            F.ceil(price).alias("price_ceil"),
            F.signum(price - 1000).cast("int").alias("above_1000"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# q39 — map + array construction/extraction (higher-order functions)
# ---------------------------------------------------------------------------
@register(
    "q39_map_array_funcs",
    oracle="""
SELECT p_partkey,
       round(p_retailprice * 0.08, 4)                    AS tax_from_map,
       CAST(2 AS INT)                                    AS n_keys,
       'base,tax'                                        AS keys_sorted,
       CAST(((p_size % 5 + 1) * (p_size % 5 + 2)) // 2 AS BIGINT) AS seq_sum,
       (p_size % 5 + 1) >= 3                             AS has_three,
       CASE WHEN p_size IS NULL THEN NULL
            WHEN p_size % 5 + 1 >= 2 THEN '1,2' ELSE '1' END AS head2
FROM part
WHERE p_partkey < 300
ORDER BY p_partkey
""",
    tags=("scalar", "map", "array", "higher-order"),
    doc="MapType/ArrayType expression surface: map_from_arrays, "
    "element_at, map_keys, sequence, aggregate (fold), array_contains, "
    "slice — all JVM-side higher-order functions, zero UDFs. The oracle "
    "verifies the extracted scalars algebraically.",
)
def q39_map_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 300)
    m = F.map_from_arrays(
        F.array(F.lit("base"), F.lit("tax")),
        F.array(F.col("p_retailprice"), F.col("p_retailprice") * 0.08),
    )
    seq = F.sequence(F.lit(1), F.col("p_size") % 5 + 1)
    return (
        p.select(
            "p_partkey",
            F.round(F.element_at(m, F.lit("tax")), 4).alias("tax_from_map"),
            F.size(m).alias("n_keys"),
            F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_sorted"),
            F.aggregate(seq, F.lit(0), lambda acc, x: acc + x)
            .cast("bigint")
            .alias("seq_sum"),
            F.array_contains(seq, 3).alias("has_three"),
            F.array_join(F.slice(seq, 1, 2), ",").alias("head2"),
        )
        .orderBy("p_partkey")
    )
