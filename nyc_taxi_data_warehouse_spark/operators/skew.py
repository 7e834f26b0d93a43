"""Skew mitigation: salted joins and explicit skew diagnostics.

Spark 3.5+/4.x AQE handles sort-merge skew automatically
(``spark.sql.adaptive.skewJoin``), and the session factory keeps it on.
Salting is the *explicit* fallback for the cases AQE can't fix: a
broadcast-ineligible dim joined on a pathological hot key (one key >>
one shuffle partition), or skewed aggregation state. The salt here is a
deterministic hash of a high-cardinality fact column — results are
bit-identical to the unsalted join (tests + the q38 oracle prove it),
only the partitioning changes.

At 100 TB: an N-way salt multiplies the dim side by N (explode — no
shuffle, map-side) and splits each hot fact key across N shuffle
partitions. Choose N ~ (hot-key rows / target partition rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_fact(df: DataFrame, salt_from: str | Column, n_salts: int) -> DataFrame:
    """Deterministic salt in [0, n_salts): pmod(hash(high-card col))."""
    return df.withColumn(SALT_COL, F.pmod(F.hash(salt_from), F.lit(n_salts)))


def explode_dim(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate every dim row once per salt value (map-side, no shuffle)."""
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    return df.withColumn(SALT_COL, F.explode(salts))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where each fact key is spread across ``n_salts`` shuffle
    partitions. Equivalent rows to ``fact.join(dim, on, how)``; the salt
    column never escapes."""
    f = salt_fact(fact, salt_from, n_salts)
    d = explode_dim(dim, n_salts)
    return f.join(d, [*on, SALT_COL], how).drop(SALT_COL)


def key_skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts vs the mean — what to salt, and by
    how much (max_share ~ N tells you the salt factor)."""
    counts = df.groupBy(key).agg(F.count("*").alias("n"))
    total = counts.agg(
        F.sum("n").alias("total_rows"), F.count("*").alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            key,
            "n",
            F.round(F.col("n") * F.col("n_keys") / F.col("total_rows"), 4).alias(
                "x_mean"
            ),
        )
        .orderBy(F.desc("n"), key)
        .limit(top)
    )
