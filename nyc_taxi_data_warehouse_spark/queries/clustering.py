"""Embedding-clustering queries: spherical k-means over the embeddings
table. Backed by operators/clustering.py; the oracle replays the exact
Lloyd's iterations in SQL (possible because recentering sums components
as DECIMAL — see the operator docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.clustering import kmeans
from ..sources import load_table
from .registry import register

K, N_ITER, DIM = 8, 2, 64

_COS = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)


def _assign_sql(vecs: str, cents: str) -> str:
    cos = _COS.format(a="v", b="cv")
    return f"""
  SELECT vec_id, v, cell, sim FROM (
    SELECT vec_id, v, cell, {cos} AS sim,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY {cos} DESC, cell) AS rn
    FROM {vecs} CROSS JOIN {cents}
  ) WHERE rn = 1
"""


def _k01_oracle() -> str:
    # All fixture vectors are exactly DIM components (e02 value-checks
    # dim_min = dim_max = 64), so the component explode can use a fixed
    # generate_series instead of a lateral unnest.
    return f"""
WITH v0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c0 AS (SELECT vec_id AS cell, v AS cv FROM v0 WHERE vec_id < {K}),
a1 AS ({_assign_sql("v0", "c0")}),
comp AS (
  SELECT cell, i AS pos,
         CAST(sum(CAST(v[i] AS DECIMAL(28,14))) AS DOUBLE) / count(*) AS cx
  FROM a1 CROSS JOIN generate_series(1, {DIM}) AS g(i)
  GROUP BY cell, i
),
c1 AS (SELECT cell, list(cx ORDER BY pos) AS cv FROM comp GROUP BY cell),
a2 AS ({_assign_sql("v0", "c1")})
SELECT cell, count(*) AS n_vecs,
       CAST(min(vec_id) AS BIGINT) AS min_vec_id,
       round(CAST(sum(CAST(sim AS DECIMAL(18,8))) AS DOUBLE) / count(*), 4)
         AS avg_sim
FROM a2 GROUP BY cell ORDER BY cell
"""


@register(
    "k01_kmeans_clusters",
    oracle=_k01_oracle(),
    tags=("clustering", "kmeans", "similarity", "iterative"),
    doc=f"Spherical k-means, k={K}, {N_ITER} assignment rounds with a "
    "decimal-summed recenter in between (seed centroids = vectors of "
    "the k smallest ids). Cluster cardinalities, identity (min id) and "
    "mean within-cluster cosine are value-checked against a SQL replay "
    "of the identical iterations.",
)
def k01_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = kmeans(emb, k=K, n_iter=N_ITER)
    return (
        assigned.groupBy("cell")
        .agg(
            F.count("*").alias("n_vecs"),
            F.min("vec_id").cast("long").alias("min_vec_id"),
            F.round(
                F.sum(F.col("sim").cast("decimal(18,8)")).cast("double")
                / F.count("*"),
                4,
            ).alias("avg_sim"),
        )
        .orderBy("cell")
    )


# ---------------------------------------------------------------------------
# k02 — cluster-balanced downsampling (semantic data mixing)
# ---------------------------------------------------------------------------
_K02_CAP = 10


def _k02_oracle() -> str:
    # Same two Lloyd's rounds as k01, then keep the CAP smallest ids per
    # cluster — the deterministic form of cluster-balanced sampling.
    base = _k01_oracle().split("SELECT cell, count(*)")[0]  # CTE chain up to a2
    return f"""{base}
SELECT cell, vec_id, rank_in_cell, sim FROM (
  SELECT cell, vec_id, sim,
         row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rank_in_cell
  FROM a2
) WHERE rank_in_cell <= {_K02_CAP}
ORDER BY cell, rank_in_cell
"""


@register(
    "k02_cluster_balanced_sample",
    oracle=_k02_oracle(),
    tags=("clustering", "kmeans", "sampling", "curation"),
    doc=f"Keep the {_K02_CAP} smallest ids per k-means cluster — "
    "cluster-balanced downsampling, the curation step that prevents a "
    "dominant semantic cluster from flooding a training mix. "
    "Deterministic (id-ordered) so the SQL replay value-checks it.",
)
def k02_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = kmeans(emb, k=K, n_iter=N_ITER)
    w = Window.partitionBy("cell").orderBy("vec_id")
    return (
        assigned.withColumn("rank_in_cell", F.row_number().over(w))
        .where(F.col("rank_in_cell") <= _K02_CAP)
        .select("cell", "vec_id", "rank_in_cell", "sim")
        .orderBy("cell", "rank_in_cell")
    )
