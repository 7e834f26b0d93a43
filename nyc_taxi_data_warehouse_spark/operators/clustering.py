"""Spherical k-means (Lloyd's iterations) over embedding columns — the
semantic-clustering primitive training-data pipelines use for data
mixing, domain balancing, and cluster-level dedup/sampling.

Absent from the reference (no iterative computation of any kind exists
there); designed Spark-first:

- Assignment is a broadcast join against the (tiny) centroid table plus
  an argmax window — one narrow pass over the corpus, no shuffle of
  vectors beyond the argmax's per-id partitioning.
- Recentering shuffles (cell, pos, component) triples — dim-bounded
  rows, never whole vectors — and sums components as DECIMAL so the
  result is independent of Spark's partial-aggregation order (floating
  addition is not associative; decimal addition is). That determinism is
  what lets a SQL oracle replay the iterations bit-for-bit.
- Iteration count is a parameter (each round is one assignment + one
  recenter); k-means converges in few rounds on normalized embeddings,
  and real pipelines fix the round budget anyway.

At 100 TB: the corpus is never collected or replicated; per round the
data moves once (assignment is map-side against broadcast centroids,
recentering reduces dim*k cells). Centroids stay a k x dim table —
driver/executor memory is O(k*dim) regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import vector as V


def kmeans_assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign every vector to its max-cosine centroid (ties → smaller
    cell id). ``vectors``: (_id, _v); ``centroids``: (cell, _cv).
    Output: (_id, _v, cell, sim)."""
    # Norm hoist (V.cosine_hoisted): the vector-side self-dot runs once
    # per row, not once per (vector, centroid) pair — k× fewer folds.
    v = vectors.withColumn("_vn", V.norm("_v"))
    c = centroids.withColumn("_cn", V.norm("_cv"))
    scored = v.join(F.broadcast(c)).withColumn(
        "sim",
        F.round(
            V.cosine_hoisted("_v", "_cv", "_vn", "_cn"),
            6,
        ),
    )
    w = Window.partitionBy("_id").orderBy(F.desc("sim"), "cell")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("_id", "_v", "cell", "sim")
    )


def kmeans_recenter(assigned: DataFrame) -> DataFrame:
    """New centroid per cell = component-wise mean of member vectors.

    Components are summed as DECIMAL(28,14) (exact, order-independent)
    and divided in double — the same digits any engine produces. Cells
    that lost every member simply disappear (standard Lloyd's behavior
    with deterministic init)."""
    comp = (
        assigned.select("cell", F.posexplode("_v").alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(28,14)")).cast("double")
                / F.count("*")
            ).alias("cx")
        )
    )
    return comp.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cx"))), lambda s: s.cx
        ).alias("_cv")
    )


def kmeans(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``n_iter`` assignment rounds (with a recenter between rounds)
    starting from the deterministic seed centroids = the vectors of the
    ``k`` smallest ids. Returns the final assignment:
    (id_col, cell, sim)."""
    from ..session import spread

    # spread(): every Lloyd's round is (broadcast join + argmax window)
    # over the corpus rows — an unsplittable input would serialize all
    # k×N cosine folds on one core (no-op at scale; session.spread).
    v = spread(df).select(
        F.col(id_col).alias("_id"), V.as_double(vec_col).alias("_v")
    )
    cents = v.where(F.col("_id") < k).select(
        F.col("_id").alias("cell"), F.col("_v").alias("_cv")
    )
    assigned = kmeans_assign(v, cents)
    for _ in range(n_iter - 1):
        cents = kmeans_recenter(assigned)
        assigned = kmeans_assign(v, cents)
    return assigned.select(F.col("_id").alias(id_col), "cell", "sim")
