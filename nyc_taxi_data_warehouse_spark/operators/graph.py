"""Iterative graph operators over edge-list DataFrames.

``dedup.dup_clusters`` already does min-label propagation (connected
components); this module adds PageRank — the authority score a
web-scale curation pipeline uses to weight documents by link structure
(e.g. as the ``weight_col`` feeding ``sampling.weighted_sample``).

Scale shape, per iteration: contributions are one equi-join
(rank ⋈ out-degree-annotated edges on src) + one groupBy(dst) — two
hash shuffles on uniformly-distributed node ids, map-side combined.
The degree table is computed once and reused; lineage is cut per round
with ``localCheckpoint`` (the same discipline as dup_clusters) so the
plan stays flat across iterations. Dangling nodes (no out-edges)
redistribute their mass uniformly — handled as a 1-row broadcast
aggregate, not a cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)``. Returns
    ``(id, rank)`` with ranks summing to 1 (the probability form).
    Stops early when the total absolute rank change drops below
    ``tol``."""
    edges = edges.select("src", "dst").persist()
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        edges.unpersist()
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg")).persist()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    for _ in range(max_iter):
        with_deg = ranks.join(out_deg, ranks.id == out_deg.src, "left").select(
            "id", "rank", "deg"
        )
        # mass of dangling nodes, redistributed uniformly (1-row agg)
        dangling = with_deg.where(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        contribs = (
            edges.join(
                with_deg.where(F.col("deg").isNotNull()),
                edges.src == F.col("id"),
            )
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = (
            nodes.join(contribs, nodes.id == contribs.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        delta = (
            new_ranks.join(ranks.select("id", F.col("rank").alias("_old")), "id")
            .agg(F.sum(F.abs(F.col("rank") - F.col("_old"))).alias("d"))
            .collect()[0]["d"]
        )
        ranks = new_ranks
        if delta < tol:
            break
    edges.unpersist()
    out_deg.unpersist()
    return ranks
