"""Data selection via importance resampling (DSIR-style).

Given a RAW corpus (web crawl) and a small TARGET corpus (the
high-quality domain you want more of), select raw documents whose
hashed n-gram distribution looks like the target: fit bag-of-hashed-
ngram models p (target) and q (raw), weight every raw document by
``log p(doc) - log q(doc)``, and draw a without-replacement sample of
exactly k documents with probability proportional to the importance
weight (Gumbel top-k). This is the public DSIR recipe (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169) re-expressed in DataFrame algebra.

Spark shape, stage by stage:
- Features: one explode of unigram+bigram hashes → ``pmod`` into m
  buckets → groupBy (_id, bucket) with map-side combine. Ints only.
- Distributions: a groupBy over buckets → an m-row table (m is the
  feature dimension, thousands — always broadcastable). Add-one
  smoothing over the m buckets, so unseen buckets stay finite.
- Weights: the raw corpus' features equi-join the two m-row dists
  (broadcast), then per-document terms are summed as DECIMAL(28,14) —
  exact, order-independent addition, so the selected set is bit-stable
  under any partitioning (the same trick clustering.py uses).
- Selection: Gumbel top-k — score = log_w + Gumbel(xxhash64(id, seed))
  — equals without-replacement sampling proportional to exp(log_w),
  with the same TakeOrderedAndProject scale shape as
  ``sampling.weighted_sample`` (per-partition top-k, no global sort).
  Gumbel-on-log avoids materializing exp(log_w), which overflows for
  long documents.

Documents with no tokens have no features and are never selected;
NULL ids are excluded (a hash-seeded sampler cannot reproduce them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

_M = float(1 << 63)


def hashed_ngram_features(
    df: DataFrame, text_col: str, id_col: str, buckets: int = 8192
) -> DataFrame:
    """(_id, bucket, cnt): unigram + bigram counts hashed into
    ``buckets`` via xxhash64 pmod m."""
    toks = df.where(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.filter(T.tokens(text_col), lambda t: t != "").alias("_t"),
    )
    grams = toks.select(
        "_id",
        F.explode(
            F.concat(
                F.col("_t"),
                F.zip_with(
                    F.slice(F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                    F.slice(F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0))),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
            )
        ).alias("g"),
    )
    return (
        grams.select(
            "_id", F.pmod(F.xxhash64("g"), F.lit(buckets)).alias("bucket")
        )
        .groupBy("_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def fit_bucket_dist(features: DataFrame, buckets: int) -> DataFrame:
    """(bucket, logp) — add-one-smoothed log probability of each hash
    bucket over a corpus' features. Buckets never observed are simply
    absent; readers must treat absence as log(1 / (C + m))."""
    totals = features.groupBy("bucket").agg(F.sum("cnt").alias("cnt_b"))
    grand = totals.agg(
        F.coalesce(F.sum("cnt_b"), F.lit(0)).cast("double").alias("grand_c")
    )
    return totals.join(F.broadcast(grand)).select(
        "bucket",
        F.log(
            (F.col("cnt_b").cast("double") + F.lit(1.0))
            / (F.col("grand_c") + F.lit(float(buckets)))
        ).alias("logp"),
        F.col("grand_c"),
    )


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "body",
    id_col: str = "doc_id",
    buckets: int = 8192,
) -> DataFrame:
    """(id_col, log_w): per-raw-document importance weight
    ``sum_g cnt_g * (log p_target(g) - log q_raw(g))``, exact-decimal
    summed."""
    # The raw corpus' features feed BOTH the q distribution and the
    # weight join; without a cut, the tokenize→explode→hash→aggregate
    # pipeline (the expensive pass over every document) runs twice.
    # Eager localCheckpoint materializes it once and truncates lineage
    # (the repo's standard reuse pattern; plain persist() would leak
    # storage past this lazy operator's return).
    raw_feats = hashed_ngram_features(
        raw, text_col, id_col, buckets
    ).localCheckpoint(eager=True)
    p = fit_bucket_dist(
        hashed_ngram_features(target, text_col, id_col, buckets), buckets
    )
    q = fit_bucket_dist(raw_feats, buckets)
    # absent bucket => count 0 => smoothed log(1/(C+m)); C arrives on
    # every present row, and the grand totals double as 1-row fallbacks
    cp = p.select(F.max("grand_c").alias("cp_total"))
    cq = q.select(F.max("grand_c").alias("cq_total"))
    m = float(buckets)
    joined = (
        raw_feats.join(F.broadcast(p.select("bucket", F.col("logp").alias("lp"))),
                       "bucket", "left")
        .join(F.broadcast(q.select("bucket", F.col("logp").alias("lq"))),
              "bucket", "left")
        .join(F.broadcast(cp))
        .join(F.broadcast(cq))
        .select(
            "_id",
            (
                F.col("cnt").cast("double")
                * (
                    F.coalesce(
                        F.col("lp"),
                        F.log(
                            F.lit(1.0)
                            / (F.coalesce("cp_total", F.lit(0.0)) + m)
                        ),
                    )
                    - F.coalesce(
                        F.col("lq"),
                        F.log(
                            F.lit(1.0)
                            / (F.coalesce("cq_total", F.lit(0.0)) + m)
                        ),
                    )
                )
            ).alias("term"),
        )
    )
    return (
        joined.groupBy("_id")
        .agg(
            F.sum(F.col("term").cast("decimal(28,14)"))
            .cast("double")
            .alias("log_w")
        )
        .select(F.col("_id").alias(id_col), "log_w")
    )


def importance_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "body",
    id_col: str = "doc_id",
    buckets: int = 8192,
    seed: int = 0,
) -> DataFrame:
    """Exactly ``k`` raw documents (fewer iff raw is smaller), sampled
    without replacement with probability proportional to their DSIR
    importance weight. Returns the raw rows plus ``log_w``."""
    lw = importance_weights(raw, target, text_col, id_col, buckets)
    u = (
        F.abs(F.xxhash64(F.col(id_col), F.lit(seed))).cast("double")
        + F.lit(1.0)
    ) / F.lit(_M + 2.0)
    gumbel = -F.log(-F.log(u))
    picked = (
        lw.withColumn("_score", F.col("log_w") + gumbel)
        .orderBy(F.col("_score").desc(), F.col(id_col))
        .limit(k)
        .drop("_score")
    )
    return raw.join(picked, id_col)
