"""Similarity-search queries over the ``embeddings`` table: brute-force
cosine top-k (exact baseline), kNN classification, LSH-bucketed ANN
(the scale path). Backed by operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from ..sources import load_table
from .registry import register

N_PLANES, DIM = 8, 64

_COS_SQL = (
    "list_dot_product(qv, cv) / "
    "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))"
)


def _planes_sql(seed: str = "hp") -> str:
    """Inline the deterministic hyperplane matrix as DuckDB list literals."""
    planes = S.hyperplanes(N_PLANES, DIM, seed)
    rows = ", ".join(
        f"({p}, [{', '.join(repr(x) for x in row)}]::DOUBLE[])"
        for p, row in enumerate(planes)
    )
    return f"(VALUES {rows}) AS planes(p, pv)"


def _bucket_sql(seed: str = "hp") -> str:
    return f"""
  SELECT vec_id, embedding::DOUBLE[] AS v,
         CAST(sum(CASE WHEN list_dot_product(embedding::DOUBLE[], pv) > 0
                       THEN power(2, p) ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings, {_planes_sql(seed)}
  GROUP BY vec_id, embedding
"""


_BUCKET_SQL = _bucket_sql()

# Multi-table / multi-probe config for e08/e09 (and d08 with 4 tables):
# 8 independent tables of 8 planes, probing Hamming radius <= 2. On the
# fixture's near-isotropic vectors this is the measured recall@5 >= 0.9
# setting (0.95 at sf0.01); on clustered real embeddings the same dials
# reach it with far smaller candidate sets.
N_TABLES, PROBE_RADIUS = 8, 2


def _mb_sql(n_tables: int) -> str:
    """One row per (vector, table) with that table's bucket code."""
    return "\n  UNION ALL ".join(
        f"SELECT vec_id, v, {t} AS tbl, bucket FROM ({_bucket_sql(S.table_seed(t))})"
        for t in range(n_tables)
    )


def _masks_sql() -> str:
    masks = S.probe_masks(N_PLANES, PROBE_RADIUS)
    return f"(VALUES {', '.join(f'({m})' for m in masks)}) AS masks(m)"


# ---------------------------------------------------------------------------
# e01 — brute-force cosine top-k (exact ANN baseline)
# ---------------------------------------------------------------------------
@register(
    "e01_cosine_topk",
    oracle=f"""
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8),
     c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings),
     sims AS (
       SELECT qid, cid, round({_COS_SQL}, 6) AS sim
       FROM q JOIN c ON qid != cid
     ),
     ranked AS (
       SELECT qid, cid, sim,
              row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
       FROM sims
     )
SELECT qid, cid, sim, rn FROM ranked WHERE rn <= 5 ORDER BY qid, rn
""",
    tags=("similarity", "ann", "topk"),
)
def e01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk(emb.where(F.col("vec_id") < 8), emb, k=5)


# ---------------------------------------------------------------------------
# e02 — embedding statistics per label (exact decimal-summed norms)
# ---------------------------------------------------------------------------
@register(
    "e02_embedding_stats",
    oracle="""
SELECT label,
       count(*) AS n_vecs,
       round(CAST(sum(CAST(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                           AS DECIMAL(18,8))) AS DOUBLE) / count(*), 4) AS avg_norm,
       CAST(min(len(embedding)) AS INT) AS dim_min,
       CAST(max(len(embedding)) AS INT) AS dim_max
FROM embeddings
GROUP BY label
ORDER BY label
""",
    tags=("similarity", "agg"),
)
def e02_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import vector as V

    emb = load_table(spark, sf_dir, "embeddings")
    nrm = V.norm(V.as_double_sql("embedding"))
    return (
        emb.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(
                F.sum(nrm.cast("decimal(18,8)")).cast("double") / F.count("*"), 4
            ).alias("avg_norm"),
            F.min(F.size("embedding")).alias("dim_min"),
            F.max(F.size("embedding")).alias("dim_max"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# e03 — kNN majority-vote classification
# ---------------------------------------------------------------------------
@register(
    "e03_knn_classify",
    oracle=f"""
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 20),
     c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv, label FROM embeddings),
     sims AS (
       SELECT qid, cid, label, round({_COS_SQL}, 6) AS sim
       FROM q JOIN c ON qid != cid
     ),
     nn AS (
       SELECT qid, cid, label FROM (
         SELECT qid, cid, label,
                row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
         FROM sims
       ) WHERE rn <= 5
     ),
     votes AS (
       SELECT qid, label AS nlabel, count(*) AS votes FROM nn GROUP BY qid, label
     )
SELECT qid, nlabel AS predicted_label, votes FROM (
  SELECT qid, nlabel, votes,
         row_number() OVER (PARTITION BY qid ORDER BY votes DESC, nlabel) AS rn
  FROM votes
) WHERE rn = 1 ORDER BY qid
""",
    tags=("similarity", "knn"),
)
def e03_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.knn_classify(emb.where(F.col("vec_id") < 20), emb, k=5)


# ---------------------------------------------------------------------------
# e04 — random-hyperplane LSH bucketing (ANN scale path)
# ---------------------------------------------------------------------------
@register(
    "e04_ann_lsh_buckets",
    oracle=f"""
WITH bucketed AS ({_BUCKET_SQL})
SELECT bucket, count(*) AS n_vecs, CAST(min(vec_id) AS BIGINT) AS min_vec_id
FROM bucketed
GROUP BY bucket
ORDER BY bucket
""",
    tags=("similarity", "ann", "lsh"),
    doc="8 deterministic md5-derived hyperplanes -> 256 sign buckets; "
    "the corpus-side pre-partitioning that turns ANN probes into "
    "single-bucket equi-joins at scale.",
)
def e04_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        S.lsh_buckets(emb, n_planes=N_PLANES, dim=DIM)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_vecs"),
            F.min("vec_id").cast("long").alias("min_vec_id"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# e05 — ANN probe: top-1 neighbor within the query's LSH bucket
# ---------------------------------------------------------------------------
@register(
    "e05_ann_topk_probe",
    oracle=f"""
WITH bucketed AS ({_BUCKET_SQL}),
q AS (SELECT vec_id AS qid, v AS qv, bucket FROM bucketed WHERE vec_id < 8),
c AS (SELECT vec_id AS cid, v AS cv, bucket FROM bucketed),
cand AS (
  SELECT qid, q.bucket AS bucket, cid, round({_COS_SQL}, 6) AS sim
  FROM q JOIN c USING (bucket) WHERE qid != cid
)
SELECT qid, bucket, n_candidates, cid, sim, rn FROM (
  SELECT qid, bucket, cid, sim,
         count(*) OVER (PARTITION BY qid) AS n_candidates,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
  FROM cand
) WHERE rn <= 1 ORDER BY qid, rn
""",
    tags=("similarity", "ann", "lsh", "topk"),
)
def e05_ann_topk_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ann_topk(emb.where(F.col("vec_id") < 8), emb, k=1, n_planes=N_PLANES, dim=DIM)


# ---------------------------------------------------------------------------
# e06 — IVF ANN: coarse-quantize into cells, probe the nearest cell
# ---------------------------------------------------------------------------
_IVF_COS = _COS_SQL.replace("qv", "{a}").replace("cv", "{b}")


def _ivf_oracle() -> str:
    cos_vc = _IVF_COS.format(a="v", b="cent_v")
    cos_qc = _IVF_COS.format(a="qv", b="cv")
    return f"""
WITH cents AS (
  SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cent_v
  FROM embeddings WHERE vec_id < 8
), vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), assigned AS (
  SELECT vec_id, v, cent_id AS cell FROM (
    SELECT vec_id, v, cent_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY round({cos_vc}, 6) DESC, cent_id) AS rn
    FROM vecs CROSS JOIN cents
  ) WHERE rn = 1
), qcells AS (
  SELECT vec_id AS qid, v AS qv, cell FROM assigned
  WHERE vec_id >= 100 AND vec_id < 110
), corpus AS (
  SELECT vec_id AS cid, v AS cv, cell FROM assigned
), cand AS (
  SELECT qid, q.cell AS cell, cid, round({cos_qc}, 6) AS sim
  FROM qcells q JOIN corpus c USING (cell)
  WHERE qid != cid
)
SELECT qid, cell, cid, sim, rn FROM (
  SELECT qid, cell, cid, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
  FROM cand
) WHERE rn <= 3
ORDER BY qid, rn
"""


@register(
    "e06_ivf_ann_probe",
    oracle=_ivf_oracle(),
    tags=("similarity", "ann", "ivf"),
    doc="IVF with deterministic centroids (vec_id < 8): corpus coarse-"
    "quantized to its nearest centroid, each query probes only its own "
    "cell (n_probe=1). The oracle replays assignment and probe in SQL.",
)
def e06_ivf_ann_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") < 8)
    qs = emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 110))
    return S.ivf_topk(qs, emb, cents, k=3, n_probe=1)


# ---------------------------------------------------------------------------
# e07 — ANN recall@k vs the exact baseline (the standard ANN quality gate)
# ---------------------------------------------------------------------------
@register(
    "e07_ann_recall",
    oracle=f"""
WITH bucketed AS ({_BUCKET_SQL}),
q AS (SELECT vec_id AS qid, v AS qv, bucket FROM bucketed WHERE vec_id < 32),
c AS (SELECT vec_id AS cid, v AS cv, bucket FROM bucketed),
ann AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid
                              ORDER BY round({_COS_SQL}, 6) DESC, cid) AS rn
    FROM q JOIN c USING (bucket) WHERE qid != cid
  ) WHERE rn <= 5
),
exact AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid
                              ORDER BY round({_COS_SQL}, 6) DESC, cid) AS rn
    FROM q JOIN c ON qid != cid
  ) WHERE rn <= 5
),
hits AS (
  SELECT e.qid, count(*) AS hits
  FROM exact e JOIN ann a ON e.qid = a.qid AND e.cid = a.cid
  GROUP BY e.qid
)
SELECT x.qid,
       COALESCE(n.n_ann, 0) AS n_ann,
       COALESCE(h.hits, 0) AS hits,
       round(COALESCE(h.hits, 0) * 1.0 / 5, 4) AS recall_at_5
FROM (SELECT DISTINCT qid FROM q) x
LEFT JOIN (SELECT qid, count(*) AS n_ann FROM ann GROUP BY qid) n ON x.qid = n.qid
LEFT JOIN hits h ON x.qid = h.qid
ORDER BY x.qid
""",
    tags=("similarity", "ann", "recall", "eval"),
    doc="Per-query recall@5 of the LSH-bucketed ANN (e05 path) against "
    "the exact brute-force top-5 (e01 path) — the eval every ANN "
    "deployment needs before trading accuracy for the bucketed scan. "
    "Both sides are deterministic, so the oracle replays them in SQL.",
)
def e07_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 32)
    exact = S.cosine_topk(qs, emb, k=5).select("qid", "cid")
    ann = S.ann_topk(qs, emb, k=5, n_planes=N_PLANES, dim=DIM).select("qid", "cid")
    # ONE consumption of the ann pipeline: the previous shape read `ann`
    # twice (hits equi-join + n_ann groupBy), executing the whole
    # bucket-join/rank pipeline twice per run (guide §1.2 — don't
    # compute things twice). A left join against the exact top-k marks
    # hits per ann row; one groupBy then yields n_ann AND hits (exact
    # is unique per (qid, cid), so the join cannot fan out).
    per_q = (
        ann.join(exact.withColumn("_hit", F.lit(1)), ["qid", "cid"], "left")
        .groupBy("qid")
        .agg(F.count("*").alias("n_ann"), F.count("_hit").alias("hits"))
    )
    return (
        qs.select(F.col("vec_id").alias("qid"))
        .join(per_q, "qid", "left")
        .fillna(0, ["n_ann", "hits"])
        .select(
            "qid",
            "n_ann",
            "hits",
            F.round(F.col("hits") / 5.0, 4).alias("recall_at_5"),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# e08 — multi-table multi-probe ANN top-k (the recall-tunable scale path)
# ---------------------------------------------------------------------------
@register(
    "e08_ann_multiprobe_topk",
    oracle=f"""
WITH mb AS ({_mb_sql(N_TABLES)}),
q AS (SELECT vec_id AS qid, v AS qv, tbl, bucket FROM mb WHERE vec_id < 8),
qp AS (SELECT qid, qv, tbl, xor(bucket, m) AS bucket FROM q CROSS JOIN {_masks_sql()}),
c AS (SELECT vec_id AS cid, v AS cv, tbl, bucket FROM mb),
cand AS (
  SELECT DISTINCT qid, cid, round({_COS_SQL}, 6) AS sim
  FROM qp JOIN c USING (tbl, bucket) WHERE qid != cid
)
SELECT qid, n_candidates, cid, sim, rn FROM (
  SELECT qid, cid, sim,
         count(*) OVER (PARTITION BY qid) AS n_candidates,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
  FROM cand
) WHERE rn <= 5 ORDER BY qid, rn
""",
    tags=("similarity", "ann", "lsh", "multiprobe", "topk"),
    doc=f"{N_TABLES} independent 8-plane tables, probing Hamming radius "
    f"<= {PROBE_RADIUS} around each query code (37 probes/table). "
    "Candidates dedup on (qid, cid, sim) so vectors never enter the "
    "dedup shuffle; exact cosine ranks the union. The recall dials "
    "single-table e05 lacks: tables = memory, probe radius = compute.",
)
def e08_ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ann_topk_multi(
        emb.where(F.col("vec_id") < 8),
        emb,
        k=5,
        n_planes=N_PLANES,
        dim=DIM,
        n_tables=N_TABLES,
        probe_radius=PROBE_RADIUS,
    )


# ---------------------------------------------------------------------------
# e09 — recall@5 of the multi-table multi-probe path (the >=0.9 gate)
# ---------------------------------------------------------------------------
@register(
    "e09_ann_recall_multiprobe",
    oracle=f"""
WITH mb AS ({_mb_sql(N_TABLES)}),
q AS (SELECT vec_id AS qid, v AS qv, tbl, bucket FROM mb WHERE vec_id < 32),
qp AS (SELECT qid, qv, tbl, xor(bucket, m) AS bucket FROM q CROSS JOIN {_masks_sql()}),
c AS (SELECT vec_id AS cid, v AS cv, tbl, bucket FROM mb),
cand AS (
  SELECT DISTINCT qid, cid, round({_COS_SQL}, 6) AS sim
  FROM qp JOIN c USING (tbl, bucket) WHERE qid != cid
),
ann AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
    FROM cand
  ) WHERE rn <= 5
),
qx AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 32),
cx AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings),
exact AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid
                              ORDER BY round({_COS_SQL}, 6) DESC, cid) AS rn
    FROM qx JOIN cx ON qid != cid
  ) WHERE rn <= 5
),
hits AS (
  SELECT e.qid, count(*) AS hits
  FROM exact e JOIN ann a ON e.qid = a.qid AND e.cid = a.cid
  GROUP BY e.qid
)
SELECT x.qid,
       COALESCE(n.n_ann, 0) AS n_ann,
       COALESCE(h.hits, 0) AS hits,
       round(COALESCE(h.hits, 0) * 1.0 / 5, 4) AS recall_at_5
FROM (SELECT DISTINCT qid FROM q) x
LEFT JOIN (SELECT qid, count(*) AS n_ann FROM ann GROUP BY qid) n ON x.qid = n.qid
LEFT JOIN hits h ON x.qid = h.qid
ORDER BY x.qid
""",
    tags=("similarity", "ann", "recall", "multiprobe", "eval"),
    doc=f"recall@5 of e08's ({N_TABLES} tables, {N_PLANES} planes, "
    f"radius {PROBE_RADIUS}) config vs the exact top-5 — measured 0.95 "
    "mean recall at sf0.01 on the fixture's near-isotropic vectors (a "
    "worst case for LSH; clustered embeddings need fewer probes). The "
    "declared >=0.9 setting e07's single-table ceiling could not reach.",
)
def e09_ann_recall_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 32)
    exact = S.cosine_topk(qs, emb, k=5).select("qid", "cid")
    ann = S.ann_topk_multi(
        qs,
        emb,
        k=5,
        n_planes=N_PLANES,
        dim=DIM,
        n_tables=N_TABLES,
        probe_radius=PROBE_RADIUS,
    ).select("qid", "cid")
    # single consumption of the multi-probe pipeline — see e07
    per_q = (
        ann.join(exact.withColumn("_hit", F.lit(1)), ["qid", "cid"], "left")
        .groupBy("qid")
        .agg(F.count("*").alias("n_ann"), F.count("_hit").alias("hits"))
    )
    return (
        qs.select(F.col("vec_id").alias("qid"))
        .join(per_q, "qid", "left")
        .fillna(0, ["n_ann", "hits"])
        .select(
            "qid",
            "n_ann",
            "hits",
            F.round(F.col("hits") / 5.0, 4).alias("recall_at_5"),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# e10 — IVF ANN with multi-cell probe (n_probe recall dial)
# ---------------------------------------------------------------------------
_E10_NPROBE = 3


def _e10_oracle() -> str:
    cos_vc = _IVF_COS.format(a="v", b="cent_v")
    cos_qcent = _IVF_COS.format(a="qv", b="cent_v")
    cos_qc = _IVF_COS.format(a="qv", b="cv")
    return f"""
WITH cents AS (
  SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cent_v
  FROM embeddings WHERE vec_id < 8
), vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), assigned AS (
  SELECT vec_id, v, cent_id AS cell FROM (
    SELECT vec_id, v, cent_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY round({cos_vc}, 6) DESC, cent_id) AS rn
    FROM vecs CROSS JOIN cents
  ) WHERE rn = 1
), qcells AS (
  SELECT qid, qv, cell FROM (
    SELECT vec_id AS qid, qv, cent_id AS cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY round({cos_qcent}, 6) DESC, cent_id) AS rn
    FROM (SELECT vec_id, v AS qv FROM vecs WHERE vec_id >= 100 AND vec_id < 110)
         CROSS JOIN cents
  ) WHERE rn <= {_E10_NPROBE}
), corpus AS (
  SELECT vec_id AS cid, v AS cv, cell FROM assigned
), cand AS (
  SELECT qid, q.cell AS cell, cid, round({cos_qc}, 6) AS sim
  FROM qcells q JOIN corpus c USING (cell)
  WHERE qid != cid
)
SELECT qid, cell, cid, sim, rn FROM (
  SELECT qid, cell, cid, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
  FROM cand
) WHERE rn <= 3
ORDER BY qid, rn
"""


@register(
    "e10_ivf_multiprobe",
    oracle=_e10_oracle(),
    tags=("similarity", "ann", "ivf", "multiprobe"),
    doc=f"e06 with n_probe={_E10_NPROBE}: each query probes its "
    f"{_E10_NPROBE} nearest cells instead of one — the IVF recall dial "
    "(n_probe == #centroids degrades gracefully to exact brute force). "
    "Candidates need no dedup: a corpus vector lives in exactly one cell.",
)
def e10_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") < 8)
    qs = emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 110))
    return S.ivf_topk(qs, emb, cents, k=3, n_probe=_E10_NPROBE)
