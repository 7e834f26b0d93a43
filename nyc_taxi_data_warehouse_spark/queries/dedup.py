"""Dedup queries: exact, fingerprint, MinHash+LSH near-dup pairs, SimHash
signatures, n-gram Jaccard. Backed by operators/dedup.py; each paired
with a DuckDB oracle that re-derives the identical md5-based signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import dedup as D
from ..sources import load_table
from .registry import register
from .text import _NORM_SQL, _TOKS_SQL

# Shared LSH shape: 8 hashes, 4 bands × 2 rows, 3-word shingles.
N_HASHES, BANDS, SHINGLE_K = 8, 4, 3

_SHINGLES_SQL = f"""
  SELECT doc_id,
         list_distinct(list_transform(
             generate_series(1, greatest(len(tk) - {SHINGLE_K - 1}, 1)),
             i -> array_to_string(tk[i:i+{SHINGLE_K - 1}], ' '))) AS sh
  FROM (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents) t
"""

_MH_COLS_SQL = ",\n         ".join(
    f"list_min(list_transform(sh, s -> md5('{i}|' || s))) AS mh{i}"
    for i in range(N_HASHES)
)

_BAND_COLS_SQL = ",\n         ".join(
    "md5(mh{a} || '|' || mh{b}) AS band{idx}".format(a=2 * b, b=2 * b + 1, idx=b)
    for b in range(BANDS)
)


# ---------------------------------------------------------------------------
# d01 — exact dedup stats (hash groupBy on content)
# ---------------------------------------------------------------------------
@register(
    "d01_exact_dedup_stats",
    oracle="""
SELECT count(*) AS total_docs,
       count(DISTINCT text) AS unique_texts,
       CAST(count(*) - count(DISTINCT text) AS BIGINT) AS dup_rows
FROM documents
""",
    tags=("dedup", "exact"),
)
def d01_exact_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("total_docs"),
        F.count_distinct("text").alias("unique_texts"),
        (F.count("*") - F.count_distinct("text")).cast("long").alias("dup_rows"),
    )


# ---------------------------------------------------------------------------
# d02 — deterministic keep-one dedup (groupBy + keep-min, not dropDuplicates)
# ---------------------------------------------------------------------------
@register(
    "d02_exact_dedup_keep_min",
    oracle="""
SELECT lang, count(*) AS n_kept,
       CAST(sum(keep_id) AS BIGINT) AS sum_kept_ids
FROM (
  SELECT lang, min(doc_id) AS keep_id
  FROM documents
  GROUP BY lang, text
) t
GROUP BY lang
ORDER BY lang
""",
    tags=("dedup", "exact"),
    doc="Dedup on (lang, text) keeping the smallest doc_id — the "
    "deterministic alternative to dropDuplicates, aggregated per lang "
    "so the kept-row identity (sum of ids) is value-checked.",
)
def d02_exact_dedup_keep_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    kept = D.exact_dedup(d, ["lang", "text"], "doc_id")
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("doc_id").cast("long").alias("sum_kept_ids"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# d03 — MinHash + LSH near-duplicate pairs with exact Jaccard verify
# ---------------------------------------------------------------------------
# CTE chain producing the verified near-dup pair list; shared by the d03
# oracle and the d07 cluster-resolution oracle (recursive closure on top).
_PAIRS_CTES = f"""shingled AS ({_SHINGLES_SQL}),
sigs AS (
  SELECT doc_id, sh,
         {_MH_COLS_SQL}
  FROM shingled
),
banded AS (
  SELECT doc_id, sh,
         {_BAND_COLS_SQL}
  FROM sigs
),
buckets AS (
  SELECT doc_id, 0 AS band_idx, band0 AS key FROM banded
  UNION ALL SELECT doc_id, 1, band1 FROM banded
  UNION ALL SELECT doc_id, 2, band2 FROM banded
  UNION ALL SELECT doc_id, 3, band3 FROM banded
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b
    ON a.band_idx = b.band_idx AND a.key = b.key AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT id_a, id_b,
         round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
               (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6) AS jaccard
  FROM cand
  JOIN shingled sa ON sa.doc_id = id_a
  JOIN shingled sb ON sb.doc_id = id_b
  WHERE round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
              (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6) >= 0.1
)"""


@register(
    "d03_minhash_lsh_pairs",
    oracle=f"""
WITH {_PAIRS_CTES}
SELECT id_a, id_b, jaccard FROM pairs
ORDER BY id_a, id_b
""",
    tags=("dedup", "minhash", "lsh"),
    doc="4 bands x 2 rows over 8 md5-MinHashes of distinct 3-word "
    "shingles; same-bucket candidates verified with exact Jaccard.",
)
def d03_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        D.minhash_lsh_pairs(
            d,
            "text",
            "doc_id",
            n_hashes=N_HASHES,
            bands=BANDS,
            shingle_k=SHINGLE_K,
            jaccard_threshold=0.1,
        )
        .withColumnsRenamed({"id_a": "id_a", "id_b": "id_b"})
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# d07 — transitive duplicate clusters (connected components over d03 pairs)
# ---------------------------------------------------------------------------
@register(
    "d07_dup_clusters",
    oracle=f"""
WITH RECURSIVE {_PAIRS_CTES},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, root) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
),
labels AS (SELECT id, min(root) AS cluster_id FROM reach GROUP BY id)
SELECT cluster_id,
       count(*) AS n_docs,
       CAST(sum(id) AS BIGINT) AS sum_member_ids,
       max(id) AS max_member_id
FROM labels
GROUP BY cluster_id
ORDER BY cluster_id
""",
    tags=("dedup", "clusters", "iterative"),
    doc="Transitive closure of the d03 near-dup pair graph: min-label "
    "propagation (Spark, iterative joins + localCheckpoint) vs a "
    "recursive CTE (DuckDB). cluster_id = smallest doc_id in the "
    "component = the canonical keep doc; A~B~C collapses to one keeper, "
    "which pairwise dedup alone cannot decide.",
)
def d07_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        d,
        "text",
        "doc_id",
        n_hashes=N_HASHES,
        bands=BANDS,
        shingle_k=SHINGLE_K,
        jaccard_threshold=0.1,
    )
    labels = D.dup_clusters(pairs)
    return (
        labels.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("id").cast("long").alias("sum_member_ids"),
            F.max("id").alias("max_member_id"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# d04 — SimHash signatures (32-bit majority vote, portable arithmetic)
# ---------------------------------------------------------------------------
@register(
    "d04_simhash_signatures",
    oracle=f"""
SELECT doc_id, {T.simhash32_duckdb_sql('tk')} AS simhash
FROM (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents) t
WHERE doc_id < 100
ORDER BY doc_id
""",
    tags=("dedup", "simhash"),
)
def d04_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    # bind the token array in its own projection: the 32 bit-vote
    # aggregates then reference a cheap column, not the tokenize tree
    tk = d.select("doc_id", T.tokens("text").alias("_tk"))
    return (
        tk.select("doc_id", T.simhash32("_tk").alias("simhash"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# d05 — direct n-gram Jaccard similarity (bounded candidate set)
# ---------------------------------------------------------------------------
@register(
    "d05_ngram_jaccard_topk",
    oracle=f"""
WITH shingled AS ({_SHINGLES_SQL}),
small AS (SELECT * FROM shingled WHERE doc_id < 150)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.sh, b.sh)) * 1.0 /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
FROM small a JOIN small b ON a.doc_id < b.doc_id
ORDER BY jaccard DESC, id_a, id_b
LIMIT 20
""",
    tags=("dedup", "jaccard", "topk"),
    doc="Exact pairwise n-gram Jaccard on a bounded id range — the "
    "verification primitive; at scale candidates come from LSH (d03), "
    "never a full cross join.",
)
def d05_ngram_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 150)
    tk = d.select("doc_id", T.tokens("text").alias("_tk"))
    sh = tk.select(
        "doc_id",
        F.array_distinct(T.word_shingles("_tk", SHINGLE_K)).alias("sh"),
    )
    a = sh.withColumnsRenamed({"doc_id": "id_a", "sh": "sh_a"})
    b = sh.withColumnsRenamed({"doc_id": "id_b", "sh": "sh_b"})
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(inter / union, 6).alias("jaccard"))
        .orderBy(F.desc("jaccard"), "id_a", "id_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# d06 — embedding-cosine near-dup (LSH candidates + exact verification)
# ---------------------------------------------------------------------------
def _d06_oracle() -> str:
    from .similarity import _BUCKET_SQL, _COS_SQL

    cos = _COS_SQL.replace("qv", "x.v").replace("cv", "y.v")
    return f"""
WITH bk AS ({_BUCKET_SQL})
SELECT x.vec_id AS id_a,
       y.vec_id AS id_b,
       x.bucket AS bucket,
       round({cos}, 6) AS sim
FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
WHERE round({cos}, 6) >= 0.3
ORDER BY id_a, id_b
"""


@register(
    "d06_embedding_near_dup",
    oracle=_d06_oracle(),
    tags=("dedup", "similarity", "lsh"),
)
def d06_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine near-dup pairs over the embeddings table: LSH bucket
    candidate join + exact cosine >= 0.3 (threshold tuned to the
    synthetic corpus — random vectors have no true dups; the pipeline is
    identical at any threshold)."""
    from ..operators.similarity import embedding_near_dup

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup(emb, threshold=0.3)


# ---------------------------------------------------------------------------
# d08 — multi-table embedding near-dup (recall-tunable candidate union)
# ---------------------------------------------------------------------------
_D08_TABLES = 4


def _d08_oracle() -> str:
    from .similarity import _COS_SQL, _mb_sql

    cos = _COS_SQL.replace("qv", "x.v").replace("cv", "y.v")
    return f"""
WITH mb AS ({_mb_sql(_D08_TABLES)})
SELECT DISTINCT x.vec_id AS id_a,
       y.vec_id AS id_b,
       round({cos}, 6) AS sim
FROM mb x JOIN mb y
  ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id
WHERE round({cos}, 6) >= 0.3
ORDER BY id_a, id_b
"""


@register(
    "d08_embedding_near_dup_multitable",
    oracle=_d08_oracle(),
    tags=("dedup", "similarity", "lsh", "multitable"),
    doc="d06 with 4 independent LSH tables: pairs colliding in ANY "
    "table, deduped on (id_a, id_b, sim) so vectors never enter the "
    "dedup shuffle. The n_tables dial recovers the pairs a single "
    "8-plane code misses (same rotation pattern as MinHash bands).",
)
def d08_embedding_near_dup_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_near_dup

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup(emb, threshold=0.3, n_tables=_D08_TABLES)
