"""Keyword-search queries over the ``documents`` table: inverted-index
construction and ranked retrieval. Backed by operators/search.py.

Determinism note: the catalog's ranked-retrieval query (s02) scores with
exact integer arithmetic (per-term ppm contributions, integer division
before the sum) so the DuckDB value-hash gate has zero float rounding in
it. The float BM25 ranking (ln-based idf — ulp-unsafe across libms) is
the ``bm25_topk`` operator, verified against a pure-Python reference in
tests/test_search.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import search as SE
from ..sources import load_table
from .registry import register
from .text import _TOKS_SQL

# ---------------------------------------------------------------------------
# s01 — inverted index: per-term postings statistics
# ---------------------------------------------------------------------------
@register(
    "s01_inverted_index",
    oracle=f"""
WITH tk AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents),
p AS (
  SELECT term, doc_id, count(*) AS tf
  FROM tk WHERE term <> '' GROUP BY term, doc_id
),
agg AS (
  SELECT term,
         CAST(count(*) AS BIGINT) AS df,
         CAST(sum(tf) AS BIGINT) AS total_tf,
         CAST(max(tf) AS BIGINT) AS max_tf
  FROM p GROUP BY term
),
top AS (
  SELECT term, doc_id AS top_doc FROM (
    SELECT term, doc_id,
           row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rn
    FROM p
  ) WHERE rn = 1
)
SELECT term, df, total_tf, max_tf, top_doc
FROM agg JOIN top USING (term)
ORDER BY term
""",
    tags=("search", "inverted_index", "text"),
    doc="The inverted index summarized per term: document frequency, "
    "corpus term frequency, peak within-doc frequency, and the top "
    "document (argmax tf, tie -> min doc_id). Plan: explode -> one "
    "groupBy(term, doc) with map-side partial combine absorbing token "
    "volume, then a term-level aggregation and a term-partitioned "
    "window sharing the same hash partitioning. Written partitioned by "
    "term, this table IS the search index at 100 TB — keyword lookups "
    "prune to single partitions instead of scanning the corpus.",
)
def s01_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    p = SE.postings(d)
    # ONE aggregation pass: top_doc (argmax tf, tie -> min doc_id) folds
    # into the same groupBy as the counts via max(struct(tf, -doc_id)) —
    # struct ordering compares tf first, then -doc_id, so the max struct
    # is exactly (max tf, min doc_id). The previous window+join form
    # evaluated the whole postings subtree (tokenize + explode +
    # groupBy) TWICE — once per branch — plus a join; this is the same
    # result from a single pass (plan: 2 subtree evals + 3 exchanges ->
    # 1 eval + 2 exchanges).
    # Assumption pinned (ADVICE r11): doc_id is a NUMERIC id whose
    # negation cannot overflow — (-doc_id) flips at Long.MIN_VALUE, and
    # a non-numeric orderable id type needs max_by(doc_id,
    # struct(tf, -doc_id)) or the old window form instead.
    return (
        p.groupBy("term")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("total_tf"),
            F.max("tf").cast("long").alias("max_tf"),
            (-F.max(F.struct(F.col("tf"), (-F.col("doc_id")).alias("nd"))).nd).alias(
                "top_doc"
            ),
        )
        .select("term", "df", "total_tf", "max_tf", "top_doc")
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# s02 — ranked keyword retrieval (exact-integer tf-idf scoring)
# ---------------------------------------------------------------------------
_S02_TERMS = ("spark", "merge", "window", "slow")
_S02_K = 15
# Per-term contribution: tf * N * 1e6 // (df * dl) — a tf-idf family
# score (idf proxy N/df, doc-length normalized), computed in exact
# integer arithmetic: integer division per term BEFORE the sum, so the
# result is engine- and order-independent. Headroom: tf * N * 1e6 stays
# under 2^63 to ~1e3 * 5e9 docs; beyond that, upgrade to DECIMAL(38,0).


@register(
    "s02_keyword_search",
    oracle=f"""
WITH tk AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents),
tk_ne AS (SELECT doc_id, term FROM tk WHERE term <> ''),
dl AS (SELECT doc_id, count(*) AS dl FROM tk_ne GROUP BY doc_id),
n AS (SELECT count(*) AS n_docs FROM documents),
p AS (
  SELECT term, doc_id, count(*) AS tf
  FROM tk_ne WHERE term IN {_S02_TERMS!r}
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM p GROUP BY term),
scored AS (
  SELECT p.doc_id,
         CAST(p.tf * n.n_docs * 1000000 // (dfs.df * dl.dl) AS BIGINT) AS term_ppm
  FROM p JOIN dfs USING (term) JOIN dl USING (doc_id), n
)
SELECT doc_id,
       CAST(sum(term_ppm) AS BIGINT) AS score_ppm,
       CAST(count(*) AS BIGINT) AS n_terms_matched
FROM scored
GROUP BY doc_id
ORDER BY score_ppm DESC, doc_id
LIMIT {_S02_K}
""",
    tags=("search", "retrieval", "topk", "text"),
    doc=f"Ranked keyword retrieval for the term bag {_S02_TERMS}: "
    "integer-exact tf-idf (per-term ppm = tf * N * 1e6 div (df * dl), "
    "summed per doc). Plan: the term filter lands on the exploded "
    "postings BEFORE any shuffle (only matching terms survive the "
    "scan), df stats broadcast back, one groupBy(doc) sums "
    "contributions, TakeOrderedAndProject serves the top-k. The "
    "float Okapi BM25 ranking is operators/search.py::bm25_topk, "
    "gated by a pure-Python reference test (ln() is ulp-unsafe in a "
    "cross-engine hash).",
)
def s02_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    p = SE.postings(d).where(F.col("term").isin(list(_S02_TERMS)))
    dls = SE.doc_lengths(d)
    dfs = p.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    return (
        p.join(F.broadcast(dfs), "term")
        .join(dls, "doc_id")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "term_ppm",
            F.expr("CAST(tf * n_docs * 1000000 div (df * dl) AS BIGINT)"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("term_ppm").cast("long").alias("score_ppm"),
            F.count("*").cast("long").alias("n_terms_matched"),
        )
        .orderBy(F.desc("score_ppm"), "doc_id")
        .limit(_S02_K)
    )
