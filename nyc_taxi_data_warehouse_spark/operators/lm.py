"""N-gram language-model scoring — the perplexity-style quality filter.

The catalog's t10 scores documents by mean corpus frequency of their
tokens (exact-integer, oracle-friendly). This module adds the scorer
real curation pipelines (CCNet and descendants) actually run: train a
bigram model on a REFERENCE corpus, then score any corpus by per-token
cross-entropy under that model — low entropy = fluent in-domain text,
high = rare/garbled/out-of-domain. Train and score are separate
operators because the reference corpus (e.g. Wikipedia) and the scored
corpus (a web crawl) are different tables at different scales.

Model: add-k smoothed bigram with the document start as a ``<s>``
context, P(w2 | w1) = (c(w1,w2) + k) / (c(w1) + k·V), V = unigram
vocabulary size (+1 for unseen). Cross-entropy is mean -log2 P over
the document's tokens.

Scale shape: training is one tokens shuffle + one bigram groupBy
(map-side combined). Scoring joins the target's bigrams against the
model tables on xxhash64 TOKEN HASHES — ~10x fewer shuffle bytes than
the strings, same join result (a 64-bit collision merges two counts,
noise at any realistic vocabulary); both joins are plain equi-joins
AQE can broadcast when the model is small. No collect, no cartesian;
V and k arrive as a 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as T

BOS = "\x02"  # document-start context token (never produced by tokens())


def _bigram_rows(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(_id, w1, w2) per adjacent token pair, with a BOS -> first-token
    pair, empty tokens dropped. One window over the doc id."""
    toks = df.select(
        F.col(id_col).alias("_id"), F.posexplode(T.tokens(text_col))
    ).where(F.col("col") != "")
    w = Window.partitionBy("_id").orderBy("pos")
    return toks.select(
        "_id",
        F.coalesce(F.lag("col").over(w), F.lit(BOS)).alias("w1"),
        F.col("col").alias("w2"),
    )


def train_bigram_lm(docs: DataFrame, text_col: str, id_col: str) -> dict:
    """Train on the reference corpus. Returns the model as three
    DataFrames/values: ``{"bigrams": (h1, h2, c12), "contexts":
    (h1, c1), "vocab_size": int}`` with token-hash keys."""
    bg = _bigram_rows(docs, text_col, id_col).select(
        F.xxhash64("w1").alias("h1"), F.xxhash64("w2").alias("h2")
    )
    bigrams = bg.groupBy("h1", "h2").agg(F.count("*").alias("c12"))
    contexts = bg.groupBy("h1").agg(F.count("*").alias("c1"))
    vocab_size = bg.select("h2").distinct().count() + 1  # +1 for unseen
    return {"bigrams": bigrams, "contexts": contexts, "vocab_size": vocab_size}


def score_cross_entropy(
    docs: DataFrame,
    model: dict,
    text_col: str,
    id_col: str,
    k: float = 0.1,
) -> DataFrame:
    """Per-document mean -log2 P(w_i | w_{i-1}) under the trained
    model: ``(id_col, n_tokens, cross_entropy)``. Documents with no
    tokens are dropped (no defined entropy)."""
    target = _bigram_rows(docs, text_col, id_col).select(
        "_id", F.xxhash64("w1").alias("h1"), F.xxhash64("w2").alias("h2")
    )
    v = float(model["vocab_size"])
    joined = (
        target.join(model["bigrams"], ["h1", "h2"], "left")
        .join(model["contexts"], ["h1"], "left")
        .select(
            "_id",
            (
                (F.coalesce(F.col("c12"), F.lit(0)).cast("double") + F.lit(k))
                / (F.coalesce(F.col("c1"), F.lit(0)).cast("double") + F.lit(k * v))
            ).alias("p"),
        )
    )
    return (
        joined.groupBy("_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            (-F.avg(F.log2("p"))).alias("cross_entropy"),
        )
        .select(F.col("_id").alias(id_col), "n_tokens", "cross_entropy")
    )
