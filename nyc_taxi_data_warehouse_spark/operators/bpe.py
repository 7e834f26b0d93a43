"""Distributed BPE tokenizer — train merges on a corpus, apply them.

``functions/text.py::bpe_ish_token_estimate`` is a chars/4 heuristic;
this is the real thing: learn byte-pair-encoding merges FROM the corpus
(Sennrich et al. 2016) with Spark doing the counting, then tokenize any
corpus with the learned table. No counterpart in the reference.

Scale shape — the classic two-phase trick that makes corpus-scale BPE
cheap:

1. **Collapse the corpus to word counts** (`groupBy(word).count()`).
   This is the only corpus-scale shuffle; 100 TB of text collapses to
   the distinct-word table (10^7-ish rows), on which everything else
   iterates. Training never touches the corpus again.
2. **Iterate on the word table**: each merge round explodes adjacent
   symbol pairs weighted by word count, sums per pair (a shuffle over
   the SMALL word table), and takes the argmax pair with a
   deterministic tie-break (count desc, then pair lexicographic) so the
   learned table is identical on any cluster shape. The winning merge
   rewrites symbol arrays via one narrow array fold. ``localCheckpoint``
   every few rounds cuts the growing lineage (same pattern as
   ``dedup.py::dup_clusters``).

Applying merges is inherently per-word-iterative (find lowest-rank
adjacent pair, merge, repeat) — the honest Pandas-UDF case. The merge
ranks broadcast as a closure dict (vocabulary-sized, ~MBs), and a
per-batch memo collapses repeated words, so hot words tokenize once
per Arrow batch.

Words are whitespace tokens of normalized text (``functions/text.py``);
merges never cross word boundaries. No end-of-word marker — word
boundaries are already explicit in the word table, and the marker
convention only matters when detokenizing streams, which
``concat(tokens) == word`` round-trips without.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions import text as T

SYMS = "array<string>"


def _chars(word):
    return F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: F.substring(word, i, 1)
    )


def _adjacent_pairs(syms):
    """array<struct<l,r>> of adjacent symbol pairs (empty for 1-symbol
    words): zip with the shifted self, same O(n) shape as
    ``word_shingles``."""
    n = F.size(syms)
    return F.when(n < 2, F.array().cast("array<struct<l:string,r:string>>")).otherwise(
        F.zip_with(
            F.slice(syms, 1, n - 1),
            F.slice(syms, 2, n - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        )
    )


def _apply_merge(syms, left: str, right: str):
    """One greedy left-to-right pass replacing adjacent (left, right)
    with left+right — a single array fold. After a merge the new symbol
    becomes the fold's tail, so "aaaa" under (a,a) gives [aa, aa],
    matching the standard implementation."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast(SYMS),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 100,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus; returns them
    in rank order. Stops early when the best remaining pair's weighted
    count falls below ``min_pair_count``."""
    words = (
        df.select(F.explode(T.tokens(text_col)).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("syms", _chars(F.col("w")))
        .drop("w")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for r in range(n_merges):
        best = (
            words.select(
                F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "cnt"
            )
            .groupBy("p")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("p.l"), F.asc("p.r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        left, right = best[0]["p"]["l"], best[0]["p"]["r"]
        merges.append((left, right))
        words = words.withColumn("syms", _apply_merge(F.col("syms"), left, right))
        if (r + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def _tokenize_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply merges sequentially in rank order, one greedy left-to-right
    pass each — the EXACT computation ``_apply_merge`` runs at train
    time, so apply(corpus) reproduces training's final symbol arrays
    bit-for-bit. (A single pass per merge is exhaustive: the merged
    symbol ``left+right`` can never equal ``left`` or ``right``, so a
    pass cannot create new occurrences of its own pair.)"""
    syms = list(word)
    for left, right in merges:
        if len(syms) < 2:
            break
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def apply_bpe(
    df: DataFrame, text_col: str, id_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Tokenize each document with a learned merge table:
    ``(id_col, bpe_tokens array<string>, n_bpe_tokens)``. Arrow-batched;
    a per-batch memo makes repeated words free."""
    table = list(merges)

    @pandas_udf(SYMS)
    def bpe_udf(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def one(text):
            out: list[str] = []
            for w in (text or "").split(" "):
                if not w:
                    continue
                if w not in memo:
                    memo[w] = _tokenize_word(w, table)
                out.extend(memo[w])
            return out

        return texts.map(one)

    norm = F.array_join(T.tokens(text_col), " ")
    out = df.select(F.col(id_col), bpe_udf(norm).alias("bpe_tokens"))
    return out.withColumn("n_bpe_tokens", F.size("bpe_tokens"))
