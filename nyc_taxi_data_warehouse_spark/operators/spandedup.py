"""Duplicated-span removal — substring-level exact dedup.

Doc-level dedup (``operators/dedup.py``: fingerprint, MinHash, SimHash)
drops WHOLE near-identical documents; this operator removes REPEATED
n-token spans from otherwise-distinct documents (boilerplate headers,
licence blocks, quoted passages) — the "ExactSubstr" half of the
training-data dedup story (Lee et al. 2021, "Deduplicating Training
Data Makes Language Models Better"). The reference has no counterpart
(its dedup surface is a per-file S3 existence check,
``save_nyc_data_to_s3.py:58-78``).

Design — suffix arrays don't distribute; sliding window hashes do:

1. Tokenize; docs shorter than ``n`` tokens cannot contain an n-token
   span and pass through untouched (exactly the paper's "substring of
   at least N tokens" floor).
2. One row per window start: ``(doc_id, pos, xxhash64(n-gram))``.
3. ONE hash shuffle of that occurrence table, partitioned by the gram
   hash: a window over the hash marks duplicated grams and elects a
   deterministic keeper (min ``(doc_id, pos)``) — no groupBy+self-join
   round trip, so the token-scale table is shuffled once, and the
   shuffle rows are 3 scalars (~24 B), never the text.
4. Flagged (non-keeper) starts collapse per doc into maximal merged
   spans (same-width intervals over sorted starts — a single array
   fold), and the spans mask tokens out of the rebuilt text.

At 100 TB the gram shuffle is the dominant cost and is inherent to
exact substring dedup; everything downstream of it touches only the
flagged minority. Skew: a gram repeated k times costs one k-row window
partition — bounded by ``max_occurrences`` which drops pathological
grams (k beyond it) from flagging entirely (they are boilerplate the
caller should handle with a stopspan list; dropping keeps the window
partition bounded, mirroring minhash's ``max_bucket_size`` guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T

SPAN_T = "array<struct<s:int,e:int>>"


def _window_hashes(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """One row per n-token window: (id, pos, h). pos is 0-based token
    index of the window start; only docs with >= n tokens emit rows."""
    toks = df.select(F.col(id_col), T.tokens(text_col).alias("_tk"))
    grams = toks.where(F.size("_tk") >= n).select(
        id_col,
        F.posexplode(T.word_shingles("_tk", n)).alias("pos", "_gram"),
    )
    return grams.select(id_col, "pos", F.xxhash64("_gram").alias("h"))


def duplicated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 20,
    scope: str = "corpus",
    keep_first: bool = True,
    max_occurrences: int = 10_000,
) -> DataFrame:
    """Flagged window starts: ``(id_col, pos)`` for every n-token span
    occurrence scheduled for removal.

    ``scope='corpus'``: a gram is duplicated when it occurs >= 2 times
    anywhere (including twice in one doc). ``scope='cross_doc'``: only
    when it occurs in >= 2 distinct documents. ``keep_first=True``
    spares the globally-first occurrence (min (doc_id, pos)) so one
    copy of the content survives; ``False`` removes every occurrence.
    """
    if scope not in ("corpus", "cross_doc"):
        raise ValueError(f"scope must be 'corpus' or 'cross_doc'; got {scope!r}")
    occ = _window_hashes(df, text_col, id_col, n)
    w = Window.partitionBy("h")
    cnt = F.count(F.lit(1)).over(w)
    if scope == "corpus":
        dup = cnt >= 2
    else:
        dup = F.min(id_col).over(w) != F.max(id_col).over(w)
    flagged = occ.withColumn("_dup", dup & (cnt <= max_occurrences))
    if keep_first:
        keeper = F.min(F.struct(id_col, "pos")).over(w)
        flagged = flagged.withColumn(
            "_keep", F.struct(id_col, "pos") == keeper
        ).where(F.col("_dup") & ~F.col("_keep"))
    else:
        flagged = flagged.where("_dup")
    return flagged.select(id_col, "pos")


def _merge_starts(pos_arr, n: int):
    """Sorted same-width window starts -> maximal merged [s, e) spans.
    One array fold; adjacent windows (gap == n) merge too — the removed
    token set is identical either way."""
    empty = F.array().cast(SPAN_T)
    return F.aggregate(
        F.array_sort(pos_arr),
        empty,
        lambda acc, p: F.when(
            (F.size(acc) == 0) | (p > F.element_at(acc, -1)["e"]),
            F.concat(acc, F.array(F.struct(p.alias("s"), (p + n).alias("e")))),
        ).otherwise(
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        F.greatest(F.element_at(acc, -1)["e"], p + n).alias("e"),
                    )
                ),
            )
        ),
    )


def remove_duplicated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 20,
    scope: str = "corpus",
    keep_first: bool = True,
    max_occurrences: int = 10_000,
) -> DataFrame:
    """Cleaned corpus: ``(id_col, clean_text, n_tokens, n_removed,
    n_dup_spans)``. ``clean_text`` is the normalized document with every
    flagged span's tokens deleted (untouched docs pass through with
    ``n_removed = 0``); ``n_tokens`` counts the ORIGINAL normalized
    tokens, so ``n_removed / n_tokens`` is the corpus duplication rate.
    """
    starts = duplicated_spans(
        df, text_col, id_col, n, scope, keep_first, max_occurrences
    )
    return _remove_starts(df, starts, text_col, id_col, n)


def _remove_starts(
    df: DataFrame, starts: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """Mask the n-token windows at ``starts`` (id, pos) out of ``df``;
    shared rebuild for within-corpus dedup and cross-corpus
    decontamination."""
    per_doc = starts.groupBy(id_col).agg(
        F.collect_list("pos").alias("_starts")
    )
    out = (
        df.join(per_doc, id_col, "left")
        .withColumn("_tk", T.tokens(text_col))
        .withColumn(
            "_spans",
            F.when(F.col("_starts").isNull(), F.array().cast(SPAN_T)).otherwise(
                _merge_starts(F.col("_starts"), n)
            ),
        )
        .select(
            id_col,
            F.array_join(
                F.filter(
                    "_tk",
                    lambda t, i: ~F.exists(
                        "_spans", lambda sp: (sp["s"] <= i) & (i < sp["e"])
                    ),
                ),
                " ",
            ).alias("clean_text"),
            F.size("_tk").alias("n_tokens"),
            F.aggregate(
                "_spans", F.lit(0), lambda acc, sp: acc + (sp["e"] - sp["s"])
            ).alias("n_removed"),
            F.size("_spans").alias("n_dup_spans"),
        )
    )
    return out


def decontaminate_spans(
    train: DataFrame,
    test: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 13,
    test_text_col: str | None = None,
    test_id_col: str | None = None,
    broadcast_test: bool = True,
) -> DataFrame:
    """Cross-corpus span decontamination: delete from ``train`` every
    n-token span that ALSO occurs anywhere in ``test`` — the
    n-gram-overlap eval-leakage scrub (GPT-3 appendix C used n=13;
    public recipe), at span rather than whole-document granularity so
    a long crawl page quoting one benchmark question loses 13 tokens,
    not the page. Complements ``queries/pipeline.py``'s document-level
    decontamination.

    Output schema matches ``remove_duplicated_spans``:
    ``(id_col, clean_text, n_tokens, n_removed, n_dup_spans)``.

    Scale shape: the test corpus collapses to DISTINCT window hashes —
    8 bytes per unique n-gram, usually broadcastable
    (``broadcast_test=True``); the train occurrence table then flags
    matches with a LEFT SEMI join, so train rows never multiply no
    matter how often a gram repeats on either side (no window, no
    ``max_occurrences`` dial needed). With ``broadcast_test=False``
    the semi join shuffles (id, pos, h) scalar triples — the same
    bound as ``duplicated_spans``' one gram shuffle.
    """
    t_text = test_text_col or text_col
    t_id = test_id_col or id_col
    test_h = (
        _window_hashes(test, t_text, t_id, n).select("h").distinct()
    )
    if broadcast_test:
        test_h = F.broadcast(test_h)
    starts = (
        _window_hashes(train, text_col, id_col, n)
        .join(test_h, "h", "left_semi")
        .select(id_col, "pos")
    )
    return _remove_starts(train, starts, text_col, id_col, n)


# ---------------------------------------------------------------------------
# Unit-level boilerplate removal (lines / sentences)
# ---------------------------------------------------------------------------

_SENTENCE_SPLIT = r"(?<=[.!?])\s+"


def remove_boilerplate_units(
    df: DataFrame,
    text_col: str,
    id_col: str,
    unit: str = "line",
    min_docs: int = 3,
) -> DataFrame:
    """Drop LINES (or sentences) whose normalized form appears in at
    least ``min_docs`` DISTINCT documents — headers, footers, cookie
    banners, licence lines: the boilerplate-removal stage of the
    CCNet/RefinedWeb-style pipelines. The complementary operator to
    ``remove_duplicated_spans``: spans catch arbitrary-position token
    runs, units catch whole structural elements cheaply.

    Returns ``(id_col, clean_text, n_units, n_removed_units)`` with
    ``clean_text`` the ORIGINAL unit texts (not normalized) of the
    surviving units, joined by newline (or space for sentences), in
    original order. Matching is on the normalized fingerprint, so
    case/punctuation variants of a boilerplate line all count as one.

    Scale shape: one shuffle of ``(hash)`` scalars to count distinct
    docs per unit fingerprint (exact — a frequency threshold must not
    be approximate or legal boilerplate sneaks through), one broadcast
    or hash join back, one groupBy(id) to reassemble. Unit texts
    shuffle only in the final reassembly of SURVIVORS.
    """
    from ..functions import text as T

    if unit == "line":
        units = F.split(F.col(text_col), r"\r?\n")
        joiner = "\n"
    elif unit == "sentence":
        units = F.split(F.col(text_col), _SENTENCE_SPLIT)
        joiner = " "
    else:
        raise ValueError(f"unit must be 'line' or 'sentence'; got {unit!r}")

    exploded = (
        df.select(F.col(id_col), F.posexplode(units).alias("pos", "_u"))
        .where(F.length(F.trim("_u")) > 0)
        .withColumn("_h", F.xxhash64(T.normalize("_u")))
    )
    boiler = (
        exploded.groupBy("_h")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("_h")
    )
    # boilerplate status is a pure function of the fingerprint, so one
    # broadcast anti-join on the hash removes every offending unit
    survivors = exploded.join(F.broadcast(boiler), "_h", "left_anti")
    rebuilt = survivors.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "_u"))),
                lambda s: s["_u"],
            ),
            joiner,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("_kept"),
    )
    totals = (
        df.select(F.col(id_col), units.alias("_us"))
        .select(
            id_col,
            F.coalesce(
                F.size(F.filter("_us", lambda u: F.length(F.trim(u)) > 0)),
                F.lit(0),  # null text -> zero units, not null counters
            ).alias("n_units"),
        )
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_units",
            (F.col("n_units") - F.coalesce("_kept", F.lit(0))).alias(
                "n_removed_units"
            ),
        )
    )
