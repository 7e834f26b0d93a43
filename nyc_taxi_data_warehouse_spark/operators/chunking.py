"""Document chunking — split long documents into overlapping token
windows sized for a model's context.

The missing half of the window-filling story: ``packing.py`` packs many
SHORT documents into one context window; this splits one LONG document
into many windows. A training/RAG pipeline runs chunking first, then
packs the chunks. No counterpart anywhere in the reference.

Chunk ``i`` of a document covers tokens ``[i*stride, i*stride +
max_tokens)``; ``stride == max_tokens`` (the default) tiles the
document without overlap, a smaller stride overlaps consecutive chunks
by ``max_tokens - stride`` tokens (the standard trick so no semantic
span is ever cut in half at every boundary that contains it).

Scale shape: pure narrow operators — tokenize, ``sequence`` +
``explode`` over the per-doc chunk count, ``slice`` + ``array_join``
per chunk. NO shuffle anywhere (plan-asserted): chunking n documents
is embarrassingly parallel and the output lands partition-local,
ready for a downstream repartition only if the caller wants one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_tokens: int = 512,
    stride: int | None = None,
) -> DataFrame:
    """One row per (document, chunk): ``(id_col, chunk_idx, n_chunks,
    n_tokens, chunk_text)``. Every token of every document lands in at
    least one chunk; every chunk holds at most ``max_tokens`` tokens;
    the final chunk carries the (possibly shorter) tail.

    ``n_chunks = 1 if n <= max_tokens else ceil((n - max_tokens) /
    stride) + 1`` — the smallest count whose last window still reaches
    the end of the document.
    """
    if stride is None:
        stride = max_tokens
    if not 0 < stride <= max_tokens:
        raise ValueError(f"stride must be in (0, max_tokens]; got {stride}")

    toks = df.select(
        F.col(id_col), T.tokens(text_col).alias("_tk")
    ).withColumn("_n", F.size("_tk"))
    n_chunks = F.when(F.col("_n") <= max_tokens, F.lit(1)).otherwise(
        F.ceil((F.col("_n") - F.lit(max_tokens)) / F.lit(stride)).cast("int") + 1
    )
    chunks = (
        toks.withColumn("n_chunks", n_chunks)
        .select(
            id_col,
            "_tk",
            "n_chunks",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"),
        )
        .withColumn(
            "_chunk_tk",
            # slice() is 1-indexed; the tail chunk just gets fewer tokens
            F.slice(F.col("_tk"), F.col("chunk_idx") * stride + 1, max_tokens),
        )
        .select(
            id_col,
            "chunk_idx",
            "n_chunks",
            F.size("_chunk_tk").alias("n_tokens"),
            F.array_join("_chunk_tk", " ").alias("chunk_text"),
        )
    )
    return chunks
