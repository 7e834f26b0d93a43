"""Streaming ingest into the persisted retrieval indexes: an embedding
stream lands in the ANN index, a document stream lands in the BM25
postings index — batch by batch, so both serve queries continuously
while the corpus grows. The retrieval-side siblings of ``dedup_ingest``.

Exactly-once with a one-line argument each: foreachBatch + checkpoint
gives at-least-once delivery, and the wrapped operator is idempotent —
``append_to_ann_index`` anti-joins already-indexed ids (sidecar dials,
column-pruned id scan), ``upsert_postings_for_docs`` REPLACES a doc's
postings wherever they live (touched-partition dynamic overwrite). An
idempotent apply under at-least-once delivery is exactly-once; with a
single sink per stream there is no multi-write crash window at all.

Scale: ANN appends add files and never rewrite (fragmentation is
per-(tbl, bucket) and shallow; probes stay pruned); postings upserts
rewrite only the term/bucket partitions the batch touches. Neither
pays O(corpus) per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.search import postings, upsert_postings_for_docs
from ..operators.similarity import append_to_ann_index


def _drain(writer_source: DataFrame, apply_batch, checkpoint: str | None) -> None:
    writer = writer_source.writeStream.foreachBatch(apply_batch)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()


def stream_ann_ingest(
    spark: SparkSession,
    vectors: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: str | None = None,
) -> None:
    """Drain the streaming ``vectors`` (availableNow) into an existing
    ``write_ann_index`` table. Bootstrap the index first with
    ``write_ann_index`` over the initial corpus (possibly empty)."""

    def apply_batch(batch: DataFrame, _epoch: int) -> None:
        if batch.isEmpty():
            return
        append_to_ann_index(batch, index_path, id_col=id_col, vec_col=vec_col)

    _drain(vectors, apply_batch, checkpoint)


def stream_postings_ingest(
    spark: SparkSession,
    docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint: str | None = None,
    assume_new_docs: bool = True,
) -> None:
    """Drain the streaming ``docs`` (availableNow) into an existing
    ``write_postings_index`` table. ``assume_new_docs`` defaults True —
    the ingest-stream case (fresh doc_ids, skip the dropped-term scan);
    set False for a stream that re-delivers EDITED documents."""

    def apply_batch(batch: DataFrame, _epoch: int) -> None:
        if batch.isEmpty():
            return
        upsert_postings_for_docs(
            postings(batch, text_col=text_col, id_col=id_col),
            index_path,
            assume_new_docs=assume_new_docs,
        )

    _drain(docs, apply_batch, checkpoint)
