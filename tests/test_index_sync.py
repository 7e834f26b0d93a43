"""Warehouse-DML → search-index propagation via the change feed
(operators/search.sync_postings_from_snapshot): appends, updates,
redactions, deletes, and restores on a snapshot documents table reach
the postings index as one stream of row changes, converging to exactly
the index a full rebuild from the latest version produces."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.search import (
    postings,
    set_postings_sync_cursor,
    sync_postings_from_snapshot,
    write_postings_index,
)
from nyc_taxi_data_warehouse_spark.warehouse.snapshots import (
    read_snapshot,
    snapshot_delete_rows,
    snapshot_restore,
    snapshot_update_rows,
    snapshot_write,
    snapshot_write_with_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _index_rows(spark, path):
    return sorted(
        map(
            tuple,
            spark.read.parquet(path)
            .select("term", "doc_id", "tf")
            .collect(),
        )
    )


def _rebuild(spark, table, tmp_path, name):
    ref = str(tmp_path / name)
    write_postings_index(
        postings(read_snapshot(spark, table), "text", "doc_id"), ref
    )
    return _index_rows(spark, ref)


def test_sync_follows_all_dml(spark, tmp_path):
    table = str(tmp_path / "docs_tbl")
    idx = str(tmp_path / "postings_idx")
    v1 = snapshot_write_with_stats(
        _docs(
            spark,
            [
                (1, "alpha beta gamma"),
                (2, "beta delta"),
                (3, "secret token epsilon"),
            ],
        ),
        table,
        stats_cols=["doc_id"],
    )
    write_postings_index(
        postings(read_snapshot(spark, table), "text", "doc_id"), idx
    )
    set_postings_sync_cursor(spark, idx, v1)

    # DML storm: append, redact (update), delete
    snapshot_write(
        _docs(spark, [(4, "zeta alpha")]), table, mode="append"
    )
    snapshot_update_rows(
        spark, table, "doc_id", [3], {"text": "redacted"}
    )
    snapshot_delete_rows(spark, table, "doc_id", [2])

    res = sync_postings_from_snapshot(spark, table, idx)
    assert res["docs_upserted"] == 2  # doc 4 (new) + doc 3 (update)
    assert res["docs_deleted"] == 1  # doc 2
    assert _index_rows(spark, idx) == _rebuild(spark, table, tmp_path, "ref1")
    # the redacted doc's old terms are gone from the index
    assert (
        spark.read.parquet(idx)
        .where((F.col("term") == "secret") | (F.col("term") == "epsilon"))
        .count()
        == 0
    )

    # idempotent: nothing new -> no-op, cursor stable
    res2 = sync_postings_from_snapshot(spark, table, idx)
    assert (res2["docs_upserted"], res2["docs_deleted"]) == (0, 0)
    assert res2["synced_to"] == res["synced_to"]

    # a restore propagates too: roll the table back to v1
    snapshot_restore(spark, table, v1)
    res3 = sync_postings_from_snapshot(spark, table, idx)
    assert res3["docs_deleted"] == 1  # doc 4 disappears again
    assert _index_rows(spark, idx) == _rebuild(spark, table, tmp_path, "ref2")


def test_sync_requires_cursor_and_update_in_one_range(spark, tmp_path):
    import pytest

    table = str(tmp_path / "docs_tbl2")
    idx = str(tmp_path / "idx2")
    snapshot_write(_docs(spark, [(1, "one two")]), table)
    write_postings_index(
        postings(read_snapshot(spark, table), "text", "doc_id"), idx
    )
    with pytest.raises(ValueError, match="synced_version"):
        sync_postings_from_snapshot(spark, table, idx)
    set_postings_sync_cursor(spark, idx, 1)
    # insert-then-delete of the same doc inside one sync range nets to
    # absent; delete-then-reinsert nets to present
    snapshot_write(_docs(spark, [(9, "ephemeral words")]), table,
                   mode="append")
    snapshot_delete_rows(spark, table, "doc_id", [9])
    snapshot_delete_rows(spark, table, "doc_id", [1])
    snapshot_write(_docs(spark, [(1, "one again")]), table, mode="append")
    sync_postings_from_snapshot(spark, table, idx)
    assert _index_rows(spark, idx) == _rebuild(spark, table, tmp_path, "ref3")
    got_terms = {r["term"] for r in spark.read.parquet(idx).collect()}
    assert "ephemeral" not in got_terms
    assert "again" in got_terms
