"""INITIAL defaults for ADD COLUMN (Iceberg-v3 semantics).

The contract under test: a column added with a default reads that
value for rows of files that PHYSICALLY lack the column (written
before the add), while rows written after the add keep what they
stored — including genuine NULLs. Physical absence is the per-file
marker, so the default costs zero data movement and no per-row
bookkeeping, and it must flow through every read surface: plain reads,
the long-history flat path, DML predicates, metadata MIN/MAX and
COUNT(col), the change feed, and the streaming source.
"""

from __future__ import annotations

import json

import pytest

from nyc_taxi_data_warehouse_spark.warehouse.eqdeletes import (
    snapshot_delete_keys,
)
from nyc_taxi_data_warehouse_spark.warehouse.snapshots import (
    _list_manifests,
    _load_manifest,
    read_snapshot,
    snapshot_add_column,
    snapshot_changes,
    snapshot_compact,
    snapshot_count_nonnull,
    snapshot_delete_where,
    snapshot_drop_column,
    snapshot_minmax,
    snapshot_rename_column,
    snapshot_write,
)


def _bag(df, *cols):
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


def _man(spark, path):
    return _load_manifest(spark, path, _list_manifests(spark, path)[-1])


def test_default_fills_old_files_only(spark, tmp_path):
    t = str(tmp_path / "t")
    v1 = snapshot_write(
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string"),
        t,
    )
    snapshot_add_column(spark, t, "lang", "string", default="en")
    assert _man(spark, t)["defaults"] == {"lang": "en"}
    # old rows read the default
    assert _bag(read_snapshot(spark, t), "id", "lang") == [
        (1, "en"), (2, "en")
    ]
    # travel below the add: column absent entirely
    assert "lang" not in read_snapshot(spark, t, version=v1).columns

    # post-add rows keep what they stored — INCLUDING genuine NULL
    snapshot_write(
        spark.createDataFrame(
            [(3, "c", "fr"), (4, "d", None)],
            "id int, name string, lang string",
        ),
        t,
        mode="append",
    )
    assert _bag(read_snapshot(spark, t), "id", "lang") == [
        (1, "en"), (2, "en"), (3, "fr"), (4, None)
    ]

    # refusals: non-scalar, uncastable
    with pytest.raises(ValueError, match="plain scalar"):
        snapshot_add_column(spark, t, "x", "int", default=[1])
    with pytest.raises(ValueError, match="does not cast"):
        snapshot_add_column(spark, t, "y", "int", default="abc")


def test_default_through_flat_path_and_dml(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_write(
        spark.createDataFrame([(0, 0)], "id int, amt int"), t
    )
    snapshot_add_column(spark, t, "score", "int", default=7)
    # > _FLAT_READ_THRESHOLD commits so the flat path would engage —
    # the must_have probe detects the pre-add file and keeps the
    # per-commit fill
    for i in range(1, 11):
        snapshot_write(
            spark.createDataFrame(
                [(i, i, i * 10)], "id int, amt int, score int"
            ),
            t,
            mode="append",
        )
    got = _bag(read_snapshot(spark, t), "id", "score")
    assert got == [(0, 7)] + [(i, i * 10) for i in range(1, 11)]

    # DML predicate on the DEFAULT value erases the pre-add row
    v, n = snapshot_delete_where(spark, t, {"score": [7]})
    assert n == 1
    assert _bag(read_snapshot(spark, t).where("id = 0"), "id") == []


def test_default_in_metadata_aggregates_and_feed(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_write(
        spark.createDataFrame([(1,), (2,)], "id int"), t
    )
    snapshot_add_column(spark, t, "score", "int", default=100)
    snapshot_write(
        spark.createDataFrame([(3, 5)], "id int, score int"),
        t,
        mode="append",
    )
    # pre-add rows contribute the DEFAULT to min/max and count(col)
    assert snapshot_minmax(spark, t, "score") == (5, 100)
    assert snapshot_count_nonnull(spark, t, "score") == 3

    # the change feed fills pre-add insert frames with the default
    ch = snapshot_changes(spark, t, from_version=0)
    assert sorted(
        (r["id"], r["score"]) for r in ch.collect()
    ) == [(1, 100), (2, 100), (3, 5)]


def test_default_streams_and_survives_rename(spark, tmp_path):
    from nyc_taxi_data_warehouse_spark.streaming.snapshot_source import (
        read_snapshot_stream,
    )

    t = str(tmp_path / "t")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    snapshot_write(
        spark.createDataFrame([(1,)], "id int"), t
    )
    snapshot_add_column(spark, t, "score", "int", default=9)
    # a RENAME of the defaulted column: the default is keyed by the
    # frozen physical name and keeps filling
    snapshot_rename_column(spark, t, "score", "points")
    assert _bag(read_snapshot(spark, t), "id", "points") == [(1, 9)]
    assert _man(spark, t)["defaults"] == {"score": 9}

    (
        read_snapshot_stream(spark, t)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert _bag(spark.read.parquet(out), "id", "points") == [(1, 9)]


def test_default_lifecycle_drop_compact_eq(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_write(
        spark.createDataFrame([(1,), (2,)], "id int"), t
    )
    snapshot_add_column(spark, t, "grp", "int", default=5)

    # equality delete KEYED on the defaulted column kills pre-add rows
    snapshot_delete_keys(
        spark, t, spark.createDataFrame([(5,)], "grp int")
    )
    assert _bag(read_snapshot(spark, t), "id") == []
    snapshot_write(
        spark.createDataFrame([(3, 6)], "id int, grp int"),
        t,
        mode="append",
    )

    # untargeted compact MATERIALIZES the default and sheds the entry
    snapshot_compact(spark, t, target_mb=1)
    assert "defaults" not in _man(spark, t)
    assert _bag(read_snapshot(spark, t), "id", "grp") == [(3, 6)]

    # drop of a defaulted column sheds its entry too
    snapshot_add_column(spark, t, "tag", "string", default="x")
    assert _man(spark, t)["defaults"] == {"tag": "x"}
    snapshot_drop_column(spark, t, "tag")
    assert "defaults" not in _man(spark, t)


def test_bloom_refuses_defaulted_key(spark, tmp_path):
    from nyc_taxi_data_warehouse_spark.warehouse.bloomindex import (
        build_snapshot_bloom_index,
    )

    t = str(tmp_path / "t")
    idx = str(tmp_path / "idx")
    snapshot_write(
        spark.createDataFrame([(1,)], "id int"), t
    )
    snapshot_add_column(spark, t, "user", "string", default="anon")
    with pytest.raises(ValueError, match="INITIAL default"):
        build_snapshot_bloom_index(spark, t, "user", idx)
    # after a materializing compact the refusal clears
    snapshot_compact(spark, t, target_mb=1)
    assert build_snapshot_bloom_index(spark, t, "user", idx) >= 1


def test_cli_add_with_default(spark, tmp_path, capsys):
    from nyc_taxi_data_warehouse_spark.__main__ import main

    t = str(tmp_path / "t")
    snapshot_write(
        spark.createDataFrame([(1,)], "id int"), t
    )
    main(
        [
            "snapshot-alter", "--table-path", t,
            "--add", "score:int", "--default", "42",
        ],
        spark=spark,
    )
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out) == {"version": 2, "added": "score"}
    assert _bag(read_snapshot(spark, t), "id", "score") == [(1, 42)]
