"""Adversarial edge-case gate over the ENTIRE 104-query catalog.

The external driver samples ~50 queries per round and has repeated the
same sample, so ~half the catalog may never be driver-checked; this
module raises the local bar instead: every registered query must run
WITHOUT ERROR — and match its DuckDB oracle where one exists — against
three degenerate corpora that break hidden assumptions healthy data
hides:

- ``empty``  — all ten tables have zero rows (empty aggregates, empty
  joins, degenerate loops must converge, no div-by-zero under ANSI).
- ``single`` — exactly one row per table (no pairs for self-joins,
  windows of one, LIMIT/top-k above the row count).
- ``nulls``  — a few rows with every OPTIONAL column null (names,
  measures, dates, text, embeddings); only primary/foreign keys and
  event ids/times stay populated. Null arithmetic, null group keys, and
  null-handling in custom operators must agree with the oracle.

Fixtures are pyarrow-sliced from the sf0.001 corpus, preserving the
exact on-disk schema (single ``<table>.parquet`` files, original
logical types), so both engines read identical bytes through the same
code paths as production data.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nyc_taxi_data_warehouse_spark.queries import QUERIES

from .conftest import SF_SMOKE
from .oracle_harness import TABLES, run_pair

VARIANTS = ("empty", "single", "nulls")

# Columns that stay populated in the ``nulls`` variant: join/group keys
# (a corpus where keys are null tests the oracle, not the engine), event
# ids/timestamps (the streaming watermark column is not optional), and
# the embedding vector itself — DuckDB's list_inner_product errors on
# NULL elements, so a null-vector corpus cannot be oracle-checked; the
# similarity operators' null handling is covered by the empty variant.
PRESERVE: dict[str, set[str]] = {
    "region": {"r_regionkey"},
    "nation": {"n_nationkey", "n_regionkey"},
    "customer": {"c_custkey", "c_nationkey"},
    "supplier": {"s_suppkey", "s_nationkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"},
    "events": {"event_id", "user_id", "ts"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id", "embedding"},
}

# Divergences that are Spark-engine semantics, pinned exactly (any OTHER
# difference still fails): SQL-standard GROUP BY ROLLUP/CUBE includes
# the empty grouping set, whose global-aggregate row exists even over
# empty input (DuckDB emits it); Spark's Expand+Aggregate plan groups by
# the grouping id, so an empty relation yields zero rows. Not worth a
# permanent extra union+aggregate in a hot query for the empty-table
# case — recorded instead.
KNOWN_DIVERGENCES: dict[tuple[str, str], str] = {
    ("q13_rollup_returns", "empty"): "row count spark=0 duck=1",
    ("q14_cube_orders", "empty"): "row count spark=0 duck=1",
}


@pytest.fixture(scope="session")
def edge_dirs(tmp_path_factory):
    dirs: dict[str, str] = {}
    for variant in VARIANTS:
        d = str(tmp_path_factory.mktemp(f"edge_{variant}"))
        for t in TABLES:
            tbl = pq.read_table(os.path.join(SF_SMOKE, f"{t}.parquet"))
            if variant == "empty":
                out = tbl.slice(0, 0)
            elif variant == "single":
                out = tbl.slice(0, 1)
            else:
                out = tbl.slice(0, 5)
                for i, field in enumerate(out.schema):
                    if field.name not in PRESERVE[t]:
                        out = out.set_column(
                            i, field, pa.nulls(len(out), type=field.type)
                        )
            pq.write_table(out, os.path.join(d, f"{t}.parquet"))
        dirs[variant] = d
    return dirs


@pytest.mark.parametrize("variant", VARIANTS)
@pytest.mark.parametrize("qname", sorted(QUERIES))
def test_catalog_survives_degenerate_corpus(spark, edge_dirs, variant, qname):
    errors = run_pair(spark, edge_dirs[variant], qname)
    pinned = KNOWN_DIVERGENCES.get((qname, variant))
    if pinned is not None:
        assert len(errors) == 1 and pinned in errors[0], errors
        return
    assert not errors, errors
