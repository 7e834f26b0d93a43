"""t2-style correctness: every declared query vs the DuckDB oracle.

Runs at sf0.001 by default (fast); set SPARK_GRAFT_ORACLE_SF_DIR to
/root/testdata/sf0.01 to reproduce the driver's tier exactly.
"""

from __future__ import annotations

import os

import pytest

from nyc_taxi_data_warehouse_spark.queries import QUERIES

from .oracle_harness import run_pair

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    errors = run_pair(spark, SF_DIR, name)
    assert not errors, "\n".join(errors)
