"""Physical-plan audit helpers.

"Would this plan survive a 100× scale-up?" is checked mechanically: tests
call these to assert that filters reached the parquet scan, that dimension
joins broadcast, and that no accidental cartesian product exists. The
reference has no equivalent (its one job is a narrow scan→project→write);
for a warehouse engine the plan IS the product.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _mode(df: DataFrame):
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(_mode(df))


explain_str = formatted_plan


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists per scan — column-pruning audit."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def assert_broadcast_join(df: DataFrame, n_expected: int = 1) -> None:
    plan = df._jdf.queryExecution().executedPlan().toString()
    found = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert found >= n_expected, (
        f"expected >= {n_expected} broadcast joins, found {found}\n{plan[:4000]}"
    )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"cartesian product in plan\n{plan[:4000]}"


def assert_no_exchange(df: DataFrame) -> None:
    """Co-located (bucketed) joins must not shuffle either side."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"unexpected shuffle in plan\n{plan[:4000]}"
