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


# ---------------------------------------------------------------------------
# Measured (post-execution) audits. The text-based asserts above check the
# plan SHAPE; these read the executed plan's SQLMetrics, so a test can cap
# what a query actually MOVED — shuffle bytes/rows written, spill — rather
# than inferring it. "Minimize shuffles" becomes a number under regression
# control instead of a design claim.
# ---------------------------------------------------------------------------


def _iter_executed_nodes(jplan):
    """Walk every node of an executed physical plan, descending through
    the wrappers the plain ``children()`` walk misses:

    - ``AdaptiveSparkPlanExec`` — AQE's final plan is only reachable via
      ``executedPlan()`` (its ``children`` is empty).
    - ``*QueryStageExec`` — AQE stage wrappers hold their subtree in
      ``plan()``.
    - ``ReusedExchangeExec`` is NOT descended: its metrics alias the
      original exchange's, and double-counting would overstate shuffle
      volume (reuse is free by construction).
    """
    stack = [jplan]
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        yield node
        if cls == "ReusedExchangeExec":
            continue
        if cls == "AdaptiveSparkPlanExec":
            stack.append(node.executedPlan())
            continue
        if cls.endswith("QueryStageExec"):
            stack.append(node.plan())
            continue
        if cls == "InMemoryTableScanExec":
            continue  # cached subtree was executed (and metered) elsewhere
        it = node.children().iterator()
        while it.hasNext():
            stack.append(it.next())


def executed_metrics(df: DataFrame) -> dict:
    """Aggregate SQLMetrics over an ALREADY-EXECUTED DataFrame's plan.

    Returns ``{"n_shuffles": int, "shuffle_bytes_written": int,
    "shuffle_records_written": int, "spill_bytes": int,
    "output_rows_max": int}``. Call after an action that ran THIS
    DataFrame's own query execution (``collect_with_metrics`` below —
    ``df.count()`` builds a separate plan and leaves this one's metrics
    at zero).
    """
    totals = {
        "n_shuffles": 0,
        "shuffle_bytes_written": 0,
        "shuffle_records_written": 0,
        "spill_bytes": 0,
        "output_rows_max": 0,
    }
    for node in _iter_executed_nodes(df._jdf.queryExecution().executedPlan()):
        cls = node.getClass().getSimpleName()
        if cls == "ShuffleExchangeExec":
            totals["n_shuffles"] += 1
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            key, val = kv._1(), kv._2().value()
            if val < 0:  # uninitialized zeroValue sentinel
                continue
            if key == "shuffleBytesWritten":
                totals["shuffle_bytes_written"] += val
            elif key == "shuffleRecordsWritten":
                totals["shuffle_records_written"] += val
            elif key == "spillSize":
                totals["spill_bytes"] += val
            elif key == "numOutputRows":
                totals["output_rows_max"] = max(totals["output_rows_max"], val)
    return totals


def collect_with_metrics(df: DataFrame) -> dict:
    """Drain ``df``'s own executed plan distributedly (no driver-side row
    materialization — the underlying RDD is counted, not collected) and
    return its aggregated ``executed_metrics``."""
    qe = df._jdf.queryExecution()
    qe.executedPlan().execute().count()
    return executed_metrics(df)
