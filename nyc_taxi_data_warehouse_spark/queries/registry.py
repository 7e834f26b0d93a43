"""Declared query catalog: every engine capability as a (Spark, oracle) pair.

This is the engine's public query surface — the replacement for the
reference's "connect to Redshift and run SQL" (``/root/reference/
README.md:77``). Each entry pairs a Spark callable ``(spark, sf_dir) ->
DataFrame`` with the equivalent ANSI SQL a DuckDB oracle can run over the
same parquet, so every operator is continuously verified end-to-end.

Cross-engine determinism rules (why the queries look the way they do):
- Money aggregates go through ``CAST(x AS DECIMAL(18,2))`` before SUM —
  decimal addition is exact and associative, so Spark's partial
  aggregation order (nondeterministic across partitions) cannot change
  the result, and DuckDB produces the identical digits.
- Averages are computed as ``round(cast(sum(decimal) as double)/count, 4)``
  rather than ``avg()`` — Spark's decimal ``avg`` and DuckDB's differ in
  result type and rounding.
- Every LIMIT/top-k query carries a unique total ordering (tie-break on a
  key column); otherwise the selected rows would be engine-dependent.
- Timestamps stay TIMESTAMP_NTZ end-to-end (sources/registry.py pins the
  events table; the other tables are NTZ on disk).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # None → not SQL-expressible; driver does rows-only
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name, fn, oracle, tags, doc or (fn.__doc__ or ""))
        return fn

    return deco


def get_queries() -> dict[str, SparkQuery]:
    return {q.name: q.spark for q in QUERIES.values()}


def get_oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in QUERIES.values() if q.oracle is not None}
