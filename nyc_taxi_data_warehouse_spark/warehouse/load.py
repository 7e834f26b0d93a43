"""Idempotent monthly load — the whole reference DAG as one callable.

Reference pipeline (SURVEY.md §3.1): Airflow branch-check → scrape URL →
download → S3 multipart upload → EMR step (``data/emr/etl.py``: read parquet
→ cast/rename 2 cols → project 13 → JDBC append to Redshift) → step sensor.

Here it collapses to ``load_month(spark, path, year, month)``:

  read (explicit schema) → cast+rename (≙ etl.py:21-26) → project 13
  (≙ etl.py:28-43) → INSERT OVERWRITE the (year, month) partition
  → record in ingest_log.

Two deliberate upgrades over the reference:
- **INSERT OVERWRITE one partition** (dynamic partitionOverwriteMode)
  instead of blind append (etl.py:53-55): re-running a month replaces it
  rather than double-inserting — the reference's idempotency hole (its
  guard is only file-level, save_nyc_data_to_s3.py:58-78).
- **ingest_log anti-join** for backfill (≙ populate_s3.py:70-82): the
  reference HEAD-checks S3 once per file; at 100 TB / thousands of files
  that is O(n) API calls, here it's one metadata-sized join.

The pipeline is narrow (scan → project → write, zero shuffles); at scale
the only knob that matters is input split size, handled in session.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import FHVHV_WAREHOUSE_SCHEMA, SOURCE_RENAMES
from .catalog import FACT_TABLE, INGEST_LOG


@dataclass(frozen=True)
class LoadResult:
    year: int
    month: int
    rows: int
    skipped: bool


class RawSchemaError(ValueError):
    """The raw file is missing consumed columns or has wrong types."""


def validate_raw_schema(df: DataFrame) -> None:
    """Trust-but-verify the bronze read (SURVEY.md §1.2): the raw file may
    be wider than the warehouse schema (extra columns are fine — the
    projection drops them) but every CONSUMED column must exist with a
    compatible type, or the load fails fast with the precise gap instead
    of writing nulls/garbage into the fact table."""
    have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems: list[str] = []
    for f in FHVHV_WAREHOUSE_SCHEMA.fields:
        src = {v: k for k, v in SOURCE_RENAMES.items()}.get(f.name, f.name)
        want = f.dataType.simpleString()
        got = have.get(src)
        ok = {
            "int": {"int", "bigint"},  # location ids arrive int64, cast down
            "timestamp": {"timestamp", "timestamp_ntz"},
        }.get(want, {want})
        if got is None:
            problems.append(f"missing column {src!r} (needed for {f.name})")
        elif got not in ok:
            problems.append(f"{src!r}: expected one of {sorted(ok)}, got {got!r}")
    if problems:
        raise RawSchemaError("; ".join(problems))


def transform_raw(df: DataFrame) -> DataFrame:
    """Cast/rename + 13-column projection (≙ data/emr/etl.py:21-43).

    The raw TLC file is wider than the warehouse schema; projection is a
    modeling decision (SURVEY.md §1.2) and also lets Catalyst prune the
    parquet scan to exactly the referenced columns.
    """
    for src, dst in SOURCE_RENAMES.items():
        df = df.withColumn(dst, F.col(src).cast("integer"))
    return df.select(*[f.name for f in FHVHV_WAREHOUSE_SCHEMA.fields])


def load_month(
    spark: SparkSession,
    path: str,
    year: int,
    month: int,
    force: bool = False,
    backend: str = "managed",
    snapshot_path: str | None = None,
    wap: bool = False,
    audit=None,
    _loaded_months: set[tuple[int, int]] | None = None,
) -> LoadResult:
    """Load one monthly file into the partitioned fact table, idempotently.

    Two interchangeable storage backends for the same fact table:

    - ``backend="managed"`` (default): the catalog-managed parquet table
      — INSERT OVERWRITE of the (year, month) partition under scoped
      dynamic ``partitionOverwriteMode``; idempotency from the
      ``ingest_log`` anti-join.
    - ``backend="snapshot"``: a ``warehouse.snapshots`` versioned table
      at ``snapshot_path`` — the month lands via
      ``snapshot_replace_partitions`` (readers keep their pinned
      version; a crash leaves only an orphan commit dir), and
      idempotency comes from the MANIFEST itself: each load commit
      records its ``(year, month, source_path, rows)`` provenance, so
      no separate ingest log is needed and the already-loaded check is
      a metadata-only manifest scan.

    ``wap=True`` (snapshot backend only) routes the load through
    write-audit-publish: the month lands on an isolated branch, the
    ``audit`` callback inspects the branch head (default: schema
    matches the transform's output and the observed row count is
    positive), and only an approved load fast-forwards main — the
    engine-native answer to the reference's validate-by-inspection
    step (/root/reference/README.md:77, "check the data" before
    exposing it). A failed audit raises ``branching.AuditFailed`` and
    leaves main exactly at the prior month (the poisoned branch is
    dropped). ``audit`` receives the branch-head DataFrame and returns
    truthy to approve.
    """
    if backend not in ("managed", "snapshot"):
        raise ValueError(f"backend must be managed|snapshot; got {backend!r}")
    if backend == "snapshot" and not snapshot_path:
        raise ValueError("backend='snapshot' requires snapshot_path")
    if wap and backend != "snapshot":
        raise ValueError("wap=True requires backend='snapshot'")
    # The partition-replacing write below is only safe under
    # partitionOverwriteMode=dynamic — on an untuned session Spark's
    # static default would drop every OTHER month on overwrite. Scoped
    # (set/restore) so the load never permanently mutates the caller's
    # session confs.
    from ..session import dynamic_partition_overwrite

    if not force:
        # the whole-history manifest scan is skipped entirely under
        # force (its result would be unused), and backfill threads its
        # already-computed set through `_loaded_months` so M loads cost
        # one scan, not M
        if backend == "snapshot":
            already = (
                _loaded_months
                if _loaded_months is not None
                else _snapshot_loaded_months(spark, snapshot_path)
            )
            if (year, month) in already:
                return LoadResult(year, month, rows=0, skipped=True)
        elif _already_loaded(spark, year, month):
            return LoadResult(year, month, rows=0, skipped=True)

    from pyspark.sql import Observation

    raw = spark.read.parquet(path)
    validate_raw_schema(raw)
    out = transform_raw(raw).withColumns(
        {"year": F.lit(year).cast("int"), "month": F.lit(month).cast("int")}
    )
    # Piggyback the row count on the write job itself (Observation) —
    # a post-write count() would re-scan the whole partition, a second
    # full pass at 100 TB.
    obs = Observation(f"load_{year}_{month}")
    out = out.observe(obs, F.count(F.lit(1)).alias("rows"))
    if backend == "snapshot":
        from .snapshots import snapshot_replace_partitions

        # Two-phase under the hood (files, then Observation-read, then
        # the provenance-carrying manifest): snapshot_replace_partitions
        # writes the commit files before the manifest flips, and the
        # Observation is populated by that same write job — so the rows
        # figure lands in the manifest without a second scan.
        rows_holder: dict[str, int] = {}

        def _load_extra() -> dict:
            rows_holder["rows"] = _obs_rows(obs)
            return {
                "load": {
                    "year": year,
                    "month": month,
                    "source_path": path,
                    "rows": rows_holder["rows"],
                }
            }

        if wap:
            from .branching import drop_branch, write_audit_publish
            from .snapshots import _list_manifests, snapshot_write

            if not _list_manifests(spark, snapshot_path):
                # WAP forks from an existing head; a first-ever load
                # publishes an EMPTY v1 to branch from, so a vetoed
                # first month still leaves main a readable empty table.
                # Built fresh (not out.limit(0)): ``out`` carries the
                # Observation, which is single-use per action
                snapshot_write(
                    spark.createDataFrame([], out.schema), snapshot_path,
                    partition_cols=["year", "month"],
                )

            def _wap_write(ref: str) -> None:
                snapshot_replace_partitions(
                    out, ref, ["year", "month"], extra=_load_extra
                )

            def _default_audit(df) -> bool:
                want = {
                    (f.name, f.dataType.simpleString())
                    for f in out.schema.fields
                }
                got = {
                    (f.name, f.dataType.simpleString())
                    for f in df.schema.fields
                }
                return got == want and rows_holder["rows"] > 0

            wap_branch = f"load-{year}-{month:02d}"
            # Self-healing retries: a publish-time SnapshotConflict
            # (which deliberately keeps the branch) or a crash before
            # drop_branch leaves `load-YYYY-MM` behind, and the fixed
            # name would then fail every retry of the same month in
            # create_branch. A leftover here is always debris — the
            # month's load either never published (so its branch state
            # is superseded by this re-run) or did publish (in which
            # case the manifest-replay skip above already returned).
            try:
                drop_branch(spark, snapshot_path, wap_branch, reclaim=True)
            except FileNotFoundError:
                pass
            write_audit_publish(
                spark,
                snapshot_path,
                wap_branch,
                _wap_write,
                audit or _default_audit,
                keep_branch_on_failure=False,
            )
        else:
            snapshot_replace_partitions(
                out, snapshot_path, ["year", "month"], extra=_load_extra
            )
        return LoadResult(year, month, rows=rows_holder["rows"], skipped=False)
    # Dynamic partition overwrite: only the (year, month) partition in this
    # DataFrame is replaced; all other months are untouched.
    with dynamic_partition_overwrite(spark):
        out.write.mode("overwrite").insertInto(FACT_TABLE)
    rows = _obs_rows(obs)
    _record(spark, path, year, month, rows)
    return LoadResult(year, month, rows=rows, skipped=False)


def _obs_rows(obs) -> int:
    """The observed row count, tolerating the zero-task case: a write
    of an empty month can schedule no tasks at all, the CollectMetrics
    node then never executes, and ``Observation.get`` fails JVM-side —
    no tasks means no rows, so 0 is exact, not a guess.

    The zero-task case is detected by PROBING THE JVM OBSERVATION
    STATE, not by substring-matching the exception text: an unrelated
    JVM assertion raised during ``get`` would otherwise be
    misclassified and permanently record rows=0 provenance for a
    committed non-empty load (and a WAP audit would veto a perfectly
    good branch). Never-populated state is a schema-less empty
    ``GenericRow`` from ``getRow()`` (size 0 — observed on Spark
    4.1.2; ``getOrEmpty`` NPEs on it, so it can't be the probe); a
    populated observation always carries ``GenericRowWithSchema`` with
    one field per metric. Any failure with a populated row re-raises."""
    try:
        return int(obs.get["rows"])
    except Exception:
        try:
            jrow = obs._jo.getRow()
            never_populated = jrow is None or int(jrow.size()) == 0
        except Exception:
            never_populated = False
        if never_populated:
            return 0
        raise


def _snapshot_loaded_months(
    spark: SparkSession, snapshot_path: str
) -> set[tuple[int, int]]:
    """(year, month) pairs present in the CURRENT table version —
    REPLAYED from the commit manifests' ``load`` provenance in version
    order, honoring ``snapshot_restore`` commits (a restore resets the
    loaded set to the restored version's: months rolled back must
    become loadable again, or they would stay silently missing while
    the provenance says "loaded"). Metadata only: one small JSON per
    retained version, no data files touched. Months whose provenance
    (or restore target) was vacuumed out of history conservatively
    re-load — replace_partitions makes the re-load idempotent."""
    from .snapshots import _list_manifests, _load_manifest

    try:
        versions = _list_manifests(spark, snapshot_path)
    except Exception:
        return set()
    states: dict[int, set[tuple[int, int]]] = {}
    cur: set[tuple[int, int]] = set()
    for v in versions:
        man = _load_manifest(spark, snapshot_path, v)
        rf = man.get("restored_from")
        if rf is not None:
            cur = set(states.get(rf, set()))
        else:
            cur = set(cur)
            li = man.get("load")
            if li:
                cur.add((li["year"], li["month"]))
        states[v] = cur
    return cur


def backfill(
    spark: SparkSession,
    manifest: list[tuple[str, int, int]],
    backend: str = "managed",
    snapshot_path: str | None = None,
) -> list[LoadResult]:
    """Load every not-yet-ingested (path, year, month) from a manifest.

    ≙ populate_s3.py main loop, but the "already ingested?" check is one
    anti-join against ingest_log instead of a HEAD call per file. On the
    snapshot backend the loaded set comes from the commit manifests
    (same anti-join shape, different metadata source).
    """
    if not manifest:
        return []
    mdf = spark.createDataFrame(manifest, "source_path string, year int, month int")
    loaded: set[tuple[int, int]] | None = None
    if backend == "snapshot":
        loaded = _snapshot_loaded_months(spark, snapshot_path)
        ldf = (
            spark.createDataFrame(sorted(loaded), "year int, month int")
            if loaded
            else spark.createDataFrame([], "year int, month int")
        )
    else:
        ldf = spark.table(INGEST_LOG).select("year", "month")
    todo = (
        mdf.join(ldf, on=["year", "month"], how="left_anti")
        .orderBy("year", "month")
        .collect()  # manifest is metadata-sized (one row per month-file)
    )
    # thread the already-computed loaded set through: the anti-join
    # above is the idempotency gate; without threading, every
    # load_month call would redo the whole-history manifest scan
    return [
        load_month(
            spark, r.source_path, r.year, r.month,
            backend=backend, snapshot_path=snapshot_path,
            _loaded_months=loaded,
        )
        for r in todo
    ]


def _already_loaded(spark: SparkSession, year: int, month: int) -> bool:
    return bool(
        spark.table(INGEST_LOG)
        .where((F.col("year") == year) & (F.col("month") == month))
        .limit(1)
        .take(1)
    )


def _record(spark: SparkSession, path: str, year: int, month: int, rows: int) -> None:
    row = [(path, year, month, rows)]
    (
        spark.createDataFrame(
            row, "source_path string, year int, month int, row_count long"
        )
        .withColumn("loaded_at", F.current_timestamp())
        .write.mode("append")
        .insertInto(INGEST_LOG)
    )
