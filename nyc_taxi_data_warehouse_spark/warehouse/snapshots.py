"""Snapshot-versioned tables — manifest commits, time travel, vacuum.

``merge_upsert``/``load_month`` rewrite partitions IN PLACE (dynamic
partition overwrite). That is idempotent, but at cluster scale it has
the classic lockless-warehouse race: a reader that planned its scan
before an overwrite commits can read a partition mid-rewrite. The fix —
the same idea Delta/Iceberg are built on, reduced to its core — is to
never mutate data files, only publish new MANIFESTS:

```
table/
  data/<commit-uuid>/...            immutable parquet, written once
  _versions/00000001.json           checkpoint commit: {"ckpt": <blob>}
  _versions/00000001.<id>.ckpt.parquet   full state, zstd parquet
  _versions/00000002.json           delta commit: {"files_add": [...]}
```

- A table VERSION is a JSON manifest resolving to exactly the data
  files it comprises (plus the schema, so empty tables read back
  typed). The on-disk doc is an O(CHANGE) DELTA against its parent —
  adds/removes of files, DV sidecars, stats entries — with a full
  columnar checkpoint blob every ``manifestlog.checkpoint_every()``
  commits and at every chain start; see ``manifestlog`` for the
  format, reconstruction, and the 100 TB metadata math.
- The LATEST version is simply the highest-numbered manifest — no
  pointer file, so publishing a version is ONE atomic exclusive create
  (``FileSystem.create(overwrite=false)``): readers see the old
  version or the new one, never a mix, and two racing writers cannot
  both claim a version number (the loser retries on the next number).
  Checkpoint blobs are written BEFORE the claim, so a committed doc's
  blob always exists; a losing racer's blob is aged debris for
  ``sweep_orphans``.
- Readers resolve a manifest, then scan an explicit file list; a
  concurrent commit cannot change files out from under a running scan
  because data files are never rewritten or deleted by commits.
- ``vacuum_snapshots`` deletes files referenced ONLY by dropped
  versions — storage reclamation is decoupled from correctness, and
  time travel (``read_snapshot(version=N)``) works for any retained N.

All filesystem IO goes through the Hadoop ``FileSystem`` API (via the
session's JVM), so the same code addresses ``file://``, HDFS, or any
``FileSystem`` implementation the cluster ships. The one semantic this
layer leans on is atomic exclusive create, which local filesystems and
HDFS give; plain S3 would need the S3A conditional-create or a commit
service — the documented reality for every manifest-log design.
"""

from __future__ import annotations

import json
import re
import uuid

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from . import manifestlog

_VDIR = "_versions"
_DDIR = "data"
_BDIR = "_branches"
_TDIR = "_tags"

# Branch refs: "<table-path>#<branch>" — '#' begins the fragment in any
# URI, so no real filesystem/object-store path contains one, making it
# an unambiguous separator. A ref routes MANIFESTS to the branch's own
# version chain (_branches/<name>/_versions/) while data files always
# live in the table root's shared data/ pool (commit dirs are
# uuid-named, so branch writers can never collide with main or with
# each other on a data path). Every snapshot function that takes a
# table path accepts a ref; see ``warehouse/branching.py`` for the
# public branch/tag API.
_REF_SEP = "#"


def _split_ref(path: str) -> tuple[str, str]:
    """(table root, manifest dir relative to root) for a path-or-ref."""
    if _REF_SEP not in path:
        return path, _VDIR
    root, _, branch = path.rpartition(_REF_SEP)
    _check_ref_name(branch)
    return root, f"{_BDIR}/{branch}/{_VDIR}"


def _root(path: str) -> str:
    """The table root of a path-or-ref (where data files live)."""
    return _split_ref(path)[0]


def _check_ref_name(name: str) -> None:
    import re

    if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]*", name or ""):
        raise ValueError(
            f"invalid branch/tag name {name!r}: use letters, digits, "
            "'.', '_', '-' (must start alphanumeric)"
        )


class SnapshotConflict(RuntimeError):
    """Another writer published this version first; retry the commit."""


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _jp(jvm, *parts: str):
    return jvm.org.apache.hadoop.fs.Path("/".join(p.rstrip("/") for p in parts))


def _read_bytes(fs, jvm, jpath) -> bytes:
    stream = fs.open(jpath)
    try:
        return bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()


# How the commit claims a manifest name. The whole isolation story rests
# on exactly one writer winning the `{version:08d}.json` create:
#
# - ``"create"`` (default): ``fs.create(path, overwrite=false)`` —
#   atomic on HDFS and local filesystems, where the namenode/kernel
#   arbitrates the exclusive create.
# - ``"builder"``: the ``FSDataOutputStreamBuilder`` contract,
#   ``fs.createFile(path).overwrite(false).build()``. On S3A with
#   conditional creates enabled this maps to a conditional PUT
#   (``If-None-Match: *``), where the CONFLICT surfaces at ``close()``
#   (the PUT happens there), not at create time — the plain "create"
#   path's check-then-create is a race window on object stores. Both
#   failure points are treated as "lost the race"; mis-reporting a
#   transient close() failure as a conflict is SAFE (SnapshotConflict is
#   retryable and the orphaned data files never corrupt reads), whereas
#   the reverse — claiming success on an unconfirmed write — is not.
#
# Selected globally via SPARK_GRAFT_SNAPSHOT_COMMIT (create|builder);
# there is deliberately no per-call argument — mixing claim strategies
# on one table would let two writers both win the same version.
def _commit_mode() -> str:
    import os

    mode = os.environ.get("SPARK_GRAFT_SNAPSHOT_COMMIT", "create")
    if mode not in ("create", "builder"):
        raise ValueError(
            f"SPARK_GRAFT_SNAPSHOT_COMMIT must be create|builder; got {mode!r}"
        )
    return mode


def _write_bytes_exclusive(fs, jpath, data: bytes) -> bool:
    """Atomic create-if-absent; False when the path already exists (or,
    in builder mode, when the conditional write could not be CONFIRMED
    — see ``_commit_mode``)."""
    if _commit_mode() == "builder":
        # unlike plain create(), the builder does not create parent
        # directories; mkdirs is idempotent (and a no-op namespace-wise
        # on object stores, where directories are virtual)
        fs.mkdirs(jpath.getParent())
        try:
            out = fs.createFile(jpath).overwrite(False).build()
        except Exception:
            return False
        try:
            out.write(bytearray(data))
            out.close()
        except Exception:
            # conditional-PUT stores reject here (If-None-Match miss)
            return False
        return True
    try:
        out = fs.create(jpath, False)
    except Exception:
        return False
    try:
        out.write(bytearray(data))
    finally:
        out.close()
    return True


def _list_manifests(spark: SparkSession, path: str) -> list[int]:
    root, mdir = _split_ref(path)
    fs, jvm = _fs(spark, root)
    vdir = _jp(jvm, root, mdir)
    if not fs.exists(vdir):
        return []
    out = []
    for st in fs.listStatus(vdir):
        name = st.getPath().getName()
        if name.endswith(".json"):
            out.append(int(name[:-5]))
    return sorted(out)


def _read_doc(
    spark: SparkSession, path: str, version: int, must: bool = True
) -> dict | None:
    """The RAW manifest JSON body of one version — a delta/checkpoint
    doc (see ``manifestlog``) or a legacy full manifest. ``must=False``
    returns None when the version's manifest no longer exists
    (vacuumed) instead of raising."""
    root, mdir = _split_ref(path)
    fs, jvm = _fs(spark, root)
    jpath = _jp(jvm, root, mdir, f"{version:08d}.json")
    if not must and not fs.exists(jpath):
        return None
    # The committer claims the manifest name with an exclusive create,
    # then writes the (small) body in one buffered write+close. A reader
    # can glimpse the claimed-but-unfinished file for a moment; a short
    # retry closes that window without any lock protocol.
    for attempt in range(5):
        try:
            return json.loads(_read_bytes(fs, jvm, jpath).decode("utf-8"))
        except (ValueError, UnicodeDecodeError):
            if attempt == 4:
                raise
            import time

            time.sleep(0.05 * (attempt + 1))


def _read_blob(spark: SparkSession, path: str, name: str) -> bytes | None:
    """A manifest-dir sidecar blob (checkpoint parquet); None if gone."""
    root, mdir = _split_ref(path)
    fs, jvm = _fs(spark, root)
    jpath = _jp(jvm, root, mdir, name)
    if not fs.exists(jpath):
        return None
    return _read_bytes(fs, jvm, jpath)


def _write_blob(spark: SparkSession, path: str, name: str, data: bytes):
    root, mdir = _split_ref(path)
    fs, jvm = _fs(spark, root)
    jpath = _jp(jvm, root, mdir, name)
    fs.mkdirs(jpath.getParent())
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


# Reconstructed-state LRU (see manifestlog.StateCache): keyed by the
# commit's uuid manifest_id, so hits can never be stale — across
# sessions, branches, and dropped-and-recreated tables alike. Makes
# ascending history walks (snapshot_versions, the change feed, vacuum)
# O(1) folds per version instead of O(chain) re-reads.
_STATE_CACHE = manifestlog.StateCache(maxsize=256)


def _load_manifest(spark: SparkSession, path: str, version: int) -> dict:
    """The full manifest dict of one version — per-commit scalars plus
    the reconstructed state (files / dv_files / dv_targets / stats):
    the commit docs on disk are O(change) deltas with periodic parquet
    checkpoints (``manifestlog``), so no reader ever depends on a
    full-table JSON being rewritten per commit."""
    doc = _read_doc(spark, path, version, must=True)
    if "files" in doc:
        return doc  # legacy full manifest: state inline
    return manifestlog.reconstruct(
        doc,
        lambda v: _read_doc(spark, path, v, must=False),
        lambda name: _read_blob(spark, path, name),
        _STATE_CACHE,
    )


def _colmap(man: dict) -> dict:
    """The manifest's logical→physical column-name map (RENAME
    support). Identity entries are never stored; absent/empty means
    every column's on-disk name equals its logical name (all
    pre-rename history). Physical names are FROZEN at add time:
    ``snapshot_rename_column`` changes only the logical name in
    ``man["schema"]`` and records the mapping here, so every file —
    written before OR after the rename — stores the same physical
    column, and readers alias once at the read boundary instead of
    resolving names per file (the silent-null hazard a naive rename
    has). Everything BELOW the manifest boundary is physical: file
    columns, per-file stats keys, ``stats_cols``, partition
    directories, equality-delete sidecar columns and entry keys."""
    return man.get("colmap") or {}


def _phys(man: dict, col: str) -> str:
    """Physical (on-disk) name of logical column ``col`` per the
    MANIFEST's colmap."""
    return _colmap(man).get(col, col)


def _phys_fields(schema: StructType, colmap: dict) -> StructType:
    """``schema`` with field names mapped logical→physical."""
    from pyspark.sql.types import StructField

    return StructType(
        [
            StructField(
                colmap.get(f.name, f.name), f.dataType, f.nullable
            )
            for f in schema.fields
        ]
    )


def _write_commit_files(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None,
    colmap: dict | None = None,
) -> tuple[str, list[str]]:
    """Write ``df`` as a new immutable commit dir; returns (commit id,
    file paths RELATIVE to the table root). Branch refs write into the
    same root data/ pool as main (uuid commit dirs cannot collide).

    ``colmap`` (logical→physical, see ``_colmap``): ``df`` arrives
    with LOGICAL names from every writer; files always store PHYSICAL
    names, so renamed columns keep one on-disk identity across the
    table's whole history. ``partition_cols`` are already physical
    (the manifest stores the directory layout's names)."""
    path = _root(path)
    commit = uuid.uuid4().hex
    dest = f"{path}/{_DDIR}/{commit}"
    if colmap:
        phys = [colmap.get(c, c) for c in df.columns]
        dups = sorted({p for p in phys if phys.count(p) > 1})
        if dups:
            # a newest-writer-wins append can evolve the schema with a
            # column NAMED after another column's frozen physical slot
            # (add_column refuses this; the raw append path lands here)
            # — fail with the real cause, not parquet's duplicate-
            # column error after a partial job
            pairs = [
                f"{c!r}→{colmap.get(c, c)!r}"
                for c in df.columns
                if colmap.get(c, c) in dups
            ]
            raise ValueError(
                "columns collide on their on-disk (physical) names "
                f"({', '.join(pairs)}) — a column may not reuse another "
                "column's physical slot; pick a different name"
            )
        df = df.select(
            *[F.col(c).alias(p) for c, p in zip(df.columns, phys)]
        )
    writer = df.write.mode("error")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(dest)
    spark = df.sparkSession
    fs, jvm = _fs(spark, path)
    root_uri = fs.makeQualified(_jp(jvm, path)).toString().rstrip("/")
    files = []
    it = fs.listFiles(_jp(jvm, dest), True)
    while it.hasNext():
        p = it.next().getPath().toString()
        name = p.rsplit("/", 1)[-1]
        if name.startswith("_") or name.startswith("."):
            continue
        assert p.startswith(root_uri + "/"), (p, root_uri)
        files.append(p[len(root_uri) + 1 :])
    return commit, sorted(files)


_DV_INHERIT = "inherit"


def _dv_targets_for(man: dict, new_targets=()) -> object:
    """The ``dv_targets`` value for a commit that carries ``man``'s
    sidecars (plus optionally new ones tombstoning ``new_targets``):
    the recorded list unioned with the additions — or the INHERIT
    sentinel when ``man`` is a legacy manifest with sidecars but no
    recorded target list, making ``_commit`` derive it from the
    sidecar footprint once (after which it stays recorded)."""
    if man.get("dv_files") and man.get("dv_targets") is None:
        return _DV_INHERIT
    if not (man.get("dv_targets") or new_targets):
        return None
    return sorted(set(man.get("dv_targets") or ()) | set(new_targets))


# ---------------------------------------------------------------------------
# Equality deletes: key-tombstone sidecars scoped by per-file sequence
# ---------------------------------------------------------------------------
#
# An EQUALITY-DELETE entry is {"path": <sidecar relpath>, "seq":
# <commit version>, "keys": [<key columns>]}: the sidecar's rows (one
# per deleted key) delete every matching row in live files added
# STRICTLY BEFORE seq (per the manifest's per-file "seq" map; a file
# with no entry predates tracking and every delete applies). Files
# appended in the same commit get seq == the entry's seq, so an
# upsert's own new images are never self-deleted. This is the public
# Iceberg-v2 equality-delete design re-expressed on this manifest
# format: the WRITE side never reads the table (a CDC upsert batch
# costs its own images plus one key sidecar), the READ side anti-joins
# keys only over the applicable files, and ``snapshot_resolve_eq``
# folds entries into position deletion vectors so read cost never
# accretes. Mutators (DML/compact) resolve outstanding entries first —
# their stats proofs and row accounting stay position-exact.


def _eq_entries(man: dict) -> list[dict]:
    return list(man.get("eqs") or [])


def _eq_applicable(entries: list[dict], seq_map: dict, f: str) -> bool:
    s = seq_map.get(f, 0)
    return any(e["seq"] > s for e in entries)


def _eq_affected_files(man: dict, files=None) -> list[str]:
    """The (scoped) live files at least one equality delete applies
    to — the surface metadata-only answers must scan instead."""
    entries = _eq_entries(man)
    if not entries:
        return []
    seq_map = man.get("seq") or {}
    src = man["files"] if files is None else files
    return [f for f in src if _eq_applicable(entries, seq_map, f)]


def _eq_live_entries(
    entries: list[dict], files: list[str], seq_map: dict
) -> list[dict]:
    """Entries still applicable to at least one of ``files`` — the
    rest are inert (every file they could match has left the table)
    and fold away, exactly like shrunk dv_targets."""
    out = []
    for e in entries:
        if any(seq_map.get(f, 0) < e["seq"] for f in files):
            out.append(e)
    return out


def _sidecar_df(
    spark: SparkSession, root: str, paths: list[str], cols: list[str]
) -> DataFrame:
    """Read sidecar parquet relpaths projected to ``cols``, broadcast
    when the on-disk total is <= 64 MB (the overwhelmingly common
    case — sidecars hold only deleted keys/positions), else leave the
    join to shuffle rather than risk the driver. The ONE copy of the
    threshold policy every sidecar consumer (position DVs, equality
    keys, the change feed's delta reads) shares."""
    root = _root(root)
    df = spark.read.parquet(*[f"{root}/{p}" for p in paths]).select(*cols)
    fs, jvm = _fs(spark, root)
    total = sum(
        fs.getFileStatus(_jp(jvm, root, p)).getLen() for p in paths
    )
    return F.broadcast(df) if total <= 64 << 20 else df


def _apply_eq(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    entries: list[dict],
) -> DataFrame:
    """Anti-join ``df`` against the entries' key sidecars. Entries are
    grouped by key-column set so N same-shape upsert batches cost one
    join, not N. Plain (non-null-safe) equality: a NULL key on a data
    row never matches — the upsert writers refuse NULL keys, so a NULL
    here can only be pre-existing data an eq delete must not touch."""
    if not entries:
        return df
    by_keys: dict[tuple, list[str]] = {}
    for e in entries:
        by_keys.setdefault(tuple(e["keys"]), []).append(e["path"])
    for keys, paths in sorted(by_keys.items()):
        keycols = list(keys)
        df = df.join(
            _sidecar_df(spark, root, paths, keycols), keycols, "left_anti"
        )
    return df


def _commit(
    spark: SparkSession,
    path: str,
    files: list[str],
    schema: StructType,
    op: str,
    parent: int | None,
    extra: dict | None = None,
    partition_cols: list[str] | None = None,
    dv_files=_DV_INHERIT,
    dv_targets=_DV_INHERIT,
    known_rows: dict[str, int] | None = None,
    props=_DV_INHERIT,
    carried_only: bool = False,
    eq_files=_DV_INHERIT,
    known_seq: dict | None = None,
    last_seq_floor: int | None = None,
    colmap=_DV_INHERIT,
    defaults=_DV_INHERIT,
) -> int:
    """``dv_files`` — the DELETION-VECTOR sidecars active at this
    version (parquet relpaths of (file, pos) tombstones, merged at
    read; see ``snapshot_delete_rows_dv``). Default is INHERIT from
    the parent: DV entries are keyed by (relpath, row position) and
    data files are immutable + uuid-unique, so a stale entry for a
    file the commit dropped is inert — while an entry for a carried
    file MUST keep riding or its deleted rows resurrect. Commits that
    replace the whole table state (overwrite, compact, restore,
    publish) pass an explicit list/None instead.

    ``dv_targets`` — the distinct data files the sidecars tombstone,
    recorded in the manifest so readers can split scans (untargeted
    files skip the anti-join entirely) and the streaming feed planner
    never opens a sidecar. Same inherit semantics; a SUPERSET of the
    live targets is legal (readers intersect with ``files`` — uuid
    commit dirs make relpath reuse impossible, so a superset can
    never claim a fresh file). A caller passing explicit sidecars
    without targets gets them derived from the sidecar footprint
    (one metadata-sized distinct per commit).

    METADATA IS O(CHANGE): the on-disk doc is a delta against the
    parent's reconstructed state (adds/removes of files, sidecars,
    targets, stats entries) with a full parquet checkpoint every
    ``manifestlog.checkpoint_every()`` commits and at every chain
    start — see ``manifestlog`` for the format and scale math. The
    checkpoint blob is written BEFORE the exclusive manifest claim,
    so a doc that references one can always resolve it; a losing
    racer's blob is debris for ``sweep_orphans``.

    ``eq_files`` — the EQUALITY-DELETE entries active at this version
    ([{"path", "seq", "keys"}]; see the module-level note above
    ``_eq_entries``). Inherit semantics like ``dv_files``; an entry
    passed with ``seq=None`` is stamped with THIS commit's sequence
    number (the entry deletes rows only in files that predate it).
    Entries no live file is subject to are pruned automatically.
    ``known_seq`` carries per-file added-at sequences through
    whole-state ops (restore/fork/publish), like ``known_rows``;
    files new to the table are stamped with the commit's sequence.
    ``last_seq_floor`` forces the commit's sequence above another
    chain's counter (fork: the base table's; publish: the branch
    head's) — sequence numbers order files against eq entries, and
    branch chains restart VERSION numbers at 1, so versions cannot
    serve."""
    import time

    root, mdir = _split_ref(path)
    fs, jvm = _fs(spark, root)
    pman = _load_manifest(spark, path, parent) if parent is not None else None
    if dv_files == _DV_INHERIT:
        dv_files = pman.get("dv_files") if pman else None
        if dv_targets == _DV_INHERIT:
            dv_targets = pman.get("dv_targets") if pman else None
    if dv_targets == _DV_INHERIT:
        dv_targets = None
    if dv_files and not dv_targets:
        dv_targets = sorted(
            r[0]
            for r in spark.read.parquet(*[f"{root}/{p}" for p in dv_files])
            .select("_dv_file")
            .distinct()
            .collect()
        )
    if not dv_files:
        dv_targets = None
    if eq_files == _DV_INHERIT:
        eq_files = pman.get("eqs") if pman else None
    # logical→physical column map (RENAME; see _colmap). INHERIT from
    # the parent like every carried scalar; whole-state ops (restore,
    # fork, publish) pass the source manifest's; full overwrites pass
    # None (fresh files are written physical == logical). Entries whose
    # logical key left the schema are PRUNED (self-healing, like inert
    # eq entries): an append under the newest-writer-wins schema rule
    # can revert a renamed column to its physical name, and a stale
    # entry would poison the read boundary's inverse aliasing.
    if colmap == _DV_INHERIT:
        colmap = _colmap(pman) if pman else None
    if colmap:
        names = {f.name for f in schema.fields}
        colmap = {
            l: p for l, p in colmap.items() if l in names and l != p
        }
    colmap = dict(colmap) if colmap else None
    # INITIAL defaults ({physical col: scalar}; see _read_file_list):
    # inherited and pruned exactly like colmap — an entry whose
    # physical slot left the schema is dead weight
    if defaults == _DV_INHERIT:
        defaults = (pman.get("defaults") if pman else None) or None
    if defaults:
        phys_names = {
            (colmap or {}).get(f.name, f.name) for f in schema.fields
        }
        defaults = {
            c: v for c, v in defaults.items() if c in phys_names
        }
    defaults = dict(defaults) if defaults else None
    files = sorted(files)
    if len(set(files)) != len(files):
        raise ValueError(f"duplicate relpaths in commit file list at {path}")
    version = (parent or 0) + 1
    # the chain-independent data sequence: strictly increases along
    # any commit lineage (legacy parents without one fall back to
    # their version — same monotonicity, and only relative order
    # matters)
    parent_last = (
        int(pman.get("last_seq") or pman["version"]) if pman else 0
    )
    seq_no = max(parent_last, int(last_seq_floor or 0)) + 1
    extra = dict(extra or {})
    stats = extra.pop("stats", None)
    stats_cols = extra.pop("stats_cols", None)
    if stats is None:
        stats_cols = None
    # Per-file row counts: carry the parent's entries for carried
    # files, read footers ONLY for paths the parent didn't know —
    # O(change) per commit, like every other manifest field. Counts
    # for legacy history stay absent until those files churn (readers
    # self-heal from footers); forged metadata-only commits (tests)
    # simply record none (missing_ok skips not-found footers).
    parent_rows = (pman.get("rows") if pman else None) or {}
    parent_files = set(pman["files"]) if pman else set()
    rows = {f: parent_rows[f] for f in files if f in parent_rows}
    if known_rows:  # caller already read these footers — don't repeat
        rows.update(
            {f: known_rows[f] for f in files if f in known_rows}
        )
    # strictly files NEW TO THE TABLE: a carried file the (legacy)
    # parent tracked without a count stays a gap — backfilling here
    # would make one upgrade commit O(table) footer reads; readers
    # (snapshot_count) self-heal the gap per call instead.
    # ``carried_only`` marks whole-state carries whose files all come
    # from some other validated manifest (branch fork with parent=None,
    # publish, restore): their row-count gaps must stay gaps too.
    new_files = (
        []
        if carried_only
        else [f for f in files if f not in rows and f not in parent_files]
    )
    if new_files:
        rows.update(_rows_for_files(spark, root, new_files, missing_ok=True))
    # Per-file added-at sequences: carried files keep the parent's
    # entries; whole-state ops pass the source manifest's via
    # ``known_seq``; anything still unknown that is genuinely new to
    # the table is stamped with this commit's sequence. Files known
    # to neither stay gaps (legacy history — treated as predating
    # every equality delete, which is what they do).
    parent_seq = (pman.get("seq") if pman else None) or {}
    seq = {f: parent_seq[f] for f in files if f in parent_seq}
    if known_seq:
        seq.update({f: known_seq[f] for f in files if f in known_seq})
    if not carried_only:
        for f in files:
            if f not in seq and f not in parent_files:
                seq[f] = seq_no
    # Equality-delete entries: stamp fresh entries (seq=None) with
    # this commit's sequence, then prune entries no live file is
    # subject to (inert — every file they could match has left).
    eq_files = [
        {**e, "seq": seq_no if e.get("seq") is None else e["seq"]}
        for e in (eq_files or [])
    ]
    eq_files = _eq_live_entries(eq_files, files, seq) or None
    # Table properties CARRY like every other state key (the INHERIT
    # default); whole-state commits (branch fork, publish) and the
    # property DDL pass an explicit dict. CHECK constraints live under
    # "constraint.<name>" and are enforced here — the single choke
    # point every commit flows through — against the files NEW TO THE
    # TABLE (O(change) data read; restores re-validate resurrected
    # files against the CURRENT constraints). A failed check leaves
    # the written files as sweep_orphans debris, never a version.
    # Branch forks and publishes are exempt: they are whole-state
    # carries of an already-validated state (props travel WITH it, so
    # enforcement history is consistent), and validating them would
    # re-scan the table per fork.
    if props == _DV_INHERIT:
        props = pman.get("props") if pman else None
    props = dict(props) if props else None
    if props and op not in ("branch", "publish"):
        added = [f for f in files if f not in parent_files]
        # validate under the COMMIT's own masking: fresh files are
        # never dv-targeted or eq-applicable (uuid dirs, own-sequence
        # stamps), so this is free for appends — but a restore
        # re-adds OLD files whose violating rows may be masked dead
        # by the carried tombstones/entries, and refusing those would
        # block a perfectly valid rollback
        _enforce_constraints(
            spark, root, added, schema, partition_cols, props,
            dv_files=sorted(dv_files) if dv_files else None,
            dv_targets=sorted(set(dv_targets)) if dv_targets else None,
            eq_entries=eq_files,
            file_seq=seq,
            colmap=colmap,
            defaults=defaults,
        )
        # Rows can also go live WITHOUT a new file: a commit that
        # DROPS tombstone sidecars (restore rolling back past a DV
        # delete) resurrects previously-masked rows in carried files.
        # Detect it metadata-only (a sidecar left the dv set) and
        # re-validate the parent's targeted files that remain live,
        # under the NEW dv masking, so still-deleted rows never
        # false-positive. compact_dvs is exempt: consolidation proves
        # its live tombstone set unchanged by count round-trip.
        removed_dvs = set((pman or {}).get("dv_files") or ()) - set(
            dv_files or ()
        )
        if removed_dvs and op != "compact_dvs":
            fset = set(files)
            if pman is not None and pman.get("dv_targets") is not None:
                suspects = set(pman["dv_targets"])
            else:  # legacy parent: no recorded targets — be safe
                suspects = set((pman or {}).get("files") or ())
            suspects = sorted((suspects & fset) - set(added or ()))
            if suspects:
                _enforce_constraints(
                    spark, root, suspects, schema, partition_cols, props,
                    dv_files=sorted(dv_files) if dv_files else None,
                    dv_targets=sorted(set(dv_targets))
                    if dv_targets
                    else None,
                    eq_entries=eq_files,
                    file_seq=seq,
                    colmap=colmap,
                    defaults=defaults,
                )
        # Same resurrection hazard for EQUALITY deletes: an entry that
        # left the state (restore rolling back past an upsert) brings
        # its masked rows back to life in carried files — re-validate
        # the files it applied to, under the NEW masking. resolve_eq
        # is exempt: it replaces entries with position tombstones for
        # the same rows (visibility unchanged by construction, and the
        # recorded resolve counts pin it).
        cur_eq_paths = {e["path"] for e in (eq_files or [])}
        removed_eqs = [
            e
            for e in ((pman or {}).get("eqs") or [])
            if e["path"] not in cur_eq_paths
        ]
        if removed_eqs and op != "resolve_eq":
            fset = set(files)
            suspects = sorted(
                f
                for f in fset
                if f not in set(added or ())
                and _eq_applicable(removed_eqs, seq, f)
            )
            if suspects:
                _enforce_constraints(
                    spark, root, suspects, schema, partition_cols, props,
                    dv_files=sorted(dv_files) if dv_files else None,
                    dv_targets=sorted(set(dv_targets))
                    if dv_targets
                    else None,
                    eq_entries=eq_files,
                    file_seq=seq,
                    colmap=colmap,
                    defaults=defaults,
                )
    state = {
        "files": files,
        "dv_files": sorted(dv_files) if dv_files else None,
        "dv_targets": sorted(set(dv_targets)) if dv_targets else None,
        "stats": stats,
        "stats_cols": stats_cols,
        "rows": rows or None,
        "props": props,
        "eqs": (
            sorted(eq_files, key=lambda e: (e["seq"], e["path"]))
            if eq_files
            else None
        ),
        "seq": seq or None,
    }
    scalars = {
        "version": version,
        "parent": parent,
        "op": op,
        "last_seq": seq_no,
        # wall-clock commit time (driver): powers timestamp time travel
        # (``snapshot_version_at``). Ordering is by VERSION, not this
        # field — clock skew between writers cannot reorder history, it
        # only blurs which version a given timestamp resolves to, the
        # same contract every manifest-log store documents.
        "committed_at_ms": int(time.time() * 1000),
        # immutable uuid identity: chains the delta log (children
        # record parent_id), keys the reconstruction cache, and binds
        # checkpoint blobs to the manifest that references them
        "manifest_id": uuid.uuid4().hex,
        "schema": json.loads(schema.json()),
        # The table's partition LAYOUT is part of the manifest: carried
        # files are classified by their partition directories, so every
        # commit must agree on the layout (enforced by
        # ``_require_same_layout``) and rewrites (delete/compact) must
        # reproduce it.
        "partition_cols": list(partition_cols) if partition_cols else None,
        **({"colmap": colmap} if colmap else {}),
        **({"defaults": defaults} if defaults else {}),
        **extra,
    }
    if pman is not None and pman.get("manifest_id"):
        scalars["parent_id"] = pman["manifest_id"]
    parent_state = (
        manifestlog.state_from_manifest(pman) if pman is not None else None
    )
    doc, ckpt = manifestlog.encode_commit(scalars, state, parent_state)
    if ckpt is not None:
        _write_blob(spark, path, doc["ckpt"], ckpt)
    data = json.dumps(doc, sort_keys=True).encode("utf-8")
    jpath = _jp(jvm, root, mdir, f"{version:08d}.json")
    if not _write_bytes_exclusive(fs, jpath, data):
        raise SnapshotConflict(
            f"version {version} of {path} was committed concurrently"
        )
    _STATE_CACHE.put(doc["manifest_id"], state)
    return version


def _manifest_partition_cols(man: dict) -> list[str] | None:
    pc = man.get("partition_cols")
    return list(pc) if pc else None


def _require_same_layout(
    man: dict, partition_cols: list[str] | None, op: str
) -> None:
    """Carried files are classified by partition DIRECTORY, so a commit
    whose layout differs from the parent's would silently misclassify
    them (an unpartitioned rewrite's files are 'never in any touched
    partition' — stale rows survive merges). Fail fast instead. Legacy
    manifests that predate layout recording are exempt (the
    depth check in ``snapshot_replace_partitions`` still guards them).
    """
    if "partition_cols" not in man:
        return
    have = _manifest_partition_cols(man)
    want = list(partition_cols) if partition_cols else None
    if have != want:
        raise ValueError(
            f"{op}: table partition layout is {have} but caller passed "
            f"{want} — mixed layouts misclassify carried files; evolve "
            "the layout metadata-only with snapshot_set_layout, or "
            "rewrite with snapshot_write(mode='overwrite') / "
            "snapshot_compact"
        )


def snapshot_write(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_cols: list[str] | None = None,
    retries: int = 0,
) -> int:
    """Publish ``df`` as a new table version; returns the version
    number. ``mode='overwrite'`` makes the new commit the whole table;
    ``'append'`` unions it with the parent version's files. Raises
    ``SnapshotConflict`` if another writer claims the version number
    first (data files are orphaned, never corrupting — re-run).

    ``retries``: on conflict, re-derive the parent and RECOMMIT THE
    SAME already-written data files against the new head — the
    standard lakehouse transaction retry. The expensive write job runs
    once; each retry is metadata-only (one manifest read + one
    exclusive create). Semantically safe for both modes: an overwrite
    means "this df is the whole table" regardless of head, and an
    append's union with the NEW parent's file list composes with any
    concurrent commit (a concurrent delete's rewrite is in the new
    parent; this append's files are disjoint by construction)."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append; got {mode!r}")
    spark = df.sparkSession
    versions = _list_manifests(spark, path)
    parent = versions[-1] if versions else None
    cmap, dflts = None, None
    if mode == "append" and parent is not None:
        pman = _load_manifest(spark, path, parent)
        # fail fast BEFORE the expensive data write
        _require_same_layout(pman, partition_cols, "append")
        # appended files store PHYSICAL names (frozen across renames —
        # see _colmap); a full overwrite starts a fresh identity map.
        # defaults are captured WITH the schema, like the colmap — the
        # retry loop must never pair this schema with a different
        # head's alter state (the captured-tuple rule).
        cmap = _colmap(pman) or None
        dflts = pman.get("defaults")
    _, new_files = _write_commit_files(df, path, partition_cols, colmap=cmap)
    for attempt in range(retries + 1):
        files = new_files
        if mode == "append" and parent is not None:
            pman = _load_manifest(spark, path, parent)
            _require_same_layout(pman, partition_cols, "append")
            files = sorted(pman["files"] + new_files)
        try:
            return _commit(
                spark, path, files, df.schema, mode, parent,
                partition_cols=partition_cols,
                dv_files=_DV_INHERIT if mode == "append" else None,
                colmap=cmap if mode == "append" else None,
                defaults=dflts if mode == "append" else None,
            )
        except SnapshotConflict:
            if attempt == retries:
                raise
            versions = _list_manifests(spark, path)
            parent = versions[-1] if versions else None


def snapshot_replace_partitions(
    df: DataFrame, path: str, partition_cols: list[str],
    extra=None,
    retries: int = 0,
) -> int:
    """Dynamic-partition-overwrite semantics, versioned: the new commit
    replaces the parent's files ONLY in the partitions present in
    ``df``; all other files carry over. Readers of older versions are
    unaffected — this is the race-free counterpart of the in-place
    overwrite in ``merge.py``. ``extra`` keys are recorded verbatim in
    the commit manifest (the snapshot-backed load path records its
    ``load`` provenance there, making the manifest the idempotency
    ledger). ``extra`` may be a CALLABLE returning the dict — it is
    invoked only after the commit files are written, so values that
    materialize with the write job (an Observation's row count) can be
    recorded without a second scan."""
    spark = df.sparkSession
    versions = _list_manifests(spark, path)
    parent = versions[-1] if versions else None
    # Metadata-sized: one row per touched partition. Null partition
    # values land in Spark's default-partition directory; values whose
    # STRING form needs path escaping (spaces etc.) are out of contract
    # for partition columns here, as in the rest of the warehouse.
    touched_rows = df.select(*partition_cols).distinct().collect()
    touched = {
        "/".join(
            f"{c}=__HIVE_DEFAULT_PARTITION__" if r[c] is None else f"{c}={r[c]}"
            for c in partition_cols
        )
        for r in touched_rows
    }
    if parent is not None:
        _require_same_layout(
            _load_manifest(spark, path, parent),
            partition_cols,
            "replace_partitions",
        )
    cmap, dflts = None, None
    if parent is not None:
        _pm = _load_manifest(spark, path, parent)
        cmap = _colmap(_pm) or None
        dflts = _pm.get("defaults")  # captured-tuple rule
    _, new_files = _write_commit_files(
        df, path, partition_cols, colmap=cmap
    )
    extra_doc = extra() if callable(extra) else extra
    seen_files = (
        set(_load_manifest(spark, path, parent)["files"])
        if parent is not None
        else set()
    )
    for attempt in range(retries + 1):
        carried = []
        if parent is not None:
            prefixes = tuple(f"{c}=" for c in partition_cols)
            for f in _load_manifest(spark, path, parent)["files"]:
                rel = f.split("/", 2)[-1]  # strip data/<commit>/
                dirs = rel.split("/")[:-1]
                # A parent file without the expected partition
                # directories (written unpartitioned by a legacy
                # rewrite) cannot be classified — carrying it would
                # keep stale rows of touched partitions alive. Fail
                # fast; such files no longer occur (every rewrite
                # reproduces the recorded layout).
                if len(dirs) != len(partition_cols) or any(
                    not d.startswith(p) for d, p in zip(dirs, prefixes)
                ):
                    raise ValueError(
                        f"replace_partitions: parent file {f} is not laid "
                        f"out by {partition_cols} (layout evolution leaves "
                        "old files in their original dirs); run "
                        "snapshot_compact to migrate them first"
                    )
                pdir = rel.rsplit("/", 1)[0] if "/" in rel else ""
                if pdir not in touched:
                    carried.append(f)
        try:
            return _commit(
                spark,
                path,
                sorted(carried + new_files),
                df.schema,
                "replace_partitions",
                parent,
                extra=extra_doc,
                partition_cols=partition_cols,
                # the captured (schema, colmap, defaults) tuple — see
                # stream_snapshot_append for why inheriting the
                # retry-time head's alter state is a silent-null hazard
                colmap=cmap,
                defaults=dflts,
            )
        except SnapshotConflict:
            # transaction retry: the replacement files are already
            # written and stay valid — only the CARRIED set depends on
            # the parent, and it is recomputed from the new head above
            # (metadata-only), composing with concurrent appends or
            # rewrites of OTHER partitions. A concurrent change inside
            # one of OUR touched partitions is a true write-write
            # conflict: blindly recommitting would silently discard it,
            # so that keeps raising even with retries left.
            if attempt == retries:
                raise
            versions = _list_manifests(spark, path)
            parent = versions[-1] if versions else None
            head_files: set[str] = set()
            if parent is not None:
                pman = _load_manifest(spark, path, parent)
                _require_same_layout(
                    pman, partition_cols, "replace_partitions"
                )
                head_files = set(pman["files"])
            for f in head_files ^ seen_files:
                rel = f.split("/", 2)[-1]
                pdir = rel.rsplit("/", 1)[0] if "/" in rel else ""
                if pdir in touched:
                    raise SnapshotConflict(
                        f"partition {pdir!r} was modified concurrently "
                        "— write-write conflict; re-run the load "
                        "against the current table state"
                    ) from None
            seen_files = head_files


def _to_epoch_ms(ts) -> int:
    """Epoch milliseconds from a datetime, ISO-8601 string, or numeric
    epoch SECONDS (floats keep sub-second precision). Naive datetimes
    and ISO strings are interpreted in the DRIVER's local timezone
    (Python's ``.timestamp()`` default) — the same clock that stamped
    ``committed_at_ms``, so naive-in/naive-out round-trips on one
    machine; pass an aware datetime or a ``+HH:MM`` ISO offset when
    resolving against a table committed from another timezone."""
    import datetime as _dt

    if isinstance(ts, _dt.datetime):
        return int(ts.timestamp() * 1000)
    if isinstance(ts, str):
        # ISO wins for strings: '20260815' is basic-format ISO (a CLI
        # digit-sniffing heuristic would misroute it to epoch-seconds
        # 1970); plain numeric strings that aren't ISO fall through
        try:
            return int(_dt.datetime.fromisoformat(ts).timestamp() * 1000)
        except ValueError:
            return int(float(ts) * 1000)
    return int(float(ts) * 1000)


def snapshot_version_at(spark: SparkSession, path: str, ts) -> int:
    """The latest retained version committed at or before ``ts``
    (datetime | ISO string | epoch seconds) — Delta's TIMESTAMP AS OF.
    Commit times come from the manifests' ``committed_at_ms`` (driver
    wall clock at claim time; manifests predating the field fall back
    to the manifest file's modification time). Resolution walks the
    retained manifest list — metadata-proportional, bounded by
    retention, like every history API here. Raises when ``ts`` predates
    the oldest retained commit (vacuum may have dropped the version
    that was live then — guessing would silently serve newer data), and
    likewise for any ``ts`` inside a retention GAP (tag-pinned vacuum
    drops untagged middles): the dropped versions' commit times are
    gone with their manifests, so the whole (t(best), t(next)) window
    refuses rather than risk serving a version older than what was
    live at ``ts``."""
    ts_ms = _to_epoch_ms(ts)
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    root, mdir = _split_ref(path)
    fs, jvm = _fs(spark, root)
    best = None
    next_man = None
    for v in versions:
        man = _load_manifest(spark, path, v)
        t = man.get("committed_at_ms")
        if t is None:
            t = fs.getFileStatus(
                _jp(jvm, root, mdir, f"{v:08d}.json")
            ).getModificationTime()
        if t <= ts_ms:
            best = v
        else:
            next_man = man  # per-chain commit times are monotone (one
            # writer wins each claim; skew only blurs the boundary)
            break
    if best is None:
        raise FileNotFoundError(
            f"no version of {path} existed at or before {ts!r} (oldest "
            f"retained is v{versions[0]}); history below it was vacuumed"
        )
    # Retention GAP guard: tag-pinned retention can leave holes in the
    # middle of the chain (vacuum drops untagged versions between a tag
    # and the kept tail). If the next retained version's parent is not
    # ``best``, some DROPPED version was live during (t(best), ts] —
    # serving ``best`` would silently time-travel too far back.
    if next_man is not None and next_man.get("parent") != best:
        raise FileNotFoundError(
            f"the version of {path} live at {ts!r} was vacuumed (retained "
            f"chain jumps v{best} -> v{next_man.get('parent')}'s child); "
            "refusing to serve older data"
        )
    return best


def _norm_partition_value(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        # Spark writes boolean partition dirs as 'true'/'false';
        # Python str(True) is 'True' — a silent zero-file match
        return "true" if v else "false"
    return str(v)


def _partition_pruned_files(
    man: dict, partitions: dict, unencoded: str = "raise"
) -> list[str]:
    """Manifest-resident partition pruning: the files of ``man`` whose
    partition-directory values match ``partitions`` ({col: value or
    list-of-values}; ``None`` selects the Hive null partition). Pure
    driver-side string work over relpaths the manifest already holds —
    no listing, no stats, no data I/O — so a one-partition read of a
    10^6-file table plans from metadata alone. Values compare as the
    DIRECTORY strings Spark wrote (callers pass primitives; ``str()``
    normalizes), which is exactly Hive/Iceberg partition-predicate
    semantics. Unknown columns refuse: a typo'd key silently matching
    nothing would read as 'partition is empty'.

    ``unencoded`` picks the behavior for files whose directories do
    NOT carry every filter column — possible only after
    ``snapshot_set_layout`` evolved the layout and before a compact
    migrated the old files (such a file MAY hold matching rows;
    metadata cannot tell):

    - ``"raise"`` (default): refuse loudly — for surfaces whose answer
      must be provable from directory values alone (metadata-only
      partition drops, partition-scoped change feeds, metadata
      MIN/MAX);
    - ``"exclude"``: directory semantics verbatim (a non-encoding file
      never matches) — ONLY for whole-file proofs, where absence of
      the directory must mean "not proven";
    - ``"include"``: conservative keep — for DML victim planning (a
      possible match must stay a candidate);
    - ``"split"``: like "include" but returns ``(files_to_read,
      unencoded_subset)`` in ONE relpath-parsing pass — for readers
      that apply a row-level residual filter
      (``_partition_residual_cond``) and need to know whether any
      unmigrated file survived, without re-parsing every path."""
    from ..streaming.snapshot_source import _partition_values_from_path

    if unencoded not in ("raise", "exclude", "include", "split"):
        raise ValueError(f"bad unencoded mode {unencoded!r}")
    # directory names are PHYSICAL (frozen at add time — see _colmap);
    # callers filter by logical names
    pc = set(_manifest_partition_cols(man) or [])
    bad = sorted(k for k in partitions if _phys(man, k) not in pc)
    if bad:
        raise ValueError(
            f"partition filter on non-partition column(s) {bad} — table "
            f"layout is {sorted(pc) or 'unpartitioned'}"
        )
    partitions = {_phys(man, k): v for k, v in partitions.items()}
    want: dict[str, set] = {}
    for k, val in partitions.items():
        vs = val if isinstance(val, (list, tuple, set, frozenset)) else [val]
        want[k] = {_norm_partition_value(v) for v in vs}
    out = []
    unenc = []
    for f in man["files"]:
        vals = _partition_values_from_path(f)
        missing = [k for k in want if k not in vals]
        if missing:
            if unencoded == "raise":
                raise ValueError(
                    f"file {f} does not encode partition column(s) "
                    f"{missing} in its directories — the layout evolved "
                    "(snapshot_set_layout) and this surface needs "
                    "directory-provable partition values; run "
                    "snapshot_compact to migrate old files first"
                )
            if unencoded in ("include", "split"):
                out.append(f)
                unenc.append(f)
            continue
        if all(vals.get(k) in vs for k, vs in want.items()):
            out.append(f)
    if unencoded == "split":
        return out, unenc
    return out


def _partition_residual_cond(partitions: dict):
    """Row-level equivalent of the directory match — applied by read
    surfaces over files that predate a layout evolution (their rows
    carry the column as DATA, not directories). Comparison is on the
    directory STRING form (cast-to-string), keeping the exact
    semantics ``_partition_pruned_files`` documents; for rows of
    dir-encoded files the condition is a tautology, so applying it to
    a whole mixed read changes nothing for migrated files."""
    cond = None
    for k, val in partitions.items():
        vs = val if isinstance(val, (list, tuple, set, frozenset)) else [val]
        strs = sorted(
            {_norm_partition_value(v) for v in vs if v is not None}
        )
        c = F.col(k).cast("string").isin(*strs) if strs else None
        if any(v is None for v in vs):
            isn = F.col(k).isNull()
            c = isn if c is None else (c | isn)
        if c is None:
            # an EMPTY value list matches nothing — the column's
            # constraint must be FALSE, never silently dropped (which
            # would return every unmigrated-file row)
            c = F.lit(False)
        cond = c if cond is None else (cond & c)
    return cond if cond is not None else F.lit(True)


def _files_not_encoding(
    man: dict, partitions: dict, files: list[str] | None = None
) -> list[str]:
    """The subset of ``files`` (default: all live files) whose relpath
    directories do NOT carry every filter/layout column (logical keys,
    compared physical) — nonempty exactly while a layout evolution
    (``snapshot_set_layout``) has files not yet migrated by a compact."""
    from ..streaming.snapshot_source import _partition_values_from_path

    want = [_phys(man, k) for k in partitions]
    out = []
    for f in man["files"] if files is None else files:
        vals = _partition_values_from_path(f)
        if any(k not in vals for k in want):
            out.append(f)
    return out


def read_snapshot(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    at_timestamp=None,
    partitions: dict | None = None,
    _versions: list | None = None,
) -> DataFrame:
    """The table at ``version`` (default: latest), or as of
    ``at_timestamp`` (datetime | ISO string | epoch seconds — resolved
    via ``snapshot_version_at``). Partition columns come back from the
    directory names (``basePath``), exactly like a plain partitioned
    read.

    ``_versions``: internal — a manifest listing the caller already
    holds (``snapshot_register`` resolves the head itself so its
    registry records exactly what the view reflects; re-listing here
    would double the directory RPCs on the DML view-refresh hot
    path).

    ``partitions`` ({col: value or list}) prunes AT THE MANIFEST: only
    matching files enter the scan (``df.inputFiles()`` shows exactly
    them). This matters on the flat read path, where partition values
    ride a broadcast lookup join rather than Hive directory discovery
    — a WHERE on the joined column cannot skip files there, so without
    manifest pruning a one-partition query of a 100 TB table opens
    every file."""
    if version is not None and at_timestamp is not None:
        raise ValueError("pass version OR at_timestamp, not both")
    if at_timestamp is not None:
        version = snapshot_version_at(spark, path, at_timestamp)
    versions = (
        _versions if _versions is not None else _list_manifests(spark, path)
    )
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(
            f"version {version} not present at {path} (have {versions})"
        )
    man = _load_manifest(spark, path, version)
    schema = StructType.fromJson(man["schema"])
    files = man["files"]
    residual = None
    if partitions:
        # conservative keep for files predating a layout evolution
        # (they may hold matching rows as DATA); the residual row
        # filter below restores exactness — a tautology on rows of
        # dir-encoded files, the real predicate on unmigrated ones
        files, unenc = _partition_pruned_files(man, partitions, "split")
        if unenc:
            residual = _partition_residual_cond(partitions)
    out = _read_file_list(
        spark, path, files, schema,
        partition_cols=_manifest_partition_cols(man),
        dv_files=man.get("dv_files"),
        dv_targets=man.get("dv_targets"),
        eq_entries=man.get("eqs"),
        file_seq=man.get("seq"),
        colmap=_colmap(man) or None,
        defaults=man.get("defaults"),
    )
    return out.where(residual) if residual is not None else out


# name (lowercased) → {"path", "name", "pinned"} for every table that
# went through ``snapshot_register``; consumed by the SQL statement
# front door (``sqlfront``). Process-global like local-mode temp views;
# a re-register overwrites, matching createOrReplaceTempView.
_SQL_REGISTRY: dict[str, dict] = {}


def snapshot_register(
    spark: SparkSession,
    path: str,
    name: str,
    version: int | None = None,
    at_timestamp=None,
    partitions: dict | None = None,
) -> None:
    """Register the snapshot table as a session temp view so plain
    ``spark.sql`` can query it — the ad-hoc-SQL surface over versioned
    tables (``SELECT ... FROM name``), with the same version /
    timestamp / partition-scope selection as ``read_snapshot``. The
    view captures the version RESOLVED NOW: a later commit does not
    leak into an already-registered view (reader isolation carries
    into SQL), and omitting ``version`` pins the current latest —
    re-register to follow the head."""
    # resolve the version FIRST and pin read_snapshot to it, so the
    # registry's ``resolved_version`` provably equals what the view
    # reflects (no listing race with a concurrent commit) — the SQL
    # front door's metadata-planned SELECT fast path answers at this
    # version for exact parity with a spark.sql scan of the view
    resolved = version
    listing = None
    if resolved is None:
        if at_timestamp is not None:
            resolved = snapshot_version_at(spark, path, at_timestamp)
        else:
            listing = _list_manifests(spark, path)
            # empty table: let read_snapshot raise its own error
            resolved = listing[-1] if listing else None
    read_snapshot(
        spark, path, version=resolved, partitions=partitions,
        _versions=listing,
    ).createOrReplaceTempView(name)
    # capture the VIEW-WRAPPED plan (not the raw DataFrame: the View/
    # SubqueryAlias wrapper shifts the semantic hash) — the identity
    # token the SELECT fast path compares against the live view
    view_df = spark.table(name)
    # record the name→path binding for the SQL statement front door
    # (``sqlfront.snapshot_sql``): DELETE/UPDATE/MERGE/ALTER/VACUUM/
    # DESCRIBE HISTORY statements resolve table names through this.
    # Mirrors temp-view semantics (re-register overwrites). ``pinned``
    # registrations (explicit version/timestamp/partition scope) are
    # time-travel views: the front door refuses to mutate through them
    # and never auto-refreshes them after a DML on the same path.
    _SQL_REGISTRY[name.lower()] = {
        "path": path,
        "name": name,
        "pinned": (
            version is not None
            or at_timestamp is not None
            or bool(partitions)
        ),
        # the pin itself, for READ surfaces that can honor it (SHOW
        # PARTITIONS of a version-pinned view shows THAT version)
        "version": version,
        "at_timestamp": at_timestamp,
        # what the temp view ACTUALLY reflects (head resolved at
        # registration for unpinned names) — the SELECT fast path
        # answers at this version, matching the view byte-for-byte
        # even when later commits have moved the table head
        "resolved_version": resolved,
        # a partition-scoped registration restricts the view to a
        # file subset the fast path does not model — it refuses and
        # the statement passes through to spark.sql over the view
        "partitions": dict(partitions) if partitions else None,
        # the registered DataFrame itself: the SELECT fast path
        # verifies via sameSemantics that the live temp view is STILL
        # this plan — a view the user later replaced or dropped must
        # win for reads (passthrough precedence), never be shadowed
        # by the registry binding
        "view_df": view_df,
    }


_FLAT_READ_THRESHOLD = 8


# Footer cache for _flat_readable: data files are IMMUTABLE once
# written (content-addressed commit dirs, never rewritten in place), so
# a file's parquet schema can be remembered for the process lifetime —
# repeated reads of a long-history table pay footer I/O only for files
# not yet seen, instead of one serial driver-side footer read per file
# per read. Keyed (root, relpath); bounded by wholesale clear (entries
# are tiny, the bound is a runaway guard, not an LRU).
_FOOTER_CACHE: dict[tuple[str, str], tuple] = {}
_FOOTER_CACHE_MAX = 1 << 20


def _flat_readable(
    spark: SparkSession,
    path: str,
    files: list[str],
    schema: StructType,
    partition_cols: list[str],
    must_have: set | None = None,
) -> bool:
    """True iff every file can be read DIRECTLY under the target
    schema in one scan: its partition-directory keys are exactly the
    target layout, and every data column it stores has the target
    type byte-for-byte (missing columns null-fill; anything needing a
    cast — a widened/narrowed history — keeps the per-commit path).
    ``must_have``: physical column names every file must PHYSICALLY
    store for the flat path — columns with an initial DEFAULT fill
    per commit group, which one flat scan cannot express.
    At most one parquet FOOTER read per file EVER (metadata-only,
    cached — see ``_FOOTER_CACHE``), fetched through a small thread
    pool so an object store's per-open latency is paid concurrently,
    not serially."""
    from ..streaming.snapshot_source import (
        _pa_fs,
        _partition_values_from_path,
    )

    path = _root(path)

    try:
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_type
    except ImportError:  # pragma: no cover
        return False
    want_keys = set(partition_cols)
    data_types = {
        f.name: f.dataType
        for f in schema.fields
        if f.name not in want_keys
    }
    fs, root = _pa_fs(path)
    missing = [f for f in files if (root, f) not in _FOOTER_CACHE]
    if missing:
        from concurrent.futures import ThreadPoolExecutor

        def probe(f: str):
            try:
                with fs.open_input_file(f"{root}/{f}") as fh:
                    return f, tuple(
                        (fld.name, fld.type) for fld in pq.read_schema(fh)
                    )
            except OSError:
                return f, None  # transient/missing: NOT cached

        with ThreadPoolExecutor(
            max_workers=min(16, len(missing))
        ) as pool:
            probed = dict(pool.map(probe, missing))
        good = {f: v for f, v in probed.items() if v is not None}
        if len(_FOOTER_CACHE) + len(good) > _FOOTER_CACHE_MAX:
            _FOOTER_CACHE.clear()
        for f, fields in good.items():
            _FOOTER_CACHE[(root, f)] = fields
        if len(good) != len(probed):
            return False
    for f in files:
        if set(_partition_values_from_path(f)) != want_keys:
            return False
        if must_have and not must_have <= {
            n for n, _ in _FOOTER_CACHE[(root, f)]
        }:
            return False  # defaulted column absent: needs per-part fill
        for name, atype in _FOOTER_CACHE[(root, f)]:
            want = data_types.get(name)
            if want is None:
                return False  # dropped-column history needs the cast path
            try:
                have = from_arrow_type(atype)
            except Exception:
                return False
            if have != want:
                return False
    return True


# ASCII characters Spark's scan metadata percent-encodes in
# ``_metadata.file_path`` (the Java URI path grammar's illegal set:
# control chars, space, and "<>%?#[]\^`{|}"). Everything else —
# including '+' and non-ASCII — passes through RAW, so url_decode
# (form decoding: '+' → space) would corrupt round-trips; instead we
# encode manifest relpaths to the URI form and join on that.
# Verified empirically on pyspark 4.1.2: disk 'name=a b' → meta
# 'name=a%20b', disk 'name=a%23b' → meta 'name=a%2523b', disk
# 'name=a+b' / 'name=héllo' → unchanged.
_URI_ILLEGAL = set(' "<>%?#[]\\^`{|}\x7f') | {chr(c) for c in range(0x20)}


def _uri_encode_relpath(rel: str) -> str:
    """A manifest relpath (on-disk form) → the exact string
    ``_metadata.file_path`` carries for that file (URI path form)."""
    out = []
    for ch in rel:
        if ch in _URI_ILLEGAL:
            out.append("".join("%%%02X" % b for b in ch.encode("utf-8")))
        else:
            out.append(ch)
    return "".join(out)


def _relpath_from_file_path(col):
    """``data/<hex32>/...`` relpath (URI-encoded form) from a
    ``_metadata.file_path`` column. Greedy leading ``.*`` pins the LAST
    ``data/<hex32>/`` occurrence: a table living under a directory named
    like a commit dir can't confuse the match. Join keys built from this
    must be ``_uri_encode_relpath``-encoded manifest relpaths."""
    return F.regexp_extract(col, "^.*/(data/[0-9a-f]{32}/.*)$", 1)


def _read_file_list_flat(
    spark: SparkSession,
    path: str,
    files: list[str],
    schema: StructType,
    partition_cols: list[str],
    versions: list[int] | None = None,
    row_ids: bool = False,
) -> DataFrame:
    """ONE scan over the whole file list (``_flat_readable`` verified).
    Partition discovery cannot span commit dirs (each is its own hive
    root — CONFLICTING_DIRECTORY_STRUCTURES), so it is disabled and the
    partition-directory values ride in a broadcast (relpath → values)
    lookup parsed driver-side from the manifest relpaths.

    ``versions`` (parallel to ``files``) is the change-feed variant: the
    lookup gains a ``_commit_version`` column carried into the output.
    The SAME relpath may then appear at several versions (a restore
    re-adding a file whose original append is also in range) — the scan
    reads each distinct file ONCE and the lookup join fans its rows out
    to one copy per listed version, never rows × paths × lookup-rows.

    ``row_ids=True`` appends the stable row identity the deletion-
    vector layer is keyed by: ``_dv_file`` (raw manifest relpath) and
    ``_dv_pos`` (``_metadata.row_index``)."""
    from ..streaming.snapshot_source import _partition_values_from_path

    path = _root(path)

    pfields = {f.name: f for f in schema.fields if f.name in partition_cols}
    data_fields = [f for f in schema.fields if f.name not in pfields]
    scan = (
        spark.read.option("recursiveFileLookup", "true")
        .schema(StructType(data_fields))
        # dedupe: Spark reads a path listed twice TWICE (no dedup), so a
        # repeated relpath would double its physical rows before the
        # lookup join multiplied them again
        .parquet(*dict.fromkeys(f"{path}/{f}" for f in files))
    )
    if not pfields and versions is None and not row_ids:
        return scan.select(*[f.name for f in schema.fields])
    lookup_rows = []
    for i, f in enumerate(files):
        vals = _partition_values_from_path(f)
        # key by the URI-encoded form — _metadata.file_path percent-
        # encodes e.g. spaces, so a raw-relpath join silently drops
        # every row of files under such partition dirs
        row = [_uri_encode_relpath(f)]
        if versions is not None:
            row.append(versions[i])
        if row_ids:
            row.append(f)
        lookup_rows.append((*row, *[vals.get(c) for c in partition_cols]))
    lookup = spark.createDataFrame(
        lookup_rows,
        ", ".join(
            ["_relpath string"]
            + (["_commit_version int"] if versions is not None else [])
            + (["_dv_file string"] if row_ids else [])
            + [f"`{c}` string" for c in partition_cols]
        ),
    )
    out_cols = [
        F.col(f.name).cast(f.dataType).alias(f.name)
        if f.name in pfields
        else F.col(f.name)
        for f in schema.fields
    ]
    if versions is not None:
        out_cols.append(F.col("_commit_version"))
    if row_ids:
        out_cols.extend([F.col("_dv_file"), F.col("_dv_pos")])
    scan = scan.withColumn(
        "_relpath", _relpath_from_file_path(F.col("_metadata.file_path"))
    )
    if row_ids:
        # LEFT join + in-column raise on an unmapped scan path (see
        # _require_mapped): the row identity feeds the DV anti-join /
        # tombstone writers, so encoding drift must fail loudly there,
        # never silently drop a file's rows. The plain (no row-id)
        # reads keep the inner join — their encoder is pinned by
        # tests/test_uri_relpaths.py against the running Spark.
        scan = scan.withColumn("_dv_pos", F.col("_metadata.row_index"))
        return (
            scan.join(F.broadcast(lookup), "_relpath", "left")
            .withColumn(
                "_dv_file", _require_mapped(F.col("_dv_file"), "_relpath")
            )
            .select(*out_cols)
        )
    return scan.join(F.broadcast(lookup), "_relpath").select(*out_cols)


_DV_COLS = ("_dv_file", "_dv_pos")


def _read_file_list(
    spark: SparkSession,
    path: str,
    files: list[str],
    schema: StructType,
    partition_cols: list[str] | None = None,
    dv_files: list[str] | None = None,
    row_ids: bool = False,
    dv_targets: list[str] | None = None,
    eq_entries: list[dict] | None = None,
    file_seq: dict | None = None,
    colmap: dict | None = None,
    defaults: dict | None = None,
) -> DataFrame:
    """Scan an explicit manifest file list, normalised to ``schema``.

    ``defaults`` ({PHYSICAL column name: scalar}): INITIAL defaults —
    a column added with a default fills that value for rows of files
    that PHYSICALLY lack the column (written before the add), while
    genuine NULLs written after the add stay NULL (the Iceberg-v3
    initial-default distinction; physical absence is the per-file
    marker, so no per-row bookkeeping exists anywhere).

    ``dv_files`` are the manifest's deletion-vector sidecars (parquet
    relpaths of ``(_dv_file, _dv_pos)`` tombstones): their rows are
    anti-joined away here, so EVERY reader that threads the manifest's
    ``dv_files`` through gets merge-on-read deletes for free.
    ``row_ids=True`` keeps the ``_dv_file``/``_dv_pos`` identity
    columns in the output (for writers that need to address rows).

    ``dv_targets`` (the manifest's recorded distinct tombstoned files;
    a superset of the live targets is legal) SPLITS the scan: files
    with no outstanding tombstones bypass the anti-join — and, unless
    ``row_ids`` is asked for, the whole row-identity machinery
    (``_metadata`` projection, relpath decode join) — entirely. Only
    the targeted files pay. At 100 TB with a few tombstoned files,
    the read plan is a plain scan unioned with one small anti-join,
    instead of every row of the table flowing through the join (the
    >64 MB sidecar fallback was a full-table shuffle).

    ``eq_entries``/``file_seq`` (the manifest's equality-delete
    entries and per-file added-at versions) split the scan the same
    way: files are grouped by WHICH entries apply (applicability is
    monotone in the file's seq, so the groups are the suffixes of the
    seq-sorted entry list — at most len(entries)+1 of them, and
    maintenance keeps that list short), each group anti-joins only
    its applicable key sidecars, and files no entry applies to scan
    clean."""
    from bisect import bisect_right

    from pyspark.sql.types import LongType, StringType, StructField

    path = _root(path)
    if colmap:
        # RENAME support (one wrapper recursion): files, stats,
        # partition dirs and eq sidecars all live in the PHYSICAL
        # namespace (``_colmap``), so the whole machinery below runs
        # with the physical schema and the output aliases back to
        # logical names once, at this single boundary. ``_dv_file``/
        # ``_dv_pos`` are synthetic and pass through untouched.
        # Entries outside the requested schema are ignored (callers
        # may pass a head colmap against a narrower projection).
        names = {f.name for f in schema.fields}
        colmap = {l: p for l, p in colmap.items() if l in names}
        inv = {p: l for l, p in colmap.items()}
        out = _read_file_list(
            spark, path, files, _phys_fields(schema, colmap),
            partition_cols=partition_cols, dv_files=dv_files,
            row_ids=row_ids, dv_targets=dv_targets,
            eq_entries=eq_entries, file_seq=file_seq,
            defaults=defaults,
        )
        return out.select(
            *[F.col(c).alias(inv.get(c, c)) for c in out.columns]
        )
    if eq_entries and files:
        seq_map = file_seq or {}
        entries = sorted(eq_entries, key=lambda e: (e["seq"], e["path"]))
        seqs = [e["seq"] for e in entries]
        groups: dict[int, list[str]] = {}
        for f in files:
            groups.setdefault(bisect_right(seqs, seq_map.get(f, 0)), []).append(f)
        # with recorded dv_targets, only groups actually holding a
        # tombstoned file pay the DV read — without the pruning every
        # group's recursion would re-read and re-broadcast the same
        # sidecars (K+1 redundant reads per scan while entries are
        # outstanding)
        tset = set(dv_targets) if dv_targets is not None else None
        parts = []
        for idx in sorted(groups):
            gdvs = dv_files
            if dv_files and tset is not None and not (
                tset & set(groups[idx])
            ):
                gdvs = None
            part = _read_file_list(
                spark, path, groups[idx], schema,
                partition_cols=partition_cols,
                dv_files=gdvs, row_ids=row_ids,
                dv_targets=dv_targets if gdvs else None,
                defaults=defaults,
            )
            parts.append(_apply_eq(spark, path, part, entries[idx:]))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    if dv_files and dv_targets is not None:
        tset = set(dv_targets)
        tomb = [f for f in files if f in tset]
        if not tomb:
            dv_files = None  # every tombstone is inert: clean scan
        elif len(tomb) < len(files):
            clean = [f for f in files if f not in tset]
            return _read_file_list(
                spark, path, clean, schema,
                partition_cols=partition_cols,
                dv_files=None, row_ids=row_ids,
                defaults=defaults,
            ).unionByName(
                _read_file_list(
                    spark, path, tomb, schema,
                    partition_cols=partition_cols,
                    dv_files=dv_files, row_ids=row_ids,
                    defaults=defaults,
                )
            )
        # else: every file is targeted — fall through whole
    want_ids = bool(row_ids or dv_files)
    if want_ids:
        clash = [f.name for f in schema.fields if f.name in _DV_COLS]
        if clash:
            raise ValueError(
                f"columns {clash} are reserved for the deletion-vector "
                "row identity; rename them to use DV reads"
            )
    if not files:
        out = StructType(
            list(schema.fields)
            + (
                [
                    StructField("_dv_file", StringType()),
                    StructField("_dv_pos", LongType()),
                ]
                if row_ids
                else []
            )
        )
        return spark.createDataFrame([], out)
    # Partition values live in the directory names UNDER each commit
    # dir, so each commit is its own basePath: one read per commit
    # (bounded by retained versions, not data size), unioned by name.
    by_commit: dict[str, list[str]] = {}
    for f in files:
        commit = "/".join(f.split("/", 2)[:2])  # data/<uuid>
        by_commit.setdefault(commit, []).append(f)
    # Long-history bound: past a handful of commit dirs the per-commit
    # union's plan grows O(commit dirs) — a delete over a fragmented
    # table, or read_snapshot after thousands of small appends, would
    # pay a node per commit. When a footer sweep proves every file
    # stores the target types at the target layout (the common case:
    # stable schema), collapse the whole list into ONE scan; histories
    # that genuinely need per-file normalisation (widened/narrowed/
    # dropped columns, layout changes) keep the per-commit cast path,
    # whose depth is then bounded by how unusual the history is.
    live_defaults = {
        c: v
        for c, v in (defaults or {}).items()
        if c in {f.name for f in schema.fields}
    }
    if len(by_commit) > _FLAT_READ_THRESHOLD and _flat_readable(
        spark, path, files, schema, partition_cols or [],
        must_have=set(live_defaults) or None,
    ):
        df = _read_file_list_flat(
            spark, path, files, schema, partition_cols or [],
            row_ids=want_ids,
        )
        if not want_ids:
            return df  # never touch user columns when no DV machinery ran
        return _apply_dvs(spark, path, df, dv_files, keep_ids=row_ids)
    parts = []
    dtypes = {f.name: f.dataType for f in schema.fields}
    for commit, flist in sorted(by_commit.items()):
        p = spark.read.option("basePath", f"{path}/{commit}").parquet(
            *[f"{path}/{f}" for f in flist]
        )
        # INITIAL defaults: fill per commit group, BEFORE the union —
        # physical absence of the column marks exactly the pre-add
        # files, and a post-union fill could not tell their rows from
        # genuine NULLs written later
        for c, dval in sorted(live_defaults.items()):
            if c not in p.columns:
                p = p.withColumn(c, F.lit(dval).cast(dtypes[c]))
        if want_ids:
            # row identity must come from each leaf scan (_metadata is
            # per-scan, unreachable after the union)
            p = p.withColumn(
                "_dv_enc",
                _relpath_from_file_path(F.col("_metadata.file_path")),
            ).withColumn("_dv_pos", F.col("_metadata.row_index"))
        parts.append(p)
    # allowMissingColumns: an appended commit written AFTER a column was
    # added carries the new column; older carried-over commits surface
    # it as null — schema evolution without rewriting history. The
    # manifest schema (the newest writer's) decides the column set.
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p, allowMissingColumns=True)
    for f in schema.fields:
        if f.name not in df.columns:
            df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
    # pin the manifest's types (an int widened to bigint by a newer
    # writer reads back as bigint everywhere)
    out_cols = [
        F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields
    ]
    if want_ids:
        out_cols.extend([F.col("_dv_enc"), F.col("_dv_pos")])
    df = df.select(*out_cols)
    if not want_ids:
        return df  # never touch user columns when no DV machinery ran
    enc2raw = F.broadcast(
        spark.createDataFrame(
            [(_uri_encode_relpath(f), f) for f in files],
            "_dv_enc string, _dv_file string",
        )
    )
    # LEFT join + in-column raise: a silent inner join would let
    # encoding drift (see _uri_encode_relpath) drop whole files from
    # DV-masked reads and the DML victim reads — the same fail-loud
    # rule collect_file_stats and the Bloom builder enforce.
    df = (
        df.join(enc2raw, "_dv_enc", "left")
        .withColumn("_dv_file", _require_mapped(F.col("_dv_file"), "_dv_enc"))
        .drop("_dv_enc")
    )
    return _apply_dvs(spark, path, df, dv_files, keep_ids=row_ids)


def _require_mapped(mapped, enc_col: str):
    """``mapped`` unless NULL — then raise AT SCAN TIME naming the
    unmapped encoded relpath. Living inside the output column keeps
    column pruning from optimizing the check away."""
    return F.when(
        mapped.isNull(),
        F.raise_error(
            F.concat(
                F.lit(
                    "scan path matches no manifest relpath "
                    "(_uri_encode_relpath drifted from Spark's "
                    "_metadata.file_path encoding): "
                ),
                F.col(enc_col),
            )
        ),
    ).otherwise(mapped)


def _apply_dvs(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    dv_files: list[str] | None,
    keep_ids: bool,
) -> DataFrame:
    """Merge-on-read: anti-join the deletion-vector tombstones on
    (file, row position). DV sidecars hold only deleted keys, so they
    broadcast in the overwhelmingly common case; past a size threshold
    the join falls back to a shuffle rather than risk the driver."""
    if dv_files:
        df = df.join(
            _sidecar_df(spark, root, dv_files, list(_DV_COLS)),
            list(_DV_COLS),
            "left_anti",
        )
    if not keep_ids:
        df = df.drop(*_DV_COLS)
    return df


def snapshot_changes(
    spark: SparkSession,
    path: str,
    from_version: int | None = None,
    to_version: int | None = None,
    from_timestamp=None,
    to_timestamp=None,
    partitions: dict | None = None,
) -> DataFrame:
    """Row-level change feed between two retained versions.

    ``partitions`` ({col: value | list}) scopes the feed to matching
    partition directories — every per-commit file diff is pruned at
    the manifest before any read, so a one-tenant CDC consumer of a
    100 TB table plans and scans only its tenant's files, and commits
    confined to other partitions contribute nothing (zero scan nodes,
    not just zero rows).

    Bounds can be given as versions or as TIMESTAMPS (datetime | ISO
    string | epoch seconds, resolved via ``snapshot_version_at``):
    ``from_timestamp=yesterday_9am`` means "changes SINCE the state
    that was live then" — the resolved version is the exclusive lower
    bound, exactly like ``from_version``. Timestamp resolution inherits
    the retention-gap refusal (never silently serves extra history).
    Exactly one of ``from_version``/``from_timestamp`` is required;
    ``to_version``/``to_timestamp`` are mutually exclusive.

    Returns the table's columns (at ``to_version``'s schema) plus
    ``_change_type`` (``'insert'`` | ``'delete'``) and
    ``_commit_version`` — every row change a consumer must apply to go
    from the table at ``from_version`` (exclusive) to ``to_version``
    (inclusive, default latest). An updated row appears as a delete of
    the old image plus an insert of the new one, the standard
    file-granular CDF contract.

    The feed is derived purely from manifest FILE diffs, so there is no
    write-path overhead and it works retroactively for any retained
    history. Per commit, only the files that commit added or removed
    are scanned — cost is proportional to the size of the change, never
    the table. Rewrite commits (compaction, delete_rows survivors,
    merge carry-alongs) re-write unchanged rows into new files; those
    are cancelled row-for-row with ``exceptAll`` over the touched files
    (a compaction therefore yields an EMPTY change set), which is also
    why bag semantics — duplicate physical rows — are preserved
    exactly. Append-only commits skip the diff entirely: added files
    stream straight through with no shuffle.

    Versions below ``from_version`` may already be vacuumed; every
    version in the requested range must still be retained (loud
    ``FileNotFoundError`` otherwise).
    """
    if (from_version is None) == (from_timestamp is None):
        raise ValueError(
            "exactly one of from_version / from_timestamp is required"
        )
    if to_version is not None and to_timestamp is not None:
        raise ValueError("to_version and to_timestamp are mutually exclusive")
    if from_timestamp is not None:
        from_version = snapshot_version_at(spark, path, from_timestamp)
    if to_timestamp is not None:
        to_version = snapshot_version_at(spark, path, to_timestamp)
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    if to_version is None:
        to_version = versions[-1]
    if from_version > to_version:
        raise ValueError(
            f"from_version {from_version} > to_version {to_version}"
        )
    # Versions are consecutive (each commit's parent is the previous
    # version); the diff for v needs both v's manifest and its parent's,
    # so every manifest in [from_version, to_version] must be retained
    # (from_version == 0 means "since before version 1" — no parent).
    needed = set(range(max(from_version, 1), to_version + 1))
    missing = needed - set(versions)
    if missing:
        raise FileNotFoundError(
            f"versions {sorted(missing)} not retained at {path} (have "
            f"{versions}) — change feed needs every manifest in range; "
            "raise from_version above the vacuum cutoff"
        )
    # exclusive lower bound: from_version's manifest is needed only as
    # the parent of the first diff
    want = [v for v in sorted(needed) if v > from_version]
    target_man = _load_manifest(spark, path, to_version)
    out_schema = StructType.fromJson(target_man["schema"])
    # Columns align by IDENTITY through the target's rename lineage:
    # physical names are frozen (see _colmap), so the TARGET's map is
    # the correct logical→physical translation for every in-lineage
    # file, however old. A column whose identity was reset (full
    # overwrite) under a reused logical name reads null-filled from
    # pre-reset commits — field-identity semantics, not name reattach.
    tmap = _colmap(target_man) or None
    tinv = {p: l for l, p in (tmap or {}).items()}
    # defaults resolve PER VERSION (unlike the identity map): an
    # untargeted compact MATERIALIZES them and sheds the entries, so
    # the target may carry none while in-range history still fills —
    # each commit's frames read under its own manifest's defaults,
    # reproducing exactly what that version's queryable reads showed
    # (and making the compact's delete/insert pairs cancel).
    tdefaults = target_man.get("defaults")
    target_schema_json = json.dumps(target_man["schema"], sort_keys=True)
    changes: list[DataFrame] = []
    # Plan-growth bound: the per-commit loop below builds one DataFrame
    # pair per commit, so a feed spanning thousands of commits would
    # explode the driver-side plan O(commits). The overwhelmingly
    # common commit in a long history is a pure APPEND at the current
    # schema — those are BATCHED into one multi-path scan plus a
    # broadcast (file → commit-version) lookup join, collapsing N
    # append commits into a single scan node. Only rewrite commits
    # (which need their per-commit exceptAll cancellation) and commits
    # written under an older schema (whose files can't be read with
    # the target schema directly) stay on the per-commit path, so the
    # plan grows with the number of UNUSUAL commits, not the history
    # length. The lookup is keyed by file RELPATH, not commit dir —
    # a restore can re-add a file minted by an earlier in-range commit,
    # and that row must carry the restore's version, not the original's.
    def _scoped(man: dict) -> set[str]:
        if not partitions:
            return set(man["files"])
        return set(_partition_pruned_files(man, partitions))

    if partitions:
        # validate the filter keys once, loudly (a typo'd column must
        # never read as "no changes")
        _partition_pruned_files(target_man, partitions)
    batched: list[tuple[str, int]] = []
    for v in want:
        man = _load_manifest(spark, path, v)
        parent = man["parent"]
        pfiles: set[str] = set()
        pdvs: list[str] = []
        peqs: list[dict] = []
        pseq: dict = {}
        pman = None
        if parent is not None:
            pman = _load_manifest(spark, path, parent)
            pfiles = _scoped(pman)
            pdvs = pman.get("dv_files") or []
            peqs = pman.get("eqs") or []
            pseq = pman.get("seq") or {}
        cdvs = man.get("dv_files") or []
        ceqs = man.get("eqs") or []
        cseq = man.get("seq") or {}
        files = _scoped(man)
        added = sorted(files - pfiles)
        removed = sorted(pfiles - files)
        # ADD COLUMN WITH DEFAULT moves no files but retroactively
        # changes every pre-existing row of the column (NULL →
        # default). Emit that change exactly: diff the WHOLE carried
        # state, parent-side read under the parent's defaults, child
        # side under the commit's — exceptAll cancels every untouched
        # row (files that physically store the column, columns whose
        # fill didn't change), leaving precisely the retroactive
        # delete(old image)+insert(new image) pairs. Costs one read of
        # the pre-add surface at feed time — the honest price of
        # replaying a rows-changing commit.
        retro_defaults = bool(
            set(man.get("defaults") or {})
            - set((pman or {}).get("defaults") or {})
        )
        if retro_defaults:
            added = sorted(files)
            removed = sorted(pfiles)
        dv_same = set(cdvs) == set(pdvs)
        eq_same = {e["path"] for e in ceqs} == {e["path"] for e in peqs}
        # the batched fast path reads added files with NO dv masking —
        # safe only when the commit carries no tombstones at all. With
        # outstanding DVs, a restore can re-add an OLD file some
        # carried sidecar targets (fresh uuid-dir appends can never be
        # targeted, but structurally proving "not a re-add" costs more
        # than the per-commit path it would save), and the unmasked
        # batched read would resurrect its dead rows as inserts. The
        # EQUALITY-delete analog: the entry set must be unchanged (a
        # changed set implies row deletes/resurrections this commit)
        # AND no carried entry may apply to an added file (a restore
        # can re-add a file older than a carried entry — its key-
        # masked rows must not stream; fresh appends carry the
        # commit's own sequence and are never applicable).
        if (
            not removed
            and dv_same
            and not cdvs
            and eq_same
            and not _eq_affected_files(man, added)
            and json.dumps(man["schema"], sort_keys=True) == target_schema_json
            and man.get("partition_cols") == target_man.get("partition_cols")
            # every ADDED file must encode the target layout in its
            # DIRECTORIES: a restore can re-add a file written before a
            # layout evolution (snapshot_set_layout) whose partition
            # column lives in its data pages — the flat read's relpath
            # lookup would null-fill it (silent feed corruption; the
            # per-commit path reads it from the pages correctly)
            and not _files_not_encoding(
                target_man,
                dict.fromkeys(_manifest_partition_cols(target_man) or ()),
                added,
            )
            and (man.get("defaults") or None) == (tdefaults or None)
            and (
                not tdefaults
                or _flat_readable(
                    spark, path, added,
                    _phys_fields(out_schema, tmap or {}),
                    _manifest_partition_cols(target_man) or [],
                    must_have=set(tdefaults),
                )
            )
        ):
            batched.extend((f, v) for f in added)
            continue
        target_pcols = _manifest_partition_cols(target_man)
        # Deletion-vector deltas on files present on BOTH sides: new
        # tombstones are row DELETES; tombstones that vanished (a
        # restore to a pre-delete state) RESURRECT their rows as
        # inserts. Reads are masked by the matching side's DV set —
        # parent's for what was live before, the commit's for what is
        # live now — which also makes equivalent-tombstone swaps
        # (delete, restore past it, delete again) cancel to zero.
        # When the retroactive-defaults override expanded added/removed
        # to the WHOLE carried state, the full-state exceptAll diff
        # below — each side read under its own dv/eq masks — already
        # yields exactly the net row changes, including any tombstones
        # this commit added or dropped. Running the dv/eq delta legs
        # too would emit those same rows a second time at the same
        # _commit_version (e.g. restore-forward across an
        # add-with-default that also carries a DV), breaking the feed's
        # exact bag-semantics contract. Skip them by emptying `common`.
        common = set() if retro_defaults else (files & pfiles)
        ptgts = pman.get("dv_targets") if parent is not None else None
        for (
            delta_dvs, mask_dvs, mask_tgts, mask_eq, mask_seq,
            mask_defaults, ctype,
        ) in (
            # masks are the side the CONSUMER holds: rows already dead
            # there (position OR key form) must not re-emit
            (sorted(set(cdvs) - set(pdvs)), pdvs, ptgts, peqs, pseq,
             (pman or {}).get("defaults"), "delete"),
            (
                sorted(set(pdvs) - set(cdvs)),
                cdvs,
                man.get("dv_targets"),
                ceqs,
                cseq,
                man.get("defaults"),
                "insert",
            ),
        ):
            if not delta_dvs or not common:
                continue
            ent = _sidecar_df(spark, path, delta_dvs, list(_DV_COLS))
            aff = sorted(
                common
                & {r["_dv_file"] for r in ent.select("_dv_file").distinct().collect()}
            )
            if not aff:
                continue
            rows = _read_file_list(
                spark, path, aff, out_schema,
                partition_cols=target_pcols,
                dv_files=sorted(mask_dvs), row_ids=True,
                dv_targets=mask_tgts,
                eq_entries=mask_eq, file_seq=mask_seq,
                colmap=tmap,
                defaults=mask_defaults,
            ).join(ent, list(_DV_COLS), "left_semi")
            changes.append(
                rows.drop(*_DV_COLS)
                .withColumn("_change_type", F.lit(ctype))
                .withColumn("_commit_version", F.lit(v))
            )
        # EQUALITY-delete deltas on common files. An ADDED entry
        # (upsert_eq/delete_eq, or a restore back TO an eq-masked
        # state) deletes the rows it newly masks: rows of its
        # applicable files that were visible to the PARENT (mask:
        # parent's dvs + parent's eq set) and match its keys — minus
        # rows in dv entries the same commit ADDED (those are the
        # dv-added leg's to report). A REMOVED entry (restore past an
        # upsert) resurrects: rows visible under the CHILD's full
        # state that match its keys — minus rows in dv entries the
        # commit REMOVED (the dv-removed leg's). Entries process
        # sequentially with processed ones appended to the mask, so a
        # row matching two entries emits once. resolve_eq commits
        # cancel to zero through these same masks (the new dvs cover
        # exactly the removed entries' rows), and a restore swapping
        # position masks back to key masks cancels symmetrically — no
        # op trust needed anywhere.
        cpaths = {e["path"] for e in ceqs}
        ppaths = {e["path"] for e in peqs}
        eq_added = [e for e in ceqs if e["path"] not in ppaths]
        eq_removed = [e for e in peqs if e["path"] not in cpaths]
        if common and (eq_added or eq_removed):

            def _keys_df(e):
                # sidecar columns are physical; the frames they join
                # are logical — alias through the target's inverse map
                kdf = _sidecar_df(spark, path, [e["path"]], e["keys"])
                return kdf.select(
                    *[F.col(k).alias(tinv.get(k, k)) for k in e["keys"]]
                )

            def _keys_of(e):
                return [tinv.get(k, k) for k in e["keys"]]

            def _dv_entry_df(paths):
                if not paths:
                    return None
                return _sidecar_df(spark, path, paths, list(_DV_COLS))

            added_dv_ent = (
                _dv_entry_df(sorted(set(cdvs) - set(pdvs)))
                if eq_added
                else None
            )
            mask = list(peqs)
            for e in sorted(eq_added, key=lambda e: (e["seq"], e["path"])):
                aff = sorted(
                    f for f in common if pseq.get(f, 0) < e["seq"]
                )
                if aff:
                    rows = _read_file_list(
                        spark, path, aff, out_schema,
                        partition_cols=target_pcols,
                        dv_files=sorted(pdvs) or None,
                        dv_targets=ptgts,
                        row_ids=True,
                        eq_entries=mask, file_seq=pseq,
                        colmap=tmap,
                        defaults=(pman or {}).get("defaults"),
                    )
                    if added_dv_ent is not None:
                        rows = rows.join(
                            added_dv_ent, list(_DV_COLS), "left_anti"
                        )
                    rows = rows.drop(*_DV_COLS).join(
                        _keys_df(e), _keys_of(e), "left_semi"
                    )
                    changes.append(
                        rows.withColumn("_change_type", F.lit("delete"))
                        .withColumn("_commit_version", F.lit(v))
                    )
                mask = mask + [e]
            removed_dv_ent = (
                _dv_entry_df(sorted(set(pdvs) - set(cdvs)))
                if eq_removed
                else None
            )
            mask = list(ceqs)
            for e in sorted(
                eq_removed, key=lambda e: (e["seq"], e["path"])
            ):
                aff = sorted(
                    f for f in common if cseq.get(f, 0) < e["seq"]
                )
                if aff:
                    rows = _read_file_list(
                        spark, path, aff, out_schema,
                        partition_cols=target_pcols,
                        dv_files=sorted(cdvs) or None,
                        dv_targets=man.get("dv_targets"),
                        row_ids=True,
                        eq_entries=mask, file_seq=cseq,
                        colmap=tmap,
                        defaults=man.get("defaults"),
                    )
                    if removed_dv_ent is not None:
                        rows = rows.join(
                            removed_dv_ent, list(_DV_COLS), "left_anti"
                        )
                    rows = rows.drop(*_DV_COLS).join(
                        _keys_df(e), _keys_of(e), "left_semi"
                    )
                    changes.append(
                        rows.withColumn("_change_type", F.lit("insert"))
                        .withColumn("_commit_version", F.lit(v))
                    )
                mask = mask + [e]
        ins = _read_file_list(
            spark, path, added, out_schema, partition_cols=target_pcols,
            dv_files=sorted(cdvs),
            dv_targets=man.get("dv_targets"),
            eq_entries=ceqs, file_seq=cseq,
            colmap=tmap,
            defaults=man.get("defaults"),
        )
        if removed:
            dele = _read_file_list(
                spark, path, removed, out_schema,
                partition_cols=target_pcols,
                # the PARENT's tombstones: consumers hold the parent
                # state, so rows already dead there must not re-delete
                dv_files=sorted(pdvs),
                dv_targets=ptgts,
                eq_entries=peqs, file_seq=pseq,
                colmap=tmap,
                defaults=(pman or {}).get("defaults"),
            )
            # cancel rewritten-but-unchanged rows (bag semantics)
            ins, dele = ins.exceptAll(dele), dele.exceptAll(ins)
            changes.append(
                dele.withColumn("_change_type", F.lit("delete")).withColumn(
                    "_commit_version", F.lit(v)
                )
            )
        if added:
            changes.append(
                ins.withColumn("_change_type", F.lit("insert")).withColumn(
                    "_commit_version", F.lit(v)
                )
            )
    if batched:
        # One scan over every batched commit's files, shared with the
        # long-history read path (``_read_file_list_flat``): partition
        # values and the commit version ride in the broadcast relpath
        # lookup, and a relpath re-added by an in-range restore is read
        # once and fanned out per version by the join.
        ins = _read_file_list_flat(
            spark,
            path,
            [f for f, _ in batched],
            _phys_fields(out_schema, tmap or {}),
            _manifest_partition_cols(target_man) or [],
            versions=[v for _, v in batched],
        )
        changes.append(
            ins.select(
                *[
                    F.col((tmap or {}).get(f.name, f.name)).alias(f.name)
                    for f in out_schema.fields
                ],
                F.lit("insert").alias("_change_type"),
                F.col("_commit_version"),
            )
        )
    if not changes:
        empty = spark.createDataFrame([], out_schema)
        return empty.withColumn(
            "_change_type", F.lit("").cast("string")
        ).withColumn("_commit_version", F.lit(0).cast("int"))
    df = changes[0]
    for c in changes[1:]:
        df = df.unionByName(c)
    return df


def snapshot_restore(
    spark: SparkSession, path: str, version: int
) -> int:
    """Roll the table back to ``version`` — published as a NEW commit
    whose file list is the old version's, so the rollback is itself
    versioned (undoable, conflict-checked, visible in history) and
    costs zero data movement: manifests reference immutable files, so
    restoring is re-listing them. The restored version must still be
    retained (vacuum drops old manifests); the change feed reports the
    rollback as the exact delete+insert set any consumer needs.
    """
    versions = _list_manifests(spark, path)
    if version not in versions:
        raise FileNotFoundError(
            f"version {version} not present at {path} (have {versions})"
        )
    man = _load_manifest(spark, path, version)
    latest = versions[-1]
    # deliberately NO same-layout guard (round 9): the commit below
    # republishes the restored version's own partition_cols alongside
    # its whole state, so restoring across a snapshot_set_layout is
    # self-consistent — it rolls the layout back too, and every reader
    # resolves layouts per version (per-file, for mixed histories)
    return _commit(
        spark,
        path,
        man["files"],
        StructType.fromJson(man["schema"]),
        "restore",
        latest,
        extra=(
            {
                "restored_from": version,
                **(
                    {
                        "stats": man.get("stats"),
                        "stats_cols": man.get("stats_cols"),
                    }
                    if man.get("stats") is not None
                    else {}
                ),
            }
        ),
        partition_cols=_manifest_partition_cols(man),
        # the RESTORED state's tombstones, never the abandoned head's
        # (whose DVs may reference exactly the files being restored)
        dv_files=man.get("dv_files"),
        dv_targets=_dv_targets_for(man),
        # the restored manifest already holds its files' row counts —
        # without this, restoring across a compact re-reads every
        # restored footer (the O(table) storm row tracking must never
        # pay on a zero-data-movement op)
        known_rows=man.get("rows"),
        carried_only=True,
        # same whole-state carry for the equality-delete plane: the
        # restored EQ entries with the restored files' added-at
        # sequences (re-stamping a re-added file would detach it from
        # the entries that masked its rows — silent resurrection)
        eq_files=man.get("eqs"),
        known_seq=man.get("seq"),
        # the RESTORED state's logical→physical map and defaults,
        # never the abandoned head's (whose alters may postdate it)
        colmap=_colmap(man) or None,
        defaults=man.get("defaults"),
    )


def snapshot_versions(spark: SparkSession, path: str) -> list[dict]:
    """Version history, oldest first: version/op/parent/n_files."""
    out = []
    for v in _list_manifests(spark, path):
        man = _load_manifest(spark, path, v)
        out.append(
            {
                "version": v,
                "op": man["op"],
                "parent": man["parent"],
                "n_files": len(man["files"]),
            }
        )
    return out


def snapshot_files(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    _man: dict | None = None,
) -> DataFrame:
    """The table's FILES metadata as a queryable DataFrame (the
    ``table.files`` / ``DESCRIBE DETAIL`` surface every lakehouse
    exposes): one row per live data file with its size, partition
    values, tombstone flag, and per-column min/max stats as a JSON
    string. Built from the manifest + one filesystem status per file
    (metadata-only, no data reads) — and DISTRIBUTED once built, so
    operational queries over a million-file table ("bytes per
    partition", "files with stale stats", "tombstoned share") run as
    ordinary Spark SQL instead of a driver loop."""
    from ..streaming.snapshot_source import _partition_values_from_path

    if _man is not None:
        man = _man
    else:
        versions = _list_manifests(spark, path)
        if not versions:
            raise FileNotFoundError(f"no snapshot versions at {path}")
        if version is None:
            version = versions[-1]
        elif version not in versions:
            raise FileNotFoundError(
                f"version {version} not present at {path} "
                f"(have {versions})"
            )
        man = _load_manifest(spark, path, version)
    root = _root(path)
    stats = man.get("stats") or {}
    tgts = set(man.get("dv_targets") or ())
    frows = man.get("rows") or {}
    eq_aff = set(_eq_affected_files(man))
    # stats are keyed by on-disk (physical) names; present LOGICAL
    inv = {p: l for l, p in _colmap(man).items()}
    rows = []
    for f in man["files"]:
        pv = _partition_values_from_path(f)
        rows.append(
            (
                f,
                # physical footer row count from the manifest (null for
                # files predating row tracking — see snapshot_count)
                frows.get(f),
                json.dumps(pv, sort_keys=True) if pv else None,
                f in tgts,
                f in eq_aff,
                json.dumps(
                    {inv.get(c, c): v for c, v in stats[f].items()},
                    sort_keys=True,
                )
                if f in stats
                else None,
            )
        )
    base = spark.createDataFrame(
        rows,
        "file string, rows long, partition_values string, "
        "has_tombstones boolean, has_eq_deletes boolean, stats string",
    )

    # file sizes come from the EXECUTORS (Arrow-batched pyarrow
    # file-info, one batched call per partition) — a serial driver
    # getFileStatus loop is one object-store RPC per file, hours at
    # 10^6 files. Everything else above is already in the manifest.
    from pyspark.sql.functions import pandas_udf

    sizer = _make_batch_sizer()

    @pandas_udf("long")
    def _sizes(paths: pd.Series) -> pd.Series:
        import pandas as pd

        return pd.Series(sizer(paths.tolist()), dtype="int64")

    return base.select(
        "file",
        _sizes(F.concat(F.lit(f"{root}/"), F.col("file"))).alias("bytes"),
        "rows",
        "partition_values",
        "has_tombstones",
        "has_eq_deletes",
        "stats",
    )


def snapshot_partitions(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Partition-level metadata table (the ``table.partitions`` /
    ``SHOW PARTITIONS`` surface): one row per distinct
    partition-directory tuple of the CURRENT layout with file count,
    physical row count, byte total, and tombstone presence — built on
    ``snapshot_files`` (manifest + executor-batched file stats, no
    data reads) and aggregated AS a Spark plan, so it stays distributed
    at a million files.

    Values are the DIRECTORY strings (the same domain every partition
    predicate uses); the Hive null partition surfaces as NULL. After a
    layout evolution, files not yet migrated (their directories don't
    encode the current layout) group under ``encodes_layout = false``
    with NULL partition values — visibly unmigrated rather than
    silently misbinned; a compact moves them into their real groups.
    ``rows`` is the PHYSICAL footer total (NULL when any grouped file
    predates row tracking); live-row exactness under tombstones is
    ``snapshot_count(partitions=...)``'s job."""
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(
            f"version {version} not present at {path} (have {versions})"
        )
    man = _load_manifest(spark, path, version)
    pcols = _manifest_partition_cols(man) or []
    clash = sorted(
        set(pcols)
        & {
            "n_files", "rows", "bytes", "has_tombstones",
            "has_eq_deletes", "encodes_layout",
        }
    )
    if clash:
        raise ValueError(
            f"partition column(s) {clash} collide with this view's "
            "metric columns — query snapshot_files and aggregate "
            "yourself, or rename the column"
        )
    # ONE manifest load: snapshot_files reuses it (legacy full-JSON
    # manifests bypass the state cache, so a second load would re-read
    # and re-parse the whole document on the driver)
    files = snapshot_files(spark, path, version, _man=man)
    m = F.from_json(
        F.coalesce(F.col("partition_values"), F.lit("{}")),
        "map<string,string>",
    )
    # internal names are prefixed so a partition column named like a
    # snapshot_files column (rows, bytes, ...) can never clobber the
    # metric inputs before aggregation
    pt = {c: f"__pt_{i}" for i, c in enumerate(pcols)}
    if pcols:
        enc = None
        for c in pcols:
            has = F.map_contains_key(m, F.lit(c))
            enc = has if enc is None else (enc & has)
        files = files.withColumn("__pt_enc", enc)
        for c in pcols:
            files = files.withColumn(
                pt[c],
                F.when(F.col("__pt_enc"), F.element_at(m, F.lit(c))),
            )
    else:
        files = files.withColumn("__pt_enc", F.lit(True))
    keys = [pt[c] for c in pcols] + ["__pt_enc"]
    agg = files.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_files"),
        # NULL when ANY grouped file predates row tracking — a partial
        # sum would silently undercount
        F.when(
            F.count("rows") == F.count(F.lit(1)), F.sum("rows")
        ).alias("rows"),
        F.sum("bytes").alias("bytes"),
        F.max("has_tombstones").alias("has_tombstones"),
        F.max("has_eq_deletes").alias("has_eq_deletes"),
    )
    out = agg.select(
        *[F.col(pt[c]).alias(c) for c in pcols],
        F.col("__pt_enc").alias("encodes_layout"),
        "n_files", "rows", "bytes", "has_tombstones", "has_eq_deletes",
    )
    return out.orderBy(
        *[F.col(c).asc_nulls_last() for c in pcols + ["encodes_layout"]]
    )


def snapshot_count(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    at_timestamp=None,
    partitions: dict | None = None,
) -> int:
    """Exact live row count of the table at ``version`` (default:
    latest) WITHOUT scanning data pages: per-file footer counts ride
    in the manifest (recorded at commit time, O(new files) each — see
    ``_commit``), so the physical total is one metadata fold; the
    deletion-vector correction semi-joins the tombstone sidecars
    against the live file list (∝ tombstone rows, never table rows).
    On a 100 TB / 10^6-file table this answers COUNT(*) from a few
    KB of metadata plus the (usually tiny) sidecars, where a scan —
    even a parquet-optimized one — opens every file.

    Files predating row tracking (legacy history) self-heal: only the
    MISSING footers are read (fail-loud — a manifest-referenced file
    that cannot be opened is corruption, not a gap). The correction
    term means the count is exact under merge-on-read DML too.

    ``partitions`` scopes the count to matching partition directories
    (manifest-pruned — see ``_partition_pruned_files``), still without
    touching data pages."""
    if version is not None and at_timestamp is not None:
        raise ValueError("pass version OR at_timestamp, not both")
    if at_timestamp is not None:
        version = snapshot_version_at(spark, path, at_timestamp)
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(
            f"version {version} not present at {path} (have {versions})"
        )
    man = _load_manifest(spark, path, version)
    root = _root(path)
    files = man["files"]
    residual = None
    if partitions:
        # partition-scoped count stays metadata-only too: prune the
        # file list first, correct by the tombstones targeting exactly
        # those files (the sidecar semi-join keys on relpath). Files
        # predating a layout evolution cannot answer from directories
        # — they join the scanned surface below with a row-level
        # residual filter (exact, cost ∝ unmigrated files).
        files, unenc = _partition_pruned_files(man, partitions, "split")
        if unenc:
            residual = _partition_residual_cond(
                {_phys(man, k): v for k, v in partitions.items()}
            )
    # files an outstanding EQUALITY delete applies to cannot answer
    # from metadata (a key may match 0..n of their rows) — scan
    # exactly that surface with full masking; the rest stays
    # metadata-only. ``snapshot_resolve_eq`` restores the pure
    # metadata answer.
    eq_aff = _eq_affected_files(man, files)
    scan_set = sorted(set(eq_aff) | set(unenc if residual is not None else ()))
    scanned = 0
    if scan_set:
        sset = set(scan_set)
        files = [f for f in files if f not in sset]
        rows = _read_file_list(
            spark, path, scan_set,
            # physical namespace: eq entry keys are on-disk names, and
            # a count never surfaces column names anyway
            _phys_fields(StructType.fromJson(man["schema"]), _colmap(man)),
            partition_cols=_manifest_partition_cols(man),
            dv_files=man.get("dv_files"),
            dv_targets=man.get("dv_targets"),
            eq_entries=man.get("eqs"),
            file_seq=man.get("seq"),
            # an eq entry KEYED on a defaulted column must mask the
            # pre-add rows here exactly as it does on every read
            defaults=man.get("defaults"),
        )
        if residual is not None:
            # physical frame — the residual was built on physical names;
            # a tautology for dir-encoded eq_aff rows, exact for the rest
            rows = rows.where(residual)
        scanned = rows.count()
    return scanned + _physical_row_total(
        spark, root, man, files
    ) - _dv_entry_count(spark, root, man.get("dv_files"), files)


def snapshot_minmax(
    spark: SparkSession,
    path: str,
    col: str,
    version: int | None = None,
    partitions: dict | None = None,
):
    """``(min, max)`` of ``col`` over the live table — answered from
    the manifest's per-file stats when that is PROVABLY exact: every
    (scoped) live file carries stats for the column and no deletion
    vector targets any of them (a tombstoned row could hold the
    extreme). Otherwise falls back to an exact scan of exactly the
    uncovered surface. The metadata path returns values in the stats
    image's normalized domain (numbers native, date/timestamp as ISO
    strings — see ``collect_file_stats``); the scan path returns
    Spark-typed values. All-null (or empty) tables return
    ``(None, None)`` on both paths."""
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(
            f"version {version} not present at {path} (have {versions})"
        )
    man = _load_manifest(spark, path, version)
    residual = None
    unenc: set = set()
    if partitions:
        # files predating a layout evolution can't answer a SCOPED
        # aggregate from stats (their recorded extremes cover rows
        # outside the scope) — they join the scanned surface below
        # with the row-level residual filter (exact)
        files, _ue = _partition_pruned_files(man, partitions, "split")
        if _ue:
            unenc = set(_ue)
            residual = _partition_residual_cond(partitions)
    else:
        files = man["files"]
    stats = man.get("stats") or {}
    tgts = set(man.get("dv_targets") or ())
    if man.get("dv_files") and man.get("dv_targets") is None:
        tgts = set(files)  # legacy: unknown targets — assume any
    eq_aff = set(_eq_affected_files(man, files))
    pcol = _phys(man, col)  # stats are keyed by on-disk column names
    cov = {
        f
        for f in files
        if f in stats and pcol in stats[f] and f not in tgts
        and f not in eq_aff and f not in unenc
    }
    covered = [f for f in files if f in cov]
    uncovered = [f for f in files if f not in cov]
    los = [stats[f][pcol][0] for f in covered]
    his = [stats[f][pcol][1] for f in covered]
    if uncovered:
        # scan ONLY the files metadata cannot answer for — partial
        # stats coverage or outstanding tombstones on the file. On a
        # mostly-statted table one DV'd file costs one small scan, not
        # a full-table aggregate. Scan extremes join the metadata ones
        # through the same order-preserving normalization the stats
        # were recorded in — UNWIDENED (widen=0): these are exact
        # observed endpoints, and padding them outward (as the
        # recorded Decimal bounds are) would return a value not
        # present in the data. The combined result can still surface
        # a covered file's widened Decimal bound — that is the
        # documented metadata-path contract.
        schema = StructType.fromJson(man["schema"])
        df = _read_file_list(
            spark, path, uncovered, schema,
            partition_cols=_manifest_partition_cols(man),
            dv_files=man.get("dv_files"),
            dv_targets=man.get("dv_targets"),
            eq_entries=man.get("eqs"),
            file_seq=man.get("seq"),
            colmap=_colmap(man) or None,
            defaults=man.get("defaults"),
        )
        if residual is not None:
            df = df.where(residual)
        row = df.agg(
            F.min(F.col(col)).alias("lo"), F.max(F.col(col)).alias("hi")
        ).first()
        if not covered:
            return (row["lo"], row["hi"])  # pure scan: Spark-typed
        los.append(_stat_norm(row["lo"]))
        his.append(_stat_norm(row["hi"]))
    los = [v for v in los if v is not None]
    his = [v for v in his if v is not None]
    return (min(los) if los else None, max(his) if his else None)


def read_snapshot_where(
    spark: SparkSession,
    path: str,
    predicates: dict,
    version: int | None = None,
) -> DataFrame:
    """Manifest-pruned READ under a conjunctive predicate ({col:
    values | Range}) — the scan twin of the DML victim planner and
    ``snapshot_count_where``: only files whose stats/directories admit
    a match are opened (stats-less files conservatively kept — never a
    false negative), then the exact row-level predicate applies as a
    residual. Generalizes ``read_snapshot_pruned`` (single column,
    inclusive interval) to multi-column conjunctions, IN lists,
    exclusive/half-open bounds, and typed partition-directory ranges.

    A retention audit (``SELECT * WHERE ts < cutoff``) on a
    time-clustered 100 TB table then opens only the files the cutoff
    intersects; everything else is excluded from metadata alone. DV
    tombstones, equality deletes, column renames, and initial defaults
    all apply exactly as in ``read_snapshot`` (the pruned set reads
    through the same ``_read_file_list``)."""
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(
            f"version {version} not present at {path} (have {versions})"
        )
    man = _load_manifest(spark, path, version)
    schema = StructType.fromJson(man["schema"])
    preds = _sanitize_predicates(predicates)
    if not preds:  # provably-empty range / emptied IN list
        return spark.createDataFrame([], schema)
    victims, _carried = _victims_by_stats_where(man, preds)
    if not victims:
        return spark.createDataFrame([], schema)
    df = _read_file_list(
        spark, path, victims, schema,
        partition_cols=_manifest_partition_cols(man),
        dv_files=man.get("dv_files"),
        dv_targets=man.get("dv_targets"),
        eq_entries=man.get("eqs"),
        file_seq=man.get("seq"),
        colmap=_colmap(man) or None,
        defaults=man.get("defaults"),
    )
    return df.where(_match_expr(preds))


def snapshot_count_where(
    spark: SparkSession,
    path: str,
    predicates: dict,
    version: int | None = None,
) -> int:
    """Exact ``COUNT(*) WHERE col IN values AND ... / col BETWEEN``
    planned from manifest metadata — the read-side twin of the DML
    victim planner. Per file:

    - stats/directories EXCLUDE it (no row can match) → contributes 0,
      never opened;
    - stats/directories PROVE every row matches (``Range``: recorded
      [min, max] wholly inside the interval, zero nulls; IN: min ==
      max == a value; partition dirs row-exactly) → contributes its
      recorded footer count minus live DV tombstones, never opened;
    - BOUNDARY files — matches mixed with survivors, stats-less files,
      files under an outstanding equality delete (a key may mask
      0..n of their rows, unprovable from metadata) — are scanned
      with the exact residual predicate and full DV/eq masking.

    On a time-clustered 100 TB table, ``COUNT(*) WHERE ts <
    retention_cutoff`` then opens only the boundary files where the
    cutoff lands — everything else answers from a few KB of manifest.
    Same NULL semantics as the DML planner (predicates never match
    NULL; a provably-empty range or emptied IN list returns 0)."""
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(
            f"version {version} not present at {path} (have {versions})"
        )
    preds = _sanitize_predicates(predicates)
    if not preds:
        return 0
    man = _load_manifest(spark, path, version)
    victims, _carried = _victims_by_stats_where(man, preds)
    if not victims:
        return 0
    full = set(_full_match_files_where(man, preds))
    eq_aff = set(_eq_affected_files(man, victims))
    proven = [f for f in victims if f in full and f not in eq_aff]
    pset = set(proven)
    scan = [f for f in victims if f not in pset]
    scanned = 0
    if scan:
        scanned = (
            _read_file_list(
                spark, path, scan,
                StructType.fromJson(man["schema"]),
                partition_cols=_manifest_partition_cols(man),
                dv_files=man.get("dv_files"),
                dv_targets=man.get("dv_targets"),
                eq_entries=man.get("eqs"),
                file_seq=man.get("seq"),
                colmap=_colmap(man) or None,
                defaults=man.get("defaults"),
            )
            .where(_match_expr(preds))
            .count()
        )
    root = _root(path)
    return (
        scanned
        + _physical_row_total(spark, root, man, proven)
        - _dv_entry_count(spark, root, man.get("dv_files"), proven)
    )


_AGG_FUNCS = ("min", "max", "sum", "count")


def _agg_normalize(aggs) -> list:
    """Validate/normalize the ``aggs`` argument shared by
    ``snapshot_agg_where`` and ``snapshot_group_agg_where``:
    ``[(func, col)]`` with lowercased funcs, or a loud ValueError."""
    norm: list[tuple[str, str]] = []
    for a in aggs:
        try:
            func, col = a
        except Exception:
            raise ValueError(f"each agg must be (func, col); got {a!r}")
        fl = str(func).lower()
        if fl not in _AGG_FUNCS:
            raise ValueError(
                f"agg func must be one of {_AGG_FUNCS}; got {func!r}"
            )
        if col == "*" and fl != "count":
            raise ValueError(
                f"'*' is only valid under count; got {func!r}('*')"
            )
        norm.append((fl, col))
    if not norm:
        raise ValueError("aggs must name at least one aggregate")
    return norm


def _agg_validate_types(norm, ftypes) -> None:
    from pyspark.sql.types import NumericType

    for fl, c in norm:
        if c != "*" and c not in ftypes:
            raise ValueError(
                f"unknown column {c!r} (have {sorted(ftypes)})"
            )
        if fl == "sum" and not isinstance(ftypes[c], NumericType):
            raise ValueError(
                f"SUM needs a numeric column; {c!r} is "
                f"{ftypes[c].simpleString()}"
            )


def _agg_ent(man: dict, f: str, col: str):
    return (man.get("stats") or {}).get(f, {}).get(_phys(man, col))


def _dir_values_cached(rel_file: str):
    """Memoized ``_partition_values_from_path`` — relpaths are
    immutable manifest strings, and the aggregate planner consults
    each file's directory values once per (aggregate, gate, combine),
    which at 10^5-file manifests would re-parse the same path many
    times over. Callers must NOT mutate the returned dict."""
    import functools

    global _dir_values_cached

    from ..streaming.snapshot_source import _partition_values_from_path

    _dir_values_cached = functools.lru_cache(maxsize=131072)(
        _partition_values_from_path
    )
    return _dir_values_cached(rel_file)


def _dir_decode_types(for_sum: bool = False):
    """The ONE list of partition-key types whose directory strings
    decode back to the Spark-typed value faithfully — shared by the
    proven gate, the grouped planner's key check, and the decoder so
    they can never drift. Excluded on purpose: float/double (Java and
    Python render doubles differently; NaN never equals itself) and
    tz-ful TimestampType (directories are written in the SESSION
    timezone while collect() converts through the driver's OS
    timezone — under a non-default session tz the same instant would
    decode and collect to different naive datetimes, splitting groups
    and mis-combining MIN/MAX; TimestampNTZ has no conversion and
    stays). ``for_sum`` narrows to types where value × rows is exact
    multiplication."""
    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        DateType,
        DecimalType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
        TimestampNTZType,
    )

    integral = (ByteType, ShortType, IntegerType, LongType)
    if for_sum:
        return integral + (DecimalType,)
    return integral + (
        StringType, BooleanType, DecimalType, DateType,
        TimestampNTZType,
    )


def _agg_dir_value(man: dict, f: str, col: str, ftypes):
    """A partition column's value for file ``f``, decoded from its
    directory string (None for the Hive null partition). Callers only
    reach this for files the proven gate already decode-checked."""
    s = _dir_values_cached(f).get(_phys(man, col))
    return (
        None if s is None else _decode_partition_string(s, ftypes[col])
    )


def _agg_part_provable(man, col, ftypes, base_ok, rows_map, kind):
    """Files whose partition DIRECTORY proves aggregates over
    partition column ``col``: the directory value IS the column value
    for every row, so a full-match file with a known row count
    answers MIN/MAX (the value, when rows exist), COUNT (rows or 0
    for the null partition), and SUM (value × rows — integral and
    Decimal only: exact multiplication; float repeated-addition order
    cannot be reproduced) with zero I/O. ``kind`` is ``minmax`` /
    ``sum`` / ``count``. MIN/MAX/SUM require a decodable type
    (``_dir_decode_types``) and a parseable directory; COUNT only
    needs null-vs-non-null, which the Hive null marker decides for
    EVERY key type — a COUNT over a double-partitioned key still
    answers with zero I/O."""
    import decimal

    if kind != "count" and not isinstance(
        ftypes[col], _dir_decode_types(for_sum=kind == "sum")
    ):
        return set()
    phys = _phys(man, col)
    ok = set()
    for f in base_ok:
        if f not in rows_map:
            continue  # no row count: can't weigh the value
        vals = _dir_values_cached(f)
        if phys not in vals:
            continue  # layout evolved: the value lives in-row
        if kind != "count":
            try:
                _decode_partition_string(vals[phys], ftypes[col])
            except (
                ValueError, ArithmeticError, decimal.InvalidOperation
            ):
                continue  # hand-placed undecodable directory: scan
        ok.add(f)
    return ok


def _agg_proven_sets(man, norm, ftypes, victims, full):
    """The exactness gates shared by the flat and grouped aggregate
    planners: per requested aggregate, the set of victim files whose
    metadata PROVABLY answers it — see ``snapshot_agg_where``'s
    docstring for the per-rule rationale. Returns ``(proven, rows_map)``
    with ``proven`` aligned to ``norm``."""
    import math

    from pyspark.sql.types import (
        BooleanType,
        DateType,
        DecimalType,
        NumericType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    tgts = set(man.get("dv_targets") or ())
    if man.get("dv_files") and man.get("dv_targets") is None:
        tgts = set(victims)  # legacy: unknown targets — assume any
    eq_aff = set(_eq_affected_files(man, victims))
    part_cols = set(_manifest_partition_cols(man) or ())
    rows_map = man.get("rows") or {}
    base_ok = {
        f for f in victims
        if f in full and f not in tgts and f not in eq_aff
    }
    proven: list[set] = []
    for fl, col in norm:
        if fl == "count" and col == "*":
            ok = {f for f in base_ok if f in rows_map}
        elif _phys(man, col) in part_cols:
            # partition values live in DIRECTORY names, not stats —
            # and the directory is even stronger than stats: it is
            # the exact value of every row, so the freshness query
            # (MAX over the partition key) answers with zero I/O
            ok = _agg_part_provable(
                man, col, ftypes, base_ok, rows_map,
                "sum" if fl == "sum" else
                "count" if fl == "count" else "minmax",
            )
        elif fl == "count":
            ok = set()
            for f in base_ok:
                e = _agg_ent(man, f, col)
                if f in rows_map and e is not None and len(e) >= 3:
                    ok.add(f)
        elif fl == "sum":
            ok = set()
            for f in base_ok:
                e = _agg_ent(man, f, col)
                if e is None or len(e) < 4:
                    continue
                if e[3] is None and not (
                    f in rows_map and e[2] == rows_map[f]
                ):
                    # a NULL sum is only provably "zero non-null rows"
                    # when the null count says ALL rows are null —
                    # otherwise (overflow under non-ANSI, oddity) the
                    # scan decides (REVIEW r11)
                    continue
                ok.add(f)
        elif isinstance(ftypes[col], DecimalType) or not isinstance(
            ftypes[col],
            (
                NumericType,
                StringType,
                BooleanType,
                DateType,
                TimestampType,
                TimestampNTZType,
            ),
        ):
            # Decimal endpoints are outward-widened floats, and any
            # type whose stats image is a lossy str(v) — intervals,
            # binary, arrays, structs — orders wrongly as a string:
            # both prune-exact, neither answer-exact (REVIEW r11)
            ok = set()
        else:
            ok = set()
            idx = 0 if fl == "min" else 1
            for f in base_ok:
                e = _agg_ent(man, f, col)
                if e is None:
                    continue
                v = e[idx]
                if isinstance(v, float) and math.isnan(v):
                    continue  # Spark orders NaN largest; scan decides
                ok.add(f)
        proven.append(ok)
    return proven, rows_map


def _agg_combine_one(fl, col, meta, sv, man, ftypes, rows_map):
    """Combine one aggregate's metadata contributions (``meta`` — the
    fully-proven files) with its residual-scan value ``sv`` into the
    final Spark-typed Python value. The exactness invariants live in
    ``_agg_proven_sets``; this is pure arithmetic plus the
    denormalization of date/timestamp stat images."""
    import datetime
    import decimal
    import math

    from pyspark.sql.types import (
        DateType,
        TimestampNTZType,
        TimestampType,
    )

    part = col != "*" and _phys(man, col) in set(
        _manifest_partition_cols(man) or ()
    )
    if fl == "count":
        total = int(sv or 0)
        if col == "*":
            total += sum(rows_map[f] for f in meta)
        elif part:
            # the directory value applies to every row: a non-null
            # partition contributes all its rows, the null partition
            # contributes none. The RAW directory string decides —
            # null-ness needs no type decode, so COUNT answers even
            # for float/double keys
            phys = _phys(man, col)
            total += sum(
                rows_map[f]
                for f in meta
                if _dir_values_cached(f).get(phys) is not None
            )
        else:
            total += sum(
                rows_map[f] - _agg_ent(man, f, col)[2] for f in meta
            )
        return total
    if fl == "sum":
        with decimal.localcontext() as ctx:
            # wide-decimal contributions and totals combine at full
            # width — the ambient prec=28 would silently round
            # (REVIEW r11); Spark's SUM result caps at decimal(38,s)
            ctx.prec = 76
            vals = []
            for f in meta:
                if part:
                    v = _agg_dir_value(man, f, col, ftypes)
                    if v is not None and rows_map[f]:
                        vals.append(v * rows_map[f])
                    continue
                s = _agg_ent(man, f, col)[3]
                if s is not None:
                    vals.append(
                        decimal.Decimal(s) if isinstance(s, str) else s
                    )
            if sv is not None:
                vals.append(sv)
            if not vals:
                return None
            return sum(vals)
    idx = 0 if fl == "min" else 1
    if part:
        vals = [
            v
            for f in meta
            if rows_map[f]
            and (v := _agg_dir_value(man, f, col, ftypes)) is not None
        ]
        if sv is not None:
            # scan values are already Spark-typed, like the decoded
            # directory values — compare typed, no stat-image detour
            vals.append(sv)
        if not vals:
            return None
        return min(vals) if fl == "min" else max(vals)
    vals = [
        v for f in meta if (v := _agg_ent(man, f, col)[idx]) is not None
    ]
    if isinstance(sv, float) and math.isnan(sv):
        # NaN orders largest in Spark: it IS the max; for min it means
        # every scanned value was NaN — metadata values (never NaN,
        # gated in _agg_proven_sets) win when present
        if fl == "max" or not vals:
            return sv
        sv = None
    if sv is not None:
        if not vals:
            # scan-only: the Spark-typed value passes through
            # untouched (normalizing would widen Decimals)
            return sv
        vals.append(_stat_norm(sv))
    if not vals:
        return None
    r = min(vals) if fl == "min" else max(vals)
    dt = ftypes[col]
    if isinstance(dt, DateType) and isinstance(r, str):
        r = datetime.date.fromisoformat(r)
    elif isinstance(
        dt, (TimestampType, TimestampNTZType)
    ) and isinstance(r, str):
        r = datetime.datetime.fromisoformat(r)
    return r


def snapshot_agg_where(
    spark: SparkSession,
    path: str,
    aggs: list,
    predicates=None,
    version: int | None = None,
    _man: dict | None = None,
) -> list:
    """Exact MIN/MAX/SUM/COUNT — optionally under a plannable predicate
    ({col: values | Range | null-test}, or a DNF list of such dicts) —
    answered from manifest metadata wherever PROVABLE, scanning only
    the files metadata cannot answer for: the aggregate twin of
    ``snapshot_count_where``. ``aggs`` is a list of ``(func, col)``
    with func in min|max|sum|count (col ``"*"`` for COUNT(*) only);
    returns Python values aligned with ``aggs``.

    Per admitted file (the stats planner's victims; every file when
    ``predicates`` is None):

    - a file the predicate provably matches WHOLE (``_full_match_
      files_where``), free of DV tombstones and equality deletes,
      answers from metadata: MIN/MAX from the recorded endpoints, SUM
      from the exactly-recorded per-file sums (stats fourth element),
      COUNT from recorded row/null counts — never opened;
    - every other admitted file — boundary files, stats-less or
      legacy-stats files, tombstoned files — joins ONE residual scan
      computing all requested aggregates at once.

    Exactness rules (a file failing one moves to the scan — the result
    is never approximate):
    - MIN/MAX answers from stats only for types whose recorded image
      round-trips faithfully (non-decimal numerics, strings, bools,
      dates, timestamps). Decimal endpoints are OUTWARD-WIDENED
      floats and interval/binary/array/struct images are lossy
      ``str(v)`` — exact for pruning, wrong for answering — so those
      scan; Decimal SUM answers (sums are recorded exactly);
    - a NULL recorded sum proves "zero non-null rows" only when the
      null count equals the row count — otherwise (e.g. overflow
      under a non-ANSI writer) the file scans;
    - a NaN endpoint routes the file to the scan (Spark orders NaN
      largest; Python comparisons would mis-combine it);
    - PARTITION columns answer from their DIRECTORY values (the
      directory is the exact value of every row): MIN/MAX/COUNT for
      decodable key types, SUM as value × rows for integral/Decimal
      keys — so ``MAX(day)`` on a day-partitioned table, the
      freshness query, is zero-I/O; float/double keys, undecodable
      directories, and layout-evolution files (value in-row) scan;
    - float SUM combines per-file partials in Python — same value up
      to float addition order, exactly like any distributed sum;
      integral SUM is exact under ANSI (the session default; a
      non-ANSI writer's wrapped per-file partials are out of scope).

    ``_man`` is internal plumbing for the SQL fast path: the
    already-loaded manifest FOR ``version`` (pass both or neither) so
    the statement doesn't list/load the same manifest twice.

    MIN/MAX of date/timestamp columns denormalize from the stats image
    (ISO strings) back to Python date/datetime via the schema, so both
    paths return Spark-typed values. SQL NULL semantics throughout:
    MIN/MAX/SUM over zero matching non-null rows return None, COUNT
    returns 0 — including under a provably-empty predicate.

    At 100 TB this is the retention-audit companion: ``SELECT MIN(ts),
    MAX(ts), SUM(bytes), COUNT(*) WHERE ts < cutoff`` on a
    time-clustered table opens only the boundary files the cutoff
    intersects; everything else answers from a few KB of manifest."""
    if _man is None or version is None:
        versions = _list_manifests(spark, path)
        if not versions:
            raise FileNotFoundError(f"no snapshot versions at {path}")
        if version is None:
            version = versions[-1]
        elif version not in versions:
            raise FileNotFoundError(
                f"version {version} not present at {path} "
                f"(have {versions})"
            )
    norm = _agg_normalize(aggs)
    man = (
        _man
        if _man is not None
        else _load_manifest(spark, path, version)
    )
    schema = StructType.fromJson(man["schema"])
    ftypes = {fld.name: fld.dataType for fld in schema.fields}
    _agg_validate_types(norm, ftypes)

    def empties() -> list:
        return [0 if fl == "count" else None for fl, _ in norm]

    preds = None
    if predicates is not None:
        preds = _sanitize_predicates(predicates)
        if not preds:
            return empties()
    if preds is not None:
        victims, _carried = _victims_by_stats_where(man, preds)
        full = set(_full_match_files_where(man, preds))
    else:
        victims = list(man["files"])
        full = set(victims)
    if not victims:
        return empties()
    proven, rows_map = _agg_proven_sets(man, norm, ftypes, victims, full)

    need_scan = [f for f in victims if any(f not in p for p in proven)]
    sset = set(need_scan)
    scan_row = None
    if need_scan:
        df = _read_file_list(
            spark, path, need_scan, schema,
            partition_cols=_manifest_partition_cols(man),
            dv_files=man.get("dv_files"),
            dv_targets=man.get("dv_targets"),
            eq_entries=man.get("eqs"),
            file_seq=man.get("seq"),
            colmap=_colmap(man) or None,
            defaults=man.get("defaults"),
        )
        if preds is not None:
            df = df.where(_match_expr(preds))
        exprs = []
        for k, (fl, col) in enumerate(norm):
            arg = F.lit(1) if col == "*" else F.col(col)
            exprs.append(getattr(F, fl)(arg).alias(f"_a{k}"))
        scan_row = df.agg(*exprs).first()

    out: list = []
    for k, (fl, col) in enumerate(norm):
        meta = [f for f in victims if f in proven[k] and f not in sset]
        sv = scan_row[f"_a{k}"] if scan_row is not None else None
        out.append(
            _agg_combine_one(fl, col, meta, sv, man, ftypes, rows_map)
        )
    return out


def _decode_partition_string(s, dt):
    """A partition-directory string back to the Spark-typed Python
    value — the inverse of how Spark wrote the directory, for exactly
    the types ``snapshot_group_agg_where`` admits as group keys."""
    import datetime
    import decimal

    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        DateType,
        DecimalType,
        IntegerType,
        LongType,
        ShortType,
        TimestampNTZType,
        TimestampType,
    )

    if s is None:
        return None
    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return int(s)
    if isinstance(dt, BooleanType):
        return s == "true"
    if isinstance(dt, DecimalType):
        return decimal.Decimal(s)
    if isinstance(dt, DateType):
        return datetime.date.fromisoformat(s)
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return datetime.datetime.fromisoformat(s)
    return s  # StringType


def snapshot_group_agg_where(
    spark: SparkSession,
    path: str,
    by: list,
    aggs: list,
    predicates=None,
    version: int | None = None,
    _man: dict | None = None,
) -> list:
    """Exact GROUPED MIN/MAX/SUM/COUNT over PARTITION columns —
    optionally under a plannable predicate — answered from manifest
    metadata wherever provable: the GROUP BY twin of
    ``snapshot_agg_where``. Returns ``[(by_vals..., agg_vals...),
    ...]`` with Spark-typed Python values, one tuple per live group,
    in no particular order (SQL GROUP BY order is unspecified).

    ``by`` must name partition columns: their values are directory
    strings the manifest already holds, so a victim file binds to its
    group with zero I/O. Per group, the same proven/scan split as the
    flat planner: fully-proven files contribute recorded stats, and
    ALL unprovable files across all groups join ONE residual
    ``groupBy(by).agg(...)`` scan, combined per group driver-side
    (#groups rows — partition counts, not data counts).

    Files route to the scan when any requested aggregate is unproven
    (the ``_agg_proven_sets`` gates), when the file's directories do
    not encode every group column (pre-``snapshot_set_layout``
    files — their group values live in data columns, which the scan
    groups correctly), when the file predates row tracking (group
    existence needs a row count), or when a group column's type
    can't be decoded from its directory string faithfully
    (float/double and tz-ful timestamp keys — see
    ``_dir_decode_types`` — everything scans rather than risking a
    silent key mismatch).

    Group existence follows SQL: a group is emitted iff at least one
    live row matched — metadata groups with zero recorded rows (all
    files empty) are suppressed, exactly as a passthrough GROUP BY
    emits nothing for them.

    At 100 TB this is the partition-profile query: ``SELECT day,
    COUNT(*), SUM(bytes) ... WHERE day < cutoff GROUP BY day`` on a
    day-partitioned table answers from the manifest alone — no file
    opens at all when stats prove every admitted file."""
    if _man is None or version is None:
        versions = _list_manifests(spark, path)
        if not versions:
            raise FileNotFoundError(f"no snapshot versions at {path}")
        if version is None:
            version = versions[-1]
        elif version not in versions:
            raise FileNotFoundError(
                f"version {version} not present at {path} "
                f"(have {versions})"
            )
    norm = _agg_normalize(aggs)
    man = (
        _man
        if _man is not None
        else _load_manifest(spark, path, version)
    )
    schema = StructType.fromJson(man["schema"])
    ftypes = {fld.name: fld.dataType for fld in schema.fields}
    _agg_validate_types(norm, ftypes)
    if not by:
        raise ValueError("by must name at least one partition column")
    part_cols = set(_manifest_partition_cols(man) or ())
    for c in by:
        if c not in ftypes:
            raise ValueError(
                f"unknown column {c!r} (have {sorted(ftypes)})"
            )
        if _phys(man, c) not in part_cols:
            raise ValueError(
                f"group column {c!r} is not a partition column — "
                "grouped metadata aggregates need directory-provable "
                "group values (layout: "
                f"{sorted(part_cols) or 'unpartitioned'})"
            )

    preds = None
    if predicates is not None:
        preds = _sanitize_predicates(predicates)
        if not preds:
            return []
    if preds is not None:
        victims, _carried = _victims_by_stats_where(man, preds)
        full = set(_full_match_files_where(man, preds))
    else:
        victims = list(man["files"])
        full = set(victims)
    if not victims:
        return []
    proven, rows_map = _agg_proven_sets(man, norm, ftypes, victims, full)

    phys_by = [_phys(man, c) for c in by]
    decodable = all(
        isinstance(ftypes[c], _dir_decode_types()) for c in by
    )
    sset: set = set()
    keyof: dict = {}
    for f in victims:
        if not decodable or f not in rows_map or any(
            f not in p for p in proven
        ):
            sset.add(f)
            continue
        vals = _dir_values_cached(f)
        if any(k not in vals for k in phys_by):
            sset.add(f)  # layout evolved: group values are in-row
            continue
        try:
            # TYPED keys, decoded per the schema: directory strings
            # are not canonical (Spark trims trailing fractional-
            # second zeros — 'ts=...00.123' for a .123000 value — and
            # Decimal scales vary), so matching meta groups to scan
            # groups on strings would split a group; typed values
            # hash/compare by VALUE. An undecodable directory (hand-
            # placed file) routes to the scan rather than erroring.
            keyof[f] = tuple(
                _decode_partition_string(vals[k], ftypes[c])
                for k, c in zip(phys_by, by)
            )
        except (ValueError, ArithmeticError):
            sset.add(f)

    scan_rows: list = []
    if sset:
        df = _read_file_list(
            spark, path, sorted(sset), schema,
            partition_cols=_manifest_partition_cols(man),
            dv_files=man.get("dv_files"),
            dv_targets=man.get("dv_targets"),
            eq_entries=man.get("eqs"),
            file_seq=man.get("seq"),
            colmap=_colmap(man) or None,
            defaults=man.get("defaults"),
        )
        if preds is not None:
            df = df.where(_match_expr(preds))
        exprs = []
        for k, (fl, col) in enumerate(norm):
            arg = F.lit(1) if col == "*" else F.col(col)
            exprs.append(getattr(F, fl)(arg).alias(f"_a{k}"))
        scan_rows = df.groupBy(*[F.col(c) for c in by]).agg(
            *exprs
        ).collect()

    meta_by_key: dict = {}
    for f, key in keyof.items():
        meta_by_key.setdefault(key, []).append(f)
    scan_by_key = {
        tuple(r[c] for c in by): r for r in scan_rows
    }
    out: list = []
    for key in set(meta_by_key) | set(scan_by_key):
        meta = meta_by_key.get(key, [])
        srow = scan_by_key.get(key)
        if srow is None and not any(rows_map[f] for f in meta):
            continue  # zero live rows: SQL emits no such group
        bvals = tuple(srow[c] for c in by) if srow is not None else key
        avals = tuple(
            _agg_combine_one(
                fl,
                col,
                meta,
                srow[f"_a{k}"] if srow is not None else None,
                man,
                ftypes,
                rows_map,
            )
            for k, (fl, col) in enumerate(norm)
        )
        out.append(bvals + avals)
    return out


def snapshot_count_nonnull(
    spark: SparkSession,
    path: str,
    col: str,
    version: int | None = None,
    partitions: dict | None = None,
) -> int:
    """Exact ``COUNT(col)`` (non-null rows) — metadata-only wherever
    provable: a file with a recorded row count, a recorded null count
    for ``col`` (stats third element), and no outstanding tombstones
    contributes ``rows - nulls`` without being opened; only the
    uncovered remainder (legacy stats, missing counts, DV'd files) is
    scanned, with tombstone masking applied. Completes the
    metadata-aggregate family: COUNT(*) (``snapshot_count``), MIN/MAX
    (``snapshot_minmax``), COUNT(col)."""
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(
            f"version {version} not present at {path} (have {versions})"
        )
    man = _load_manifest(spark, path, version)
    residual = None
    unenc: set = set()
    if partitions:
        # same layout-evolution recipe as snapshot_minmax: unmigrated
        # files scan with the residual filter, the rest stay metadata
        files, _ue = _partition_pruned_files(man, partitions, "split")
        if _ue:
            unenc = set(_ue)
            residual = _partition_residual_cond(partitions)
    else:
        files = man["files"]
    stats = man.get("stats") or {}
    rows = man.get("rows") or {}
    tgts = set(man.get("dv_targets") or ())
    if man.get("dv_files") and man.get("dv_targets") is None:
        tgts = set(files)  # legacy: unknown targets — assume any
    eq_aff = set(_eq_affected_files(man, files))
    pcol = _phys(man, col)  # stats are keyed by on-disk column names
    cov = {
        f
        for f in files
        if f in rows
        and f not in tgts
        and f not in eq_aff
        and f not in unenc
        and len(stats.get(f, {}).get(pcol) or ()) >= 3
    }
    total = sum(rows[f] - stats[f][pcol][2] for f in cov)
    uncovered = [f for f in files if f not in cov]
    if uncovered:
        schema = StructType.fromJson(man["schema"])
        df = _read_file_list(
            spark, path, uncovered, schema,
            partition_cols=_manifest_partition_cols(man),
            dv_files=man.get("dv_files"),
            dv_targets=man.get("dv_targets"),
            eq_entries=man.get("eqs"),
            file_seq=man.get("seq"),
            colmap=_colmap(man) or None,
            defaults=man.get("defaults"),
        )
        if residual is not None:
            df = df.where(residual)
        total += df.agg(F.count(F.col(col)).alias("c")).first()["c"]
    return total


def snapshot_history(spark: SparkSession, path: str) -> DataFrame:
    """The commit history as a queryable DataFrame (``DESCRIBE
    HISTORY``): version, op, parent, commit timestamp, file/DV counts,
    and the op-specific annotations (rows added/removed, DV rows,
    restore target, load provenance) as a JSON string. One manifest
    reconstruction per retained version — ascending, so the state
    cache makes the walk O(1) folds per version."""
    scalar_skip = {
        "version", "parent", "op", "committed_at_ms", "schema",
        "partition_cols", "manifest_id", "parent_id", "files",
        "dv_files", "dv_targets", "stats", "stats_cols", "rows",
        "props", "eqs", "seq", "last_seq", "colmap", "defaults",
    }
    rows = []
    for v in _list_manifests(spark, path):
        man = _load_manifest(spark, path, v)
        extras = {
            k: val for k, val in man.items() if k not in scalar_skip
        }
        rows.append(
            (
                v,
                man.get("op"),
                man.get("parent"),
                man.get("committed_at_ms"),
                len(man["files"]),
                len(man.get("dv_files") or ()),
                json.dumps(extras, sort_keys=True) if extras else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "version int, op string, parent int, committed_at_ms long, "
        "n_files int, n_dv_files int, extras string",
    )


def _branch_names(spark: SparkSession, path: str) -> list[str]:
    """Branch names under the table's _branches/ dir (metadata-only)."""
    fs, jvm = _fs(spark, path)
    bdir = _jp(jvm, path, _BDIR)
    if not fs.exists(bdir):
        return []
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(bdir)
        if st.isDirectory()
    )


def _tag_versions(spark: SparkSession, path: str) -> dict[str, int]:
    """{tag name: pinned main-chain version} (metadata-only)."""
    fs, jvm = _fs(spark, path)
    tdir = _jp(jvm, path, _TDIR)
    if not fs.exists(tdir):
        return {}
    out = {}
    for st in fs.listStatus(tdir):
        name = st.getPath().getName()
        if name.endswith(".json"):
            # same claimed-but-unfinished window as _load_manifest:
            # create_tag claims the name with an exclusive create, then
            # writes the body — retry over the torn glimpse so routine
            # tag creation can't crash a concurrent vacuum/list_tags
            for attempt in range(5):
                try:
                    doc = json.loads(
                        _read_bytes(fs, jvm, st.getPath()).decode("utf-8")
                    )
                    break
                except (ValueError, UnicodeDecodeError):
                    if attempt == 4:
                        raise
                    import time

                    time.sleep(0.05 * (attempt + 1))
            out[name[:-5]] = doc["version"]
    return out


def vacuum_snapshots(
    spark: SparkSession,
    path: str,
    keep_last: int | None = None,
    older_than=None,
) -> dict:
    """Drop all but the newest ``keep_last`` versions and delete data
    files no surviving version references. Time travel to dropped
    versions is gone afterwards (their manifests are removed) — run
    when no reader is pinned below the cutoff, the same contract as any
    manifest-log VACUUM. Returns {"versions_dropped", "files_deleted"}.

    ``keep_last=None`` (the default) resolves from the table's own
    ``retention.keep_last`` property when set, else 2 — so a table
    owner declares retention ONCE (``snapshot_set_properties``) and
    every maintenance job honors it without plumbing a number through
    schedulers; an explicit argument still wins.

    ``older_than`` (datetime | ISO string | epoch seconds) adds an AGE
    FLOOR: only versions committed before it are dropped, so
    "keep a week of time travel" composes with "always keep the last
    N" — a burst of commits never prematurely ages out history, and a
    quiet table never drops below ``keep_last``. Resolved from the
    table's ``retention.max_age_hours`` property when unset (both
    gates then come from declared policy).

    Branch/tag aware: TAGGED versions are never dropped regardless of
    ``keep_last`` (delete the tag first), and files referenced by ANY
    branch manifest survive — a live branch's history stays readable
    through a main-chain vacuum. Vacuum targets the TABLE; a branch ref
    is refused (``drop_branch`` removes a branch's manifests, after
    which its unshared files are ordinary vacuum candidates)."""
    if _REF_SEP in path:
        raise ValueError(
            "vacuum the table root, not a branch ref — use drop_branch "
            "to retire a branch, then vacuum the table"
        )
    fs, jvm = _fs(spark, path)
    versions = _list_manifests(spark, path)
    head = _load_manifest(spark, path, versions[-1]) if versions else {}
    props = head.get("props") or {}
    if keep_last is None:
        raw = props.get("retention.keep_last", "2")
        try:
            keep_last = int(raw)
        except ValueError as e:
            raise ValueError(
                f"table property retention.keep_last={raw!r} is not an "
                "int"
            ) from e
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    if older_than is None and props.get("retention.max_age_hours"):
        import time as _time

        try:
            hours = float(props["retention.max_age_hours"])
        except ValueError as e:
            raise ValueError(
                "table property retention.max_age_hours="
                f"{props['retention.max_age_hours']!r} is not a number"
            ) from e
        older_than = _time.time() - hours * 3600.0
    cutoff_ms = _to_epoch_ms(older_than) if older_than is not None else None
    tagged = set(_tag_versions(spark, path).values())
    drop = [v for v in versions[:-keep_last] if v not in tagged]
    if cutoff_ms is not None:

        def _commit_ms(v: int) -> int:
            # legacy manifests predate committed_at_ms: fall back to
            # the manifest file's mtime, the SAME clock
            # snapshot_version_at resolves with — treating them as
            # epoch 0 would age out history the declared policy
            # promised to keep
            t = _load_manifest(spark, path, v).get("committed_at_ms")
            if t is None:
                t = fs.getFileStatus(
                    _jp(jvm, path, _VDIR, f"{v:08d}.json")
                ).getModificationTime()
            return t

        drop = [v for v in drop if _commit_ms(v) < cutoff_ms]
    keep = [v for v in versions if v not in drop]
    referenced: set[str] = set()
    for v in keep:
        referenced.update(_storage_refs(_load_manifest(spark, path, v)))
    for b in _branch_names(spark, path):
        ref = f"{path}{_REF_SEP}{b}"
        for bv in _list_manifests(spark, ref):
            referenced.update(
                _storage_refs(_load_manifest(spark, ref, bv))
            )
    # RESCUE pass, while every ancestor manifest is still present: a
    # retained DELTA doc whose parent is about to be dropped (the
    # retention tail, or a tagged island in dropped history) could
    # never reconstruct afterwards — write its full state as a
    # checkpoint blob bound to its manifest_id. keep is ascending, so
    # a retained parent is itself made self-sufficient first and the
    # induction holds; re-vacuums are no-ops (exclusive create).
    keep_set = set(keep)
    for v in keep:
        doc = _read_doc(spark, path, v, must=True)
        if "files" in doc or doc.get("ckpt"):
            continue  # legacy full / checkpoint commit: terminal
        if doc.get("parent") in keep_set:
            continue  # parent retained (and rescued if it needed it)
        name = manifestlog.rescue_name(v, doc["manifest_id"])
        jpath = _jp(jvm, path, _VDIR, name)
        if fs.exists(jpath):
            continue  # a prior vacuum already rescued this version
        man = _load_manifest(spark, path, v)
        _write_bytes_exclusive(
            fs,
            jpath,
            manifestlog.encode_checkpoint(
                manifestlog.state_from_manifest(man)
            ),
        )
    # collect the dropped versions' file refs and metadata blobs
    # BEFORE deleting any manifest: a delta doc's reconstruction may
    # need an earlier manifest that is itself being dropped
    drop_refs: dict[int, list[str]] = {}
    drop_blobs: list[str] = []
    for v in drop:
        doc = _read_doc(spark, path, v, must=True)
        drop_refs[v] = _storage_refs(_load_manifest(spark, path, v))
        if doc.get("ckpt"):
            drop_blobs.append(doc["ckpt"])
        if "manifest_id" in doc:
            drop_blobs.append(
                manifestlog.rescue_name(v, doc["manifest_id"])
            )
    deleted = 0
    for v in drop:
        for f in drop_refs[v]:
            if f not in referenced:
                if fs.delete(_jp(jvm, path, f), False):
                    deleted += 1
        fs.delete(_jp(jvm, path, _VDIR, f"{v:08d}.json"), False)
    for name in drop_blobs:
        fs.delete(_jp(jvm, path, _VDIR, name), False)
    # sweep now-empty commit dirs (metadata-only listing)
    ddir = _jp(jvm, path, _DDIR)
    if fs.exists(ddir):
        for st in fs.listStatus(ddir):
            it = fs.listFiles(st.getPath(), True)
            if not it.hasNext():
                fs.delete(st.getPath(), True)
    return {"versions_dropped": len(drop), "files_deleted": deleted}


def sweep_orphans(
    spark: SparkSession, path: str, grace_seconds: float = 7 * 24 * 3600
) -> dict:
    """Delete data files referenced by NO retained manifest — the
    debris of crashed commits (files written, the manifest create lost
    or never attempted: vacuum can't find them because they appear in
    no manifest at all) and of metadata-only ``drop_branch`` calls.

    The AGE GATE is the safety mechanism: every commit protocol in
    this module writes data files BEFORE claiming its manifest, so an
    unreferenced-but-younger-than-grace file may be an in-flight
    commit and is left alone. ``grace_seconds`` must exceed the
    longest plausible write-to-claim window (default: 7 days, the
    usual object-store retention posture). A commit dir whose every
    non-hidden file was orphan-deleted is removed entirely (including
    its _SUCCESS-style markers, which otherwise keep it alive through
    vacuum's empty-dir sweep).

    The referenced set spans the MAIN chain, every BRANCH chain, and —
    because tagged versions' manifests are retained by vacuum — every
    tag. Metadata-proportional driver work: one file listing of data/
    plus one manifest read per retained version. Returns
    {"files_deleted", "dirs_deleted", "files_kept_young"}."""
    import time

    if _REF_SEP in path:
        raise ValueError("sweep the table root, not a branch ref")
    fs, jvm = _fs(spark, path)
    cutoff_ms_meta = (time.time() - grace_seconds) * 1000.0
    referenced: set[str] = set()
    meta_deleted = 0
    for mref in [path] + [
        f"{path}{_REF_SEP}{b}" for b in _branch_names(spark, path)
    ]:
        for v in _list_manifests(spark, mref):
            referenced.update(
                _storage_refs(_load_manifest(spark, mref, v))
            )
        # checkpoint-blob debris: a commit writes its checkpoint BEFORE
        # the exclusive manifest claim, so a losing racer (or a crash
        # between blob and claim) strands a blob no manifest
        # references. Same age gate as data files — an in-flight
        # commit's just-written blob is never swept.
        meta_deleted += _sweep_ckpt_debris(spark, mref, cutoff_ms_meta)
    ddir = _jp(jvm, path, _DDIR)
    if not fs.exists(ddir):
        return {
            "files_deleted": meta_deleted,
            "dirs_deleted": 0,
            "files_kept_young": 0,
        }
    root_uri = fs.makeQualified(_jp(jvm, path)).toString().rstrip("/")
    cutoff_ms = (time.time() - grace_seconds) * 1000.0
    files_deleted = dirs_deleted = kept_young = 0
    for st in fs.listStatus(ddir):
        if not st.isDirectory():
            continue
        any_referenced = any_young = marker_young = False
        orphans = []
        it = fs.listFiles(st.getPath(), True)
        while it.hasNext():
            fst = it.next()
            p = fst.getPath().toString()
            name = p.rsplit("/", 1)[-1]
            if name.startswith("_") or name.startswith("."):
                # markers ride with their dir's fate — but their age
                # still gates marker-ONLY dirs below
                if fst.getModificationTime() > cutoff_ms:
                    marker_young = True
                continue
            rel = p[len(root_uri) + 1 :] if p.startswith(root_uri + "/") else p
            if rel in referenced:
                any_referenced = True
            elif fst.getModificationTime() > cutoff_ms:
                any_young = True
                kept_young += 1
            else:
                orphans.append(fst.getPath())
        if not any_referenced and not any_young:
            # whole commit dir is orphaned debris: remove it, markers too
            if orphans:
                fs.delete(st.getPath(), True)
                files_deleted += len(orphans)
                dirs_deleted += 1
            elif (
                not marker_young
                and st.getModificationTime() <= cutoff_ms
            ):
                # marker-only (or empty) AGED dir: a crashed commit
                # whose data files never landed. Without this branch
                # it survives both GC paths forever — vacuum's
                # empty-dir sweep sees the markers, and the orphan
                # loop above has nothing to delete.
                if fs.delete(st.getPath(), True):
                    dirs_deleted += 1
        else:
            for op in orphans:
                if fs.delete(op, False):
                    files_deleted += 1
    return {
        "files_deleted": files_deleted + meta_deleted,
        "dirs_deleted": dirs_deleted,
        "files_kept_young": kept_young,
    }


def snapshot_maintain(spark: SparkSession, path: str) -> dict:
    """One-call table maintenance, driven ENTIRELY by the table's own
    declared properties — the owner writes policy once
    (``snapshot_set_properties``) and any scheduler can run a bare
    ``snapshot_maintain`` / ``snapshot-maintain`` on every table it
    knows about without plumbing per-table knobs:

    - ``maintain.min_file_mb`` — targeted compaction: bin-pack
      partitions holding >=2 fragments below this size (rewrite cost
      ∝ fragmented bytes, see ``snapshot_compact(min_file_mb=)``).
    - ``maintain.dv_compact_files`` — consolidate deletion-vector
      sidecars once this many have accumulated AND consolidation
      would materially shrink the set (``_maybe_auto_compact_dvs``'s
      gates, applied at maintenance time instead of per-DML).
    - ``retention.keep_last`` / ``retention.max_age_hours`` — vacuum
      old versions + unreferenced files (count floor AND/OR age
      floor; both compose — see ``vacuum_snapshots``). Vacuum runs
      ONLY when the owner has declared retention: an undeclared
      policy means "keep history", never "apply a default cutoff" —
      maintenance must not be the thing that silently destroys time
      travel.
    - ``maintain.orphan_grace_hours`` — sweep crashed-commit debris
      older than the grace window (age gate per ``sweep_orphans``).
    - ``maintain.eq_resolve_entries`` — fold accumulated
      equality-delete entries into position deletion vectors once
      this many are outstanding (``snapshot_resolve_eq``), keeping
      the streaming-upsert read tax bounded.

    Every step is opportunistic: a concurrent writer winning a commit
    race skips that step for this run (the next run retries) rather
    than failing the whole sweep — maintenance never contends with
    ingest. Returns {step: result | "skipped" | "conflict"} so
    schedulers can log what actually happened. Undeclared steps cost
    nothing but one manifest read (shared, metadata-only)."""
    props = snapshot_properties(spark, path)
    report: dict = {}

    def _num(key):
        raw = props.get(key)
        if raw is None:
            return None
        try:
            return float(raw)
        except ValueError:
            raise ValueError(
                f"table property {key}={raw!r} is not a number"
            ) from None

    eq_entries_n = _num("maintain.eq_resolve_entries")
    if eq_entries_n is not None:
        # resolve FIRST: outstanding equality deletes block the
        # compaction steps' position-exact accounting anyway (they
        # auto-resolve), so an explicit policy runs it as its own
        # conflict-tolerant step
        try:
            head = _load_manifest(
                spark, path, _list_manifests(spark, path)[-1]
            )
            if len(_eq_entries(head)) >= int(eq_entries_n):
                v, n = snapshot_resolve_eq(spark, path)
                report["resolve_eq"] = {"version": v, "rows": n}
            else:
                report["resolve_eq"] = "below_threshold"
        except SnapshotConflict:
            report["resolve_eq"] = "conflict"
    else:
        report["resolve_eq"] = "skipped"
    min_file_mb = _num("maintain.min_file_mb")
    if min_file_mb is not None:
        try:
            report["compact"] = {
                "version": snapshot_compact(
                    spark, path, min_file_mb=min_file_mb
                )
            }
        except SnapshotConflict:
            report["compact"] = "conflict"
    else:
        report["compact"] = "skipped"
    dv_files_n = _num("maintain.dv_compact_files")
    if dv_files_n is not None:
        try:
            _maybe_auto_compact_dvs(spark, path, int(dv_files_n))
            report["compact_dvs"] = "evaluated"
        except SnapshotConflict:  # pragma: no cover - swallowed inside
            report["compact_dvs"] = "conflict"
    else:
        report["compact_dvs"] = "skipped"
    if (
        props.get("retention.keep_last") is not None
        or props.get("retention.max_age_hours") is not None
    ):
        report["vacuum"] = vacuum_snapshots(spark, path)
    else:
        report["vacuum"] = "skipped"
    grace_h = _num("maintain.orphan_grace_hours")
    if grace_h is not None:
        report["sweep_orphans"] = sweep_orphans(
            spark, path, grace_seconds=grace_h * 3600.0
        )
    else:
        report["sweep_orphans"] = "skipped"
    return report


def _sweep_ckpt_debris(
    spark: SparkSession, path: str, cutoff_ms: float
) -> int:
    """Delete AGED ``*.ckpt.parquet`` blobs in a chain's manifest dir
    that no committed manifest references: the leavings of commit
    races lost after the blob landed (regular checkpoints are written
    pre-claim) and of superseded rescues. A kept blob is exactly one a
    retained manifest names — its own ``ckpt`` key, or the rescue name
    bound to its manifest_id."""
    root, mdir = _split_ref(path)
    fs, jvm = _fs(spark, root)
    vdir = _jp(jvm, root, mdir)
    if not fs.exists(vdir):
        return 0
    live: dict[int, set[str]] = {}
    deleted = 0
    for st in fs.listStatus(vdir):
        name = st.getPath().getName()
        if not name.endswith(".ckpt.parquet"):
            continue
        if st.getModificationTime() > cutoff_ms:
            continue  # possibly an in-flight commit's blob
        try:
            v = int(name.split(".", 1)[0])
        except ValueError:
            continue
        if v not in live:
            doc = _read_doc(spark, path, v, must=False)
            names: set[str] = set()
            if doc is not None:
                if doc.get("ckpt"):
                    names.add(doc["ckpt"])
                if doc.get("manifest_id"):
                    names.add(
                        manifestlog.rescue_name(v, doc["manifest_id"])
                    )
            live[v] = names
        if name not in live[v]:
            if fs.delete(st.getPath(), False):
                deleted += 1
    return deleted


def stream_snapshot_append(
    spark: SparkSession,
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    stream_id: str,
    partition_cols: list[str] | None = None,
    retries: int = 3,
    auto_compact_rows: int | None = None,
    auto_compact_trigger: int = 16,
) -> None:
    """Land a stream into a snapshot table, one APPEND VERSION per
    micro-batch, exactly once across checkpoint replays.

    ``auto_compact_rows`` opts into small-file maintenance: after each
    batch commit, once ``auto_compact_trigger`` fragments with fewer
    recorded rows than this have piled up, a TARGETED compaction
    bin-packs them (carried files untouched, cadence-gated — see
    ``_maybe_auto_compact_small``). Streaming ingest is the canonical
    small-file generator; without maintenance a month of micro-batches
    is 10^5 tiny files and every read pays the open() storm.
    Downstream feed readers should use ``onNonAppend="verify"`` (the
    compact commits are row-neutral with recorded totals).

    foreachBatch is at-least-once; exactly-once falls out of making the
    apply idempotent: every stream commit records ``(stream_id, epoch)``
    in its manifest, and a replayed epoch that already appears in the
    version history is skipped (its earlier data files are already
    published; the replay's orphan dir is invisible to readers). The
    same idempotent-apply ∘ at-least-once composition as
    ``streaming/dedup_ingest.py`` — but here the publish step is the
    atomic manifest create, so a crash ANYWHERE leaves either the old
    history or the old history plus one complete version, never a
    partial table.
    """

    def apply_batch(batch: DataFrame, epoch: int) -> None:
        if batch.isEmpty():
            return
        checked: set[int] = set()

        def epoch_applied(versions: list[int]) -> bool:
            for v in versions:
                if v in checked:
                    continue
                checked.add(v)
                man = _load_manifest(spark, path, v)
                if (
                    man.get("stream_id") == stream_id
                    and man.get("epoch") == epoch
                ):
                    return True
            return False

        if epoch_applied(_list_manifests(spark, path)):
            return
        head = _list_manifests(spark, path)
        cmap, dflts = None, None
        if head:
            _hm = _load_manifest(spark, path, head[-1])
            cmap = _colmap(_hm) or None
            dflts = _hm.get("defaults")  # captured-tuple rule
        _, new_files = _write_commit_files(
            batch, path, partition_cols, colmap=cmap
        )
        # transaction retry (default on for streams: concurrent batch
        # writers or a second stream on the same table are the NORM,
        # not an error): the batch's files are written once; each
        # retry re-derives the head and recommits metadata-only
        for attempt in range(retries + 1):
            versions = _list_manifests(spark, path)
            # re-check the exactly-once guard against manifests that
            # appeared since the last look: the conflicting commit may
            # BE this epoch, landed by a replayed/zombie instance of
            # this same stream while we were writing files or retrying
            # — recommitting would double the batch. Our orphan commit
            # dir stays invisible to readers (GC reclaims it later).
            if epoch_applied(versions):
                return
            parent = versions[-1] if versions else None
            files = new_files
            if parent is not None:
                pman = _load_manifest(spark, path, parent)
                _require_same_layout(pman, partition_cols, "stream_append")
                files = sorted(pman["files"] + new_files)
            try:
                _commit(
                    spark,
                    path,
                    files,
                    batch.schema,
                    "stream_append",
                    parent,
                    extra={"stream_id": stream_id, "epoch": epoch},
                    partition_cols=partition_cols,
                    # the (schema, colmap, defaults) TUPLE captured at
                    # file-write time: inheriting the retry-time head's
                    # alter state under this stale schema would let
                    # _commit's pruning destroy a concurrent rename's
                    # mapping or a defaulted column's fill — permanent
                    # silent nulls. Committing the captured tuple is
                    # ordinary newest-writer-wins schema semantics.
                    colmap=cmap,
                    defaults=dflts,
                )
                _maybe_auto_compact_small(
                    spark, path, auto_compact_rows,
                    trigger_files=auto_compact_trigger,
                )
                return
            except SnapshotConflict:
                if attempt == retries:
                    raise

    (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def _footer_row_total(spark: SparkSession, root: str, files: list[str]) -> int:
    """Sum of parquet-footer ``num_rows`` over manifest relpaths —
    metadata-only, distributed past a small count (the per-file
    variant ``_rows_for_files`` holds the single copy of the footer
    logic; a serial driver loop here would stall a large compaction
    for hours at 10^5+ sequential object-store opens)."""
    return sum(_rows_for_files(spark, root, files).values())


def _rows_for_files(
    spark: SparkSession,
    root: str,
    files: list[str],
    missing_ok: bool = False,
) -> dict[str, int]:
    """Per-file parquet-footer row counts (metadata-only, never data
    pages). Small lists read footers on the driver; past a threshold
    the opens fan out to executors (same shape as ``_file_bytes_total``
    — a serial loop is one object-store round-trip per file).

    ``missing_ok=True`` SKIPS files whose footer cannot be found
    instead of raising — used by ``_commit`` to keep forged metadata
    histories (tests that commit synthetic relpaths) valid: the
    manifest ``rows`` map is legally partial and readers self-heal
    from footers. Any error other than not-found still propagates —
    throttling must never silently degrade the map."""
    if not files:
        return {}

    def _count(uri: str) -> int | None:
        import pyarrow.fs as pafs
        import pyarrow.parquet as pq

        if "://" in uri:
            fs, p = pafs.FileSystem.from_uri(uri)
        else:
            fs, p = pafs.LocalFileSystem(), uri
        try:
            with fs.open_input_file(p) as f:
                return pq.ParquetFile(f).metadata.num_rows
        except FileNotFoundError:
            if missing_ok:
                return None
            raise

    uris = [f"{root}/{f}" for f in files]
    if len(files) <= 256:
        counted = map(_count, uris)
    else:
        n_slices = min(
            len(uris), max(2, spark.sparkContext.defaultParallelism)
        )
        counted = (
            spark.sparkContext.parallelize(uris, n_slices)
            .map(_count)
            .collect()
        )
    return {f: n for f, n in zip(files, counted) if n is not None}


def _physical_row_total(
    spark: SparkSession, root: str, man: dict, files: list[str]
) -> int:
    """Physical (pre-DV) row total of ``files`` — from the manifest's
    recorded per-file counts, footer-reading ONLY the gap (legacy
    history; fail-loud, a referenced file that cannot be opened is
    corruption, never a silent under-count)."""
    rows = man.get("rows") or {}
    total = sum(rows[f] for f in files if f in rows)
    missing = [f for f in files if f not in rows]
    if missing:
        total += sum(_rows_for_files(spark, root, missing).values())
    return total


def _make_batch_sizer():
    """Factory for the executor-side batched file-size function shared
    by ``_file_bytes_total`` and ``snapshot_files``: ONE FileSystem
    construction and ONE batched ``get_file_info`` call per batch of
    URIs (a per-file ``from_uri`` rebuilds the object-store client —
    the RPC storm the fan-out exists to avoid, just moved). The
    fs-local path prefix is derived from ``from_uri``'s own resolution
    of the first URI, which handles authority-bearing schemes (HDFS
    ``hdfs://nn:8020/x`` → ``/x``) and bucket-in-path ones (S3
    ``s3://b/k`` → ``b/k``) alike — naive ``scheme://`` stripping
    breaks the former. Returned as a closure so Spark pickles it by
    value (no package import needed on untuned workers)."""

    def batch_sizes(uris: list) -> list:
        import pyarrow.fs as pafs

        uris = list(uris)
        if not uris:
            return []
        first = uris[0]
        if "://" in first:
            fs, first_path = pafs.FileSystem.from_uri(first)
            off = len(first) - len(first_path)
            rels = [u[off:] for u in uris]
        else:
            fs, rels = pafs.LocalFileSystem(), uris
        infos = fs.get_file_info(rels)
        out = []
        for u, info in zip(uris, infos):
            if info.size is None:
                # a NotFound info would otherwise surface as an opaque
                # int64-cast failure downstream
                raise FileNotFoundError(f"cannot stat {u}")
            out.append(info.size)
        return out

    return batch_sizes


def _file_bytes_total(
    spark: SparkSession, root: str, files: list[str]
) -> int:
    """Total on-disk bytes of manifest relpaths (``_file_sizes`` holds
    the single copy of the stat logic: driver below a threshold,
    batched executor fan-out beyond — a serial driver loop is one
    object-store RPC per file, hours at the 10^5–10^6-file design
    point)."""
    return sum(_file_sizes(spark, root, files).values())


def _file_sizes(
    spark: SparkSession, root: str, files: list[str]
) -> dict[str, int]:
    """Per-file on-disk bytes of manifest relpaths — the aligned
    variant of ``_file_bytes_total`` for callers that need each size
    (targeted compaction's victim selection). Same scale shape: driver
    stats up to a small count, batched executor fan-out beyond."""
    if not files:
        return {}
    if len(files) <= 256:
        fs, jvm = _fs(spark, root)
        return {
            f: fs.getFileStatus(_jp(jvm, root, f)).getLen() for f in files
        }
    uris = [f"{root}/{f}" for f in files]
    sizer = _make_batch_sizer()
    n_slices = min(len(uris), max(2, spark.sparkContext.defaultParallelism))
    sizes = (
        spark.sparkContext.parallelize(uris, n_slices)
        .mapPartitions(lambda it: sizer(list(it)))
        .collect()
    )
    return dict(zip(files, sizes))


def _storage_refs(man: dict) -> list[str]:
    """EVERY storage relpath a manifest references — data files plus
    deletion-vector sidecars (deleting a retained version's DVs would
    RESURRECT its deleted rows) plus equality-delete key sidecars
    (same hazard, key form). The single definition all three GC paths
    (vacuum, orphan sweep, branch reclaim) share: a new sidecar kind
    added here is automatically protected everywhere."""
    return (
        man["files"]
        + (man.get("dv_files") or [])
        + [e["path"] for e in man.get("eqs") or ()]
    )


def _dv_entry_count(
    spark: SparkSession,
    root: str,
    dv_files: list[str] | None,
    files: list[str],
) -> int:
    """Tombstones in ``dv_files`` that target one of ``files`` — the
    manifest-relpath semi-join ignores inert entries whose data file
    has since been rewritten away."""
    if not dv_files:
        return 0
    live = F.broadcast(
        spark.createDataFrame([(f,) for f in files], "_dv_file string")
    )
    return (
        spark.read.parquet(*[f"{_root(root)}/{p}" for p in dv_files])
        .join(live, "_dv_file", "left_semi")
        .count()
    )


def _fragment_victims(files: list[str], is_frag) -> list[str]:
    """Fragments worth bin-packing: only PARTITIONS holding >= 2 of
    them qualify — packing a lone fragment reproduces one
    under-threshold file (bin-packing cannot merge across partition
    dirs), so this selection makes every targeted pass strictly
    reduce the file count and the fixpoint a true no-op."""
    from ..streaming.snapshot_source import _partition_values_from_path

    frags: dict[tuple, list[str]] = {}
    for f in files:
        if is_frag(f):
            key = tuple(sorted(_partition_values_from_path(f).items()))
            frags.setdefault(key, []).append(f)
    return sorted(
        f for group in frags.values() if len(group) >= 2 for f in group
    )


def _constraint_exprs(props: dict | None) -> dict[str, str]:
    """name -> SQL expr of the CHECK constraints in a props dict."""
    pre = "constraint."
    return {
        k[len(pre):]: v
        for k, v in (props or {}).items()
        if k.startswith(pre)
    }


def _enforce_constraints(
    spark: SparkSession,
    path: str,
    files: list[str],
    schema: StructType,
    partition_cols: list[str] | None,
    props: dict,
    dv_files: list[str] | None = None,
    dv_targets: list[str] | None = None,
    eq_entries: list[dict] | None = None,
    file_seq: dict | None = None,
    colmap: dict | None = None,
    defaults: dict | None = None,
) -> None:
    """Refuse data that violates a recorded CHECK constraint. Scans
    ONLY ``files`` (the commit's additions — O(change), never the
    table) with SQL CHECK semantics: a row passes unless the
    expression is literally FALSE (NULL passes, like every SQL
    engine). Early-exits on the first violating row per constraint.
    ``dv_files``/``dv_targets`` apply the commit's deletion-vector
    masking for the resurrection re-check (a still-tombstoned row is
    not live and must not fail the check). ``colmap`` aliases the scan
    back to LOGICAL names — CHECK expressions are written against the
    user-visible schema."""
    checks = _constraint_exprs(props)
    if not checks or not files:
        return
    df = _read_file_list(
        spark, path, files, schema, partition_cols=partition_cols,
        dv_files=dv_files, dv_targets=dv_targets,
        eq_entries=eq_entries, file_seq=file_seq, colmap=colmap,
        defaults=defaults,
    )
    for name in sorted(checks):
        expr = checks[name]
        bad = (
            df.where(
                ~F.coalesce(F.expr(expr).cast("boolean"), F.lit(True))
            )
            .limit(1)
            .collect()
        )
        if bad:
            raise ValueError(
                f"CHECK constraint {name!r} ({expr}) violated by "
                f"committed data; first offender: {bad[0].asDict()}"
            )


def snapshot_properties(
    spark: SparkSession, path: str, version: int | None = None
) -> dict[str, str]:
    """The table properties at ``version`` (default: latest) — carried
    commit-to-commit in the manifest state, metadata-only to read."""
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(
            f"version {version} not present at {path} (have {versions})"
        )
    return dict(_load_manifest(spark, path, v).get("props") or {})


def snapshot_set_properties(
    spark: SparkSession,
    path: str,
    set_props: dict[str, str] | None = None,
    unset: list[str] | None = None,
) -> int:
    """ALTER TABLE SET/UNSET TBLPROPERTIES as a metadata-only commit:
    same files, same schema, zero data movement. Keys under
    ``constraint.`` refuse here — constraints change enforcement
    semantics, so they go through ``snapshot_add_constraint`` (which
    validates existing data) / ``snapshot_drop_constraint``."""
    set_props = dict(set_props or {})
    unset = list(unset or [])
    if not set_props and not unset:
        raise ValueError("nothing to set or unset")
    guarded = [
        k for k in list(set_props) + unset if k.startswith("constraint.")
    ]
    if guarded:
        raise ValueError(
            f"properties {guarded} are CHECK constraints — use "
            "snapshot_add_constraint / snapshot_drop_constraint"
        )
    bad_vals = {k: v for k, v in set_props.items() if not isinstance(v, str)}
    if bad_vals:
        raise ValueError(
            f"property values must be strings: {sorted(bad_vals)}"
        )
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    man = _load_manifest(spark, path, versions[-1])
    props = dict(man.get("props") or {})
    missing = [k for k in unset if k not in props]
    if missing:
        raise ValueError(f"cannot unset absent properties {missing}")
    for k in unset:
        props.pop(k)
    props.update(set_props)
    return _commit(
        spark, path, man["files"], StructType.fromJson(man["schema"]),
        "set_properties", versions[-1],
        extra={"props_set": sorted(set_props), "props_unset": unset},
        partition_cols=_manifest_partition_cols(man),
        props=props,
    )


def snapshot_add_constraint(
    spark: SparkSession, path: str, name: str, expr: str
) -> int:
    """ALTER TABLE ADD CONSTRAINT (CHECK): validates the EXISTING data
    once (one full scan — the documented cost of adding a constraint
    to a populated table, same as Delta's), then records the
    expression as a carried table property. From then on EVERY commit
    validates its added files at the ``_commit`` choke point —
    appends, stream batches, merges, update images, restores — at
    O(new files) data read, and violating writes refuse before a
    version exists."""
    if not name or "/" in name or name != name.strip():
        raise ValueError(f"bad constraint name {name!r}")
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    man = _load_manifest(spark, path, versions[-1])
    props = dict(man.get("props") or {})
    key = f"constraint.{name}"
    if key in props:
        raise ValueError(
            f"constraint {name!r} already exists ({props[key]!r}); drop "
            "it first"
        )
    # validate existing rows under SQL CHECK semantics (NULL passes)
    df = read_snapshot(spark, path, versions[-1])
    bad = (
        df.where(~F.coalesce(F.expr(expr).cast("boolean"), F.lit(True)))
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(
            f"cannot add CHECK constraint {name!r} ({expr}): existing "
            f"data violates it, e.g. {bad[0].asDict()}"
        )
    props[key] = expr
    return _commit(
        spark, path, man["files"], StructType.fromJson(man["schema"]),
        "add_constraint", versions[-1],
        extra={"constraint": name, "expr": expr},
        partition_cols=_manifest_partition_cols(man),
        props=props,
    )


def snapshot_drop_constraint(
    spark: SparkSession, path: str, name: str
) -> int:
    """ALTER TABLE DROP CONSTRAINT — metadata-only."""
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    man = _load_manifest(spark, path, versions[-1])
    props = dict(man.get("props") or {})
    key = f"constraint.{name}"
    if key not in props:
        raise ValueError(f"no constraint named {name!r} on {path}")
    props.pop(key)
    return _commit(
        spark, path, man["files"], StructType.fromJson(man["schema"]),
        "drop_constraint", versions[-1],
        extra={"constraint": name},
        partition_cols=_manifest_partition_cols(man),
        props=props,
    )


def snapshot_compact(
    spark: SparkSession,
    path: str,
    target_mb: int = 256,
    partition_cols: list[str] | None = None,
    cluster_by: list[str] | None = None,
    zorder_bits: int = 8,
    n_files: int | None = None,
    min_file_mb: float | None = None,
    min_file_rows: int | None = None,
) -> int:
    """Compaction as a COMMIT: rewrite the latest version's data into
    ceil(bytes/target) files per partition and publish the result as a
    new version. Unlike ``compact_partition`` (in-place), running
    readers keep their version's files untouched; ``vacuum_snapshots``
    reclaims the fragmented ones later. Returns the new version.

    Manifest stats SURVIVE compaction: when the parent tracked
    ``stats_cols``, per-file min/max are recomputed for the new files —
    without this, every compaction silently reset ``read_snapshot_pruned``
    to a full scan (conservatively correct, catastrophically unpruned).

    ``cluster_by`` upgrades the rewrite to the OPTIMIZE-with-clustering
    shape: one column range-partitions + sorts on it; several columns
    cluster on the interleaved ``zorder_value`` so every file covers a
    compact region of the whole key space (``n_files`` overrides the
    byte-derived output count — clustering often wants a fixed shard
    layout). Because the recomputed stats
    are collected from the CLUSTERED files, their [min,max] ranges come
    out tight and disjoint — compaction then actively IMPROVES scan
    pruning instead of merely not destroying it. With partition
    columns, clustering applies within each partition (the range
    exchange keys on partitions first). Row-neutral by construction
    either way, so the feed's ``onNonAppend=verify`` passes it.

    ``min_file_mb`` makes the compaction TARGETED: only files smaller
    than the threshold are bin-packed; every right-sized file is
    carried BY REFERENCE, untouched. Rewrite cost is ∝ the fragmented
    bytes, never the table — on a 100 TB table where a streaming
    ingest left a few thousand 5 MB files among 512 MB ones, the full
    rewrite copies 100 TB; the targeted one copies the few GB of
    fragments. Deletion-vector sidecars are KEPT (entries for the
    rewritten fragments go inert — uuid relpaths never recur; entries
    for carried files keep masking), and recorded dv_targets shrink to
    the carried intersection — unless nothing carried is targeted, in
    which case the sidecars fold away entirely. Per-file stats are
    carried for carried files, recomputed for the packed ones. Only
    partitions holding >= 2 fragments pack (a lone fragment would just
    be rewritten in place — thrash, not progress); when none qualify
    the call is a no-op (returns the current version, no commit).
    Targeted mode requires the table's recorded partition layout
    (carried files are classified by directory).

    ``min_file_rows`` is the METADATA-ONLY fragment threshold: victims
    come from the manifest's recorded per-file row counts — zero
    filesystem stats, so an automated maintenance trigger can evaluate
    it on every commit for free (``_maybe_auto_compact_small``). Files
    whose count is unrecorded (legacy history) are conservatively
    carried. Mutually exclusive with ``min_file_mb``."""
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    latest = versions[-1]
    man = _load_manifest(spark, path, latest)
    latest, man = _eq_resolved_head(spark, path, latest, man)
    root = _root(path)
    if partition_cols is None:
        # default to the table's recorded layout — an unpartitioned
        # compaction of a partitioned table would strip the partition
        # directories carried-file classification depends on
        partition_cols = _manifest_partition_cols(man)
    renamed_pc = sorted(set(partition_cols or ()) & set(_colmap(man)))
    if renamed_pc:
        # partition directory names must equal the files' (physical)
        # column names, and every partition-predicate surface assumes
        # logical == physical for layout columns — re-laying out onto
        # a renamed column would write logical-named directories over
        # physical-named files (the write itself dies on the name
        # mismatch). Shedding the rename needs a fresh column
        # identity: a full rewrite via snapshot_write(overwrite).
        raise ValueError(
            f"cannot partition by renamed column(s) {renamed_pc} — "
            "their on-disk names differ from their logical names; "
            "rewrite the table (snapshot_write overwrite) to shed the "
            "rename first"
        )
    if min_file_mb is not None and min_file_rows is not None:
        raise ValueError("pass min_file_mb OR min_file_rows, not both")
    targeted = min_file_mb is not None or min_file_rows is not None
    victims, carried = list(man["files"]), []
    if targeted:
        _require_same_layout(
            man, partition_cols, "snapshot_compact(targeted)"
        )
        if min_file_mb is not None:
            sizes = _file_sizes(spark, root, man["files"])
            cut = min_file_mb * 1024 * 1024
            victims = _fragment_victims(
                man["files"], lambda f: sizes[f] < cut
            )
        else:
            frows = man.get("rows") or {}
            victims = _fragment_victims(
                man["files"],
                lambda f: f in frows and frows[f] < min_file_rows,
            )
        carried = [f for f in man["files"] if f not in set(victims)]
        if not victims:
            return latest  # nothing to bin-pack
    if n_files is None:
        if min_file_mb is not None:
            total = sum(sizes[f] for f in victims)
        elif targeted:  # rows mode: stat only the victims
            total = sum(_file_sizes(spark, root, victims).values())
        else:
            total = _file_bytes_total(spark, root, man["files"])
        n_files = max(1, -(-total // (target_mb * 1024 * 1024)))
        if targeted:
            # cap the derived output count so each packed file
            # averages AT OR ABOVE the fragment threshold — without
            # this, an unpartitioned (or clustered) pack of many
            # mid-size fragments can emit n_files outputs that all
            # still qualify as fragments, and the auto cadence would
            # rewrite the same bytes forever instead of converging.
            # (Partitioned hash-repartition packs collapse to one file
            # per partition regardless, but the cap is harmless there.)
            if min_file_mb is not None:
                cap = int(total // (min_file_mb * 1024 * 1024))
            else:
                vic_rows = sum(frows[f] for f in victims)
                cap = vic_rows // min_file_rows
            n_files = max(1, min(n_files, cap))
    if not targeted:
        df = read_snapshot(spark, path, latest)
    else:
        schema = StructType.fromJson(man["schema"])
        df = _read_file_list(
            spark, path, victims, schema,
            partition_cols=partition_cols,
            dv_files=man.get("dv_files"),
            dv_targets=man.get("dv_targets"),
            colmap=_colmap(man) or None,
            defaults=man.get("defaults"),
        )
    drop_after = None
    if cluster_by:
        bad = [c for c in cluster_by if c in (partition_cols or [])]
        if bad:
            raise ValueError(
                f"cluster_by {bad} are partition columns — the directory "
                "layout already clusters them"
            )
        if len(cluster_by) == 1:
            ckey = F.col(cluster_by[0])
        else:
            from .layout import zorder_value

            df, drop_after = zorder_value(df, cluster_by, bits=zorder_bits)
            ckey = F.col(drop_after)
        range_keys = [F.col(c) for c in (partition_cols or [])] + [ckey]
        df = df.repartitionByRange(n_files, *range_keys).sortWithinPartitions(
            *range_keys
        )
        if drop_after:
            df = df.drop(drop_after)
    elif partition_cols:
        df = df.repartition(n_files, *partition_cols)
    else:
        df = df.repartition(n_files)
    _, files = _write_commit_files(
        df, path, partition_cols, colmap=_colmap(man) or None
    )
    stats_cols = man.get("stats_cols") or []
    extra = {}
    if stats_cols:
        new_stats = collect_file_stats(spark, path, files, stats_cols)
        if carried:
            pstats = man.get("stats") or {}
            new_stats = {
                **{f: pstats[f] for f in carried if f in pstats},
                **new_stats,
            }
        extra = {"stats": new_stats, "stats_cols": stats_cols}
    # Record row totals IN the commit: the feed's onNonAppend=verify
    # gate proves row-neutrality from these, so a feed that lags behind
    # a compact + vacuum (which deletes exactly the superseded files it
    # would otherwise re-read) still verifies from metadata instead of
    # hard-failing on vanished footers. Counted while both sides still
    # exist — recorded manifest counts for the removed side, fresh
    # footers for the added side (reused by _commit via known_rows).
    # LIVE rows on the removed side: physical totals minus the
    # parent's deletion-vector tombstones targeting the REWRITTEN
    # files (their tombstones fold — the rewrite came from the
    # DV-applied read, so the added side is live-only by construction
    # and the equality must compare like with like)
    rows_new = _rows_for_files(spark, root, files)
    extra["rows_removed"] = _physical_row_total(
        spark, root, man, victims
    ) - _dv_entry_count(spark, root, man.get("dv_files"), victims)
    extra["rows_added"] = sum(rows_new.values())
    defaults_after = _DV_INHERIT
    if not targeted:
        dv_files, dv_targets = None, None  # folded into the rewrite
        # every file was rewritten from the FILLED read: initial
        # defaults are now physically materialized — shed the entries
        # (this is also what re-enables Bloom-indexing such columns)
        defaults_after = None
    else:
        extra["files_compacted"] = len(victims)
        extra["files_carried"] = len(carried)
        live_tgts = set(man.get("dv_targets") or ()) & set(carried)
        if man.get("dv_files") and man.get("dv_targets") is None:
            # legacy manifest: sidecars without a recorded target list
            # — keep them and let _commit derive the footprint (a
            # superset including the rewritten fragments is legal)
            dv_files, dv_targets = man["dv_files"], None
        elif live_tgts:
            dv_files, dv_targets = man["dv_files"], sorted(live_tgts)
        else:
            dv_files, dv_targets = None, None  # every entry went inert
    return _commit(
        spark, path, carried + files, df.schema, "compact", latest,
        extra=extra or None,
        partition_cols=partition_cols,
        dv_files=dv_files,
        dv_targets=dv_targets,
        known_rows=rows_new,
        defaults=defaults_after,
    )


def snapshot_merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    partition_cols: list[str],
    version_col: str | None = None,
) -> int:
    """Keyed MERGE producing a NEW VERSION — ``merge.py::merge_upsert``
    semantics (replace matched, insert unmatched; with ``version_col``,
    max-version-wins across target and updates so out-of-order CDC
    feeds converge and redelivery is a no-op) on a snapshot table:
    readers keep their version, the merge publishes the next one, and a
    crash mid-merge leaves only an orphan commit dir.

    Scale shape matches the in-place merge: the updates' distinct
    partition keys (metadata-sized, broadcast) prune the target read to
    touched partitions; untouched partitions carry over by reference in
    the manifest — never read, never rewritten. Keys must be
    partition-stable, as in ``merge.py``.
    """
    from pyspark.sql.window import Window

    target = read_snapshot(spark, path)
    touched = updates.select(*partition_cols).distinct()
    current = target.join(F.broadcast(touched), partition_cols, "left_semi")
    cols = target.columns
    if version_col is not None:
        tagged = (
            current.select(*cols)
            .withColumn("_src", F.lit(0))
            .unionByName(updates.select(*cols).withColumn("_src", F.lit(1)))
        )
        w = Window.partitionBy(*keys).orderBy(
            F.col(version_col).desc(), F.col("_src").asc()
        )
        merged = (
            tagged.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(*cols)
        )
    else:
        merged = current.join(
            updates.select(*keys).distinct(), keys, "left_anti"
        ).select(*cols).unionByName(updates.select(*cols))
    # No off-table materialization needed: the new commit's files are
    # written BEFORE the manifest flips, and the plan reads the OLD
    # version's immutable files — the snapshot layer dissolves the
    # read-while-overwriting hazard merge.py checkpoints around.
    return snapshot_replace_partitions(merged, path, partition_cols)


def snapshot_merge_upsert_dv(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    partition_cols: list[str],
    version_col: str | None = None,
) -> int:
    """``snapshot_merge_upsert`` semantics via deletion vectors: ONE
    commit tombstones the superseded target rows and appends only the
    surviving update images — write cost ∝ |updates| + |matched rows|,
    never touched-PARTITION bytes (the CoW merge rewrites every touched
    partition whole to replace a handful of keys; on a 100 TB table a
    small CDC batch scattered across partitions rewrote all of them).
    Unmatched target rows are never rewritten — they stay in their
    files and simply aren't tombstoned.

    Same contracts as the CoW merge: keys must be partition-stable;
    with ``version_col``, max-version-wins across target and updates
    (an older redelivered update loses to the target row it would have
    replaced — including its physical copy staying live), and
    duplicate-key rows collapse to the single winner exactly as the
    CoW path's ``row_number`` does."""
    from pyspark.sql.window import Window

    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    latest = versions[-1]
    man = _load_manifest(spark, path, latest)
    _require_same_layout(man, partition_cols, "merge_dv")
    latest, man = _eq_resolved_head(spark, path, latest, man)
    schema = StructType.fromJson(man["schema"])
    cols = [f.name for f in schema.fields]
    touched = updates.select(*partition_cols).distinct()
    target = _read_file_list(
        spark, path, man["files"], schema,
        partition_cols=partition_cols,
        dv_files=man.get("dv_files"),
        row_ids=True,
        dv_targets=man.get("dv_targets"),
        colmap=_colmap(man) or None,
        defaults=man.get("defaults"),
    ).join(F.broadcast(touched), partition_cols, "left_semi")
    if version_col is not None:
        tagged = target.withColumn("_src", F.lit(0)).unionByName(
            updates.select(*cols).withColumn("_src", F.lit(1)),
            allowMissingColumns=True,  # updates carry NULL row ids
        )
        w = Window.partitionBy(*keys).orderBy(
            F.col(version_col).desc(), F.col("_src").asc()
        )
        ranked = (
            tagged.withColumn("_rn", F.row_number().over(w))
            .localCheckpoint(eager=True)  # one shuffle feeds both sides
        )
        tombs = ranked.where(
            (F.col("_src") == 0) & (F.col("_rn") > 1)
        ).select(*_DV_COLS)
        new_rows = ranked.where(
            (F.col("_src") == 1) & (F.col("_rn") == 1)
        ).select(*cols)
    else:
        tombs = target.join(
            updates.select(*keys).distinct(), keys, "left_semi"
        ).select(*_DV_COLS)
        new_rows = updates.select(*cols)
    tombs = tombs.localCheckpoint(eager=True)
    n_tombs = tombs.count()
    new_rows = new_rows.localCheckpoint(eager=True)
    _, new_files = _write_commit_files(
        new_rows, path, partition_cols, colmap=_colmap(man) or None
    )
    new_dvs: list[str] = []
    new_tgts: list[str] = []
    if n_tombs:
        _, new_dvs = _write_commit_files(
            tombs.repartition(max(1, -(-n_tombs // 4_000_000))), path, None
        )
        new_tgts = [
            r[0] for r in tombs.select("_dv_file").distinct().collect()
        ]
    stats_cols = man.get("stats_cols") or []
    extra: dict = {"dv_added": new_dvs, "dv_rows_added": n_tombs}
    if stats_cols:
        extra["stats"] = {
            **man.get("stats", {}),
            **collect_file_stats(spark, path, new_files, stats_cols),
        }
        extra["stats_cols"] = stats_cols
    return _commit(
        spark,
        path,
        sorted(man["files"] + new_files),
        schema,
        "merge_dv",
        latest,
        extra=extra,
        partition_cols=partition_cols,
        dv_files=sorted((man.get("dv_files") or []) + new_dvs),
        dv_targets=_dv_targets_for(man, new_tgts),
    )


# ---------------------------------------------------------------------------
# File-level column statistics: manifest-side scan planning
# ---------------------------------------------------------------------------


def _stat_norm(v, widen: int = 0):
    """JSON-able, ORDER-PRESERVING image of a stat value. Numbers stay
    numbers; date/timestamp become ISO strings (fixed-width, so
    lexicographic == chronological); Decimal becomes a float interval
    endpoint WIDENED outward (widen=-1 for a min, +1 for a max) so the
    float rounding can never shrink a file's recorded range — pruning
    stays false-negative-free."""
    import datetime
    import decimal
    import math

    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    if isinstance(v, decimal.Decimal):
        f = float(v)
        if widen and math.isfinite(f):
            pad = abs(f) * 1e-12 + 1e-12
            f = f + widen * pad
        return f
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def _stat_sum_norm(v):
    """JSON-able EXACT image of a per-file SUM: ints stay ints (Python
    json encodes arbitrary precision exactly), floats stay floats,
    Decimal becomes its exact STRING — unlike the min/max endpoints
    (which only PRUNE, so outward float widening is safe), sums ANSWER
    queries (``snapshot_agg_where``) and a float image would round."""
    import decimal

    if v is None or isinstance(v, (int, float)):
        return v
    if isinstance(v, decimal.Decimal):
        return str(v)
    return None  # non-summable oddity: treated as unrecorded


def collect_file_stats(
    spark: SparkSession, path: str, files: list[str], stats_cols: list[str]
) -> dict:
    """Per-file min/max + null count for ``stats_cols`` over the given
    commit files — plus, for NUMERIC columns, the per-file SUM:
    {relpath: {col: [min, max, nulls] | [min, max, nulls, sum]}} in
    native (order-preserving) JSON form. One small aggregation grouped
    by ``_metadata.file_path`` — runs once at commit time.

    The NULL COUNT (third element; legacy two-element entries keep
    reading — every consumer indexes [0]/[1] and gates extras on
    length) is what upgrades min/max from range pruning to WHOLE-FILE
    PROOFS: ``min == max == v`` says every non-null row equals ``v``,
    but only ``nulls == 0`` makes that every ROW — the difference
    between "this file may contain matches" and "this file IS the
    match", which lets a delete drop the file by reference instead of
    rewriting it (see ``_full_match_files``).

    The SUM (fourth element, numeric columns only; same length-gated
    compatibility) is what lets ``snapshot_agg_where`` answer
    ``SUM(col) WHERE <pred>`` from metadata for files the predicate
    provably matches whole — recorded exactly (``_stat_sum_norm``),
    never widened."""
    path = _root(path)
    if not files or not stats_cols:
        return {}
    df = spark.read.parquet(*[f"{path}/{f}" for f in files])
    present = [c for c in stats_cols if c in df.columns]
    if not present:
        return {}
    from pyspark.sql.types import NumericType

    numeric = {
        f.name for f in df.schema.fields
        if f.name in set(present) and isinstance(f.dataType, NumericType)
    }
    aggs = []
    for c in present:
        aggs.append(F.min(F.col(c)).alias(f"_mn_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"_mx_{c}"))
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nl_{c}")
        )
        if c in numeric:
            aggs.append(F.sum(F.col(c)).alias(f"_sm_{c}"))
    rows = (
        df.groupBy(F.col("_metadata.file_path").alias("_f"))
        .agg(*aggs)
        .collect()
    )
    import re

    # _metadata.file_path is URI-encoded (space → %20, % → %25); the
    # manifest keys are on-disk form — map back through the encoded
    # form or a mis-keyed file keeps its [None, None] seed below and
    # pruned reads would silently exclude it
    enc2raw = {_uri_encode_relpath(f): f for f in files}
    rel_re = re.compile(r"^.*/(data/[0-9a-f]{32}/.*)$")
    # seed EVERY commit file with null-endpoint stats: an empty file
    # yields no aggregation row, and "recorded, endpoints null" is the
    # provably-excludable state (vs "no entry" = conservatively kept)
    out: dict = {
        f: {
            c: [None, None, 0, None] if c in numeric else [None, None, 0]
            for c in present
        }
        for f in files
    }
    for r in rows:
        m = rel_re.match(r["_f"])
        rel = enc2raw.get(m.group(1)) if m else None
        if rel is None:
            # An unmapped aggregation row means a NON-EMPTY file would
            # keep its [None, None] seed — the provably-excludable
            # state — and pruned reads / stats-guided deletes would
            # silently lose its rows. Encoding drift (a Spark upgrade
            # changing the file_path grammar) must fail HERE, at commit
            # time, not as silent row loss later.
            raise RuntimeError(
                f"file stats row {r['_f']!r} matches no manifest "
                "relpath — _uri_encode_relpath no longer mirrors "
                "Spark's _metadata.file_path encoding"
            )
        out[rel] = {
            c: [
                _stat_norm(r[f"_mn_{c}"], widen=-1),
                _stat_norm(r[f"_mx_{c}"], widen=1),
                int(r[f"_nl_{c}"] or 0),
            ]
            + ([_stat_sum_norm(r[f"_sm_{c}"])] if c in numeric else [])
            for c in present
        }
    return out


def snapshot_write_with_stats(
    df: DataFrame,
    path: str,
    stats_cols: list[str],
    mode: str = "overwrite",
    partition_cols: list[str] | None = None,
) -> int:
    """``snapshot_write`` + per-file min/max stats for ``stats_cols``
    recorded in the manifest (Iceberg-style scan planning metadata):
    ``read_snapshot_pruned`` later selects files by stats overlap
    WITHOUT opening them. Append mode carries the parent's stats
    forward, so incremental loads keep whole-table planning."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append; got {mode!r}")
    spark = df.sparkSession
    versions = _list_manifests(spark, path)
    parent = versions[-1] if versions else None
    cmap, dflts = None, None
    if mode == "append" and parent is not None:
        pman = _load_manifest(spark, path, parent)
        _require_same_layout(pman, partition_cols, "append")
        cmap = _colmap(pman) or None
        dflts = pman.get("defaults")  # captured-tuple rule, see above
    # stats (like the files they describe) are keyed by PHYSICAL names
    stats_cols = [(cmap or {}).get(c, c) for c in stats_cols]
    _, files = _write_commit_files(df, path, partition_cols, colmap=cmap)
    stats = collect_file_stats(spark, path, files, stats_cols)
    if mode == "append" and parent is not None:
        pman = _load_manifest(spark, path, parent)
        files = sorted(pman["files"] + files)
        stats = {**pman.get("stats", {}), **stats}
    return _commit(
        spark,
        path,
        files,
        df.schema,
        mode,
        parent,
        extra={"stats": stats, "stats_cols": stats_cols},
        partition_cols=partition_cols,
        dv_files=_DV_INHERIT if mode == "append" else None,
        colmap=cmap if mode == "append" else None,
        defaults=dflts if mode == "append" else None,
    )


def read_snapshot_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
    partitions: dict | None = None,
) -> DataFrame:
    """Range read ``lo <= col <= hi`` planned against the MANIFEST: only
    files whose recorded [min, max] overlaps the range are opened (a
    file without stats for ``col`` is conservatively kept — never a
    false negative), then the exact residual predicate applies.
    ``partitions`` composes directory pruning with the stats pruning —
    both dimensions resolve driver-side from the manifest before any
    file opens.

    Stats live in an order-preserving JSON image (numbers native, date/
    timestamp as ISO strings, Decimal as outward-widened floats), and
    lo/hi are normalized the same way before comparing — so pruning
    never produces a false negative, and the residual predicate keeps
    exactness regardless."""
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    if version is None:
        version = versions[-1]
    man = _load_manifest(spark, path, version)
    stats = man.get("stats", {})
    candidates = man["files"]
    part_residual = None
    if partitions:
        # conservative keep + row-level residual for files predating a
        # layout evolution (same recipe as read_snapshot)
        candidates, _pr_unenc = _partition_pruned_files(
            man, partitions, "split"
        )
        if _pr_unenc:
            part_residual = _partition_residual_cond(partitions)
    # widen the QUERY interval outward too (Decimal bounds): pruning
    # may only ever keep extra files, never drop a matching one
    slo, shi = _stat_norm(lo, widen=-1), _stat_norm(hi, widen=1)
    pcol = _phys(man, col)  # stats are keyed by on-disk column names
    keep = []
    for f in candidates:
        st = stats.get(f, {}).get(pcol)
        if st is None:
            keep.append(f)  # no stats -> cannot exclude
        elif st[0] is None or st[1] is None:
            # stats recorded, endpoints null: the file holds only null
            # (or zero) values for col — BETWEEN never matches null,
            # so the file is safely excludable
            continue
        elif not (st[1] < slo or st[0] > shi):
            keep.append(f)
    base = read_snapshot(spark, path, version)
    if not keep:
        return spark.createDataFrame([], base.schema)
    if len(keep) == len(man["files"]):
        pruned = base
    else:
        # the same normalised explicit-list scan every snapshot read
        # uses (per-commit basePath or the flat path), deletion vectors
        # applied — stats may keep a file whose matching rows are all
        # tombstoned (over-scan only; the residual predicate plus the
        # DV anti-join keep exactness)
        pruned = _read_file_list(
            spark, path, keep, base.schema,
            partition_cols=_manifest_partition_cols(man),
            dv_files=man.get("dv_files"),
            dv_targets=man.get("dv_targets"),
            eq_entries=man.get("eqs"),
            file_seq=man.get("seq"),
            colmap=_colmap(man) or None,
            defaults=man.get("defaults"),
        )
    out = pruned.where(F.col(col).between(F.lit(lo), F.lit(hi)))
    return out.where(part_residual) if part_residual is not None else out


def snapshot_delete_rows(
    spark: SparkSession,
    path: str,
    col: str,
    values: list,
) -> tuple[int, int]:
    """Targeted row deletion (``col IN values`` — takedowns, GDPR
    erasure, decontamination victims) at FILE granularity: only files
    that may contain a matching row are rewritten; every other file
    carries into the new version by reference. Candidate files come
    from the manifest's min/max stats when present (metadata-only
    planning, no false negatives — see ``read_snapshot_pruned``);
    stats-less files are conservatively rewritten. Returns
    ``(new_version, rows_deleted)``.

    Note the snapshot-layer caveat shared with every manifest-log
    design: the deleted rows still exist in OLDER versions' files until
    ``vacuum_snapshots`` drops those versions — erasure is complete
    only after the vacuum.
    """
    return snapshot_delete_rows_where(spark, path, {col: values})


def snapshot_delete_rows_where(
    spark: SparkSession,
    path: str,
    predicates: dict,
) -> tuple[int, int]:
    """Conjunctive copy-on-write delete: erase rows matching ``col IN
    values AND ...`` across any number of columns ({col: values}) —
    the composite-key takedown (``tenant`` AND ``user_id``). Same
    machinery as the single-column path: per-column stats exclusion
    intersects (excludable by ANY column carries the file),
    whole-file proofs must hold for EVERY column to drop a file by
    reference, and NULL semantics are SQL's (a None value matches
    nothing; NULL-keyed rows always survive — the match expression is
    null-guarded so ``~match`` never silently erases)."""
    preds = _sanitize_predicates(predicates)
    if not preds:
        versions = _list_manifests(spark, path)
        if not versions:
            raise FileNotFoundError(f"no snapshot versions at {path}")
        return versions[-1], 0

    def fn(df):
        return df.where(~_match_expr(preds))

    return _rewrite_matching_files(
        spark, path, preds, fn, "delete_rows", full_drop=True
    )


def snapshot_delete_rows_dv(
    spark: SparkSession,
    path: str,
    col: str,
    values: list,
) -> tuple[int, int]:
    """``snapshot_delete_rows`` semantics via DELETION VECTORS
    (merge-on-read): instead of rewriting every stats-selected
    candidate file whole — at 100 TB a one-key takedown on a
    non-clustered column rewrites a large share of the table — the
    commit writes only the matched rows' (file, row position)
    tombstones as a parquet sidecar and carries EVERY data file by
    reference. Readers anti-join the tombstones at scan time (see
    ``_read_file_list``); ``snapshot_compact`` folds them back into
    physical files. Write cost ∝ deleted rows, never victim-file
    bytes. Returns ``(new_version, rows_deleted)``.

    Same NULL semantics as the rewrite path (NULL never matches IN),
    same erasure caveat (older versions still hold the rows until
    vacuumed — and the tombstoned rows' BYTES remain in the current
    version's files until a compact; for physical erasure of the live
    version, compact after deleting).

    Files whose stats PROVE every row matches (``_full_match_files``:
    min == max == a deleted value, zero nulls) are DROPPED from the
    manifest instead of tombstoned — writing one (file, pos) entry per
    row of a wholly-dead file is pure waste on both sides (sidecar
    bytes ∝ its rows now, anti-join work at every read later). A
    clustered-key takedown then writes NO tombstones at all; only
    boundary files where matches mix with survivors get entries.
    """
    return _delete_rows_dv_where(spark, path, {col: values})


def _delete_rows_dv_where(
    spark: SparkSession,
    path: str,
    predicates: dict,
) -> tuple[int, int]:
    """Conjunctive merge-on-read delete — the engine behind
    ``snapshot_delete_rows_dv`` (single column) and
    ``snapshot_delete_where(mode="dv")`` (composite key). Same
    structure: per-column stats intersection plans the victims,
    per-column whole-file proofs drop wholly-dead files by reference,
    and only boundary rows get (file, pos) tombstones."""
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    latest = versions[-1]
    man = _load_manifest(spark, path, latest)
    latest, man = _eq_resolved_head(spark, path, latest, man)
    predicates = _sanitize_predicates(predicates)
    if not predicates:
        return latest, 0
    victims, _carried = _victims_by_stats_where(man, predicates)
    if not victims:
        return latest, 0
    schema = StructType.fromJson(man["schema"])
    fullset = set(_full_match_files_where(man, predicates))
    dropped = sorted(f for f in victims if f in fullset)
    victims = [f for f in victims if f not in fullset]
    drop_rows = 0
    if dropped:
        drop_rows = _physical_row_total(
            spark, _root(path), man, dropped
        ) - _dv_entry_count(
            spark, _root(path), man.get("dv_files"), dropped
        )
    dset = set(dropped)
    files_after = [f for f in man["files"] if f not in dset]
    stats_extra = (
        {
            "stats": {
                f: s for f, s in man["stats"].items() if f not in dset
            },
            "stats_cols": man.get("stats_cols"),
        }
        if man.get("stats") is not None
        else {}
    )
    drop_extra = (
        {"files_dropped_by_stats": len(dropped), "rows_dropped": drop_rows}
        if dropped
        else {}
    )
    n = 0
    new_dvs: list[str] = []
    new_tgts: list[str] = []
    if victims:
        df = _read_file_list(
            spark, path, victims, schema,
            partition_cols=_manifest_partition_cols(man),
            dv_files=man.get("dv_files"),  # never tombstone a row twice
            row_ids=True,
            dv_targets=man.get("dv_targets"),
            colmap=_colmap(man) or None,
            defaults=man.get("defaults"),
        )
        matched = (
            df.where(_match_expr(predicates))
            .select("_dv_file", "_dv_pos")
            .localCheckpoint(eager=True)  # one scan feeds count AND write
        )
        n = matched.count()
        if n:
            # ~4M tombstones (~a few hundred MB raw) per sidecar file
            _, new_dvs = _write_commit_files(
                matched.repartition(
                    max(1, n // 4_000_000 + (n % 4_000_000 > 0))
                ),
                path,
                None,
            )
            # metadata-sized (∝ targeted files): recorded in the
            # manifest so readers split clean files past the anti-join
            # and the feed planner never opens a sidecar
            new_tgts = [
                r[0]
                for r in matched.select("_dv_file").distinct().collect()
            ]
    if n == 0 and not dropped:
        return latest, 0
    dv_files: object = sorted((man.get("dv_files") or []) + new_dvs)
    dv_targets = _dv_targets_for(man, new_tgts)
    if isinstance(dv_targets, list) and dset:
        # recorded targets shrink with the dropped files (their
        # entries go inert); an all-inert carried set with no new
        # sidecars folds away entirely, restoring clean scans
        dv_targets = sorted(
            (set(dv_targets) - dset) | set(new_tgts)
        )
        if not dv_targets and not new_dvs:
            dv_files, dv_targets = None, None
    version = _commit(
        spark,
        path,
        files_after,
        schema,
        "delete_rows_dv",
        latest,
        extra={
            "dv_added": new_dvs,
            "dv_rows_added": n,
            **drop_extra,
            **stats_extra,
        },
        partition_cols=_manifest_partition_cols(man),
        dv_files=dv_files,
        dv_targets=dv_targets,
    )
    return version, n + drop_rows


def _victims_by_stats(
    man: dict, col: str, values: list
) -> tuple[list[str], list[str]]:
    """Split the manifest's files into (victims, carried) for a
    ``col IN values`` predicate using the per-file min/max stats —
    metadata-only planning with no false negatives (stats-less files
    are conservatively victims)."""
    stats = man.get("stats", {})
    col = _phys(man, col)  # stats are keyed by on-disk column names
    # NULL never matches an IN list: None values select nothing, and
    # left in they would TypeError against the stats endpoints
    values = [v for v in values if v is not None]
    if not values:
        return [], list(man["files"])
    norm = sorted(_stat_norm(v, widen=0) for v in values)
    lo, hi = norm[0], norm[-1]
    victims, carried = [], []
    for f in man["files"]:
        st = stats.get(f, {}).get(col)
        if st is None:
            victims.append(f)  # no stats -> conservatively rewrite
        elif st[0] is None or st[1] is None:
            carried.append(f)  # only-null col values: IN never matches
        elif st[1] < lo or st[0] > hi:
            carried.append(f)
        elif any(st[0] <= v <= st[1] for v in norm):
            victims.append(f)
        else:
            carried.append(f)
    return victims, carried


def _full_match_files(man: dict, col: str, values: list) -> list[str]:
    """Files where EVERY row provably matches ``col IN values`` from
    stats alone: ``min == max == some value`` (every non-null row is
    that value) AND a recorded null count of 0 (so "every non-null
    row" means every row — ``NULL IN (...)`` never matches, and a
    min/max pair says nothing about nulls). Legacy two-element stats
    entries never qualify (no null count — conservative). Decimal
    columns never qualify either: their endpoints are stored WIDENED
    (``_stat_norm``), so recorded min can never equal recorded max —
    again conservative, never wrong."""
    stats = man.get("stats") or {}
    col = _phys(man, col)  # stats are keyed by on-disk column names
    norm = {_stat_norm(v, widen=0) for v in values if v is not None}
    out = []
    for f in man["files"]:
        st = stats.get(f, {}).get(col)
        if (
            st is not None
            and len(st) >= 3
            and st[2] == 0
            and st[0] is not None
            and st[0] == st[1]
            and st[0] in norm
        ):
            out.append(f)
    return out


class Range:
    """Interval predicate for the conjunctive DML planner — the value
    side of a ``{col: Range(...)}`` entry anywhere ``{col: values}``
    predicates are accepted (``snapshot_delete_where``,
    ``snapshot_update_where``, their dv/rewrite engines, and the SQL
    front door's ``<  <=  >  >=  BETWEEN`` grammar). ``lo``/``hi``
    bound the column from below/above (``None`` = unbounded on that
    side; at least one must be set); ``lo_inc``/``hi_inc`` pick
    inclusive vs strict. NULL semantics are SQL's: a range never
    matches a NULL value.

    This is the TTL/retention/GDPR sweep shape (``DELETE FROM t WHERE
    ts < '2024-01-01'``) — the single most common DML a 100 TB table
    sees. The planner prunes victims from the same per-file min/max
    stats the range READ path (``read_snapshot_pruned``) consumes, and
    proves whole-file drops (file range wholly inside the predicate,
    zero nulls ⇒ drop by reference — no read, no rewrite, no
    tombstones), so a retention delete on a time-clustered table moves
    only the boundary files' bytes. Partition-column ranges prune and
    prove from directory values, typed by the column's declared type.

    Endpoints: int / float / str / Decimal / date / datetime (bool and
    NaN refuse — NaN comparisons are all-False and would plan a
    rewrite that matches nothing)."""

    __slots__ = ("lo", "hi", "lo_inc", "hi_inc")

    def __init__(self, lo=None, hi=None, lo_inc=True, hi_inc=True):
        import datetime
        import decimal
        import math

        if lo is None and hi is None:
            raise ValueError(
                "Range needs at least one endpoint (lo=None, hi=None "
                "would mean 'IS NOT NULL' — state that intent directly)"
            )
        ok_types = (
            int, float, str, decimal.Decimal,
            datetime.date, datetime.datetime,
        )
        for name, v in (("lo", lo), ("hi", hi)):
            if v is None:
                continue
            if isinstance(v, bool) or not isinstance(v, ok_types):
                raise ValueError(
                    f"Range {name} must be int/float/str/Decimal/date/"
                    f"datetime; got {type(v).__name__}"
                )
            if isinstance(v, float) and math.isnan(v):
                raise ValueError(f"Range {name} must not be NaN")
        self.lo, self.hi = lo, hi
        self.lo_inc, self.hi_inc = bool(lo_inc), bool(hi_inc)

    def _key(self):
        return (self.lo, self.hi, self.lo_inc, self.hi_inc)

    def __eq__(self, other):
        return isinstance(other, Range) and self._key() == other._key()

    def __hash__(self):
        return hash(self._key())

    def __repr__(self):
        l, r = "[" if self.lo_inc else "(", "]" if self.hi_inc else ")"
        return f"Range{l}{self.lo!r}, {self.hi!r}{r}"

    def is_empty(self) -> bool:
        """Provably matches nothing (lo > hi, or lo == hi with a
        strict end) — callers short-circuit to a no-op, like an
        emptied IN list. Incomparable endpoint types are NOT empty
        (the row-level predicate decides).

        Emptiness is type-blind here (the column's declared type is
        not in scope), so timestamp-shaped string endpoints are only
        declared empty when the RAW string order AND the canonical
        timestamp order AGREE — against a STRING column Spark compares
        raw ('2024-01-01 12:00' < '2024-01-01T05:00' because space <
        'T'), against a TIMESTAMP column chronologically; an ambiguous
        pair must fall through to the type-aware planner, never
        silently no-op a delete that matches rows."""
        if self.lo is None or self.hi is None:
            return False

        def empty(lo, hi) -> bool:
            if lo > hi:
                return True
            return lo == hi and not (self.lo_inc and self.hi_inc)

        try:
            lo, hi = _stat_norm(self.lo), _stat_norm(self.hi)
            raw = empty(lo, hi)
            clo = _ts_canon(lo) if isinstance(lo, str) else None
            chi = _ts_canon(hi) if isinstance(hi, str) else None
            if clo is not None or chi is not None:
                return raw and empty(
                    clo if clo is not None else lo,
                    chi if chi is not None else hi,
                )
            return raw
        except TypeError:
            return False


class _NullTest:
    """``IS NULL`` / ``IS NOT NULL`` predicate value — the third value
    shape a ``{col: ...}`` predicate entry accepts, next to value
    lists and ``Range``. Use the module singletons ``IS_NULL`` and
    ``IS_NOT_NULL``.

    The planner answers both from the null counts the stats already
    record (``collect_file_stats``: ``{col: [min, max, nulls]}``) plus
    the manifest's per-file row counts:

    - ``IS NULL`` victims: a file with a recorded ``nulls == 0`` for
      the column provably contains no match and carries by reference;
      whole-file proof when ``nulls == rows`` (every row null).
    - ``IS NOT NULL`` victims: excluded only when ``nulls == rows``
      (all-null file); whole-file proof when ``nulls == 0``.
    - Files without a recorded null count (legacy two-element stats,
      un-statted columns, files that may not physically encode the
      column — initial-default fills) stay victims and prove nothing:
      conservative, never a false negative. Partition columns have no
      in-file stats, so null tests on them scan their victims with
      the exact residual (a null partition value's directory encoding
      is writer-specific — guessing it could silently miss rows).

    The GDPR/completeness sweep shape: ``DELETE FROM t WHERE email IS
    NULL`` on a mostly-complete 100 TB table rewrites only the files
    that actually recorded nulls."""

    __slots__ = ("negate",)

    def __init__(self, negate: bool):
        self.negate = bool(negate)

    def __repr__(self):
        return "IS_NOT_NULL" if self.negate else "IS_NULL"

    def __eq__(self, other):
        return isinstance(other, _NullTest) and self.negate == other.negate

    def __hash__(self):
        return hash(("_NullTest", self.negate))


IS_NULL = _NullTest(False)
IS_NOT_NULL = _NullTest(True)


def _null_victims(man: dict, col: str, test: _NullTest) -> list[str]:
    """Files that MAY contain a row matching the null test — the
    no-false-negatives victim filter (see ``_NullTest``)."""
    stats = man.get("stats") or {}
    rows = man.get("rows") or {}
    pcol = _phys(man, col)
    out = []
    for f in man["files"]:
        ent = stats.get(f, {}).get(pcol)
        nulls = ent[2] if ent is not None and len(ent) >= 3 else None
        if nulls is None:
            out.append(f)  # unknown: keep
        elif test.negate:
            # IS NOT NULL: excludable only when provably all-null
            if not (f in rows and nulls == rows[f]):
                out.append(f)
        elif nulls > 0:
            out.append(f)
    return out


def _null_full_files(man: dict, col: str, test: _NullTest) -> list[str]:
    """Files where EVERY row provably matches the null test — sound
    whole-file proofs only (never a false drop): requires a recorded
    null count, and for IS NULL also the recorded row count."""
    stats = man.get("stats") or {}
    rows = man.get("rows") or {}
    pcol = _phys(man, col)
    out = []
    for f in man["files"]:
        ent = stats.get(f, {}).get(pcol)
        nulls = ent[2] if ent is not None and len(ent) >= 3 else None
        if nulls is None:
            continue
        if test.negate:
            if nulls == 0:
                out.append(f)
        elif f in rows and nulls == rows[f]:
            out.append(f)
    return out


# timestamp-shaped string: date, optional [T or space] time, optional
# fractional seconds — the forms both SQL users and isoformat produce
_TS_SHAPE_RE = re.compile(
    r"^(\d{4}-\d{2}-\d{2})(?:[T ](\d{2}:\d{2}:\d{2})(\.\d{1,9})?)?$"
)
# Spark's string→date cast shape: yyyy-[m]m-[d]d then end or a T/space
# separator (anything else nulls the cast — see _range_bounds_for_col)
_DATE_CAST_RE = re.compile(r"^(\d{4})-(\d{1,2})-(\d{1,2})(?:$|[T ])")


def _ts_canon(s: str) -> str | None:
    """Canonical, order-preserving form of a timestamp-shaped string:
    ``YYYY-MM-DDTHH:MM:SS.ffffff`` (T separator, fraction padded to
    exactly 6 digits). Lexicographic order on canonical forms ==
    chronological order — which is NOT true across the mixed forms
    users and ``isoformat`` produce ('2024-01-01 12:00' sorts before
    '2024-01-01T05:00' because space < 'T'; '.1' sorts before
    '.050000'). Returns None for non-timestamp-shaped or
    calendar-invalid strings — callers then refuse to prune on the
    bound (conservative, never wrong)."""
    import datetime

    m = _TS_SHAPE_RE.match(s)
    if m is None:
        return None
    d, t, f = m.groups()
    t = t or "00:00:00"
    frac = ((f or ".")[1:] + "000000")[:6]
    try:  # calendar validity: an invalid literal casts to NULL in
        # Spark (matches nothing) — a lexicographic 'proof' against it
        # would drop files whose rows don't match
        datetime.datetime.fromisoformat(f"{d}T{t}")
    except ValueError:
        return None
    return f"{d}T{t}.{frac}"


def _col_dtype(man: dict, col: str) -> str | None:
    """The column's declared simpleString type from the manifest
    schema — None when absent (planner then refuses to prune)."""
    try:
        sch = StructType.fromJson(man["schema"])
        return sch[col].dataType.simpleString()
    except Exception:
        return None


_NUM_DTYPES = ("tinyint", "smallint", "int", "bigint", "float", "double")


def _range_bounds_for_col(man: dict, col: str, rng: Range, for_proof: bool):
    """Normalize a Range's endpoints against the COLUMN'S DECLARED
    TYPE so stat/directory comparisons reproduce exactly the coercion
    Spark applies to the row-level predicate — or return None when the
    bound/type combination cannot be compared without guessing
    (planner then keeps every file a victim and proves nothing).

    Returns ``(lo, hi, statcanon, dircanon)``: comparison-ready
    endpoints (None = unbounded), a canonicalizer for recorded stat
    values, and a parser for partition-directory strings (either may
    return None = not comparable for that value).

    Exactness notes, per kind:
    - numeric: Decimal endpoints widen OUTWARD for victim planning and
      INWARD for proofs (mirroring ``_stat_norm``'s widened stat
      endpoints), so float rounding can never exclude a matching file
      or prove a non-matching one;
    - date: Spark casts a string literal to DATE by truncating AT A
      'T'/SPACE SEPARATOR ONLY — any other trailing character nulls
      the whole cast (probed: '2024-01-153', '2024-01-15x'), so the
      bound parses against ``_DATE_CAST_RE`` and refuses anything
      Spark would refuse. A datetime endpoint also refuses (Spark
      coerces the DATE COLUMN up to timestamp there — truncating the
      bound would flip boundary semantics);
    - timestamp: everything canonicalizes through ``_ts_canon``
      (date endpoints = midnight); tz-aware datetimes refuse;
    - string: str endpoints compare verbatim (UTF-8 byte order ==
      code-point order, matching Spark); non-str endpoints refuse
      (Spark would cast the COLUMN, not the literal)."""
    import datetime
    import decimal

    dtype = _col_dtype(man, col)
    if dtype is None:
        return None
    ident = lambda v: v  # noqa: E731

    def _norm2(kindcheck, conv):
        out = []
        for v, widen in ((rng.lo, 1 if for_proof else -1),
                         (rng.hi, -1 if for_proof else 1)):
            if v is None:
                out.append(None)
            else:
                c = conv(v, widen) if kindcheck(v) else None
                if c is None:
                    return None
                out.append(c)
        return out

    if dtype in _NUM_DTYPES or dtype.startswith("decimal"):
        def is_num(v):
            return isinstance(v, (int, float, decimal.Decimal)) and not (
                isinstance(v, bool)
            )

        b = _norm2(is_num, lambda v, w: _stat_norm(v, widen=w))
        if b is None:
            return None

        def dirparse(s):
            try:
                return int(s)
            except ValueError:
                try:
                    return float(s)
                except ValueError:
                    return None

        return b[0], b[1], ident, dirparse
    if dtype == "string" or dtype.startswith(("varchar", "char")):
        b = _norm2(lambda v: isinstance(v, str), lambda v, w: v)
        if b is None:
            return None
        return b[0], b[1], ident, ident
    if dtype == "date":
        def dconv(v, _w):
            if isinstance(v, datetime.datetime):
                return None  # Spark coerces the COLUMN to timestamp
            if isinstance(v, datetime.date):
                return v.isoformat()
            if isinstance(v, str):
                # reproduce Spark's string→date cast EXACTLY or refuse:
                # Spark accepts yyyy-[m]m-[d]d, truncating only at a
                # 'T'/space separator — ANY other trailing character
                # (probed: '2024-01-153', '2024-01-15x') nulls the whole
                # cast, matching NOTHING. A naive [:10] slice would
                # accept those and let the whole-file proof drop files
                # whose rows don't match. Shorthand forms ('2024',
                # '2024-01') refuse → conservative, no pruning.
                m = _DATE_CAST_RE.match(v.strip())
                if m is None:
                    return None
                try:
                    return datetime.date(
                        int(m[1]), int(m[2]), int(m[3])
                    ).isoformat()
                except ValueError:
                    return None
            return None

        b = _norm2(lambda v: True, dconv)
        if b is None:
            return None
        return b[0], b[1], ident, lambda s: dconv(s, 0)
    if dtype in ("timestamp", "timestamp_ntz"):
        def tconv(v, _w):
            if isinstance(v, datetime.datetime):
                if v.tzinfo is not None:
                    return None
                return _ts_canon(v.isoformat())
            if isinstance(v, datetime.date):
                return f"{v.isoformat()}T00:00:00.000000"
            if isinstance(v, str):
                return _ts_canon(v)
            return None

        b = _norm2(lambda v: True, tconv)
        if b is None:
            return None

        def tcanon(v):
            return _ts_canon(v) if isinstance(v, str) else None

        return b[0], b[1], tcanon, tcanon
    return None  # boolean / complex types: no range pruning


def _in_range(v, lo, hi, rng: Range) -> bool:
    return (lo is None or v > lo or (v == lo and rng.lo_inc)) and (
        hi is None or v < hi or (v == hi and rng.hi_inc)
    )


def _range_victims(man: dict, col: str, rng: Range) -> list[str]:
    """Files that MAY hold a row matching the range, from the per-file
    min/max stats: recorded [min, max] intersects the interval.
    Stats-less files and incomparable values are conservatively
    victims; all-null files never match (ranges, like IN, never match
    NULL) — the same no-false-negatives contract as
    ``_victims_by_stats``."""
    b = _range_bounds_for_col(man, col, rng, for_proof=False)
    if b is None:
        return list(man["files"])
    lo, hi, canon, _dp = b
    stats = man.get("stats", {})
    pcol = _phys(man, col)
    victims = []
    for f in man["files"]:
        st = stats.get(f, {}).get(pcol)
        if st is None:
            victims.append(f)
            continue
        if st[0] is None or st[1] is None:
            continue  # only-null column values: never matches
        try:
            mn, mx = canon(st[0]), canon(st[1])
            if mn is None or mx is None:
                victims.append(f)
                continue
            if hi is not None and (mn > hi or (mn == hi and not rng.hi_inc)):
                continue
            if lo is not None and (mx < lo or (mx == lo and not rng.lo_inc)):
                continue
        except TypeError:  # stat/bound types incomparable → keep
            pass
        victims.append(f)
    return victims


def _range_full_files(man: dict, col: str, rng: Range) -> list[str]:
    """Files where EVERY row provably matches the range from stats
    alone: recorded [min, max] wholly inside the interval AND a
    recorded null count of 0. Unlike the IN proof this does not need
    min == max — the whole-file drop fires on every file strictly
    inside a retention cutoff, which on a time-clustered table is the
    BULK of the victim bytes. Decimal stats are stored outward-widened
    and the proof bounds widen inward, so the proof can only
    under-fire, never over-fire."""
    b = _range_bounds_for_col(man, col, rng, for_proof=True)
    if b is None:
        return []
    lo, hi, canon, _dp = b
    stats = man.get("stats") or {}
    pcol = _phys(man, col)
    out = []
    for f in man["files"]:
        st = stats.get(f, {}).get(pcol)
        if (
            st is None
            or len(st) < 3
            or st[2] != 0
            or st[0] is None
            or st[1] is None
        ):
            continue
        try:
            mn, mx = canon(st[0]), canon(st[1])
            if mn is None or mx is None:
                continue
            if lo is not None and (mn < lo or (mn == lo and not rng.lo_inc)):
                continue
            if hi is not None and (mx > hi or (mx == hi and not rng.hi_inc)):
                continue
        except TypeError:
            continue
        out.append(f)
    return out


def _range_dir_files(man: dict, col: str, rng: Range, mode: str) -> list[str]:
    """Partition-directory answer for a Range on a partition column.
    ``mode="include"``: victim candidates — the directory value
    satisfies the range, or cannot be typed-compared, or the file
    does not encode the column (post-evolution data rows may match).
    ``mode="exclude"``: whole-file proof — the value PROVABLY
    satisfies (parseable, comparable, in range; every row of a
    ``month=5/`` file has month 5 non-null, so the directory is the
    proof). Values parse by the column's DECLARED type (int dirs
    compare numerically — '10' > '9'); the Hive null partition never
    matches a range."""
    from ..streaming.snapshot_source import _partition_values_from_path

    b = _range_bounds_for_col(man, col, rng, for_proof=(mode == "exclude"))
    pcol = _phys(man, col)
    out = []
    for f in man["files"]:
        vals = _partition_values_from_path(f)
        if pcol not in vals:
            if mode == "include":
                out.append(f)
            continue
        v = vals[pcol]
        if v is None:  # Hive null partition: ranges never match NULL
            continue
        ok = None
        if b is not None:
            lo, hi, _sc, dirparse = b
            try:
                cv = dirparse(v)
                if cv is not None:
                    ok = _in_range(cv, lo, hi, rng)
            except (TypeError, ValueError):
                ok = None
        if ok is None:
            if mode == "include":
                out.append(f)
        elif ok:
            out.append(f)
    return out


def _sanitize_predicates(predicates) -> dict | list:
    """{col: values} with scalars normalized to one-element lists and
    None values stripped per column (NULL never matches an IN list,
    and a null inside the list poisons ``~isin`` to NULL). Scalar
    normalization matters for STRINGS especially: naively iterating
    ``{"tenant": "acme"}`` would explode into the characters
    ``["a","c","m","e"]`` — a silently WRONG delete. A column whose
    list empties means the conjunction can match NOTHING — callers
    short-circuit to a no-op on {}. A ``Range`` value passes through
    (a provably-empty range — lo > hi — short-circuits the same
    way).

    DISJUNCTIONS: a list/tuple of {col: values} dicts is a DNF
    predicate — OR over the branches, AND within each (``DELETE ...
    WHERE (a = 1 AND b = 2) OR c > 9``). Each branch sanitizes by the
    conjunctive rules above; a provably-empty branch drops from the
    disjunction (x OR false ≡ x); all branches empty → [] (callers
    no-op, same as {}); exactly one branch left → that plain dict, so
    single-branch DNF takes every conjunctive fast path (partition
    drops included)."""
    if isinstance(predicates, (list, tuple)):
        if not predicates:
            raise ValueError(
                "DNF predicates must contain at least one branch"
            )
        branches = []
        for b in predicates:
            if not isinstance(b, dict):
                raise ValueError(
                    "DNF predicates must be a list of {col: values} "
                    f"dicts; got a {type(b).__name__} branch"
                )
            sb = _sanitize_predicates(b)
            if sb:
                branches.append(sb)
        if len(branches) == 1:
            return branches[0]
        return branches
    if not predicates:
        raise ValueError("predicates must name at least one column")
    out = {}
    for c, vals in predicates.items():
        if isinstance(vals, _NullTest):
            out[c] = vals
            continue
        if isinstance(vals, Range):
            if vals.is_empty():
                return {}
            out[c] = vals
            continue
        if not isinstance(vals, (list, tuple, set, frozenset)):
            vals = [vals]
        vals = [v for v in vals if v is not None]
        if not vals:
            return {}
        out[c] = list(vals)
    return out


def _canonical_partition_values(man: dict, col: str, vals: list) -> bool:
    """Whether ``col IN vals`` can be answered EXACTLY from partition
    directories: ``col`` is a partition column and every value has one
    canonical directory-string form (int/str/bool — a float like 5.0
    renders '5.0' against an int column's 'month=5' dir and would
    falsely exclude files Spark-typed equality matches)."""
    return _phys(man, col) in set(
        _manifest_partition_cols(man) or ()
    ) and all(type(v) in (int, str, bool) for v in vals)


def _victims_by_stats_where(
    man: dict, predicates: dict
) -> tuple[list[str], list[str]]:
    """Conjunctive (victims, carried): a file may match ``col IN vals
    AND ...`` only if EVERY predicate admits it — excludable by any
    one column carries the file. Partition-column predicates exclude
    from the DIRECTORY values (exact and free — without this, a mixed
    ``tenant AND user_id`` delete on an unstatted partition column
    would rewrite byte-identical files in every other tenant whose
    user_id range happens to admit the key); the rest use the
    single-column stats planner, keeping its no-false-negatives
    contract per column.

    DNF (list of branch dicts): a file may match ``branch1 OR
    branch2`` iff SOME branch admits it — the victim set is the UNION
    of the per-branch conjunctive victim sets (each branch keeps its
    own no-false-negatives contract, so the union keeps it for the
    disjunction). Manifest file order is preserved; a file admitted
    by several branches appears once."""
    if isinstance(predicates, (list, tuple)):
        admitted: set = set()
        for branch in predicates:
            v, _ = _victims_by_stats_where(man, branch)
            admitted |= set(v)
        return (
            [f for f in man["files"] if f in admitted],
            [f for f in man["files"] if f not in admitted],
        )
    alive = set(man["files"])
    for col, vals in predicates.items():
        if isinstance(vals, _NullTest):
            alive &= set(_null_victims(man, col, vals))
        elif isinstance(vals, Range):
            if _phys(man, col) in set(_manifest_partition_cols(man) or ()):
                # directory values answer ranges typed-exactly; files
                # not encoding the column stay candidates ("include")
                alive &= set(_range_dir_files(man, col, vals, "include"))
            else:
                alive &= set(_range_victims(man, col, vals))
        elif _canonical_partition_values(man, col, vals):
            # "include": a file predating a layout evolution may match
            # as data — it must STAY a victim candidate (the planner's
            # no-false-negatives contract)
            alive &= set(
                _partition_pruned_files(man, {col: vals}, "include")
            )
        else:
            v, _ = _victims_by_stats(man, col, vals)
            alive &= set(v)
    victims = [f for f in man["files"] if f in alive]
    carried = [f for f in man["files"] if f not in alive]
    return victims, carried


def _full_match_files_where(man: dict, predicates: dict) -> list[str]:
    """Files where EVERY row provably matches the whole conjunction:
    the per-column whole-file proof must hold for EVERY predicate
    column. For a partition column the directory IS the proof (every
    row in ``month=5/`` has month 5, non-null); data columns need the
    stats proof (min == max == a value, zero nulls).

    DNF (list of branch dicts): a file fully matches the DISJUNCTION
    when every row provably matches SOME single branch whole — the
    UNION of the per-branch proofs. (A file whose rows split across
    branches with none covering it alone is NOT proven — sound but
    not complete; it stays a boundary file and scans. Never a false
    whole-file drop.)"""
    if isinstance(predicates, (list, tuple)):
        u: set = set()
        for branch in predicates:
            u |= set(_full_match_files_where(man, branch))
        return sorted(u)
    full: set | None = None
    for col, vals in predicates.items():
        if isinstance(vals, _NullTest):
            s = set(_null_full_files(man, col, vals))
        elif isinstance(vals, Range):
            if _phys(man, col) in set(_manifest_partition_cols(man) or ()):
                s = set(_range_dir_files(man, col, vals, "exclude"))
            else:
                s = set(_range_full_files(man, col, vals))
        elif _canonical_partition_values(man, col, vals):
            # "exclude": the directory IS the proof — a file not
            # encoding the column proves nothing and must not be
            # whole-file-dropped
            s = set(_partition_pruned_files(man, {col: vals}, "exclude"))
        else:
            s = set(_full_match_files(man, col, vals))
        full = s if full is None else (full & s)
        if not full:
            return []
    return sorted(full or ())


def _match_expr(predicates: dict):
    """The conjunctive row-match Column: AND over columns of
    (isNotNull AND isin) — never NULL (each conjunct's isNotNull guard
    collapses SQL three-valued logic to plain booleans), so both
    ``where(match)`` and ``where(~match)`` partition rows exactly.
    ``Range`` values compile to null-guarded bound comparisons with
    Spark's own literal coercion — the planner's stat/directory
    pruning is calibrated to reproduce exactly these semantics.

    DNF (list of branch dicts): OR over the branch expressions. Each
    branch is never-NULL (per the guard above), so the disjunction is
    never NULL either and ``where(~match)`` still partitions rows
    exactly — the property every delete path's survivor scan relies
    on."""
    if isinstance(predicates, (list, tuple)):
        expr = None
        for branch in predicates:
            term = _match_expr(branch)
            expr = term if expr is None else (expr | term)
        return expr
    expr = None
    for c, vals in predicates.items():
        if isinstance(vals, _NullTest):
            term = (
                F.col(c).isNotNull() if vals.negate else F.col(c).isNull()
            )
        elif isinstance(vals, Range):
            term = F.col(c).isNotNull()
            if vals.lo is not None:
                lit = F.lit(vals.lo)
                term = term & (
                    F.col(c) >= lit if vals.lo_inc else F.col(c) > lit
                )
            if vals.hi is not None:
                lit = F.lit(vals.hi)
                term = term & (
                    F.col(c) <= lit if vals.hi_inc else F.col(c) < lit
                )
        else:
            term = F.col(c).isNotNull() & F.col(c).isin(vals)
        expr = term if expr is None else (expr & term)
    return expr


def _rewrite_matching_files(
    spark: SparkSession,
    path: str,
    predicates: dict,
    fn,
    op: str,
    full_drop: bool = False,
) -> tuple[int, int]:
    """Shared DML rewrite: apply ``fn`` to the rows of every file that
    may match the conjunctive ``predicates`` ({col: values}); carry
    every other file by reference; publish as one commit. Returns
    ``(new_version, rows_affected)`` where rows_affected = victim rows
    before - surviving rows after for a delete, and matching rows for
    an update (fn reports via the returned frame's ``_matched`` column
    when present).

    ``full_drop=True`` (delete semantics only): victim files whose
    stats PROVE every row matches (``_full_match_files``) are dropped
    from the manifest by reference — never read, never rewritten. A
    delete keyed on a well-clustered column (the common retire-a-key
    case after a cluster_by compact) then rewrites only the boundary
    files where matches mix with survivors; the bulk of the victim
    bytes move nowhere. Their deleted-row count comes from recorded
    footer counts minus live tombstones — exact, metadata-only."""
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    latest = versions[-1]
    man = _load_manifest(spark, path, latest)
    latest, man = _eq_resolved_head(spark, path, latest, man)
    predicates = _sanitize_predicates(predicates)
    if not predicates:  # some column's values were all None: no match
        return latest, 0
    victims, carried = _victims_by_stats_where(man, predicates)
    schema = StructType.fromJson(man["schema"])
    dropped: list[str] = []
    drop_rows = 0
    if full_drop and victims:
        fullset = set(_full_match_files_where(man, predicates))
        if fullset:
            dropped = sorted(f for f in victims if f in fullset)
            victims = [f for f in victims if f not in fullset]
            drop_rows = _physical_row_total(
                spark, _root(path), man, dropped
            ) - _dv_entry_count(
                spark, _root(path), man.get("dv_files"), dropped
            )
    if not victims and not dropped:
        return latest, 0
    if victims:
        df = _read_file_list(
            spark, path, victims, schema,
            partition_cols=_manifest_partition_cols(man),
            # merge-on-read: already-tombstoned rows must not resurrect
            # into the rewritten files (the carried DV entries for the
            # rewritten victims become inert once their files drop out)
            dv_files=man.get("dv_files"),
            dv_targets=man.get("dv_targets"),
            colmap=_colmap(man) or None,
            defaults=man.get("defaults"),
        )
        before = df.count()
        rewritten = fn(df)
        if "_matched" in rewritten.columns:
            rewritten = rewritten.localCheckpoint(eager=True)
            affected = rewritten.where("_matched").count()
            rewritten = rewritten.drop("_matched")
        else:
            rewritten = rewritten.localCheckpoint(eager=True)
            affected = before - rewritten.count()
        # rewrite in the TABLE'S layout: an unpartitioned rewrite would
        # leave files without partition directories, which
        # replace_partitions/merge would then always carry — stale rows
        pc = _manifest_partition_cols(man)
        _, new_files = _write_commit_files(
            rewritten, path, pc, colmap=_colmap(man) or None
        )
    else:  # every victim full-dropped: a pure manifest edit
        pc = _manifest_partition_cols(man)
        new_files, affected = [], 0
    # rewritten files' stats are recomputed when columns are tracked
    stats_cols = man.get("stats_cols") or []
    new_stats = {
        f: s for f, s in man.get("stats", {}).items() if f in set(carried)
    }
    if stats_cols and new_files:
        new_stats.update(
            collect_file_stats(spark, path, new_files, stats_cols)
        )
    extra: dict = (
        {"stats": new_stats, "stats_cols": stats_cols}
        if new_stats or stats_cols
        else {}
    )
    if dropped:
        extra["files_dropped_by_stats"] = len(dropped)
    version = _commit(
        spark,
        path,
        sorted(carried + new_files),
        schema,
        op,
        latest,
        extra=extra or None,
        partition_cols=pc,
    )
    return version, affected + drop_rows


def snapshot_update_rows(
    spark: SparkSession,
    path: str,
    col: str,
    values: list,
    set_values: dict,
) -> tuple[int, int]:
    """Targeted column update on matching rows (``col IN values``) —
    the redaction half of the DML triad (merge = upsert, delete_rows =
    erasure, update_rows = "null out / mask the PII columns but keep
    the row"). File granularity like ``snapshot_delete_rows``: only
    stats-selected candidate files are rewritten, everything else
    carries by reference; non-matching rows inside victim files are
    rewritten byte-for-byte-equal (NULL keys never match an IN list).

    ``set_values`` maps column name → new value: a literal (None nulls
    the column) or a ``pyspark.sql.Column`` expression evaluated per
    row (e.g. ``F.sha2(F.col("email"), 256)`` for pseudonymization).
    Values are cast to the column's existing type; unknown columns
    raise. Returns ``(new_version, rows_updated)``. Old versions still
    hold the pre-update rows until ``vacuum_snapshots`` — same
    erasure-completes-at-vacuum caveat as delete."""
    return snapshot_update_rows_where(
        spark, path, {col: values}, set_values
    )


def _check_update_targets(man: dict, set_values: dict) -> StructType:
    """Shared validation for BOTH update engines (CoW and
    merge-on-read — one copy, so a validation fix can never apply to
    one physical path and not the other): ``set_values`` columns must
    exist, and partition columns refuse (rows would have to MOVE
    directories; ``snapshot_merge_upsert`` handles key-preserving
    repartitioning updates). Returns the table schema."""
    schema = StructType.fromJson(man["schema"])
    fields = {f.name: f.dataType for f in schema.fields}
    unknown = set(set_values) - set(fields)
    if unknown:
        raise ValueError(f"update targets unknown columns {sorted(unknown)}")
    pc = _manifest_partition_cols(man) or []
    touched_pc = set(set_values) & set(pc)
    if touched_pc:
        raise ValueError(
            f"cannot update partition column(s) {sorted(touched_pc)} — "
            "rows would have to MOVE directories; use "
            "snapshot_merge_upsert for key-preserving repartitioning "
            "updates"
        )
    return schema


def _set_value_expr(v, dtype):
    """The RHS expression for one updated column: a literal (None
    nulls it) or a ``pyspark.sql.Column`` evaluated per row, cast to
    the column's EXISTING type — shared by both update engines so the
    cast/expression semantics cannot diverge."""
    from pyspark.sql import Column

    expr = v if isinstance(v, Column) else F.lit(v)
    return expr.cast(dtype)


def snapshot_update_rows_where(
    spark: SparkSession,
    path: str,
    predicates: dict,
    set_values: dict,
) -> tuple[int, int]:
    """Conjunctive copy-on-write update — ``snapshot_update_rows``
    across any number of AND-ed columns ({col: values}); the shared
    planner partition-prunes partition-column predicates and
    intersects stats exclusion for the rest."""
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    man = _load_manifest(spark, path, versions[-1])
    schema = _check_update_targets(man, set_values)

    preds = _sanitize_predicates(predicates)
    if not preds:
        return versions[-1], 0

    def fn(df):
        matched = _match_expr(preds)
        # ONE select, every RHS resolved against the PRE-update row
        # image (SQL UPDATE semantics): a sequential withColumn chain
        # would let {'email': None, 'email_hash': sha2(col('email'))}
        # hash the already-nulled value, silently dict-order dependent.
        cols = []
        for f in schema.fields:
            if f.name in set_values:
                cols.append(
                    F.when(
                        matched,
                        _set_value_expr(set_values[f.name], f.dataType),
                    )
                    .otherwise(F.col(f.name))
                    .alias(f.name)
                )
            else:
                cols.append(F.col(f.name))
        return df.select(*cols, matched.alias("_matched"))

    return _rewrite_matching_files(
        spark, path, preds, fn, "update_rows"
    )


def snapshot_update_rows_dv(
    spark: SparkSession,
    path: str,
    col: str,
    values: list,
    set_values: dict,
) -> tuple[int, int]:
    """``snapshot_update_rows`` semantics via deletion vectors: ONE
    commit tombstones the matched rows' old images and appends new
    files holding only the patched images — write cost ∝ matched rows,
    never victim-file bytes (the CoW path rewrites every candidate
    file whole to patch a handful of rows). Non-matching rows are
    never touched, read, or rewritten. The change feed reports the
    commit as delete(old image) + insert(new image), exactly like a
    CoW update. Partition values are preserved (partition columns
    refuse, as in the CoW path), so the patched images land in their
    original partitions."""
    return _update_rows_dv_where(spark, path, {col: values}, set_values)


def _update_rows_dv_where(
    spark: SparkSession,
    path: str,
    predicates: dict,
    set_values: dict,
) -> tuple[int, int]:
    """Conjunctive merge-on-read update — the engine behind
    ``snapshot_update_rows_dv`` and ``snapshot_update_where(mode="dv")``."""
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    latest = versions[-1]
    man = _load_manifest(spark, path, latest)
    latest, man = _eq_resolved_head(spark, path, latest, man)
    schema = _check_update_targets(man, set_values)
    pc = _manifest_partition_cols(man) or []
    predicates = _sanitize_predicates(predicates)
    if not predicates:
        return latest, 0
    victims, _carried = _victims_by_stats_where(man, predicates)
    if not victims:
        return latest, 0
    matched_rows = (
        _read_file_list(
            spark, path, victims, schema,
            partition_cols=pc or None,
            dv_files=man.get("dv_files"),
            row_ids=True,
            dv_targets=man.get("dv_targets"),
            colmap=_colmap(man) or None,
            defaults=man.get("defaults"),
        )
        .where(_match_expr(predicates))
        .localCheckpoint(eager=True)  # one scan feeds count + 2 writes
    )
    n = matched_rows.count()
    if n == 0:
        return latest, 0
    out_cols = []
    for f in schema.fields:
        if f.name in set_values:
            out_cols.append(
                _set_value_expr(set_values[f.name], f.dataType).alias(f.name)
            )
        else:
            out_cols.append(F.col(f.name))
    _, new_files = _write_commit_files(
        matched_rows.select(*out_cols), path, pc or None,
        colmap=_colmap(man) or None,
    )
    _, new_dvs = _write_commit_files(
        matched_rows.select("_dv_file", "_dv_pos").repartition(
            max(1, -(-n // 4_000_000))
        ),
        path,
        None,
    )
    stats_cols = man.get("stats_cols") or []
    extra: dict = {"dv_added": new_dvs, "dv_rows_added": n}
    if stats_cols:
        extra["stats"] = {
            **man.get("stats", {}),
            **collect_file_stats(spark, path, new_files, stats_cols),
        }
        extra["stats_cols"] = stats_cols
    new_tgts = [
        r[0]
        for r in matched_rows.select("_dv_file").distinct().collect()
    ]
    version = _commit(
        spark,
        path,
        sorted(man["files"] + new_files),
        schema,
        "update_rows_dv",
        latest,
        extra=extra,
        partition_cols=pc or None,
        dv_files=sorted((man.get("dv_files") or []) + new_dvs),
        dv_targets=_dv_targets_for(man, new_tgts),
    )
    return version, n


def snapshot_compact_dvs(
    spark: SparkSession,
    path: str,
    target_mb: int = 64,
    min_dead_fraction: float = 0.25,
) -> int:
    """Consolidate a table's deletion-vector sidecars into one compact
    set WITHOUT touching data files: read every live tombstone (inert
    entries for since-rewritten files are dropped), rewrite them as one
    right-sized sidecar, publish as a metadata+sidecar commit. Use when
    many small DV deletes have accumulated and full ``snapshot_compact``
    (which folds tombstones into data rewrites) is not worth the IO
    yet. Row-neutral by construction — the commit records live-entry
    counts on both sides so the feed's verify gate can pass it, like a
    data compaction. Returns the new version (or the current one when
    there is nothing to consolidate).

    A SINGLE sidecar is still a candidate when a material fraction of
    its entries has gone inert (their target files since rewritten
    away — e.g. a partition purge after a scattered DV delete): the
    dead weight is re-read by every DV-masked scan until shed.
    ``min_dead_fraction`` gates that case (footer row total vs live
    semi-join count) so a fully-live sidecar is never pointlessly
    rewritten — the gate is a COUNT-only scan, nothing materializes
    on a stand-down. The consolidated output is sized by LIVE bytes
    (raw bytes × live fraction), never dead-inclusive raw bytes — a
    mostly-inert set must shrink to its live footprint, not
    re-fragment at its old size."""
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    latest = versions[-1]
    man = _load_manifest(spark, path, latest)
    dvs = man.get("dv_files") or []
    root = _root(path)
    if not dvs:
        return latest
    live = F.broadcast(
        spark.createDataFrame(
            [(f,) for f in man["files"]], "_dv_file string"
        )
    )
    entries_plan = (
        spark.read.parquet(*[f"{root}/{p}" for p in dvs])
        .select("_dv_file", "_dv_pos")
        .join(live, "_dv_file", "left_semi")
    )
    total_entries = _footer_row_total(spark, root, dvs)
    n = entries_plan.count()
    if len(dvs) == 1:
        # single sidecar: consolidate only when materially inert
        if total_entries == 0 or (
            (total_entries - n) / total_entries < min_dead_fraction
        ):
            return latest
    if n == 0:
        # every entry was inert: the table has NO live tombstones —
        # publish a DV-free manifest instead of an empty sidecar
        new_dvs, n_after, new_tgts = None, 0, None
    else:
        # one scan feeds the write AND the distinct-target collect
        entries = entries_plan.localCheckpoint(eager=True)
        total = _file_bytes_total(spark, root, dvs)
        live_bytes = total * n / max(1, total_entries)
        n_out = max(1, -(-int(live_bytes) // (target_mb * 1024 * 1024)))
        _, new_dvs = _write_commit_files(
            entries.repartition(n_out), path, None
        )
        # count the REWRITTEN sidecars from disk: equality with the
        # live entries of the old set proves the consolidation lost
        # nothing
        n_after = _dv_entry_count(spark, root, new_dvs, man["files"])
        if n_after != n:
            raise RuntimeError(
                f"DV consolidation wrote {n_after} live tombstones, "
                f"expected {n} — aborting before the commit"
            )
        # the consolidation point is where the recorded target list
        # SHRINKS back to the live footprint (inert targets shed)
        new_tgts = sorted(
            r[0] for r in entries.select("_dv_file").distinct().collect()
        )
    extra = {"dv_rows_before": n, "dv_rows_after": n_after}
    if man.get("stats") is not None:
        extra.update(
            {"stats": man["stats"], "stats_cols": man.get("stats_cols")}
        )
    return _commit(
        spark,
        path,
        man["files"],
        StructType.fromJson(man["schema"]),
        "compact_dvs",
        latest,
        extra=extra,
        partition_cols=_manifest_partition_cols(man),
        dv_files=new_dvs,
        dv_targets=new_tgts,
    )


def snapshot_resolve_eq(spark: SparkSession, path: str) -> tuple[int, int]:
    """Fold every outstanding EQUALITY-DELETE entry into position
    deletion vectors: scan only the files the entries apply to, find
    the matching (still-live) rows, tombstone their (file, position)
    identities, and publish one ``resolve_eq`` commit that drops the
    entries — row visibility unchanged by construction. Returns
    ``(version, rows_resolved)`` (the current version when nothing is
    outstanding).

    This is the maintenance step that keeps the equality-delete read
    tax bounded: upsert writers land O(batch) commits with zero table
    reads, and the resolver periodically converts the accumulated key
    masks into the position form every read/count/plan path handles at
    full speed (then ``snapshot_compact_dvs``/``snapshot_compact``
    take over as usual). Mutators call it implicitly — DML stats
    proofs and row accounting are position-exact only."""
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    latest = versions[-1]
    man = _load_manifest(spark, path, latest)
    entries = _eq_entries(man)
    if not entries:
        return latest, 0
    schema = StructType.fromJson(man["schema"])
    seq_map = man.get("seq") or {}
    affected = _eq_affected_files(man)
    # group affected files by WHICH entries apply (suffixes of the
    # seq-sorted entry list — see _read_file_list) and semi-join each
    # group's rows against its applicable key sidecars; rows already
    # position-tombstoned are masked out (never tombstone twice)
    from bisect import bisect_right

    entries = sorted(entries, key=lambda e: (e["seq"], e["path"]))
    seqs = [e["seq"] for e in entries]
    groups: dict[int, list[str]] = {}
    for f in affected:
        groups.setdefault(bisect_right(seqs, seq_map.get(f, 0)), []).append(f)
    matched_parts = []
    # resolve works entirely in the PHYSICAL namespace: entry keys and
    # sidecar columns are on-disk names, and only (_dv_file, _dv_pos)
    # leave this function — no logical aliasing needed or wanted
    pschema = _phys_fields(schema, _colmap(man))
    for idx, flist in sorted(groups.items()):
        df = _read_file_list(
            spark, path, flist, pschema,
            partition_cols=_manifest_partition_cols(man),
            dv_files=man.get("dv_files"),
            row_ids=True,
            dv_targets=man.get("dv_targets"),
            defaults=man.get("defaults"),
        )
        by_keys: dict[tuple, list[str]] = {}
        for e in entries[idx:]:
            by_keys.setdefault(tuple(e["keys"]), []).append(e["path"])
        for keys, paths in sorted(by_keys.items()):
            keycols = list(keys)
            matched_parts.append(
                df.join(
                    _sidecar_df(spark, path, paths, keycols),
                    keycols,
                    "left_semi",
                ).select(*_DV_COLS)
            )
    matched = matched_parts[0]
    for p in matched_parts[1:]:
        matched = matched.unionByName(p)
    if len(matched_parts) > 1:
        # a row matching entries from two different key sets (or two
        # seq groups' unions) must produce ONE tombstone — duplicate
        # (file, pos) entries would inflate every count correction
        matched = matched.distinct()
    matched = matched.localCheckpoint(eager=True)
    n = matched.count()
    new_dvs: list[str] = []
    new_tgts: list[str] = []
    if n:
        _, new_dvs = _write_commit_files(
            matched.repartition(
                max(1, n // 4_000_000 + (n % 4_000_000 > 0))
            ),
            path,
            None,
        )
        new_tgts = [
            r[0] for r in matched.select("_dv_file").distinct().collect()
        ]
    extra: dict = {
        "eq_resolved": [e["path"] for e in entries],
        "eq_rows_resolved": n,
        "dv_added": new_dvs,
        "dv_rows_added": n,
    }
    if man.get("stats") is not None:
        extra.update(
            {"stats": man["stats"], "stats_cols": man.get("stats_cols")}
        )
    version = _commit(
        spark,
        path,
        man["files"],
        schema,
        "resolve_eq",
        latest,
        extra=extra,
        partition_cols=_manifest_partition_cols(man),
        dv_files=sorted((man.get("dv_files") or []) + new_dvs) or None,
        dv_targets=_dv_targets_for(man, new_tgts),
        eq_files=None,
    )
    return version, n


def _eq_resolved_head(
    spark: SparkSession, path: str, latest: int, man: dict
) -> tuple[int, dict]:
    """Mutator entry guard: resolve outstanding equality deletes
    before DML/compaction — their stats proofs ("every row of this
    file matches"), victim row accounting, and rewrite reads are all
    POSITION-exact and would otherwise overcount (or resurrect)
    key-masked rows. No-op (no extra I/O) when nothing is
    outstanding, which is the steady state."""
    if not man.get("eqs"):
        return latest, man
    v, _ = snapshot_resolve_eq(spark, path)
    return v, _load_manifest(spark, path, v)


def _maybe_auto_compact_dvs(
    spark: SparkSession,
    path: str,
    auto_compact_files: int | None,
    target_mb: int = 64,
) -> None:
    """Opportunistic sidecar consolidation after a DV-writing commit:
    once ``auto_compact_files`` sidecars have accumulated, fold them
    into a right-sized set so read-side tombstone merging never
    degrades unbounded under a stream of small DML commits. The
    COUNT trigger (not bytes) bounds amortized maintenance cost: a
    consolidation re-reads every live tombstone, so firing it per
    commit would make each DML ∝ total tombstones — at every N
    commits the re-read amortizes to 1/N per commit, the standard
    log-structured-merge tradeoff.

    The amortization guarantee is CADENCE-based, not count-based
    alone: when live tombstones exceed ``auto_compact_files ×
    (rows per right-sized sidecar)`` the consolidated output itself
    stays at or above the trigger count, and a count-only trigger
    would then re-read the whole tombstone set on EVERY subsequent
    DML — the exact per-commit blowup the trigger exists to avoid.
    So the gate also stands down whenever a ``compact_dvs`` commit
    already sits within the last ``auto_compact_files`` versions:
    consolidations are at least N commits apart, re-read cost
    amortizes to 1/N per commit regardless of the live floor, and
    (unlike a predicted-reduction gate on raw bytes) a mostly-INERT
    sidecar set still consolidates and sheds its dead weight.
    Failures (a concurrent writer winning the version) are swallowed:
    the DML already committed, and the next DV commit re-triggers."""
    if not auto_compact_files:
        return
    versions = _list_manifests(spark, path)
    man = _load_manifest(spark, path, versions[-1])
    dvs = man.get("dv_files") or []
    if len(dvs) < auto_compact_files:
        return
    # scalar-doc walk (cached): recent consolidation -> stand down
    for v in versions[-auto_compact_files:]:
        doc = _read_doc(spark, path, v, must=False)
        if doc is not None and doc.get("op") == "compact_dvs":
            return
    try:
        snapshot_compact_dvs(spark, path, target_mb=target_mb)
    except SnapshotConflict:
        pass


def _maybe_auto_compact_small(
    spark: SparkSession,
    path: str,
    min_file_rows: int | None,
    trigger_files: int = 16,
    target_mb: int = 256,
) -> None:
    """Opportunistic small-file maintenance after an append: once
    ``trigger_files`` bin-packable fragments (recorded row count under
    ``min_file_rows``, in partitions holding >= 2 of them) have
    accumulated, fold them with a TARGETED compaction — rewrite cost
    ∝ fragment bytes, carried files untouched. The whole trigger
    evaluates from the manifest's recorded per-file row counts: zero
    filesystem stats per commit, so a streaming ingest can afford it
    per micro-batch. Cadence stand-down mirrors
    ``_maybe_auto_compact_dvs``: never within ``trigger_files``
    versions of the last compact commit, bounding maintenance to 1/N
    per commit even when the ingest rate outruns packing. Conflicts
    are swallowed — the append already committed; the next batch
    re-triggers."""
    if not min_file_rows:
        return
    versions = _list_manifests(spark, path)
    man = _load_manifest(spark, path, versions[-1])
    frows = man.get("rows") or {}
    victims = _fragment_victims(
        man["files"], lambda f: f in frows and frows[f] < min_file_rows
    )
    if len(victims) < trigger_files:
        return
    for v in versions[-trigger_files:]:
        doc = _read_doc(spark, path, v, must=False)
        if doc is not None and doc.get("op") == "compact":
            return
    try:
        snapshot_compact(
            spark, path, target_mb=target_mb, min_file_rows=min_file_rows
        )
    except SnapshotConflict:
        pass


def snapshot_drop_partitions(
    spark: SparkSession,
    path: str,
    partitions: dict,
    retries: int = 0,
) -> tuple[int, int]:
    """METADATA-ONLY partition delete: remove every live file whose
    partition-directory values match ``partitions`` ({col: value |
    list-of-values}, conjunctive across columns, ``None`` = the Hive
    null partition — the same contract as ``read_snapshot``'s
    pruning). Returns ``(new_version, rows_deleted)``.

    This is the ``DELETE WHERE month = 5`` every warehouse retires
    data with, and it must move zero data bytes at any table size: a
    partition directory's value IS the column value for every row in
    it (nulls included — they land in the null partition), so file
    membership proves the predicate row-exactly with no read, no
    rewrite, no tombstones. The commit is a pure manifest edit —
    carried files by reference, dropped files' stats/row entries fall
    away, deletion-vector entries targeting dropped files go inert
    (recorded ``dv_targets`` shrink to the carried intersection; a
    sidecar set gone fully inert drops entirely, restoring clean
    scans). ``rows_deleted`` is exact and metadata-only: recorded
    per-file counts (footers read only for legacy gaps — O(change))
    minus the live tombstones already masking rows in the dropped
    files.

    Non-partition columns refuse (``_partition_pruned_files``) — a
    typo'd column must never read as "empty partition, 0 rows". The
    change feed emits the dropped rows as deletes (file-diff
    semantics, cost ∝ dropped bytes, only when a consumer asks);
    streaming feeds classify it like any other delete commit
    (out-of-scope drops pass a partition-scoped feed untouched).
    Erasure caveat as every manifest-log design: older versions still
    reference the files until ``vacuum_snapshots``.

    ``retries``: on a lost commit race the WHOLE computation reruns
    against the new head — it is metadata-only (no data written, no
    orphans possible), so a retry is a clean re-serialization: the
    drop simply lands after the racer, deleting whatever the matching
    partitions hold THEN (an append racing into a matched partition is
    the append-then-delete ordering, exactly what retrying a DELETE
    means)."""
    for _ in range(retries):
        try:
            return _drop_partitions_once(spark, path, partitions)
        except SnapshotConflict:
            continue
    return _drop_partitions_once(spark, path, partitions)


def _drop_partitions_once(
    spark: SparkSession, path: str, partitions: dict
) -> tuple[int, int]:
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    latest = versions[-1]
    man = _load_manifest(spark, path, latest)
    latest, man = _eq_resolved_head(spark, path, latest, man)
    matched = _partition_pruned_files(man, partitions)
    if not matched:
        return latest, 0
    root = _root(path)
    dropped = set(matched)
    carried = [f for f in man["files"] if f not in dropped]
    rows_deleted = _physical_row_total(
        spark, root, man, matched
    ) - _dv_entry_count(spark, root, man.get("dv_files"), matched)
    dv_files: object = _DV_INHERIT
    dv_targets: object = _DV_INHERIT
    if man.get("dv_files") and man.get("dv_targets") is not None:
        live_tgts = set(man["dv_targets"]) & set(carried)
        if live_tgts:
            dv_targets = sorted(live_tgts)
        else:  # every tombstone targeted a dropped file: all inert
            dv_files, dv_targets = None, None
    stats_extra = (
        {
            "stats": {
                f: st
                for f, st in man["stats"].items()
                if f not in dropped
            },
            "stats_cols": man.get("stats_cols"),
        }
        if man.get("stats") is not None
        else {}
    )
    version = _commit(
        spark,
        path,
        carried,
        StructType.fromJson(man["schema"]),
        "drop_partitions",
        latest,
        extra={
            # provenance, values verbatim (primitives — JSON-clean)
            "dropped_partitions": {
                k: sorted(v, key=lambda x: (x is None, str(x)))
                if isinstance(v, (list, tuple, set, frozenset))
                else v
                for k, v in partitions.items()
            },
            "rows_deleted": rows_deleted,
            "files_removed": len(matched),
            **stats_extra,
        },
        partition_cols=_manifest_partition_cols(man),
        dv_files=dv_files,
        dv_targets=dv_targets,
    )
    return version, rows_deleted


def snapshot_delete(
    spark: SparkSession,
    path: str,
    col: str,
    values: list,
    mode: str = "auto",
    dv_threshold_mb: int = 64,
    auto_compact_files: int | None = 12,
) -> tuple[int, int]:
    """Unified targeted delete (``col IN values``) with strategy
    dispatch — the front door for DML; returns ``(version, rows)``.

    - ``mode="rewrite"``: copy-on-write (``snapshot_delete_rows``) —
      victim files rewritten whole; no tombstone debt, no read-side
      join; right when victims are few/small.
    - ``mode="dv"``: merge-on-read (``snapshot_delete_rows_dv``) —
      write ∝ deleted rows; right when the stats-selected victim set
      is large (a scattered one-key takedown on a 100 TB table).
    - ``mode="auto"``: choose by the bytes the rewrite would copy —
      the stats-selected victim files' total size. Above
      ``dv_threshold_mb``, tombstones win (rewrite cost dominates);
      below it, the rewrite wins (small victim sets keep the table
      join-free). The decision is metadata-only: file sizes from the
      filesystem, victims from manifest stats.

    DV-mode commits then consolidate sidecars past
    ``auto_compact_files`` (see ``_maybe_auto_compact_dvs``).

    When ``col`` is a PARTITION column of the table, ``mode="auto"``
    dispatches to ``snapshot_drop_partitions`` instead of either data
    path: every row under a matching partition directory matches the
    predicate by construction (the directory value IS the column
    value), so the delete is a pure manifest edit that moves ZERO
    data bytes at any table size. The dispatch preserves SQL DELETE
    semantics exactly: ``None`` values are filtered first (``NULL IN``
    never matches — the raw ``snapshot_drop_partitions`` API, by
    contrast, lets ``None`` select the null partition deliberately),
    and only int/str/bool values qualify — those have one canonical
    directory-string form, while e.g. ``5.0`` against an int month
    renders ``"5.0" != "5"`` and would silently no-op where the data
    paths' Spark-typed equality deletes; such values fall through to
    the data paths. Explicit ``mode="dv"``/``"rewrite"`` always honor
    the requested physical strategy.

    One-column delegate of ``snapshot_delete_where`` — a single
    dispatch engine, so strategy/threshold fixes can never diverge
    between the single- and composite-key front doors."""
    return snapshot_delete_where(
        spark, path, {col: values}, mode=mode,
        dv_threshold_mb=dv_threshold_mb,
        auto_compact_files=auto_compact_files,
    )


def snapshot_delete_where(
    spark: SparkSession,
    path: str,
    predicates: dict,
    mode: str = "auto",
    dv_threshold_mb: int = 64,
    auto_compact_files: int | None = 12,
) -> tuple[int, int]:
    """Conjunctive DML front door: DELETE WHERE ``col IN values AND
    ...`` across any number of columns ({col: values}) with the same
    strategy dispatch as ``snapshot_delete`` — and the same fast
    paths, generalized:

    - every predicate column a partition column (+ canonical int/str/
      bool values) → ``snapshot_drop_partitions``: the whole delete is
      a manifest edit (multi-column partition dirs prove the
      conjunction row-exactly);
    - otherwise ``auto`` weighs the copy-on-write bytes (victims from
      the per-column stats INTERSECTION, minus files the per-column
      whole-file proofs drop for free) against ``dv_threshold_mb``;
    - NULL semantics are SQL's throughout: a None value matches
      nothing (a column whose list is all-None makes the whole
      conjunction a no-op)."""
    if mode not in ("auto", "dv", "rewrite"):
        raise ValueError(f"mode must be auto|dv|rewrite; got {mode!r}")
    preds = _sanitize_predicates(predicates)
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    if not preds:
        return versions[-1], 0
    man = None
    if mode == "auto":
        man = _load_manifest(spark, path, versions[-1])
        pc = set(_manifest_partition_cols(man) or ())
        if (
            # DNF (multi-branch OR) takes the data paths: per-branch
            # directory whole-file proofs still drop whole partitions
            # by reference, just through one data-path commit instead
            # of n non-atomic partition-drop commits
            isinstance(preds, dict)
            and set(preds) <= pc
            # Range and null-test predicates take the data paths:
            # ranges' directory whole-file proofs already drop whole
            # partitions by reference through a data-path commit, and
            # a null partition value's directory encoding is
            # writer-specific (see _NullTest)
            and not any(
                isinstance(v, (Range, _NullTest)) for v in preds.values()
            )
            and all(
                type(v) in (int, str, bool) for vals in preds.values()
                for v in vals
            )
            # files predating a layout evolution may hold matching
            # rows as DATA — a directory-proof drop would silently
            # miss them, so such tables fall through to the data paths
            # until a compact migrates the old files
            and not _files_not_encoding(man, preds)
        ):
            return snapshot_drop_partitions(spark, path, preds)
        cost = _victim_bytes(
            spark, path, preds, discount_full_match=True, man=man
        )
        mode = "dv" if cost > dv_threshold_mb * 1024 * 1024 else "rewrite"
    if mode == "rewrite":
        return snapshot_delete_rows_where(spark, path, preds)
    out = _delete_rows_dv_where(spark, path, preds)
    _maybe_auto_compact_dvs(spark, path, auto_compact_files)
    return out


def snapshot_update(
    spark: SparkSession,
    path: str,
    col: str,
    values: list,
    set_values: dict,
    mode: str = "auto",
    dv_threshold_mb: int = 64,
    auto_compact_files: int | None = 12,
) -> tuple[int, int]:
    """Unified targeted update — same strategy dispatch as
    ``snapshot_delete`` (the DV path writes tombstones + only the
    updated row images; the rewrite path copies victim files whole).
    One-column delegate of ``snapshot_update_where``."""
    return snapshot_update_where(
        spark, path, {col: values}, set_values, mode=mode,
        dv_threshold_mb=dv_threshold_mb,
        auto_compact_files=auto_compact_files,
    )


def snapshot_update_where(
    spark: SparkSession,
    path: str,
    predicates: dict,
    set_values: dict,
    mode: str = "auto",
    dv_threshold_mb: int = 64,
    auto_compact_files: int | None = 12,
) -> tuple[int, int]:
    """Conjunctive UPDATE front door: patch rows matching ``col IN
    values AND ...`` across any number of columns, with the same
    auto/dv/rewrite dispatch as ``snapshot_delete_where``. No
    metadata-only fast path exists for updates (rows change, bytes
    must move), but partition-column predicates still prune the
    victim set from directory values, so an update scoped to one
    tenant never reads another tenant's files. The auto estimate
    discounts provably-all-matching files: they cost the same under
    both strategies (every row needs a new image either way — DV just
    adds tombstones on top), so only boundary files tip the scale."""
    if mode not in ("auto", "dv", "rewrite"):
        raise ValueError(f"mode must be auto|dv|rewrite; got {mode!r}")
    if mode == "auto":
        mode = (
            "dv"
            if _victim_bytes(
                spark, path, predicates, discount_full_match=True
            )
            > dv_threshold_mb * 1024 * 1024
            else "rewrite"
        )
    if mode == "rewrite":
        return snapshot_update_rows_where(
            spark, path, predicates, set_values
        )
    out = _update_rows_dv_where(spark, path, predicates, set_values)
    _maybe_auto_compact_dvs(spark, path, auto_compact_files)
    return out


def snapshot_add_column(
    spark: SparkSession, path: str, name: str, dtype, default=None
) -> int:
    """METADATA-ONLY ``ALTER TABLE ADD COLUMN``: publish a new version
    with the same files and a widened schema — zero data bytes move at
    any table size. Existing rows surface the column as NULL (the
    explicit-list readers null-fill manifest columns absent from a
    file); subsequent writers include it like any other column.
    ``dtype`` is a DataType or a DDL string (``"int"``,
    ``"array<double>"``). Returns the new version.

    ``default``: an INITIAL default (Iceberg-v3 semantics) — rows of
    files written BEFORE the add read this value instead of NULL,
    while rows written after the add keep whatever they stored,
    including genuine NULLs. Physical column absence is the per-file
    marker, so the default costs zero data movement and zero per-row
    bookkeeping; it fills at the read boundary, flows through DML
    predicates, metadata MIN/MAX/COUNT(col), the change feed and the
    streaming source. Scalars only (bool/int/float/str), castable to
    ``dtype``. A Bloom index refuses such columns (pre-add rows have
    no physical values to index — candidate lists would silently miss
    them)."""
    from pyspark.sql.types import _parse_datatype_string

    if isinstance(dtype, str):
        dtype = _parse_datatype_string(dtype)
    if default is not None:
        if not isinstance(default, (bool, int, float, str)):
            raise ValueError(
                "default must be a plain scalar (bool/int/float/str); "
                f"got {type(default).__name__}"
            )
        # try_cast: under ANSI mode a malformed literal THROWS at the
        # cast — the probe must turn that into this front door's error
        probe = spark.createDataFrame([(1,)], "x int").select(
            F.lit(default).try_cast(dtype).alias("d")
        )
        normalized = probe.first()["d"]
        if normalized is None:
            raise ValueError(
                f"default {default!r} does not cast to "
                f"{dtype.simpleString()}"
            )
        # persist the CAST-NORMALIZED value, not the raw input: the
        # streaming source fills with pyarrow, whose stricter casts
        # reject values Spark coerced (7.5 → int 7; 'yes' → bool) —
        # batch and stream must fill the same bytes. Types whose
        # normalized form isn't a JSON scalar (decimal, date) refuse:
        # the manifest is JSON and the fill must round-trip exactly.
        if not isinstance(normalized, (bool, int, float, str)):
            raise ValueError(
                f"defaults are unsupported for {dtype.simpleString()} "
                "(normalized value is not a JSON scalar)"
            )
        default = normalized
    if name in _DV_COLS:
        raise ValueError(
            f"column name {name!r} is reserved for the deletion-vector "
            "row identity"
        )
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    latest = versions[-1]
    man = _load_manifest(spark, path, latest)
    schema = StructType.fromJson(man["schema"])
    if name in {f.name for f in schema.fields}:
        raise ValueError(f"column {name!r} already exists at {path}")
    # the new column's PHYSICAL name equals its logical name; refuse if
    # a renamed column still occupies that physical slot — two logical
    # columns must never share an on-disk column (see _colmap)
    taken = {p: l for l, p in _colmap(man).items()}
    if name in taken:
        raise ValueError(
            f"column name {name!r} is the on-disk (physical) name of "
            f"renamed column {taken[name]!r} — pick a different name, "
            "or rewrite the table (snapshot_write overwrite) to shed "
            "the rename history"
        )
    from pyspark.sql.types import StructField

    new_schema = StructType(list(schema.fields) + [StructField(name, dtype)])
    new_defaults = dict(man.get("defaults") or {})
    if default is not None:
        # keyed by the PHYSICAL name (= the logical one at add time,
        # frozen forever) — a later rename never detaches the default
        new_defaults[name] = default
    return _commit(
        spark,
        path,
        man["files"],
        new_schema,
        "add_column",
        latest,
        defaults=new_defaults or None,
        extra={
            "altered_column": name,
            **({"default": default} if default is not None else {}),
            **(
                {"stats": man["stats"], "stats_cols": man.get("stats_cols")}
                if man.get("stats") is not None
                else {}
            ),
        },
        partition_cols=_manifest_partition_cols(man),
        dv_files=man.get("dv_files"),
        dv_targets=_dv_targets_for(man),
    )


def snapshot_drop_column(
    spark: SparkSession, path: str, name: str
) -> int:
    """METADATA-ONLY ``ALTER TABLE DROP COLUMN``: publish a new version
    with the same files and a narrowed schema. The column's bytes stay
    in the files (readers project them away — the explicit-list scan
    selects exactly the manifest schema) until the next
    ``snapshot_compact`` physically rewrites; time travel below the
    drop still reads it. Partition columns refuse (their values ARE
    the directory layout); the column's per-file stats entries drop
    with it. Returns the new version."""
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    latest = versions[-1]
    man = _load_manifest(spark, path, latest)
    schema = StructType.fromJson(man["schema"])
    if name not in {f.name for f in schema.fields}:
        raise ValueError(f"column {name!r} does not exist at {path}")
    pc = _manifest_partition_cols(man) or []
    if name in pc:
        raise ValueError(
            f"cannot drop partition column {name!r} — its values are "
            "the directory layout; rewrite the table with a new layout "
            "(snapshot_compact) first"
        )
    new_schema = StructType([f for f in schema.fields if f.name != name])
    if not new_schema.fields:
        raise ValueError("cannot drop the last column")
    # a CHECK constraint referencing the dropped column would pass the
    # alter (no new files to scan) and then fail every future append
    # with an unresolved-column error — refuse up front instead, by
    # analyzing each constraint against the NARROWED schema
    for cname, cexpr in sorted(
        _constraint_exprs(man.get("props")).items()
    ):
        probe = spark.createDataFrame([], new_schema)
        try:
            probe.select(F.expr(cexpr))  # analysis-only, no job
        except Exception:
            raise ValueError(
                f"cannot drop column {name!r}: CHECK constraint "
                f"{cname!r} ({cexpr}) references it — drop the "
                "constraint first"
            ) from None
    # an equality delete KEYED on the column anywhere in RETAINED
    # history blocks the drop: an outstanding entry would lose its
    # join column at read time (silent resurrection), and even a
    # resolved one is re-joined by the change feed's eq legs (and can
    # come back outstanding via restore) — the feed contract is that
    # any fully-retained range replays, which a missing key column
    # would break with an AnalysisException. Resolve + vacuum the eq
    # history first, or use the documented add+backfill pattern.
    # Metadata-only: one cached state fold per retained version.
    pname = _phys(man, name)  # entry keys are on-disk names (stable)
    for hv in versions:
        hman = _load_manifest(spark, path, hv)
        for e in _eq_entries(hman):
            if pname in e["keys"]:
                raise ValueError(
                    f"cannot drop column {name!r}: equality delete "
                    f"{e['path']!r} (version {hv}) keys on it — "
                    "resolve (snapshot_resolve_eq) and vacuum that "
                    "history first"
                )
    extra: dict = {"altered_column": name}
    if man.get("stats") is not None:
        extra["stats"] = {
            f: {c: v for c, v in st.items() if c != pname}
            for f, st in man["stats"].items()
        }
        extra["stats_cols"] = [
            c for c in (man.get("stats_cols") or []) if c != pname
        ]
    return _commit(
        spark,
        path,
        man["files"],
        new_schema,
        "drop_column",
        latest,
        extra=extra,
        partition_cols=_manifest_partition_cols(man),
        dv_files=man.get("dv_files"),
        dv_targets=_dv_targets_for(man),
        # the dropped column's rename mapping (if any) goes with it.
        # Re-adding a column under the freed physical name then shares
        # drop+re-add's documented semantics: pre-drop files still
        # physically hold the old bytes until a compact rewrites them
        colmap={
            l: ph for l, ph in _colmap(man).items() if l != name
        }
        or None,
    )


def snapshot_rename_column(
    spark: SparkSession, path: str, old: str, new: str
) -> int:
    """METADATA-ONLY ``ALTER TABLE RENAME COLUMN``: publish the same
    files under a schema whose field ``old`` is now called ``new``.
    Safe because physical (on-disk) column names are FROZEN at add
    time (see ``_colmap``): every file — written before or after the
    rename — stores the column under its original physical name, the
    manifest records the logical→physical mapping, and readers alias
    once at the read boundary. No per-file name resolution, no
    silent-null hazard, zero data movement; time travel below the
    rename still reads the old name. Stats, partition directories and
    equality-delete sidecars stay keyed physical, so planning and
    masking are untouched.

    Refusals: ``old`` missing / ``new`` already present; partition
    columns (their names ARE the directory layout and every partition
    predicate surface); reserved ``_dv_*`` names; a CHECK constraint
    referencing ``old`` (drop + re-add the constraint against the new
    name). ``new`` MAY be another column's physical slot — a rename
    never mints a physical name, so the map stays injective (this is
    what keeps the classic a→tmp, b→a, tmp→b swap legal). Returns the
    new version."""
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    latest = versions[-1]
    man = _load_manifest(spark, path, latest)
    schema = StructType.fromJson(man["schema"])
    names = {f.name for f in schema.fields}
    if old not in names:
        raise ValueError(f"column {old!r} does not exist at {path}")
    if new in names:
        raise ValueError(f"column {new!r} already exists at {path}")
    if new in _DV_COLS:
        raise ValueError(
            f"column name {new!r} is reserved for the deletion-vector "
            "row identity"
        )
    pc = _manifest_partition_cols(man) or []
    if old in pc:
        raise ValueError(
            f"cannot rename partition column {old!r} — its name is the "
            "directory layout; rewrite the table with a new layout "
            "(snapshot_compact) first"
        )
    cmap = dict(_colmap(man))
    # No physical-slot check here (unlike add_column): a rename never
    # mints a physical name — it re-labels an existing frozen one, so
    # the logical→physical map stays injective by construction (each
    # physical was minted once by an add that refused taken slots).
    # This is what keeps the classic swap (a→tmp, b→a, tmp→b) legal.
    # a CHECK constraint referencing the old name would fail analysis
    # on every future commit — refuse up front (same probe as drop)
    from pyspark.sql.types import StructField

    new_schema = StructType(
        [
            StructField(new, f.dataType, f.nullable)
            if f.name == old
            else f
            for f in schema.fields
        ]
    )
    for cname, cexpr in sorted(
        _constraint_exprs(man.get("props")).items()
    ):
        probe = spark.createDataFrame([], new_schema)
        try:
            probe.select(F.expr(cexpr))  # analysis-only, no job
        except Exception:
            raise ValueError(
                f"cannot rename column {old!r}: CHECK constraint "
                f"{cname!r} ({cexpr}) references it — drop the "
                "constraint and re-add it against the new name"
            ) from None
    # the frozen physical name: whatever ``old`` already mapped to
    # (identity if never renamed). A rename chain a→b→c keeps ONE
    # mapping c→a; renaming back to the physical name erases it.
    phys = cmap.pop(old, old)
    if new != phys:
        cmap[new] = phys
    return _commit(
        spark,
        path,
        man["files"],
        new_schema,
        "rename_column",
        latest,
        extra={
            "altered_column": new,
            "renamed_from": old,
            **(
                {"stats": man["stats"], "stats_cols": man.get("stats_cols")}
                if man.get("stats") is not None
                else {}
            ),
        },
        partition_cols=_manifest_partition_cols(man),
        dv_files=man.get("dv_files"),
        dv_targets=_dv_targets_for(man),
        colmap=cmap or None,
    )


def _is_widening(cur, new) -> bool:
    """Whether every value of type ``cur`` is exactly representable as
    ``new`` — the lossless type promotions (the Iceberg v2 set):
    integer chain byte→short→int→long, float→double, and decimal
    precision growth at the SAME scale. Anything else (narrowing,
    cross-family, scale changes, string↔numeric) refuses — the read
    path pins the MANIFEST's types, so a non-widening alter would
    silently corrupt or null old files' values at scan time."""
    from pyspark.sql.types import (
        ByteType,
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
    )

    ints = [ByteType(), ShortType(), IntegerType(), LongType()]
    if cur in ints and new in ints:
        return ints.index(cur) < ints.index(new)
    if cur == FloatType() and new == DoubleType():
        return True
    if isinstance(cur, DecimalType) and isinstance(new, DecimalType):
        return new.scale == cur.scale and new.precision > cur.precision
    return False


def snapshot_widen_column(
    spark: SparkSession, path: str, name: str, new_type
) -> int:
    """METADATA-ONLY ``ALTER TABLE ALTER COLUMN TYPE`` for LOSSLESS
    promotions (``_is_widening``): publish the same files under a
    schema whose field ``name`` has the wider type — zero data bytes
    move at any table size. Safe because every explicit-list reader
    casts scans to the MANIFEST's types already (the documented
    widened-history path; long-history flat reads detect the mixed
    footers and keep the per-commit cast): old files' narrow values
    read back widened, new writers store the wide type natively.
    Recorded min/max stats stay valid verbatim (numbers compare
    numerically in the stats image); equality-delete sidecars keyed on
    the column keep matching (the read-side key join upcasts the
    narrow sidecar). Partition columns widen too — their values are
    directory strings cast at read. Time travel below the alter reads
    the narrow type. Returns the new version.

    Caveat shared with every engine's type promotion: a SATELLITE
    index that recorded the narrow key type (Bloom ``key_type``)
    fails loudly on its next sync over wide-typed files — rebuild it.
    """
    from pyspark.sql.types import StructField, _parse_datatype_string

    if isinstance(new_type, str):
        new_type = _parse_datatype_string(new_type)
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    latest = versions[-1]
    man = _load_manifest(spark, path, latest)
    schema = StructType.fromJson(man["schema"])
    fields = {f.name: f for f in schema.fields}
    if name not in fields:
        raise ValueError(f"column {name!r} does not exist at {path}")
    cur = fields[name].dataType
    if cur == new_type:
        raise ValueError(
            f"column {name!r} already has type {cur.simpleString()}"
        )
    if not _is_widening(cur, new_type):
        raise ValueError(
            f"cannot alter column {name!r} from {cur.simpleString()} to "
            f"{new_type.simpleString()} — only lossless widenings are "
            "metadata-only (byte→short→int→long, float→double, decimal "
            "precision growth at the same scale); anything else needs "
            "a rewrite (add + backfill + drop, or snapshot_write "
            "overwrite)"
        )
    new_schema = StructType(
        [
            StructField(name, new_type, f.nullable)
            if f.name == name
            else f
            for f in schema.fields
        ]
    )
    # CHECK constraints must still analyze against the widened schema
    # (type-specific expressions can break — refuse up front, like the
    # other alters)
    for cname, cexpr in sorted(
        _constraint_exprs(man.get("props")).items()
    ):
        probe = spark.createDataFrame([], new_schema)
        try:
            probe.select(F.expr(cexpr))  # analysis-only, no job
        except Exception:
            raise ValueError(
                f"cannot widen column {name!r}: CHECK constraint "
                f"{cname!r} ({cexpr}) does not analyze against the "
                "widened schema — drop and re-add it first"
            ) from None
    return _commit(
        spark,
        path,
        man["files"],
        new_schema,
        "widen_column",
        latest,
        extra={
            "altered_column": name,
            "widened_from": cur.simpleString(),
            "widened_to": new_type.simpleString(),
            **(
                {"stats": man["stats"], "stats_cols": man.get("stats_cols")}
                if man.get("stats") is not None
                else {}
            ),
        },
        partition_cols=_manifest_partition_cols(man),
        dv_files=man.get("dv_files"),
        dv_targets=_dv_targets_for(man),
    )


def snapshot_set_layout(
    spark: SparkSession, path: str, partition_cols: list[str] | None
) -> int:
    """METADATA-ONLY PARTITION EVOLUTION (the Iceberg partition-spec-
    evolution idea, re-expressed for this manifest log): publish the
    same files under a NEW partition layout that applies to FUTURE
    commits only — zero data bytes move at any table size, where a
    repartition-by-rewrite of a 100 TB table would copy all of it.
    Returns the new version.

    Existing files keep their directory layout and stay readable
    forever: the explicit-list reader groups files per commit dir with
    its own ``basePath``, so heterogeneous layouts union cleanly (an
    old file surfaces the new layout's column from its DATA pages, a
    new file from its directories). ``snapshot_compact`` migrates old
    files physically whenever wanted — full compaction restores a
    single-layout table.

    While layouts are mixed (old files not yet compacted), every
    surface stays EXACT, never silently partial:

    - partition-scoped reads / counts split the file list — directory-
      encoded files prune as always, unmigrated files read with a
      row-level residual filter (``_partition_residual_cond``);
    - metadata-only ops that must PROVE predicates from directories
      alone refuse loudly (``snapshot_drop_partitions``,
      partition-scoped feeds — ``_partition_pruned_files`` mode
      "raise") or fall back automatically (the DELETE front door's
      partition fast path steps aside to the data paths);
    - ``snapshot_replace_partitions`` keeps its existing fail-fast
      (carried files are classified by directory, unclassifiable files
      raise with a compact-first message);
    - DML victim planning keeps its no-false-negatives contract
      (unmigrated files stay candidates — mode "include");
    - whole-file proofs never fire without the directory (mode
      "exclude").

    Refusals: unknown columns; renamed columns or physical slots of
    renames (partition directories are physical names — the
    logical==physical invariant for layout columns is what keeps every
    predicate surface simple); columns with an INITIAL default (an
    old file has no physical values to prune by, and the write path's
    dir values would disagree with the read-time fill); reserved
    ``_dv_*`` names; a no-op layout."""
    versions = _list_manifests(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    latest = versions[-1]
    man = _load_manifest(spark, path, latest)
    schema = StructType.fromJson(man["schema"])
    names = {f.name for f in schema.fields}
    want = list(partition_cols) if partition_cols else None
    if want is not None:
        if len(set(want)) != len(want):
            raise ValueError(f"duplicate layout column in {want}")
        unknown = [c for c in want if c not in names]
        if unknown:
            raise ValueError(
                f"layout column(s) {unknown} not in table schema"
            )
        bad_dv = [c for c in want if c in _DV_COLS]
        if bad_dv:
            raise ValueError(f"column name(s) {bad_dv} are reserved")
        cmap = _colmap(man)
        taken = {p: l for l, p in cmap.items()}
        renamed = [
            c for c in want if cmap.get(c, c) != c or c in taken
        ]
        if renamed:
            raise ValueError(
                f"layout column(s) {renamed} carry rename history "
                "(partition directories are physical names) — rewrite "
                "the table (snapshot_write overwrite / snapshot_compact)"
                " to shed the rename first"
            )
        dflts = man.get("defaults") or {}
        defaulted = [c for c in want if c in dflts]
        if defaulted:
            raise ValueError(
                f"layout column(s) {defaulted} have an INITIAL default "
                "— pre-add files have no physical values to lay out or "
                "prune by; compact first to materialize the default"
            )
    if (_manifest_partition_cols(man) or None) == (want or None):
        raise ValueError(
            f"layout is already {want or 'unpartitioned'} at {path}"
        )
    return _commit(
        spark,
        path,
        man["files"],
        schema,
        "set_layout",
        latest,
        extra={
            "layout_from": _manifest_partition_cols(man),
            "layout_to": want,
            **(
                {"stats": man["stats"], "stats_cols": man.get("stats_cols")}
                if man.get("stats") is not None
                else {}
            ),
        },
        partition_cols=want,
        dv_files=man.get("dv_files"),
        dv_targets=_dv_targets_for(man),
    )


def _victim_bytes(
    spark: SparkSession, path: str, predicates: dict,
    discount_full_match: bool = False,
    man: dict | None = None,
) -> int:
    """Total on-disk bytes of the stats-selected victim files for the
    conjunctive ``predicates`` — what a copy-on-write DML would
    rewrite. Metadata-only; file sizes fan out to executors in batches
    past a small count (``_file_bytes_total``), so even the
    stats-can't-exclude-anything case (stats-less table, un-statted
    column — every file a victim) is one parallel stat job, and a
    genuinely SMALL table still gets its cheap join-free rewrite
    under the threshold instead of being forced onto tombstones.

    ``discount_full_match``: exclude files whose every row provably
    matches from the dv-vs-rewrite TIPPING estimate. For a delete they
    rewrite for FREE (dropped by reference). For an update they cost
    the SAME under both strategies — every row needs a new image
    either way, and merge-on-read additionally writes one tombstone
    per row and leaves the dead bytes in place until compact — so
    counting them would tip a clustered-key mass update onto the
    strictly worse DV path. Only boundary files, where matches mix
    with rows DV avoids rewriting, genuinely differentiate the
    strategies."""
    predicates = _sanitize_predicates(predicates)
    if not predicates:  # some column all-None: nothing can match
        return 0
    if man is None:  # callers with the head manifest in hand pass it
        versions = _list_manifests(spark, path)
        if not versions:
            raise FileNotFoundError(f"no snapshot versions at {path}")
        man = _load_manifest(spark, path, versions[-1])
    victims, _carried = _victims_by_stats_where(man, predicates)
    if discount_full_match:
        full = set(_full_match_files_where(man, predicates))
        victims = [f for f in victims if f not in full]
    return _file_bytes_total(spark, _root(path), victims)
