"""Cluster-aware train/val/test splitting — the leakage-proof form.

The catalog's t05 splits by a hash of the DOCUMENT id: deterministic
and engine-portable, but two near-duplicate documents hash
independently, so a train doc's near-twin can land in test — exactly
the contamination that inflates eval numbers. The fix every serious
pipeline applies: split by the hash of the near-dup CLUSTER id, so a
whole duplicate cluster moves as one unit and no near-dup pair can
ever straddle a split boundary.

Composition of verified primitives: pair generation (``minhash_lsh_
pairs`` / ``simhash_pairs`` / embedding near-dup) → ``dup_clusters``
(transitive closure, min-id canonical label) → hash-bucket the label.
Singleton documents (no near-dup) keep their own id as the label, so
the assignment stays a pure function of corpus content — re-running on
any partitioning or cluster shape yields the same split.

Scale shape: one left join of docs against the (small — only clustered
docs) label table, then the same md5-bucket projection t05 uses. The
fractions are honored in expectation per CLUSTER, as they must be —
exact per-document fractions are impossible once documents move in
groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_aware_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    fractions: dict[str, int] | None = None,
) -> DataFrame:
    """Assign every document a split such that both ends of every
    near-dup pair (and transitively, every member of a dup cluster)
    land in the SAME split.

    ``pairs``: near-dup pairs ``(id_a, id_b, ...)`` from any generator.
    ``fractions``: ordered {split_name: percent}, default
    ``{"train": 80, "val": 10, "test": 10}`` (must sum to 100).
    Returns ``docs`` + ``split_key`` (the cluster label) + ``split``.
    """
    from .dedup import dup_clusters

    fractions = fractions or {"train": 80, "val": 10, "test": 10}
    if sum(fractions.values()) != 100:
        raise ValueError(f"fractions must sum to 100: {fractions}")

    labels = dup_clusters(pairs).withColumnsRenamed(
        {"id": id_col, "cluster_id": "_cluster"}
    )
    labeled = docs.join(labels, id_col, "left").withColumn(
        "split_key", F.coalesce(F.col("_cluster"), F.col(id_col))
    ).drop("_cluster")

    bucket = (
        F.conv(F.substring(F.md5(F.col("split_key").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    expr = None
    lo = 0
    for name, pct in fractions.items():
        cond = bucket < F.lit(lo + pct)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return labeled.withColumn("split", expr)


def temporal_split(
    df: DataFrame,
    time_col: str,
    val_start,
    test_start,
    purge_gap=None,
) -> DataFrame:
    """Time-based train/val/test split with optional PURGE GAPS — the
    standard leakage control for temporally-correlated data (events,
    market ticks, logs): random/hash splits let the model see the
    future of its own evaluation window, so the split must be by time,
    and rows within ``purge_gap`` BEFORE each boundary are dropped
    entirely so trailing-window features computed on train rows cannot
    overlap the next split's period (the "purged" split of the
    time-series CV literature).

    Returns the rows with a ``split`` column (``train``/``val``/
    ``test``); purged rows are REMOVED, not labeled, and NULL
    timestamps are dropped too (a row that cannot be placed in time
    cannot be proven leak-free). ``val_start``/``test_start`` are
    anything comparable to ``time_col`` after a cast-free comparison
    (timestamps, dates, epoch numbers); ``purge_gap`` is a
    ``pyspark.sql`` interval-compatible expression string (e.g.
    ``"INTERVAL 1 HOUR"``) or a number for numeric time columns.

    Narrow projection + filter: zero shuffles, trivially scale-safe.
    """
    if not val_start < test_start:
        # swapped boundaries would silently make the 'val' branch
        # unreachable (every pre-test row labels train) and purge the
        # wrong windows — a leakage-control utility must not fail quiet
        raise ValueError(
            f"val_start ({val_start!r}) must be < test_start "
            f"({test_start!r})"
        )
    t = F.col(time_col)
    v, s = F.lit(val_start), F.lit(test_start)
    if purge_gap is None:
        in_purge = F.lit(False)
    else:
        g = (
            F.expr(purge_gap)
            if isinstance(purge_gap, str)
            else F.lit(purge_gap)
        )
        in_purge = ((t >= v - g) & (t < v)) | ((t >= s - g) & (t < s))
    return (
        df.where(t.isNotNull() & ~in_purge)
        .withColumn(
            "split",
            F.when(t < v, "train").when(t < s, "val").otherwise("test"),
        )
    )
