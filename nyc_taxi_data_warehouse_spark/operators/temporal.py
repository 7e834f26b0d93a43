"""Temporal join operators Spark lacks as built-ins: as-of join and
bounded range join — implemented as shuffle-efficient compositions, not
cross joins.

- ``asof_join``: the classic time-series "latest right row at or before
  each left row" join. Implementation: union the two sides tagged, one
  window pass per key ordered by time (last_value of the right side's
  payload over preceding rows), then keep left rows. ONE shuffle on the
  key — same cost as a groupBy — versus the naive range-join (equi-join
  then filter+argmax) which explodes |L|x|R| per key.
- ``range_join``: pairs within a bounded time distance. Implementation:
  coarse time-bucketing (bucket width = bound) so each left row joins
  only its own and adjacent buckets — the standard interval-join
  pattern; the equi-join on (key, bucket) is hash-shuffled, never a
  cartesian product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts (per ``on`` key); optionally bounded by
    ``tolerance`` (an INTERVAL string, e.g. ``'2 hours'``).

    Output: all left columns + right_cols (null when no match).
    Ties on equal timestamps resolve to the right row (<=, like
    DuckDB/pandas ``merge_asof`` with allow_exact_matches). When SEVERAL
    right rows share the matching timestamp, the one with the greatest
    ``right_cols`` tuple wins — a deterministic, data-defined tie-break
    (engines differ arbitrarily here: DuckDB ASOF picks an unspecified
    row). The matched right row is taken atomically (one struct), never
    column-mixed across rows when payload fields are null.
    """
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rt = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("_ts"),
            *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        )
        .withColumn("_side", F.lit(0))
    )
    lt_cols = [c for c in left.columns]
    unioned = lt.unionByName(rt, allowMissingColumns=True)

    # right rows sort before left rows at the same _ts (side 0 < 1):
    # an exact-timestamp right match is visible to the left row. The
    # trailing _r_* keys make the order total when right timestamps
    # collide (left rows carry nulls there, which is irrelevant — _side
    # already separates them).
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side", *[f"_r_{c}" for c in right_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # One struct per right row → last() picks the whole matched row
    # atomically; per-column last(ignorenulls) would stitch fields from
    # different rows whenever the latest match has a null field.
    match = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col("_ts").alias("_m_ts"),
            *[F.col(f"_r_{c}").alias(c) for c in right_cols],
        ),
    )
    filled = (
        unioned.withColumn("_m", F.last(match, ignorenulls=True).over(w))
        .withColumns({f"_m_{c}": F.col(f"_m.{c}") for c in right_cols})
        .withColumn("_m_ts", F.col("_m._m_ts"))
    )

    out = filled.where(F.col("_side") == 1)
    if tolerance is not None:
        within = F.col("_m_ts") >= F.col("_ts") - F.expr(f"INTERVAL {tolerance}")
        out = out.withColumns(
            {f"_m_{c}": F.when(within, F.col(f"_m_{c}")) for c in right_cols}
        ).withColumn("_m_ts", F.when(within, F.col("_m_ts")))
    return out.select(
        *lt_cols,
        *[F.col(f"_m_{c}").alias(c) for c in right_cols],
        F.col("_m_ts").alias("matched_ts"),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    bound: str,
    bound_seconds: int,
) -> DataFrame:
    """All (left, right) pairs with |left_ts - right_ts| <= bound,
    equi-matched on ``on``. Bucketed: each side is assigned
    floor(epoch/bound) buckets; candidates come from bucket b-1..b+1
    only, then the exact predicate filters. Join keys (on, bucket) are
    hash-distributed — no per-key quadratic blow-up unless the data
    itself is quadratic within the bound.
    """
    def bucketed(df: DataFrame, ts: str, explode_neighbors: bool) -> DataFrame:
        b = F.floor(F.unix_micros(F.col(ts).cast("timestamp")) / (bound_seconds * 1_000_000))
        if explode_neighbors:
            return df.withColumn(
                "_bucket", F.explode(F.array(b - 1, b, b + 1))
            )
        return df.withColumn("_bucket", b)

    lt = bucketed(left, left_ts, explode_neighbors=False)
    rt = bucketed(right, right_ts, explode_neighbors=True)
    cond = (
        F.abs(
            F.unix_micros(F.col(left_ts).cast("timestamp"))
            - F.unix_micros(F.col(right_ts).cast("timestamp"))
        )
        <= bound_seconds * 1_000_000
    )
    return lt.join(rt, on=[on, "_bucket"]).where(cond).drop("_bucket")
