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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _us(col: Column) -> Column:
    """Epoch microseconds — full precision, tz-shift cancels in deltas."""
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the closest right row per ``on`` key:

    - ``backward`` (default): most recent right_ts <= left_ts
    - ``forward``: earliest right_ts >= left_ts
    - ``nearest``: whichever of the two is closer in absolute time
      (exact ties resolve backward) — computed in the SAME single
      shuffle (two window frames over one key-partitioned sort family)

    ``tolerance`` (an INTERVAL string, e.g. ``'2 hours'``) bounds the
    match distance in the chosen direction(s).

    Output: all left columns + right_cols (null when no match).
    Exact-timestamp right rows match in every direction (<= / >=, like
    DuckDB/pandas ``merge_asof`` with allow_exact_matches). When SEVERAL
    right rows share the matching timestamp, backward picks the greatest
    ``right_cols`` tuple and forward the least — deterministic,
    data-defined tie-breaks (engines differ arbitrarily here: DuckDB
    ASOF picks an unspecified row). The matched right row is taken
    atomically (one struct), never column-mixed across rows when payload
    fields are null.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction!r}")
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

    # Backward frame: right rows sort before left rows at the same _ts
    # (side 0 < 1), so an exact-timestamp right match is visible in the
    # preceding-rows frame. Forward frame mirrors it: left before right
    # at equal _ts, following-rows frame. The trailing _r_* keys make
    # each order total when right timestamps collide (left rows carry
    # nulls there, which is irrelevant — _side already separates them).
    rk = [f"_r_{c}" for c in right_cols]
    w_back = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side", *rk)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").desc(), *rk)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # One struct per right row → last()/first() picks the whole matched
    # row atomically; per-column last(ignorenulls) would stitch fields
    # from different rows whenever the latest match has a null field.
    match = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col("_ts").alias("_m_ts"),
            *[F.col(f"_r_{c}").alias(c) for c in right_cols],
        ),
    )
    picks: dict[str, Column] = {}
    if direction in ("backward", "nearest"):
        picks["_mb"] = F.last(match, ignorenulls=True).over(w_back)
    if direction in ("forward", "nearest"):
        picks["_mf"] = F.first(match, ignorenulls=True).over(w_fwd)
    filled = unioned.withColumns(picks)
    if direction == "nearest":
        back_d = _us(F.col("_ts")) - _us(F.col("_mb._m_ts"))
        fwd_d = _us(F.col("_mf._m_ts")) - _us(F.col("_ts"))
        chosen = (
            F.when(F.col("_mb").isNull(), F.col("_mf"))
            .when(F.col("_mf").isNull(), F.col("_mb"))
            .when(fwd_d < back_d, F.col("_mf"))
            .otherwise(F.col("_mb"))  # ties resolve backward
        )
    else:
        chosen = F.col("_mb") if direction == "backward" else F.col("_mf")
    filled = (
        filled.withColumn("_m", chosen)
        .withColumns({f"_m_{c}": F.col(f"_m.{c}") for c in right_cols})
        .withColumn("_m_ts", F.col("_m._m_ts"))
    )

    out = filled.where(F.col("_side") == 1)
    if tolerance is not None:
        iv = F.expr(f"INTERVAL {tolerance}")
        within = (F.col("_m_ts") >= F.col("_ts") - iv) & (
            F.col("_m_ts") <= F.col("_ts") + iv
        )
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
