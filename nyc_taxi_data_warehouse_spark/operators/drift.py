"""Distribution-drift reporting between two corpus snapshots.

The standing question every data pipeline must answer before a new
batch joins the training corpus: does this month's data still look
like last month's? This operator reports, per numeric column, the
Population Stability Index over reference-derived quantile buckets —
the standard drift score (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25
shifted) — plus the per-bucket fractions so a drifted column is
diagnosable, not just flagged.

Scale shape: bucket boundaries come from ``approxQuantile`` on the
REFERENCE (driver-side metadata, n_buckets-1 doubles per column);
both snapshots then aggregate bucket counts in ONE pass each over all
columns (a single groupBy on (column, bucket) after a stack — map-side
combined, output is columns × buckets rows, metadata at any corpus
size). No join between the snapshots — two independent count
aggregates meet driver-side.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_counts(df: DataFrame, bounds: dict[str, list[float]]) -> dict:
    """{(col, bucket): count} over all columns in one aggregation pass.
    Bucket = number of boundaries <= value (nulls land in bucket -1)."""
    exprs = []
    for col, bs in bounds.items():
        arr = F.array(*[F.lit(float(b)) for b in bs])
        bucket = F.when(F.col(col).isNull(), F.lit(-1)).otherwise(
            F.aggregate(
                arr,
                F.lit(0),
                lambda acc, b: acc
                + F.when(F.col(col).cast("double") >= b, 1).otherwise(0),
            )
        )
        exprs.append(F.struct(F.lit(col).alias("c"), bucket.alias("b")))
    rows = (
        df.select(F.explode(F.array(*exprs)).alias("cb"))
        .groupBy("cb.c", "cb.b")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    return {(r["c"], r["b"]): r["n"] for r in rows}


def drift_report(
    reference: DataFrame,
    current: DataFrame,
    columns: list[str],
    n_buckets: int = 10,
) -> list[dict]:
    """One dict per column: ``{"column", "psi", "n_ref", "n_cur",
    "buckets": [{"bucket", "ref_frac", "cur_frac"}, ...]}`` sorted by
    descending PSI. Buckets are the reference's ``n_buckets`` quantile
    bins (so the reference is ~uniform across them by construction and
    the PSI measures the CURRENT snapshot's departure); empty fractions
    are floored at 1e-6, the standard PSI smoothing. The null bucket
    participates like any other — a null-rate shift is drift too."""
    bounds = {
        c: sorted(
            set(
                reference.select(F.col(c).cast("double").alias("_q"))
                .approxQuantile("_q", [i / n_buckets for i in range(1, n_buckets)], 0.001)
            )
        )
        for c in columns
    }
    ref_counts = _bucket_counts(reference, bounds)
    cur_counts = _bucket_counts(current, bounds)
    n_ref = sum(v for (c, _), v in ref_counts.items() if c == columns[0])
    n_cur = sum(v for (c, _), v in cur_counts.items() if c == columns[0])

    out = []
    for c in columns:
        buckets = sorted(
            {b for (cc, b) in ref_counts if cc == c}
            | {b for (cc, b) in cur_counts if cc == c}
        )
        psi = 0.0
        detail = []
        for b in buckets:
            rf = max(ref_counts.get((c, b), 0) / max(n_ref, 1), 1e-6)
            cf = max(cur_counts.get((c, b), 0) / max(n_cur, 1), 1e-6)
            psi += (cf - rf) * math.log(cf / rf)
            detail.append(
                {"bucket": b, "ref_frac": round(rf, 6), "cur_frac": round(cf, 6)}
            )
        out.append(
            {
                "column": c,
                "psi": round(psi, 6),
                "n_ref": n_ref,
                "n_cur": n_cur,
                "buckets": detail,
            }
        )
    return sorted(out, key=lambda d: -d["psi"])
