"""Deterministic sampling operators for corpus curation.

Complements the rate-based stratified downsampling already in the
catalog (t06: keep X% of each stratum): these are the COUNT-exact
samplers a training-data pipeline needs when the deliverable is "exactly
N documents, mixed 60/30/10 across domains" rather than "roughly X% of
each".

Everything is deterministic by construction — randomness comes from
``xxhash64(id, seed)``, a pure function of the row — so re-running on a
different cluster size, partitioning, or engine version selects the
SAME rows (Spark's ``sample``/``sampleBy``/``rand`` are partition-order
dependent and unsuitable for reproducible corpus builds).

No counterpart anywhere in the reference (its pipeline ships whole
months; ``/root/reference/data/airflow/dags/save_nyc_data_to_s3.py``
has no sampling of any kind).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# xxhash64 output folded into (0, 1): |h| / 2^63 lands in [0, 1); the
# +1/+2 shift keeps the endpoints open so ln(u) below is always finite.
_M = float(1 << 63)


def _hash_uniform(id_col: str, seed: int):
    h = F.abs(F.xxhash64(F.col(id_col), F.lit(seed)))
    return (h.cast("double") + F.lit(1.0)) / F.lit(_M + 2.0)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Weighted random sample WITHOUT replacement of exactly ``k`` rows
    (fewer iff the input is smaller): Efraimidis–Spirakis A-ES — each
    row draws ``u`` from its id hash and scores ``ln(u) / w``; the k
    largest scores win. Inclusion probability is proportional to
    ``weight_col`` (quality scores, dedup-cluster sizes, domain boosts).

    Scale shape: score is a narrow per-row expression and the selection
    is ``orderBy(score desc).limit(k)`` — Spark plans TakeOrdered: each
    partition keeps its local top-k, only ``partitions x k`` candidate
    rows reach the driver-side merge; there is NO global sort and NO
    full shuffle at any scale. Non-positive weights are excluded
    (ln(u)/w flips sign), matching the "weight 0 = never sample"
    contract.
    """
    u = _hash_uniform(id_col, seed)
    w = F.col(weight_col).cast("double")
    score = F.log(u) / w
    return (
        df.where(w > 0)
        .withColumn("_score", score)
        .orderBy(F.col("_score").desc())
        .limit(k)
        .drop("_score")
    )


def apportion(weights: dict[str, float], n_total: int) -> dict[str, int]:
    """Largest-remainder apportionment of ``n_total`` slots across
    domains proportional to ``weights`` — the exact integer split whose
    counts sum to ``n_total`` (plain rounding can be off by several).
    Driver-side arithmetic over the tiny domain map."""
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("mixture weights must sum to a positive value")
    quotas = {d: n_total * w / total_w for d, w in weights.items()}
    counts = {d: int(q) for d, q in quotas.items()}
    leftover = n_total - sum(counts.values())
    by_remainder = sorted(
        quotas, key=lambda d: (quotas[d] - counts[d], d), reverse=True
    )
    for d in by_remainder[:leftover]:
        counts[d] += 1
    return counts


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    n_total: int,
    id_col: str,
    seed: int = 0,
    salt_partitions: int = 32,
) -> DataFrame:
    """Exactly ``n_total`` rows mixed across domains per ``weights``
    (e.g. ``{"web": 6, "code": 3, "books": 1}`` → 60/30/10): the
    training-mixture materialization step. Per-domain quotas come from
    ``apportion``; within a domain, selection is the deterministic
    hash order (uniform — combine with ``weighted_sample`` upstream for
    quality-weighted picks). Domains absent from ``weights`` are
    dropped; a domain smaller than its quota contributes everything it
    has (the shortfall is NOT redistributed — mixtures are contracts,
    silently substituting domains would corrupt them).

    Scale shape — two-phase per-domain top-k, never one-task-per-domain:
    a window over ``domain`` alone would funnel each domain's entire
    mass through a single task (a handful of domains = a handful of
    tasks at 100 TB). Instead phase 1 ranks within ``(domain,
    hash % salt_partitions)`` — uniform tasks — and keeps each salt's
    local top-quota, capping phase 2's input at ``salt_partitions x
    quota`` rows per domain; phase 2 ranks those survivors per domain.
    Both phases are plain hash-partitioned window shuffles.
    """
    quota_rows = [(d, int(q)) for d, q in apportion(weights, n_total).items()]
    quotas = F.broadcast(
        df.sparkSession.createDataFrame(quota_rows, f"{domain_col} string, _quota int")
    )
    u = _hash_uniform(id_col, seed)
    salted = (
        df.join(quotas, domain_col)
        .withColumn("_u", u)
        .withColumn("_salt", F.pmod(F.xxhash64(F.col(id_col), F.lit(seed + 1)), F.lit(salt_partitions)))
    )
    w1 = Window.partitionBy(domain_col, "_salt").orderBy("_u", id_col)
    phase1 = salted.withColumn("_rn", F.row_number().over(w1)).where(
        F.col("_rn") <= F.col("_quota")
    )
    w2 = Window.partitionBy(domain_col).orderBy("_u", id_col)
    return (
        phase1.withColumn("_rn2", F.row_number().over(w2))
        .where(F.col("_rn2") <= F.col("_quota"))
        .drop("_quota", "_u", "_salt", "_rn", "_rn2")
    )
