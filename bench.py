"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE SHORT JSON line as the FINAL stdout line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...22...},
   "sf": ..., "n_queries": ...}

The `queries` dict on stdout contains ONLY the 22 headline timings so the
line stays well under any tail-capture limit (round 2's single line with
all 104 timings overflowed the driver's capture and parsed as null). The
FULL per-query timing dict for the whole catalog is written to
BENCH_DETAIL.json next to this script — that file is the in-repo
round-over-round regression baseline.

Each query is executed to completion (count() action drains the full
plan) after a warm-up pass of the session. Wall clock per query, plus the
end-to-end total as the headline value.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nyc_taxi_data_warehouse_spark.queries import QUERIES  # noqa: E402
from nyc_taxi_data_warehouse_spark.session import get_spark  # noqa: E402

# Headline set: the heavy/representative queries (joins, aggs, windows,
# text, dedup, similarity). Cheap point-lookups are excluded — they
# measure session overhead, not the engine.
HEADLINE = [
    "q01_pricing_summary",
    "q02_top_customers",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q07_brand_volume",
    "q10_top_orders_per_customer",
    "q13_rollup_returns",
    "q20_hourly_events",
    "q21_sessionize",
    "w01_sliding_event_rates",
    "a01_asof_purchase_view",
    "a02_range_join_bursts",
    "t02_quality_scores",
    "d03_minhash_lsh_pairs",
    "d06_embedding_near_dup",
    "e01_cosine_topk",
    "e05_ann_topk_probe",
    "m02_media_decode_features",
    "q33_explode_part_words",
    "q36_weighted_avg_udaf",
    "q38_salted_supplier_revenue",
    "w03_stateful_user_totals",
]
# NOTE: kept identical to round 1's 22-query set so the headline total
# stays a round-over-round regression signal; newer heavy queries (e08,
# e09, d08, k01/k02, p01) are timed in the full-catalog dict below.


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Headline queries run FIRST (same conditions as round 1's
    # 22-query-only bench) so the headline total stays a round-over-round
    # regression signal; the rest of the catalog follows.
    names = [n for n in HEADLINE if n in QUERIES] + [
        n for n in QUERIES if n not in HEADLINE
    ]
    extra = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if extra:
        names = [n for n in extra.split(",") if n in QUERIES]

    # Warm up whole-stage codegen for EVERY timed plan on tiny data
    # (sf0.001): several operators generate very large codegen units
    # (multi-table LSH bucket expressions, 8-way md5 min-agg windows,
    # streaming state machinery) whose first-call JIT dwarfs their
    # execution at bench scale. Timing after a uniform warm-up measures
    # the plan — the thing that scales — not JVM classloading.
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        QUERIES[name].spark(spark, warm_dir).count()

    # Min-of-2 at the target SF: single-pass wall times on a shared VM
    # swing 2-4 s per query from GC luck; the min is the low-noise
    # estimate of steady-state plan execution.
    timings: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name].spark(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    headline = [n for n in HEADLINE if n in timings] or list(timings)
    total = round(sum(timings[n] for n in headline), 3)

    # Full catalog timings -> file artifact (too big for a stdout line).
    # A SPARK_GRAFT_BENCH_QUERIES-filtered run is a spot check — don't
    # clobber the committed full-catalog baseline with a partial dict.
    detail_name = "BENCH_DETAIL.json" if not extra else "BENCH_DETAIL_partial.json"
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name
    )
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "queries": timings,
            },
            f,
            indent=1,
            sort_keys=True,
        )

    # Short final stdout line: headline timings only (~22 entries).
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": {n: timings[n] for n in headline},
                "sf": sf,
                "n_queries": len(timings),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
