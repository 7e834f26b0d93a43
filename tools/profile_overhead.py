"""Measure per-query FIXED overhead: plan construction vs execution.

Usage: python tools/profile_overhead.py [sf_dir] [name ...]

For each query: t_build (calling the builder — py4j expression
construction, load_table/tune, analysis is lazy), t_exec (.count()).
Also micro-times tune() and spark.read.parquet schema inference.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_data_warehouse_spark.queries import QUERIES  # noqa: E402
from nyc_taxi_data_warehouse_spark.session import get_spark, tune  # noqa: E402

SAMPLE = [
    "q01_pricing_summary", "q02_top_customers", "q20_hourly_events",
    "q33_explode_part_words", "t02_quality_scores", "a01_asof_purchase_view",
    "e01_cosine_topk", "q36_weighted_avg_udaf",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or SAMPLE
    spark = get_spark(app_name="profile_overhead")
    spark.sparkContext.setLogLevel("ERROR")

    # micro: tune() repeated
    t0 = time.perf_counter()
    for _ in range(10):
        tune(spark)
    print(f"tune() x10: {time.perf_counter() - t0:.3f}s")

    # micro: read.parquet schema inference repeated
    p = os.path.join(sf_dir, "orders.parquet")
    spark.read.parquet(p).schema  # warm FS caches
    t0 = time.perf_counter()
    for _ in range(10):
        spark.read.parquet(p)
    print(f"read.parquet x10: {time.perf_counter() - t0:.3f}s")

    # warm all plans once
    for n in names:
        QUERIES[n].spark(spark, "/root/testdata/sf0.001").count()

    for n in names:
        tb = te = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = QUERIES[n].spark(spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            tb = t1 - t0 if tb is None else min(tb, t1 - t0)
            te = t2 - t1 if te is None else min(te, t2 - t1)
        print(f"{n:32s} build={tb:.3f}s exec={te:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
