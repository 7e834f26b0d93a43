"""Decompose minhash_lsh_pairs (d03) into stage timings with the noop sink.

Usage: python tools/profile_minhash.py [sf_dir]

Times, each as min-of-2 after a warm-up at sf0.001:
  sig    — minhash_signatures only
  bucket — signatures -> band_key_buckets (incl. skew-guard window)
  cand   — ... -> distinct candidate pairs
  full   — whole minhash_lsh_pairs (verify join included)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nyc_taxi_data_warehouse_spark.operators import dedup as D  # noqa: E402
from nyc_taxi_data_warehouse_spark.session import get_spark  # noqa: E402
from nyc_taxi_data_warehouse_spark.sources import load_table  # noqa: E402

N_HASHES, BANDS, SHINGLE_K = 8, 4, 3


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def stage_sig(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return D.minhash_signatures(d, "text", "doc_id", N_HASHES, SHINGLE_K)


def stage_buckets(spark, sf_dir):
    sig = stage_sig(spark, sf_dir)
    from pyspark.sql.window import Window

    b = D.band_key_buckets(sig, N_HASHES, BANDS)
    bw = Window.partitionBy("band_idx", "key")
    return (
        b.withColumn("_n", F.count("*").over(bw))
        .where(F.col("_n") <= 1000)
        .drop("_n")
    )


def stage_cand(spark, sf_dir):
    buckets = stage_buckets(spark, sf_dir)
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def stage_full(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(
        d, "text", "doc_id", n_hashes=N_HASHES, bands=BANDS,
        shingle_k=SHINGLE_K, jaccard_threshold=0.1,
    )


STAGES = {
    "sig": stage_sig,
    "bucket": stage_buckets,
    "cand": stage_cand,
    "full": stage_full,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="profile_minhash")
    spark.sparkContext.setLogLevel("ERROR")
    warm = "/root/testdata/sf0.001"
    for name, fn in STAGES.items():
        noop(fn(spark, warm))
    for name, fn in STAGES.items():
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            noop(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:8s} {best:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
