"""Measure what every catalog query actually MOVES: executed-plan
SQLMetrics (shuffle count, shuffle bytes/records written, spill) for all
104 entries, written to SHUFFLES.json. Usage:

    python tools/shuffle_audit.py [--sf-dir /root/testdata/sf0.01] \
        [--out SHUFFLES.json]

This is the measured companion to the plan-shape test suite: at 100 TB
the dominant cost of most queries is their shuffle volume, so the audit
pins it per query as a reviewable, diffable artifact. A regression run
(same SF, same shuffle_partitions) compares with:

    python tools/shuffle_audit.py --compare OLD.json NEW.json

which exits 1 if any query grew its shuffle COUNT (an Exchange crept in)
or >2x its shuffle bytes.

Caveats recorded in the artifact itself:
- queries that internally materialize (localCheckpoint/persist — the
  LSH/cluster/pipeline family) are metered only on their post-checkpoint
  plan; their internal shuffle structure is asserted by the plan tests.
- byte counts scale with --sf-dir and shuffle_partitions; only compare
  like with like.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_data_warehouse_spark.plans.audit import collect_with_metrics  # noqa: E402
from nyc_taxi_data_warehouse_spark.queries import QUERIES  # noqa: E402
from nyc_taxi_data_warehouse_spark.session import get_spark  # noqa: E402


def audit(sf_dir: str, out_path: str) -> dict:
    spark = get_spark(
        app_name="shuffle_audit",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '4')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "4")),
    )
    results: dict[str, dict] = {}
    for name, q in QUERIES.items():
        t0 = time.monotonic()
        try:
            m = collect_with_metrics(q.spark(spark, sf_dir))
            m["sec"] = round(time.monotonic() - t0, 3)
            results[name] = m
        except Exception as e:  # record, keep auditing
            results[name] = {"error": f"{type(e).__name__}: {e}"}
    doc = {
        "sf_dir": sf_dir,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "queries": results,
    }
    spark.stop()
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    total_shuffles = sum(
        r.get("n_shuffles", 0) for r in results.values() if "error" not in r
    )
    total_bytes = sum(
        r.get("shuffle_bytes_written", 0) for r in results.values() if "error" not in r
    )
    spilled = [n for n, r in results.items() if r.get("spill_bytes", 0) > 0]
    errs = [n for n, r in results.items() if "error" in r]
    print(
        f"{len(results)} queries: {total_shuffles} shuffles, "
        f"{total_bytes / 2**20:.1f} MiB shuffled, spills={spilled or 0}, "
        f"errors={errs or 0} -> {out_path}"
    )
    return doc


def compare(old_path: str, new_path: str) -> int:
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    rc = 0
    for name in sorted(set(old) & set(new)):
        a, b = old[name], new[name]
        if "error" in a or "error" in b:
            continue
        if b["n_shuffles"] > a["n_shuffles"]:
            print(
                f"REGRESSION {name}: shuffle count "
                f"{a['n_shuffles']} -> {b['n_shuffles']}"
            )
            rc = 1
        if b["shuffle_bytes_written"] > max(2 * a["shuffle_bytes_written"], 1 << 20):
            print(
                f"REGRESSION {name}: shuffle bytes "
                f"{a['shuffle_bytes_written']} -> {b['shuffle_bytes_written']}"
            )
            rc = 1
    return rc


def scaling(small_path: str, big_path: str, factor: float, slack: float = 1.5) -> int:
    """Cross-scale-factor linearity check: with ``factor``x the data,
    every query's shuffle bytes must grow at most ``factor * slack``x.
    Super-linear shuffle growth is the classic silent scale-killer (a
    join that degenerates toward pairwise, a lost partial aggregation);
    this makes it a measured, failing check instead of a design hope.
    Tiny fixed-size shuffles (<4 KiB at the small SF — metadata-like
    single-row aggregates) are exempt, their growth is all constant
    overhead."""
    small = json.load(open(small_path))["queries"]
    big = json.load(open(big_path))["queries"]
    rc = 0
    worst = (0.0, None)
    for q in sorted(set(small) & set(big)):
        a, b = small[q], big[q]
        if "error" in a or "error" in b or a["shuffle_bytes_written"] < 4096:
            continue
        ratio = b["shuffle_bytes_written"] / a["shuffle_bytes_written"]
        worst = max(worst, (ratio, q))
        if ratio > factor * slack:
            print(
                f"SUPER-LINEAR {q}: {ratio:.1f}x shuffle bytes on {factor}x data"
            )
            rc = 1
    print(f"worst growth: {worst[1]} at {worst[0]:.1f}x (budget {factor * slack}x)")
    return rc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="SHUFFLES.json")
    ap.add_argument("--compare", nargs=2, metavar=("OLD", "NEW"))
    ap.add_argument("--scaling", nargs=2, metavar=("SMALL", "BIG"))
    ap.add_argument("--factor", type=float, default=10.0, help="data ratio BIG/SMALL")
    args = ap.parse_args()
    if args.compare:
        return compare(*args.compare)
    if args.scaling:
        return scaling(*args.scaling, args.factor)
    audit(args.sf_dir, args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
