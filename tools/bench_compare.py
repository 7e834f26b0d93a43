"""Diff two BENCH_DETAIL.json artifacts: per-query deltas, sorted by
regression size. Usage:

    python tools/bench_compare.py OLD.json NEW.json [--min-sec 0.3]

Prints queries slower/faster than a 20% band (ignoring sub-min-sec
timings, which are session-overhead noise at bench scale), then the
headline totals. Exit code 1 if any regression exceeds 50% — handy as a
pre-commit perf gate after touching a hot operator.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--min-sec", type=float, default=0.3)
    args = ap.parse_args()

    old = json.load(open(args.old))
    new = json.load(open(args.new))
    t_old, t_new = old["queries"], new["queries"]

    common = sorted(set(t_old) & set(t_new))
    slower, faster = [], []
    for q in common:
        a, b = t_old[q], t_new[q]
        if max(a, b) < args.min_sec:
            continue
        if b > a * 1.2:
            slower.append((b / a, q, a, b))
        elif b < a * 0.8:
            faster.append((b / a, q, a, b))

    for title, rows in (("SLOWER", sorted(slower, reverse=True)),
                        ("FASTER", sorted(faster))):
        print(f"{title} ({len(rows)}):")
        for ratio, q, a, b in rows:
            print(f"  {ratio:5.2f}x  {q}: {a:.2f} -> {b:.2f} s")

    print(
        f"headline: {old.get('value')} -> {new.get('value')} s "
        f"({len(common)} common / {len(t_old)} old / {len(t_new)} new queries)"
    )
    only_old = set(t_old) - set(t_new)
    only_new = set(t_new) - set(t_old)
    if only_old:
        print("dropped:", ", ".join(sorted(only_old)))
    if only_new:
        print("added:", ", ".join(sorted(only_new)))

    return 1 if any(r >= 1.5 for r, *_ in slower) else 0


if __name__ == "__main__":
    sys.exit(main())
