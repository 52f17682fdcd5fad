#!/usr/bin/env python3
"""Per-query scaling report between two graft.Bench JSON lines (e.g.
sf0.1 vs the GenScale sf1 mirror, same cpus): prints time ratios sorted
worst-first so superlinear queries surface. A 10x data step should cost
<= ~10x wall on scan-bound plans (often much less at local[32], where
small-sf runs are overhead-dominated); ratios well past the data step
deserve a plan audit.

Usage: python3 tools/scaling_report.py <bench_small.json> <bench_big.json>
         [data_ratio]
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.readline())


def main(small_path, big_path, data_ratio=10.0):
    small, big = load(small_path), load(big_path)
    qs = sorted(set(small["queries"]) & set(big["queries"]))
    missing = sorted(set(small["queries"]) ^ set(big["queries"]))
    if missing:
        print(f"note: {len(missing)} queries only in one file: "
              f"{', '.join(missing[:8])}{'...' if len(missing) > 8 else ''}")
    rows = []
    for q in qs:
        a, b = small["queries"][q], big["queries"][q]
        rows.append((b / a if a > 0 else float("inf"), a, b, q))
    rows.sort(reverse=True)
    print(f"total: {small['value']:.1f}s -> {big['value']:.1f}s "
          f"({big['value'] / small['value']:.2f}x for a {data_ratio:g}x "
          f"data step), {len(qs)} queries")
    over = [r for r in rows if r[0] > data_ratio]
    print(f"{len(over)} queries scale worse than the data "
          f"({data_ratio:g}x):")
    for ratio, a, b, q in rows[:25]:
        flag = " <-- superlinear" if ratio > data_ratio else ""
        print(f"  {q:<28} {a:7.2f}s -> {b:8.2f}s  {ratio:6.1f}x{flag}")


if __name__ == "__main__":
    dr = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    main(sys.argv[1], sys.argv[2], dr)
