#!/usr/bin/env python3
"""Join two graft.Bench JSON artifacts per query and print the movers.

Usage: bench_diff.py OLD.json NEW.json [--band 0.30] [--floor 0.05]

Accepts either the raw bench.json line (has a "queries" map) or a
driver BENCH_r{N}.json wrapper (tries "parsed", then scrapes whatever
per-query pairs survive in the truncated "tail"). Movers are reported
only when BOTH (a) the relative change exceeds --band (default 30%,
the documented ambient host-load band is +/-25%) and (b) the absolute
change exceeds --floor seconds (default 0.05 s — sub-50 ms moves on
millisecond queries are timer noise, not plan drift).
"""
import argparse
import json
import re
import sys


def load_queries(path):
    with open(path) as f:
        doc = json.load(f)
    if isinstance(doc.get("queries"), dict):
        return doc["queries"]
    parsed = doc.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return parsed["queries"]
    tail = doc.get("tail", "")
    pairs = dict(
        (m.group(1), float(m.group(2)))
        for m in re.finditer(r'"(q_\w+)":([0-9.]+)', tail)
    )
    if pairs:
        print(
            f"warning: {path} has no full queries map; "
            f"scraped {len(pairs)} pairs from its truncated tail",
            file=sys.stderr,
        )
        return pairs
    raise SystemExit(f"{path}: no per-query timings found")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--band", type=float, default=0.30)
    ap.add_argument("--floor", type=float, default=0.05)
    args = ap.parse_args()

    old, new = load_queries(args.old), load_queries(args.new)
    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    # Restrict both totals to queries with a non-None timing in BOTH
    # files, so a null on one side can't skew the headline percent.
    both = [q for q in shared
            if old[q] is not None and new[q] is not None]
    old_total = sum(old[q] for q in both)
    new_total = sum(new[q] for q in both)
    print(f"comparable queries: {len(shared)}")
    print(f"comparable totals:  {old_total:.2f} s -> {new_total:.2f} s "
          f"({(new_total / old_total - 1) * 100:+.1f}%)")
    if added:
        extra = sum(v for q, v in new.items() if q in added and v is not None)
        print(f"new queries: {len(added)} carrying {extra:.2f} s")
    if removed:
        print(f"removed queries: {len(removed)}: {', '.join(removed)}")

    movers = []
    for q in shared:
        a, b = old[q], new[q]
        if a is None or b is None or a <= 0:
            continue
        rel = b / a - 1
        if abs(rel) > args.band and abs(b - a) > args.floor:
            movers.append((q, a, b, rel))
    movers.sort(key=lambda t: -abs(t[3]))
    if movers:
        print(f"\nmovers beyond +/-{args.band * 100:.0f}% "
              f"and {args.floor * 1000:.0f} ms:")
        for q, a, b, rel in movers:
            print(f"  {q:32s} {a:7.3f} -> {b:7.3f} s  ({rel * 100:+.0f}%)")
    else:
        print(f"\nno movers beyond +/-{args.band * 100:.0f}% "
              f"and {args.floor * 1000:.0f} ms — within ambient band")


if __name__ == "__main__":
    main()
