#!/usr/bin/env python3
"""Mechanical before/after bench comparison (round-13 verdict item:
the movers table must be generated from the committed JSON pair, not
recalled). Usage:

    tools/bench_movers.py BEFORE.json AFTER.json [top_n]

Both files are Bench's one-line JSON ({"queries": {...}, ...}).
Prints: totals, geomean speedup over common queries, and the top-N
improvements / regressions as a markdown table.
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.readline())


def main():
    before, after = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    qb, qa = before["queries"], after["queries"]
    common = sorted(set(qb) & set(qa))
    ok = [q for q in common if qb[q] > 0 and qa[q] > 0]
    geo = math.exp(sum(math.log(qb[q] / qa[q]) for q in ok) / len(ok))
    print(f"before: {before['total_s']:.1f} s / {before['n_queries']} queries"
          f" ({sys.argv[1]})")
    print(f"after:  {after['total_s']:.1f} s / {after['n_queries']} queries"
          f" ({sys.argv[2]})")
    print(f"common: {len(ok)}; geomean speedup (before/after): {geo:.3f}")
    dropped = sorted(set(qb) - set(qa))
    added = sorted(set(qa) - set(qb))
    if dropped:
        print(f"DROPPED: {dropped}")
    if added:
        print(f"added: {added}")
    deltas = sorted(ok, key=lambda q: qa[q] - qb[q])
    print("\n| query | before s | after s | delta s | speedup |")
    print("|---|---|---|---|---|")
    for q in deltas[:top_n]:
        print(f"| {q} | {qb[q]:.2f} | {qa[q]:.2f} |"
              f" {qa[q] - qb[q]:+.2f} | {qb[q] / qa[q]:.2f} |")
    print("| … | | | | |")
    for q in deltas[-top_n:]:
        print(f"| {q} | {qb[q]:.2f} | {qa[q]:.2f} |"
              f" {qa[q] - qb[q]:+.2f} | {qb[q] / qa[q]:.2f} |")


if __name__ == "__main__":
    main()
