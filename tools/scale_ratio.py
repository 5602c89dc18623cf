#!/usr/bin/env python3
"""Emit the sf0.1 -> sf1 per-query ratio table (round-14 verdict item 1).

Usage: python3 tools/scale_ratio.py <sf01_bench.json> <sf1_bench.json>
       [threshold]

Reads two bench_last.json-format files (min-of-N per query), prints a
markdown table sorted by ratio descending, flags queries whose sf1/sf0.1
ratio exceeds the threshold (default 12 - superlinear at 10x rows), and
prints summary stats. Sub-0.2s sf0.1 queries are summarized separately:
their ratios are fixed-cost noise, not plan signal.
"""
import json
import sys


def main():
    a = json.load(open(sys.argv[1]))["queries"]
    b = json.load(open(sys.argv[2]))["queries"]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0
    common = sorted(set(a) & set(b))
    skipped = sorted(set(a) - set(b))
    rows = []
    tiny = []
    for q in common:
        if a[q] <= 0 or b[q] <= 0:
            continue
        r = b[q] / a[q]
        (rows if a[q] >= 0.2 else tiny).append((q, a[q], b[q], r))
    rows.sort(key=lambda t: -t[3])
    print(f"| query | sf0.1 s | sf1 s | ratio |")
    print(f"|---|---|---|---|")
    for q, x, y, r in rows:
        flag = " **SUPERLINEAR**" if r > thr else ""
        print(f"| {q} | {x:.2f} | {y:.2f} | {r:.2f}x{flag} |")
    n_over = sum(1 for _, _, _, r in rows if r > thr)
    ta = sum(x for _, x, _, _ in rows)
    tb = sum(y for _, _, y, _ in rows)
    print()
    print(f"{len(rows)} queries >=0.2s at sf0.1: total {ta:.1f} -> "
          f"{tb:.1f} s ({tb/ta:.2f}x at 10x rows); "
          f"{n_over} over the {thr}x threshold")
    if tiny:
        tta = sum(x for _, x, _, _ in tiny)
        ttb = sum(y for _, _, y, _ in tiny)
        mx = max(tiny, key=lambda t: t[2])
        print(f"{len(tiny)} sub-0.2s queries: total {tta:.1f} -> {ttb:.1f} s; "
              f"largest at sf1: {mx[0]} {mx[2]:.2f} s")
    if skipped:
        print(f"excluded at sf1 ({len(skipped)}): {', '.join(skipped)}")


if __name__ == "__main__":
    main()
