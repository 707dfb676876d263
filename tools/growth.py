#!/usr/bin/env python3
"""Scale-growth table: compare two Bench total_detail JSONs (e.g. sf0.1
vs sf1) and print per-query time growth sorted descending. A query whose
time grows by more than FLAG_X while the data grew 10x gets flagged for
a plan audit (BENCH_NOTES round-6 criterion: >15x growth on 10x data is
super-linear beyond shuffle/log factors and needs an explanation).

Usage: python3 tools/growth.py <base_detail.json> <scaled_detail.json> [flag_x=15]
Tooling only; not part of the library surface.
"""
import json
import sys


def main():
    base = json.load(open(sys.argv[1]))["queries"]
    scaled = json.load(open(sys.argv[2]))["queries"]
    flag_x = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    comp = sorted(set(base) & set(scaled), key=lambda k: -scaled[k] / max(base[k], 1e-9))
    missing = sorted(set(base) ^ set(scaled))
    if missing:
        print(f"[growth] not in both runs: {', '.join(missing)}")
    print(f"[growth] {'query':<28} {'base':>8} {'scaled':>8} {'growth':>8}")
    flagged = []
    for k in comp:
        g = scaled[k] / max(base[k], 1e-9)
        mark = ""
        if g > flag_x:
            mark = f"  <-- FLAG >{flag_x}x — needs a plan audit"
            flagged.append(k)
        print(f"[growth] {k:<28} {base[k]:>8.3f} {scaled[k]:>8.3f} {g:>7.2f}x{mark}")
    bt, st = sum(base[k] for k in comp), sum(scaled[k] for k in comp)
    print(f"[growth] total over {len(comp)} common queries: "
          f"{bt:.1f}s -> {st:.1f}s = {st / bt:.2f}x")
    if flagged:
        print(f"[growth] {len(flagged)} flagged: {', '.join(flagged)}")
        sys.exit(1)
    print(f"[growth] clean: no query grew >{flag_x}x")


if __name__ == "__main__":
    main()
