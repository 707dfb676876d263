#!/usr/bin/env python3
"""Waiver-prune auditor for the EXPLAINED list in bench_duckdb.py.

For every EXPLAINED entry, replays the gate's flag logic WITHOUT the
waiver across every (spark-detail x duck-sample) invocation pair given
on the command line, and reports which entries ever re-flag. An entry
that never re-flags in any pair is subsumed by the floor/constant rules
and can be deleted; an entry that re-flags in at least one pair must
keep its waiver (the gate would flicker red without it).

Usage:
  python3 tools/prune_waivers.py --spark A.json [B.json ...] \
      --duck gate1.log [gate2.log ...]

Spark args are Bench total_detail JSON lines; duck args are any file
containing bench_duckdb.py's duck-times JSON line (its stdout log
works, even with '[duck] ... ERROR' lines before the JSON). Exits 0
always — this is an auditor, not a gate.
"""
import json
import os
import sys

# import the gate's own constants from this file's directory, so the
# auditor works from any cwd, and apply the same CAP_SCALE the gate does
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_duckdb import (  # noqa: E402
    CAP_SCALE, CONSTANT_S, DUCK_FLOOR_S, EXPLAINED, RATIO_BAR)

CONSTANT_EFF = CONSTANT_S * CAP_SCALE


def load_duck(path):
    """Duck-times map from a gate log: the first line that parses as the
    duck-times JSON — bench_duckdb may print '[duck] name: ERROR ...'
    lines before its JSON dump."""
    with open(path) as f:
        for line in f:
            if line.lstrip().startswith("{"):
                return json.loads(line)["queries"]
    raise ValueError(f"{path}: no duck-times JSON line found")


def main():
    argv = sys.argv[1:]
    si, di = argv.index("--spark"), argv.index("--duck")
    spark_files = argv[si + 1:di]
    duck_files = [a for a in argv[di + 1:] if not a.startswith("--")]
    # same source as the gate's flag logic: min-of-runs when present
    sparks = {}
    for p in spark_files:
        b = json.load(open(p))
        sparks[p] = b.get("queries_min", b["queries"])
    ducks = {p: load_duck(p) for p in duck_files}

    print(f"{'entry':<28} {'cap':>5} {'flags':>6} {'worst_ratio':>11} "
          f"{'worst_excess':>12}  verdict")
    deletable, keep = [], []
    for name, (cap, _why) in sorted(EXPLAINED.items()):
        flags = 0
        pairs = 0
        worst_r, worst_ex = 0.0, 0.0
        max_spark = 0.0
        for sp, sq in sparks.items():
            if name not in sq or sq[name] <= 0:
                continue
            s = sq[name]
            max_spark = max(max_spark, s)
            for dp, dq in ducks.items():
                if name not in dq:
                    continue
                pairs += 1
                d = dq[name]
                r = s / max(d, 1e-9)
                ex = s - d
                worst_r = max(worst_r, r)
                worst_ex = max(worst_ex, ex)
                if r > RATIO_BAR and d >= DUCK_FLOOR_S and ex >= CONSTANT_EFF:
                    flags += 1
        if pairs == 0:
            verdict = "NO-DATA (keep)"
            keep.append(name)
        elif flags == 0:
            verdict = "DELETABLE (floor/constant subsume it everywhere)"
            deletable.append(name)
        else:
            verdict = f"KEEP ({flags}/{pairs} pairs re-flag)"
            keep.append(name)
        capwarn = "  !CAP" if max_spark > cap else ""
        print(f"{name:<28} {cap:>5.1f} {flags:>3}/{pairs:<3} {worst_r:>10.2f}x "
              f"{worst_ex:>11.3f}s  {verdict}{capwarn}")
    print(f"\n== {len(deletable)} deletable, {len(keep)} keep "
          f"(of {len(EXPLAINED)})")
    print("deletable:", ", ".join(deletable))

    if "--md" in argv:
        # survivor table for BENCH_NOTES: one line per keeper naming the
        # rule that does NOT subsume it (the r12 verdict's ask-#2 "done"
        # criterion), with the measured evidence
        print("\n| survivor | why floor/constant don't subsume it |")
        print("|---|---|")
        for name in keep:
            ds = [dq[name] for dq in ducks.values() if name in dq]
            ss = [sq[name] for sq in sparks.values()
                  if name in sq and sq[name] > 0]
            if not ds or not ss:
                print(f"| {name} | no current sample |")
                continue
            dlo, dhi = min(ds), max(ds)
            exhi = max(ss) - dlo
            exlo = min(ss) - dhi
            if dhi < DUCK_FLOOR_S:
                note = (f"duck {dlo:.3f}-{dhi:.3f}s under the floor, but "
                        f"excess {exlo:.2f}-{exhi:.2f}s crosses the "
                        f"{CONSTANT_EFF}s bound if a sample leaves it")
            elif dlo < DUCK_FLOOR_S <= dhi:
                note = (f"duck straddles the {DUCK_FLOOR_S}s floor "
                        f"({dlo:.3f}-{dhi:.3f}s) and excess "
                        f"{exlo:.2f}-{exhi:.2f}s can cross {CONSTANT_EFF}s")
            elif exlo < CONSTANT_EFF <= exhi:
                note = (f"duck {dlo:.3f}-{dhi:.3f}s over the floor; excess "
                        f"{exlo:.2f}-{exhi:.2f}s straddles the "
                        f"{CONSTANT_EFF}s constant bound")
            else:
                note = (f"duck {dlo:.3f}-{dhi:.3f}s over the floor, excess "
                        f"{exlo:.2f}-{exhi:.2f}s over the {CONSTANT_EFF}s "
                        f"constant bound — flags outright without the waiver")
            print(f"| {name} | {note} |")


if __name__ == "__main__":
    main()
