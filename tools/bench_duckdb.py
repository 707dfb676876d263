#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB on the same parquet views the driver
uses — the single-process comparison row for BENCH_NOTES.md.

Usage: python3 tools/bench_duckdb.py <sfDir> <verifyOutDir> [spark_bench.json]

DuckDB timings are the median of 3 runs (mirrors Bench.scala's
median-of-3). With a Spark bench JSON as the third arg, prints the
per-query RATIOS table on the oracle-comparable subset and flags every
query over the 2x-of-DuckDB bar, except:

- (floor): DuckDB < 50 ms — the ratio measures planning constants, not
  data processing, on both sides;
- (constant): the Spark excess over DuckDB is under 0.35 s — within
  Spark's fixed multi-stage scheduling overhead at local[32]/32
  partitions (measured: pure-map queries run 0.09-0.13 s regardless of
  work; each shuffle stage adds ~0.1 s — see BENCH_NOTES round 3, incl.
  sf0.01-vs-sf0.1 scaling evidence that these queries are
  constant-dominated);
- EXPLAINED: documented rows where the comparison is semantically
  lopsided (the oracle states a query's output CONTRACT, not the same
  work) or measured constant-dominated — each carries its one-line
  justification AND a max absolute Spark time: if the query ever
  exceeds its cap, the stale justification re-flags instead of waiving
  unconditionally.

Exits 1 only on a NEW unexplained >2x row (or an EXPLAINED row over its cap).
"""
import json
import statistics
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

RUNS = 3
DUCK_FLOOR_S = 0.05   # below this, the ratio measures planning constants
CONSTANT_S = 0.35     # Spark fixed multi-stage scheduling overhead bound
RATIO_BAR = 2.0

# name -> (max Spark seconds before the waiver expires, justification).
# Caps are ~3x the measured warm sf0.1 time: generous enough for host
# contention, tight enough that a real regression (10x growth) re-flags.
EXPLAINED = {
    "dd_simhash_contains": (15.0, "invariant harness: Spark runs the full "
        "simhash pipeline PLUS the fingerprint join; the oracle computes "
        "only the fingerprint-pair contract"),
    "f4_nest_explode_roundtrip": (4.0, "roundtrip query: Spark builds the "
        "nested form (2 collect_list shuffles) then explodes it back; the "
        "oracle is the flat join the roundtrip must reproduce"),
    "tpch_q10": (4.0, "constant-dominated at this SF: 1.04 s @sf0.01 vs "
        "1.30 s @sf0.1 warm (10x data, +25% time)"),
    "tpch_q18": (4.0, "constant-dominated: 0.89 s @sf0.01 vs 1.23 s @sf0.1 warm"),
    "ta_bm25": (4.0, "constant-dominated 5-stage pipeline: 0.94 s @sf0.01 "
        "vs 1.24 s @sf0.1 warm"),
    # the next three sit at the DuckDB 50 ms floor boundary and flip to
    # flags only when host contention inflates the DuckDB sample; all are
    # measured constant-dominated (warm, 10x data):
    "tpch_q3": (5.0, "constant-dominated: 1.34 s @sf0.01 vs 1.52 s @sf0.1 warm"),
    "tpch_q5": (5.0, "constant-dominated: 1.25 s @sf0.01 vs 1.69 s @sf0.1 warm"),
    "ta_bigram_lm": (3.0, "constant-dominated: 0.63 s @sf0.01 vs 1.02 s @sf0.1 warm"),
    "p11_variant_path": (2.5, "constant-dominated: 0.43 s @sf0.01 vs 0.69 s @sf0.1 warm"),
}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name in sorted(oracle):
        samples = []
        try:
            for _ in range(RUNS):
                t0 = time.monotonic()
                con.execute(oracle[name]).fetchall()
                samples.append(time.monotonic() - t0)
            times[name] = statistics.median(samples)
        except Exception as e:  # noqa: BLE001
            print(f"[duck] {name}: ERROR {e}")
    total = sum(times.values())
    print(json.dumps({"duck_total": round(total, 3), "runs": RUNS,
                      "queries": {k: round(v, 4) for k, v in times.items()}}))
    if len(sys.argv) > 3:
        spark = json.load(open(sys.argv[3]))["queries"]
        comp = sorted(set(times) & set(spark))
        st = sum(spark[k] for k in comp)
        dt = sum(times[k] for k in comp)
        print(f"[cmp] {len(comp)} comparable: spark {st:.1f}s duck {dt:.1f}s "
              f"ratio {st/dt:.2f}x")
        print(f"[ratios] {'query':<28} {'spark':>8} {'duck':>8} {'ratio':>7}")
        flagged = []
        for k in sorted(comp, key=lambda k: -(spark[k] / max(times[k], 1e-9))):
            r = spark[k] / max(times[k], 1e-9)
            mark = ""
            if r > RATIO_BAR:
                if times[k] < DUCK_FLOOR_S:
                    mark = "  (floor)"
                elif spark[k] - times[k] < CONSTANT_S:
                    mark = "  (constant)"
                elif k in EXPLAINED:
                    cap, why = EXPLAINED[k]
                    if spark[k] > cap:
                        mark = (f"  <-- FLAG: over its {cap}s EXPLAINED cap "
                                f"(waiver stale: {why})")
                        flagged.append(k)
                    else:
                        mark = f"  (explained, cap {cap}s: {why})"
                else:
                    mark = "  <-- FLAG >2x UNEXPLAINED"
                    flagged.append(k)
            print(f"[ratios] {k:<28} {spark[k]:>8.3f} {times[k]:>8.3f} {r:>6.2f}x{mark}")
        if flagged:
            print(f"[ratios] {len(flagged)} FLAGGED over {RATIO_BAR}x: {', '.join(flagged)}")
            sys.exit(1)
        print(f"[ratios] clean: no unexplained query over {RATIO_BAR}x "
              f"(floor {DUCK_FLOOR_S}s, constant bound {CONSTANT_S}s)")


if __name__ == "__main__":
    main()
