#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB on the same parquet views the driver
uses — the single-process comparison row for BENCH_NOTES.md.

Usage: python3 tools/bench_duckdb.py <sfDir> <verifyOutDir> [spark_bench.json]

With a Spark bench JSON as the third arg, prints the per-query and total
comparison on the oracle-comparable subset.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name in sorted(oracle):
        t0 = time.monotonic()
        try:
            con.execute(oracle[name]).fetchall()
            times[name] = time.monotonic() - t0
        except Exception as e:  # noqa: BLE001
            print(f"[duck] {name}: ERROR {e}")
    total = sum(times.values())
    print(json.dumps({"duck_total": round(total, 3),
                      "queries": {k: round(v, 4) for k, v in times.items()}}))
    if len(sys.argv) > 3:
        spark = json.load(open(sys.argv[3]))["queries"]
        comp = sorted(set(times) & set(spark))
        st = sum(spark[k] for k in comp)
        dt = sum(times[k] for k in comp)
        print(f"[cmp] {len(comp)} comparable: spark {st:.1f}s duck {dt:.1f}s "
              f"ratio {st/dt:.2f}x")
        worst = sorted(comp, key=lambda k: times[k] - spark[k])[:8]
        for k in worst:
            print(f"[cmp]   {k}: spark {spark[k]:.2f} duck {times[k]:.2f}")


if __name__ == "__main__":
    main()
