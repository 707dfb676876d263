#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each parquet table as a DuckDB view, runs every oracle_sql.json
entry, loads the corresponding Spark result parquet, sorts columns by name
and rows by all columns, and compares cell-by-cell (exact for non-floats,
both exact and 1e-9-relative for floats, so float drift is visible before
it becomes a driver hash mismatch).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    # sort columns by name, then rows by stringified values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [cols[i] for i in order]


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        if fa == fb:
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns want={sorted(want_cols)} got={sorted(got_cols)}")
            n_fail += 1
            continue
        wr, cols = canon(want_rows, want_cols)
        gr, _ = canon(got_rows, got_cols)
        if len(wr) != len(gr):
            print(f"FAIL {name}: rows want={len(wr)} got={len(gr)}")
            n_fail += 1
            continue
        bad = None
        exact = True
        max_rel = 0.0
        for i, (w, g) in enumerate(zip(wr, gr)):
            for j, (a, b) in enumerate(zip(w, g)):
                if a != b:
                    exact = False
                    if isinstance(a, float) or isinstance(b, float):
                        try:
                            rel = abs(float(a) - float(b)) / max(1.0, abs(float(a)))
                            max_rel = max(max_rel, rel)
                        except (TypeError, ValueError):
                            pass
                if not cells_equal(a, b):
                    bad = (i, cols[j], a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: want={a!r} got={b!r}")
            n_fail += 1
        else:
            tag = "exact" if exact else f"float-drift max_rel={max_rel:.2e}"
            print(f"PASS {name} ({len(wr)} rows, {tag})")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
