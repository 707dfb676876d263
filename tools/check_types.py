#!/usr/bin/env python3
"""Type-level oracle check: the driver hashes TYPED value encodings, so a
DuckDB HUGEINT vs Spark BIGINT column hash-mismatches even when every value
is equal (the round-1 a3/a10 failure class). check_oracle.py compares values
only; this tool compares the DuckDB result column types against the Spark
parquet schema and flags any pairing the driver's hash would treat as
distinct.

Usage: python3 tools/check_types.py <sfDir> <verifyOutDir>
"""
import glob
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# duckdb type -> set of compatible arrow types (driver-hash-equivalent).
# Calibrated against CORRECTNESS_r01: int width differences WITHIN 64 bits
# hash equal (ann_topk_brute.rank et al. were int32-vs-BIGINT and green);
# only HUGEINT (int128, overflows the int64 lane) mismatches.
_INTS = {"int8", "int16", "int32", "int64"}
COMPAT = {
    "BIGINT": _INTS,
    "INTEGER": _INTS,
    "SMALLINT": _INTS,
    "TINYINT": _INTS,
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string", "large_string"},
    "BOOLEAN": {"bool"},
    "DATE": {"date32[day]"},
    "TIMESTAMP": {"timestamp[us]", "timestamp[us, tz=UTC]"},
    "TIMESTAMP WITH TIME ZONE": {"timestamp[us, tz=UTC]"},
}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_warn = 0
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            print(f"[types] {name}: DESCRIBE failed: {e}")
            n_warn += 1
            continue
        duck = {r[0]: r[1] for r in desc}
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[types] {name}: no spark parquet output")
            n_warn += 1
            continue
        schema = pq.read_schema(files[0])
        spark = {f.name: str(f.type) for f in schema}
        if set(duck) != set(spark):
            print(f"[types] {name}: COLUMN SET MISMATCH duck={sorted(duck)} "
                  f"spark={sorted(spark)}")
            n_warn += 1
            continue
        for col_name, dt in duck.items():
            st = spark[col_name]
            ok = st in COMPAT.get(dt, set())
            # decimals: any exact-type difference is a hash risk
            if not ok:
                print(f"[types] {name}.{col_name}: duck={dt} spark={st}  <-- HASH RISK")
                n_warn += 1
    print(f"[types] {'CLEAN' if n_warn == 0 else f'{n_warn} warnings'}")
    sys.exit(0 if n_warn == 0 else 1)


if __name__ == "__main__":
    main()
