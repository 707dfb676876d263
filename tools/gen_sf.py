#!/usr/bin/env python3
"""Scale-up test-data generator: writes an sfN directory as FACTOR
id-offset copies of a source sf directory, preserving parquet schemas
byte-for-byte (pyarrow concat — a Spark rewrite would coerce events.ts
TIMESTAMP(NANOS) to int64 under nanosAsLong and lineitem/orders
TIMESTAMP(MILLIS) to micros, silently changing what DuckDB reads).

Key layout mirrors graft.tools.ScaleBench's 10x harness: every copy i
adds i*OFFSET to each table's primary key AND to every foreign key that
references a scaled table, so referential integrity holds across copies
(orders of copy 3 point at customers of copy 3). region/nation stay 1x
— they are fixed-domain dims and customer/supplier nationkeys reference
them unchanged. Value columns are copied EXACTLY: the correctness gate
compares Spark vs DuckDB on the same files, and every LIMIT query in
the library carries a unique-key tiebreaker (SortSetQueries scaladoc),
so exact-copy ties cannot flip result sets.

Usage: python3 tools/gen_sf.py <srcDir> <dstDir> [factor=10]
Tooling only (driver-side pyarrow), not part of the library surface.
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET = 10_000_000  # matches ScaleBench's id-offset convention

# table -> int64 key columns to offset per copy (PKs + FKs to scaled tables)
OFFSET_COLS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def scale(src, dst, table, factor):
    t = pq.read_table(f"{src}/{table}.parquet")
    cols = OFFSET_COLS[table]
    if not cols or factor == 1:
        copies = [t]
    else:
        copies = []
        for i in range(factor):
            c = t
            for name in cols:
                idx = c.schema.get_field_index(name)
                shifted = pc.add(c.column(name), pa.scalar(i * OFFSET, pa.int64()))
                c = c.set_column(idx, c.schema.field(name), shifted)
            copies.append(c)
    out = pa.concat_tables(copies)
    # splittable row groups (~32 per table, floor 1024 rows): a 100 TB table
    # arrives as thousands of row groups across many files, and Spark's scan
    # parallelism is bounded by row-group count — the pyarrow default writes
    # ONE group for these sizes, which serializes every scan stage at sf1
    # regardless of cores and misrepresents real large-data layout
    rg = max(1024, out.num_rows // 32)
    pq.write_table(out, f"{dst}/{table}.parquet", row_group_size=rg)
    print(f"{table}: {t.num_rows} -> {out.num_rows} rows (rg={rg})")


def main():
    src, dst = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    os.makedirs(dst, exist_ok=True)
    for table in OFFSET_COLS:
        scale(src, dst, table, factor if OFFSET_COLS[table] else 1)
    # schema parity audit: dst must read back with the identical arrow schema
    for table in OFFSET_COLS:
        a = pq.read_schema(f"{src}/{table}.parquet")
        b = pq.read_schema(f"{dst}/{table}.parquet")
        assert a.equals(b), f"{table}: schema drift {a} vs {b}"
    print("schema parity: OK")


if __name__ == "__main__":
    main()
