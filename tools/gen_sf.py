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

Embedding copies get a small id-seeded deterministic jitter (copy 0 is
always byte-exact): exact-duplicate copies make scale-run ANN recall
vacuous — every vector's 9 twins share its buckets and centroid lists,
so recall@5 measures 1.000 by construction. The jitter (splitmix64 of
(vec_id, dim, copy) -> uniform per dim, re-normalized to unit length)
keeps every twin pair far above the library's 0.35-0.45 cosine
thresholds AND far above the <=0.6 non-dup background (measured twin
cosine 0.84-0.93, so dedup pair mass is preserved and twins stay the
unambiguous nearest neighbors) while making neighbor RANKINGS real. Pass
--no-jitter for the worst-case candidate-mass variant (byte-exact
copies, the pre-r7 behavior).

Usage: python3 tools/gen_sf.py <srcDir> <dstDir> [factor=10] [--no-jitter]
Tooling only (driver-side pyarrow), not part of the library surface.
"""
import sys

import numpy as np
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


JITTER_EPS = 0.2  # per-dim uniform half-width/sqrt(3); aggregate ||delta|| ~ 0.53 over 64 dims -> measured twin cosine 0.84-0.93


def _splitmix64(x):
    x = x.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def jitter_embeddings(c, copy_idx):
    """Deterministic per-(vec_id, dim, copy) jitter + re-normalize, float32."""
    idx = c.schema.get_field_index("embedding")
    field = c.schema.field(idx)
    vec_ids = c.column("vec_id").to_numpy()                     # ORIGINAL ids: seed is copy-independent
    emb = np.array(c.column("embedding").to_pylist(), dtype=np.float64)
    n, d = emb.shape
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash, not a bug
        key = (vec_ids[:, None].astype(np.uint64) * np.uint64(1_000_003)
               + np.arange(d, dtype=np.uint64)[None, :] * np.uint64(7919)
               + np.uint64(copy_idx) * np.uint64(0x9E3779B97F4A7C15))
        u = (_splitmix64(key) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    emb = emb + JITTER_EPS * (2.0 * u - 1.0) / np.sqrt(3.0)
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    arr = pa.array(list(emb.astype(np.float32)), type=field.type)
    return c.set_column(idx, field, arr)


def scale(src, dst, table, factor, jitter=True):
    t = pq.read_table(f"{src}/{table}.parquet")
    cols = OFFSET_COLS[table]
    if not cols or factor == 1:
        copies = [t]
    else:
        copies = []
        for i in range(factor):
            c = t
            if table == "embeddings" and jitter and i > 0:
                c = jitter_embeddings(c, i)
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
    args = [a for a in sys.argv[1:] if a != "--no-jitter"]
    jitter = "--no-jitter" not in sys.argv
    src, dst = args[0], args[1]
    factor = int(args[2]) if len(args) > 2 else 10
    import os
    os.makedirs(dst, exist_ok=True)
    print(f"embedding jitter: {'ON (eps=%s)' % JITTER_EPS if jitter else 'OFF'}")
    for table in OFFSET_COLS:
        scale(src, dst, table, factor if OFFSET_COLS[table] else 1, jitter=jitter)
    # schema parity audit: dst must read back with the identical arrow schema
    for table in OFFSET_COLS:
        a = pq.read_schema(f"{src}/{table}.parquet")
        b = pq.read_schema(f"{dst}/{table}.parquet")
        assert a.equals(b), f"{table}: schema drift {a} vs {b}"
    print("schema parity: OK")


if __name__ == "__main__":
    main()
