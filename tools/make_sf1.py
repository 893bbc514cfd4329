#!/usr/bin/env python3
"""Generate a ~sf1 dataset by replicating sf0.1 with per-replica key
offsets — the empirical scale-up input for the output-edge headroom
proof (VERDICT r6 "Next #4"). NOT an oracle input: values are 10x
sf0.1 with FK-consistent surrogate keys, which is exactly what the
decimal/headroom audits need (per-column magnitude growth), while
hash parity stays the gated SFs' job.

Key scheme: every BIGINT surrogate key gets +replica*1e9 so joins stay
FK-consistent WITHIN a replica and keys are globally unique; dimension
FKs (nationkey/regionkey) and the calendar are left untouched —
matching the engine's design assumption that dims and the calendar
grow far slower than facts.

Usage: tools/make_sf1.py [src_dir] [dst_dir] [replicas]
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/sf1"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 1_000_000_000

# table -> columns that carry a per-replica key offset
KEYED = {
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

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
for table, keys in KEYED.items():
    src = f"{SRC}/{table}.parquet"
    cols = [c[0] for c in con.execute(
        f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
    reps = 1 if not keys else REPS  # dims stay single-copy
    parts = []
    for r in range(reps):
        sel = ", ".join(
            f"{c} + {r * OFF} AS {c}" if c in keys else c for c in cols)
        parts.append(f"SELECT {sel} FROM '{src}'")
    q = " UNION ALL ".join(parts)
    con.execute(f"COPY ({q}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"[sf1] {table}: {n} rows ({reps} replicas)")
print(f"[sf1] wrote {DST}")
