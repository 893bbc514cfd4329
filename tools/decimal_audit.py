#!/usr/bin/env python3
"""List every Verify-dumped query whose output schema contains a DECIMAL
column, with per-column max |value| — used to decide BIGINT vs STRING when
retiring DECIMAL from output schemas (round-6 sweep).

Usage: python3 tools/decimal_audit.py <verifyOutDir>
"""
import sys, os, glob
import duckdb

def main():
    outdir = sys.argv[1]
    con = duckdb.connect()
    hits = 0
    for key in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, key)
        if not os.path.isdir(d):
            continue
        rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        decs = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                if "DECIMAL" in str(t)]
        if not decs:
            continue
        hits += 1
        for c, t in decs:
            mx = con.sql(
                f'SELECT max(abs(cast("{c}" as double))) FROM \'{d}/*.parquet\''
            ).fetchone()[0]
            over = " OVER-INT64" if mx is not None and mx > 2**63 else ""
            print(f"{key}\t{c}\t{t}\tmax|v|={mx!r}{over}")
    print(f"== {hits} queries with DECIMAL outputs")

if __name__ == "__main__":
    main()
