#!/usr/bin/env python3
"""Red-path test for the local gate's dtype bans: builds a miniature
Verify-style dump whose parquet carries a DECIMAL column (values
matching the oracle exactly) and asserts oracle_check.py FAILS on it —
the r5 class where values are byte-identical but the driver's
dtype-sensitive hash is red.

Run: python3 tools/test_oracle_check.py   (exit 0 = the ban works)
"""
import json, os, subprocess, sys, tempfile
import duckdb

def main():
    here = os.path.dirname(os.path.abspath(__file__))
    with tempfile.TemporaryDirectory() as tmp:
        sf = os.path.join(tmp, "sf")
        out = os.path.join(tmp, "out")
        os.makedirs(sf)
        os.makedirs(os.path.join(out, "bad_decimal"))
        con = duckdb.connect()
        con.sql(f"COPY (SELECT 1::BIGINT AS k) TO '{sf}/t.parquet'")
        con.sql("COPY (SELECT 1::BIGINT AS k, CAST(42 AS DECIMAL(38,0)) AS v) "
                f"TO '{out}/bad_decimal/part.parquet'")
        oracle = {"bad_decimal":
                  "SELECT k, CAST(42 AS DECIMAL(38,0)) AS v FROM t"}
        with open(os.path.join(out, "oracle_sql.json"), "w") as f:
            json.dump(oracle, f)
        r = subprocess.run(
            [sys.executable, os.path.join(here, "oracle_check.py"), sf, out],
            capture_output=True, text=True)
        ok = r.returncode != 0 and "DECIMAL-BAN" in r.stdout
        print(r.stdout.strip())
        print("RED-PATH " + ("OK: identical-value DECIMAL fails the gate"
                             if ok else "BROKEN: DECIMAL slipped through"))
        sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main()
