#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the matching oracle SQL in
DuckDB (tables = parquet files in sfDir) and compares: row count, column
names, and a hash of all values with columns sorted by name (rows compared
in sorted order, floats rounded to 9 significant-ish decimals to absorb
read-path representation differences — the engine itself must produce
bit-stable doubles, this only guards the compare).
"""
import sys, json, glob, os, math
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): vals.append("NaN")
                else: vals.append(repr(round(v, 9)))
            else:
                vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out

def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf, "*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    # completeness: a query that THROWS inside Verify (including its
    # DecimalType lint) has its dump deleted and would otherwise vanish
    # from this loop silently — every oracle key must have a dump dir
    for key in sorted(oracle):
        if not os.path.isdir(os.path.join(outdir, key)):
            n_fail += 1
            print(f"[FAIL] {key}: no dump — query failed inside Verify "
                  "(check its stderr for '[verify] ... failed')")
    for key in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, key)
        if not os.path.isdir(d):
            continue
        spark_rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        scols, srows = spark_rel.columns, spark_rel.fetchall()
        if key not in oracle:
            print(f"[rows-only] {key}: {len(srows)} rows")
            continue
        try:
            orel = con.sql(oracle[key])
            ocols, orows = orel.columns, orel.fetchall()
        except Exception as e:
            print(f"[FAIL] {key}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_rows = len(srows) == len(orows)
        # dtype drift (e.g. BIGINT vs HUGEINT) passes the value compare but
        # fails the driver's dtype-sensitive hash — treat it as a FAILURE
        # so the local gate is red wherever the driver would be red
        ok_types = True
        if ok_cols:
            stypes = dict(zip(spark_rel.columns, [str(t) for t in spark_rel.types]))
            otypes = dict(zip(orel.columns, [str(t) for t in orel.types]))
            for c in scols:
                if stypes[c] != otypes[c]:
                    ok_types = False
                    print(f"  [DTYPE-FAIL] {key}.{c}: spark={stypes[c]} oracle={otypes[c]}")
                # DECIMAL/HUGEINT anywhere fails even when both sides agree
                # inside this DuckDB process: the driver hashes a
                # representation where Spark-parquet DECIMAL and
                # DuckDB-computed DECIMAL differ (r4 HUGEINT, r5 DECIMAL
                # episodes) — the local gate must be red where the driver
                # would be red. Allowlist intentionally empty.
                for side, t in (("spark", stypes[c]), ("oracle", otypes[c])):
                    if "DECIMAL" in t or "HUGEINT" in t:
                        ok_types = False
                        print(f"  [DECIMAL-BAN] {key}.{c} ({side}): {t} — cast to BIGINT or VARCHAR at the output edge")
        ok_vals = ok_cols and ok_rows and canon(srows, scols) == canon(orows, ocols)
        if ok_cols and ok_rows and ok_vals and ok_types:
            print(f"[ok] {key}: {len(srows)} rows")
            n_pass += 1
        else:
            n_fail += 1
            print(f"[FAIL] {key}: cols_match={ok_cols} rows {len(srows)}vs{len(orows)} vals={ok_vals} types={ok_types}")
            if not ok_cols:
                print(f"   spark cols: {sorted(scols)}\n   oracle cols: {sorted(ocols)}")
            elif not ok_vals:
                a, b = canon(srows, scols), canon(orows, ocols)
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diff:
                    print(f"   spark:  {x}\n   oracle: {y}")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
