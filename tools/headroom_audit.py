#!/usr/bin/env python3
"""Int64 headroom audit over a Verify dump: for every BIGINT output
column, report max|value| and flag columns with less than `factor`×
headroom to 2^63 — the proactive check that a BIGINT output edge
won't overflow a scale-up before the gate would catch it as NULLs.

Usage: python3 tools/headroom_audit.py <verifyOutDir> [factor=1000]
"""
import sys, os
import duckdb

# hash-VALUED columns: magnitude is fixed by the hash width (simhash is
# 60 bits by construction), not by data scale — headroom is meaningless
ALLOW = {("dd_simhash", "simhash"),
         # modular ring value: magnitude fixed by the Mersenne 2^61-1
         # ring width, not data scale (the mod is identity until ~sf1000,
         # then uniform near the ring top)
         ("q39_checksum", "checksum")}

def main():
    outdir = sys.argv[1]
    factor = float(sys.argv[2]) if len(sys.argv) > 2 else 1000.0
    limit = 2.0 ** 63 / factor
    con = duckdb.connect()
    flagged = 0
    for key in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, key)
        if not os.path.isdir(d):
            continue
        rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        cols = [c for c, t in zip(rel.columns, rel.types)
                if str(t) == "BIGINT" and (key, c) not in ALLOW]
        if not cols:
            continue
        # one scan per directory for all columns
        agg = ", ".join(f'max(abs("{c}"))' for c in cols)
        maxes = con.sql(f"SELECT {agg} FROM '{d}/*.parquet'").fetchone()
        for c, mx in zip(cols, maxes):
            if mx is not None and mx > limit:
                flagged += 1
                print(f"LOW-HEADROOM\t{key}\t{c}\tmax|v|={mx}\t"
                      f"headroom={2.0**63 / mx:.0f}x")
    print(f"== {flagged} BIGINT columns under {factor:.0f}x headroom")
    sys.exit(1 if flagged else 0)

if __name__ == "__main__":
    main()
