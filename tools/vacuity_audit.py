#!/usr/bin/env python3
"""Gate-liveness audit over a Verify dump: a query whose output is
EMPTY is a gate that can never fail (empty == empty hashes green), so
empties are a HARD failure; boolean columns with a single observed
class also FAIL the gate unless allowlisted in ALLOW_MONO — a flag may
legitimately be single-class on this corpus (e.g. no code exists), but
then it must be allowlisted WITH a spec exercising the other class.

Round-7 origin: q38_interval_join had joined two tables whose synthetic
calendars never overlap and was green-on-0-rows at every SF since its
birth; q92_outlier_mad fenced a near-uniform column a 3-sigma MAD fence
can never flag at scale.

Usage: python3 tools/vacuity_audit.py <verifyOutDir>
"""
import os
import sys

import duckdb

# single-class booleans that are data-truth on this corpus, each with a
# spec exercising the other class (see PLANS.md round-7 vacuity notes)
ALLOW_MONO = {
    ("txt_code_detect", "is_code"),      # no code in corpus; positive class spec'd
    ("pipe_code_mix", "is_code"),        # same signal, per-language rollup
    ("pipe_l_diversity", "at_risk"),     # 2-row audit table
    ("q7_semi_anti", "has_orders"),      # anti class exists only at sf0.1; both halves spec'd
    ("mm_silence_trim", "all_silent"),   # corpus payloads always have a loud frame; true class spec'd on synthetic silence
    ("sim_dbscan_cores", "is_core"),     # all-core is the TRUE answer on the dense sf1 replica corpus (cell density grows with SF at fixed eps); both classes spec'd at sf0.001 in Round14OpsSpec
    ("sim_dbscan_cores_capped", "is_core"),  # same true answer one dial finer: the sub-cell carve only removes neighbours, and at sf1 replica density every point still clears minPts=2 inside its sub-cell; the capped config's invariance vs uncapped (and the uncapped both-classes liveness) is spec'd at sf0.001 (Round14WidenSpec subBits=0/finer-carve/plane specs + Round14OpsSpec)
}


def main():
    if len(sys.argv) < 2:
        print(__doc__.strip().splitlines()[-1])
        sys.exit(2)
    outdir = sys.argv[1]
    con = duckdb.connect()
    empty, mono = [], []
    for key in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, key)
        if not os.path.isdir(d):
            continue
        rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        bools = [c for c, t in zip(rel.columns, rel.types)
                 if str(t) == "BOOLEAN" and (key, c) not in ALLOW_MONO]
        # ONE scan per directory: row count + every flag's class count
        agg = ", ".join(["count(*)"] +
                        [f'count(DISTINCT "{c}")' for c in bools])
        res = con.sql(f"SELECT {agg} FROM '{d}/*.parquet'").fetchone()
        n = res[0]
        if n == 0:
            empty.append(key)
            continue
        for c, nd in zip(bools, res[1:]):
            if nd < 2:
                mono.append((key, c, n))
    for k in empty:
        print(f"EMPTY\t{k}\t(a 0-row gate can never fail)")
    for k, c, n in mono:
        print(f"MONO-FLAG\t{k}.{c}\tsingle class over {n} rows "
              f"(FAILS the gate — allowlist in tools/vacuity_audit.py only with a spec for the other class)")
    print(f"== {len(empty)} empty outputs, {len(mono)} unallowlisted single-class flags")
    sys.exit(1 if empty or mono else 0)


if __name__ == "__main__":
    main()
