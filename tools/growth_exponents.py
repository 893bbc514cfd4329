#!/usr/bin/env python3
"""Two-point per-column growth fit between two Verify dumps (e.g. the
sf0.1 gate dump and the sf1 scale-up dump): for every BIGINT output
column present in both, fit max|v| ~ SF^e and report the worst columns
by projected headroom exhaustion — the empirical evidence behind the
BIGINT-vs-STRING output-edge decisions (VERDICT r6 "Next #4").

Usage: tools/growth_exponents.py <dumpA> <dumpB> <sfRatio> [topN=15]
(sfRatio = SF_B / SF_A, e.g. 10)
"""
import math
import os
import sys

import duckdb

ALLOW = {("dd_simhash", "simhash"),
         # modular ring value: magnitude fixed by the Mersenne 2^61-1
         # ring width, not data scale (the mod is identity until ~sf1000,
         # then uniform near the ring top)
         ("q39_checksum", "checksum")}

# identifier pass-throughs: their magnitude is the platform's key-space
# allocation (and, in the replicated sf1 input, the replica offset
# artifact), not a computed statistic — reported separately
ID_SUFFIXES = ("_id", "_key", "key", "_custkey", "_orderkey")
ID_NAMES = {"doc_id", "user_id", "vec_id", "event_id", "bid", "dropped",
            "keeper", "nearest_bench", "va", "vb", "vec_a", "vec_b",
            "query_id", "doc_a", "doc_b", "id_a", "id_b", "src", "dst",
            "node", "seed", "i", "j",
            # id-VALUED statistics: min/max/kept ids, pair endpoints
            "doc_new", "max_kept", "part_a", "part_b", "key_a", "key_b",
            # keeper_doc = min(doc_id) over a chunk's holders; an LPA
            # label IS a node id (min-label tie rule) — both jump by
            # the replica key offset on the replicated sf1 input
            "keeper_doc", "label",
            # component labels ARE ids: min(doc_id) over the cluster,
            # so their jump is the replica key offset too; cluster is
            # pipe_cluster_split's coalesce(component, doc_id)
            "component", "cluster"}


def is_identifier(col):
    c = col.lower()
    return c in ID_NAMES or any(c.endswith(s) for s in ID_SUFFIXES)


def col_maxes(con, outdir):
    out = {}
    for key in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, key)
        if not os.path.isdir(d):
            continue
        rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        cols = [c for c, t in zip(rel.columns, rel.types)
                if str(t) == "BIGINT" and (key, c) not in ALLOW]
        if not cols:
            continue
        agg = ", ".join(f'max(abs("{c}"))' for c in cols)
        for c, mx in zip(cols, con.sql(
                f"SELECT {agg} FROM '{d}/*.parquet'").fetchone()):
            if mx:
                out[(key, c)] = mx
    return out


def main():
    a, b = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3])
    top = int(sys.argv[4]) if len(sys.argv) > 4 else 15
    con = duckdb.connect()
    ma, mb = col_maxes(con, a), col_maxes(con, b)
    rows = []
    for k in sorted(set(ma) & set(mb)):
        va, vb = ma[k], mb[k]
        e = math.log(vb / va) / math.log(ratio) if va > 0 else 0.0
        head = 2.0 ** 63 / vb
        # SF multiples (of dump B) until 2^63, under the fitted exponent
        # (log-space: tiny exponents overflow float pow)
        runway = (math.inf if e <= 0.01
                  else math.exp(min(700.0, math.log(head) / e)))
        rows.append((runway, e, head, k, va, vb))
    stats = [r for r in rows if not is_identifier(r[3][1])]
    ids = [r for r in rows if is_identifier(r[3][1])]
    stats.sort(key=lambda r: r[0])
    ids.sort(key=lambda r: r[0])

    def show(title, sel):
        print(title)
        print(f"{'runway_xSF':>12} {'exp':>6} {'headroom':>12}  query.column")
        for runway, e, head, (q, c), va, vb in sel[:top]:
            r = "inf" if runway == math.inf else f"{runway:.0f}"
            print(f"{r:>12} {e:>6.2f} {head:>12.0f}x  {q}.{c} "
                  f"(max {va} -> {vb})")

    show("-- computed statistics (the output-edge audit):", stats)
    show("-- identifier pass-throughs (key-space allocation, offset "
         "artifact in replicated inputs):", ids)
    if stats:
        worst = stats[0]
        print(f"== worst computed-statistic runway: "
              f"{worst[3][0]}.{worst[3][1]} at "
              f"{'inf' if worst[0] == math.inf else format(worst[0], '.0f')}x "
              f"further SF growth before 2^63")
    else:
        print("== no computed-statistic columns in common between the two "
              "dumps (all shared BIGINT columns are identifiers)")


if __name__ == "__main__":
    main()
