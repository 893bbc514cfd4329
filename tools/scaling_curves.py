#!/usr/bin/env python3
"""Measured per-query wall-time scaling curves (VERDICT r7 "Next #1"):
run the bench for a named query subset at sf0.001 / sf0.01 / sf0.1 /
sf1 and fit each query's time-growth exponent, turning the "plans
survive 100x" argument from plan-reading into observed evidence.

Two exponents per query:
  e_last = lg-ratio over the LAST decade (sf0.1 -> sf1) — the honest
           asymptotic estimate: small SFs sit on the per-query fixed
           floor (JVM/plan/codegen ~0.1-0.5 s) which flattens any fit
           that includes them;
  e_fit  = least-squares slope over all measured points (reported for
           context, floor-biased LOW).
A query is "linear-ish" when e_last <= ~1.1; super-linear entries need
an explanation or become a named next-round fix.

Usage: tools/scaling_curves.py [queries_csv] [out_json]
Default subset: the top-20 heaviest of BENCH_DETAIL.json (driver r7).
Runs one sbt Bench per SF (SPARK_GRAFT_ONLY subset; detail JSON to
/tmp). ~10-20 min total, dominated by the sf1 pass. Run on a QUIET
host: each per-SF pass inherits Bench's own interleave + spread-repair
machinery, so a contended sample repairs itself before it lands here.
"""
import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TOP20 = ("sim_power_iteration,q120_hodges_lehmann,q126_bfs_hops,"
         "q57_pagerank,pipe_quality_funnel,txt_lid_trigram,q58_triangles,"
         "q104_weighted_median,q130_link_prediction,q123_assortativity,"
         "txt_doc_kn_perplexity,q139_kcore,q140_modularity,"
         "q118_mann_kendall,q103_spearman,dd_cluster_sizes,"
         "q124_degree_hist,q134_cvm,pipe_quality_verdict,sim_pq_adc")

SFS = [("sf0.001", "/root/testdata/sf0.001", 0.001),
       ("sf0.01", "/root/testdata/sf0.01", 0.01),
       ("sf0.1", "/root/testdata/sf0.1", 0.1),
       ("sf1", os.path.join(REPO, "target/sf1"), 1.0)]


def run_bench(queries, label, sfdir):
    detail = f"/tmp/bench_scale_{label}.json"
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sfdir,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
               SPARK_GRAFT_ONLY=queries,
               SPARK_GRAFT_BENCH_DETAIL=detail)
    print(f"[scale] bench {label} ({sfdir}) ...", flush=True)
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd=REPO, env=env, capture_output=True, text=True)
    if r.returncode != 0 or not os.path.exists(detail):
        sys.stderr.write(r.stdout[-3000:] + r.stderr[-2000:])
        raise SystemExit(f"bench failed at {label}")
    with open(detail) as f:
        d = json.load(f)
    if d.get("errors"):
        raise SystemExit(f"bench errors at {label}: {d['errors']}")
    print(f"[scale] {label}: total {d['total_sec']}s, "
          f"worst_spread {d['worst_spread']}", flush=True)
    return d["times"]


def main():
    queries = sys.argv[1] if len(sys.argv) > 1 else TOP20
    out_json = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(REPO, "SCALING_CURVES.json")
    names = [q.strip() for q in queries.split(",") if q.strip()]
    times = {}
    for label, sfdir, _ in SFS:
        if not os.path.isdir(sfdir):
            raise SystemExit(f"missing SF dir {sfdir} "
                             "(run tools/make_sf1.py first)")
        times[label] = run_bench(queries, label, sfdir)

    rows = []
    for q in names:
        pts = [(sf, times[label][q]) for label, _, sf in SFS
               if q in times[label]]
        if len(pts) < 2:
            continue
        (sa, ta), (sb, tb) = pts[-2], pts[-1]
        e_last = math.log(tb / ta) / math.log(sb / sa)
        # record WHICH decade e_last was taken over: if the query is
        # missing from the sf1 detail the "last decade" silently shifts
        # to an earlier, floor-biased one — make that visible, and flag
        # any row whose last point is not the largest configured SF
        labels_present = [label for label, _, sf in SFS
                          if q in times[label]]
        e_last_pair = f"{labels_present[-2]}->{labels_present[-1]}"
        truncated = labels_present[-1] != SFS[-1][0]
        xs = [math.log(s) for s, _ in pts]
        ys = [math.log(t) for _, t in pts]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        e_fit = (sum((x - mx) * (y - my) for x, y in zip(xs, ys))
                 / sum((x - mx) ** 2 for x in xs))
        row = {"query": q, "e_last": round(e_last, 2),
               "e_last_pair": e_last_pair,
               "e_fit": round(e_fit, 2),
               "times": {label: times[label].get(q)
                         for label, _, _ in SFS}}
        if truncated:
            row["e_last_truncated"] = True
            print(f"[scale] WARNING: {q} missing from {SFS[-1][0]} — "
                  f"e_last taken over {e_last_pair} (floor-biased)",
                  flush=True)
        rows.append(row)
    rows.sort(key=lambda r: -r["e_last"])
    with open(out_json, "w") as f:
        json.dump({"sfs": [s for s, _, _ in SFS], "rows": rows}, f, indent=1)
    print(f"\n| query | t(sf0.001) | t(sf0.01) | t(sf0.1) | t(sf1) | "
          f"e_last | e_fit |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        t = r["times"]
        print(f"| {r['query']} | {t.get('sf0.001')} | {t.get('sf0.01')} | "
              f"{t.get('sf0.1')} | {t.get('sf1')} | {r['e_last']} | "
              f"{r['e_fit']} |")
    worst = rows[0] if rows else None
    if worst:
        print(f"== worst last-decade exponent: {worst['query']} "
              f"e_last={worst['e_last']}")
    print(f"== wrote {out_json}")


if __name__ == "__main__":
    main()
