#!/usr/bin/env python3
"""Generate a ~sf1 dataset from sf0.1: keyed replication for the fact
tables (per-replica key offsets, FK-consistent within a replica) plus
CONTENT-DIVERSE document replicas — each text replica gets
deterministic word-level noise (drop / duplicate / vocab-substitute,
md5-keyed on (doc_id, replica, position)) so the scaled corpus is an
instrument for BOTH headroom (per-column magnitude growth) and
LIVENESS (the vacuity audit can run at sf1 with zero corpus-artifact
exclusions). The round-7 naive 10x replica made three operators
structurally vacuous at sf1 — txt_good_turing (every frequency x10 ⇒
odd count-of-count classes empty), dd_minhash_lsh_capped (10 identical
replicas per band bucket ⇒ the cap suppresses everything),
pipe_k_anonymity.at_risk (every QI class ≥ 10) — all three are live
under word-noise: replicas are NEAR-dups (realistic for a crawl), new
rare n-grams appear, and length jitter spreads the QI length buckets.

NOT an oracle input: hash parity stays the gated SFs' job.

Key scheme: every BIGINT surrogate key gets +replica*1e9 so joins stay
FK-consistent WITHIN a replica and keys are globally unique; dimension
FKs (nationkey/regionkey) and the calendar are left untouched —
matching the engine's design assumption that dims and the calendar
grow far slower than facts.

Usage: tools/make_sf1.py [src_dir] [dst_dir] [replicas]
"""
import hashlib
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
    # documents handled separately (content-diverse text replicas)
    "embeddings": ["vec_id"],
}


def h64(key):
    """Deterministic 64-bit int from a string — replica noise must be
    reproducible run-to-run (no random module, no time)."""
    return int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big")


def rare_schedule():
    """Exact-count rare-word schedule: the token 'gt{k}x{j}' is injected
    (as an adjacent PAIR, so the bigram (t,t) forms once per injection)
    exactly k times, for k = 1..12 and j = 0..49 — so at sf1 the bigram
    count-of-count classes N_1..N_12 each hold ≥ 50 types BY
    CONSTRUCTION (txt_good_turing needs N_r and N_{r+1} for r ≤ 10).
    Rare words are what a real crawl has (typos, ids, hapax legomena)
    and what uniform replication of a 31-word synthetic vocab lacks —
    without them EVERY possible bigram saturates (min count 247 at 10x)
    and Good-Turing has nothing to smooth. Returned flat, consumed in
    generation order; when the schedule is exhausted a new cycle starts
    under a fresh 'c{n}_' namespace so counts stay exact per type."""
    sched = []
    for k in range(1, 13):
        for j in range(50):
            sched.extend([f"gt{k}x{j}"] * k)
    return sched


RARE = rare_schedule()


def perturb(doc_id, rep, text, vocab, state):
    """Word-level noise for replica `rep` of a document: per position,
    8% drop, 8% duplicate, 12% substitute with a vocab word, 0.5%
    inject a scheduled rare-word pair after the position (all
    md5-keyed; `state` holds the global rare-schedule cursor); ~72% of
    positions pass through. Keeps replicas near-dup (shingle Jaccard
    roughly .2-.4 vs the original) while making every replica's
    shingle set, length, and n-gram profile distinct."""
    words = [w for w in text.split(" ") if w]
    if not words:
        return text
    out = []
    for i, w in enumerate(words):
        h = h64(f"{doc_id}:{rep}:{i}")
        action = h % 1000
        if action < 80:
            continue  # drop
        if action < 160:
            out.extend([w, w])  # duplicate
        elif action < 280:
            out.append(vocab[(h // 1000) % len(vocab)])  # substitute
        else:
            out.append(w)
        if action >= 995:  # rare-word pair injection (0.5%)
            c = state["cursor"]
            cyc = c // len(RARE)
            t = RARE[c % len(RARE)] if cyc == 0 else f"c{cyc}_{RARE[c % len(RARE)]}"
            out.extend([t, t])
            state["cursor"] = c + 1
    return " ".join(out) if out else text


def make_documents(con):
    rows = con.execute(
        f"SELECT doc_id, text, lang, source FROM '{SRC}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    vocab = sorted({w for _, t, _, _ in rows if t for w in t.split(" ") if w})
    state = {"cursor": 0}
    out = []
    for rep in range(REPS):
        for doc_id, text, lang, source in rows:
            if rep == 0 or text is None:
                nt = text
            else:
                nt = perturb(doc_id, rep, text, vocab, state)
            out.append((doc_id + rep * OFF, nt, lang, source,
                        len(nt) if nt is not None else None))
    con.execute("CREATE OR REPLACE TABLE _docs (doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO _docs VALUES (?, ?, ?, ?, ?)", out)
    con.execute(f"COPY (SELECT * FROM _docs ORDER BY doc_id) TO "
                f"'{DST}/documents.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM '{DST}/documents.parquet'").fetchone()[0]
    print(f"[sf1] documents: {n} rows ({REPS} content-diverse replicas, "
          f"vocab {len(vocab)})")


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
make_documents(con)
print(f"[sf1] wrote {DST}")
