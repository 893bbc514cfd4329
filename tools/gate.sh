#!/bin/bash
# Local correctness gate: Verify dump + DuckDB oracle parity.
# Usage: tools/gate.sh [sf0.001|sf0.01|sf0.1]
set -e
SF="${1:-sf0.001}"
OUT="/tmp/verify_${SF}"
cd "$(dirname "$0")/.."
rm -rf "$OUT"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" sbt -batch \
  "runMain graft.Verify /root/testdata/$SF $OUT" 2>&1 | grep "\[verify\]" || true
python3 tools/oracle_check.py "/root/testdata/$SF" "$OUT"
# schema-contract audits: no DECIMAL output anywhere, and every BIGINT
# output keeps >=1000x int64 headroom at this SF (both exit non-zero
# on violation, failing the gate)
python3 tools/decimal_audit.py "$OUT" | tail -1 | grep -q "^== 0 " \
  || { echo "DECIMAL outputs detected"; exit 1; }
python3 tools/headroom_audit.py "$OUT" 1000
# gate-liveness: a query with an EMPTY output can never fail its oracle
# (empty==empty hashes green); single-class booleans must be allowlisted
python3 tools/vacuity_audit.py "$OUT"
