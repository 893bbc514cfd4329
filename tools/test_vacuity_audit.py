#!/usr/bin/env python3
"""Red-path proof for tools/vacuity_audit.py (the gate discipline every
audit component carries, like test_oracle_check.py for the DECIMAL ban):
the audit must FAIL on an empty query output and on an unallowlisted
single-class boolean, and PASS a healthy dump.

Usage: python3 tools/test_vacuity_audit.py
"""
import os
import subprocess
import sys
import tempfile

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))


def write(dirpath, name, sql):
    d = os.path.join(dirpath, name)
    os.makedirs(d, exist_ok=True)
    duckdb.connect().execute(
        f"COPY ({sql}) TO '{d}/part.parquet' (FORMAT PARQUET)")


def run(dump):
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "vacuity_audit.py"), dump],
        capture_output=True, text=True)
    return p.returncode, p.stdout


def main():
    ok = True

    with tempfile.TemporaryDirectory() as t:
        write(t, "healthy", "SELECT * FROM (VALUES (1, true), (2, false)) v(k, flag)")
        rc, out = run(t)
        ok &= rc == 0
        print(f"[{'ok' if rc == 0 else 'FAIL'}] healthy dump passes (rc={rc})")

    with tempfile.TemporaryDirectory() as t:
        write(t, "empty_q", "SELECT 1 AS k WHERE false")
        rc, out = run(t)
        red = rc == 1 and "EMPTY\tempty_q" in out
        ok &= red
        print(f"[{'ok' if red else 'FAIL'}] empty output goes red (rc={rc})")

    with tempfile.TemporaryDirectory() as t:
        write(t, "mono_q", "SELECT * FROM (VALUES (1, true), (2, true)) v(k, flag)")
        rc, out = run(t)
        red = rc == 1 and "MONO-FLAG\tmono_q.flag" in out
        ok &= red
        print(f"[{'ok' if red else 'FAIL'}] unallowlisted single-class flag goes red (rc={rc})")

    with tempfile.TemporaryDirectory() as t:
        # allowlisted single-class flag must NOT fail
        write(t, "txt_code_detect",
              "SELECT * FROM (VALUES (1, false), (2, false)) v(doc_id, is_code)")
        rc, out = run(t)
        ok &= rc == 0
        print(f"[{'ok' if rc == 0 else 'FAIL'}] allowlisted flag passes (rc={rc})")

    print("== vacuity_audit red-path:", "ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
