#!/usr/bin/env python3
"""Time the reference's 98-query TPC-DS corpus in DuckDB over a dsdgen
parquet dir (tools/gen_tpcds.py output) — the same-scale engine proxy for
graft.tools.TpcdsTime (local tooling only — NOT part of the library).

Usage: python3 tools/bench_tpcds_duckdb.py <dataDir> [iters] [timeout_s]
Prints one JSON line: {"queries": {q: best_sec}, "total": sec, ...}.

Per-query watchdog: parquet VIEWS re-scan on every CTE reference, and
q64's twice-referenced 6-table CTE ran >44 min at sf30 that way — a
query over `timeout_s` (default 300) is interrupted and reported in
"timeout" instead of stalling the decade. Views (not materialized
tables) keep the control honest: both engines read the same parquet
files from disk, nothing is pre-loaded into memory.
"""
import glob
import json
import os
import re
import sys
import threading
import time

import duckdb

DATA = sys.argv[1]
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
TIMEOUT_S = float(sys.argv[3]) if len(sys.argv) > 3 else 300.0
SQL = "/root/reference/src/data_derivation/query_performance/sql"


def shim(t: str) -> str:
    # same dialect shims as gen_tpcds.py: DuckDB reserves the bare
    # `returns`, and its numeric->int CAST rounds where Spark/Athena
    # truncate (q54's revenue/50 segment bucketing)
    t = re.sub(r'(?i)(?<![\w"])returns(?![\w"])', '"returns"', t)
    return re.sub(r"(?i)cast\s*\(\s*\(\s*revenue\s*/\s*50\s*\)\s*AS\s+INTEGER\s*\)",
                  "cast(trunc(revenue / 50) AS INTEGER)", t)


con = duckdb.connect()
con.execute("SET default_null_order='nulls_first'")
for p in sorted(glob.glob(os.path.join(DATA, "*.parquet"))):
    t = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

def run_with_timeout(text):
    """Execute; interrupt from a watchdog thread past TIMEOUT_S."""
    done = threading.Event()

    def watchdog():
        if not done.wait(TIMEOUT_S):
            con.interrupt()

    w = threading.Thread(target=watchdog, daemon=True)
    w.start()
    try:
        con.execute(text).fetchall()
    finally:
        done.set()


results, failed, timeouts = {}, [], []
for p in sorted(glob.glob(os.path.join(SQL, "q*.sql"))):
    name = os.path.basename(p)[:-4]
    text = shim(open(p).read().rstrip().rstrip(";"))
    try:
        run_with_timeout(text)  # warm (buffer cache, plans)
        times = []
        for _ in range(ITERS):
            t0 = time.time()
            run_with_timeout(text)
            times.append(time.time() - t0)
        results[name] = round(min(times), 4)
        print(f"[duckdb-tpcds] {name}: {results[name]}", file=sys.stderr)
    except duckdb.InterruptException:
        timeouts.append(name)
        print(f"[duckdb-tpcds] {name} TIMEOUT (> {TIMEOUT_S} s)", file=sys.stderr)
    except Exception as e:
        if "INTERRUPT" in str(e).upper():
            timeouts.append(name)
            print(f"[duckdb-tpcds] {name} TIMEOUT (> {TIMEOUT_S} s)", file=sys.stderr)
        else:
            failed.append(name)
            print(f"[duckdb-tpcds] {name} FAILED: {str(e)[:200]}", file=sys.stderr)

vals = sorted(results.values())
median = 0.0 if not vals else (
    vals[len(vals) // 2] if len(vals) % 2 == 1
    else (vals[len(vals) // 2 - 1] + vals[len(vals) // 2]) / 2)
print(json.dumps({"queries": results, "total": round(sum(vals), 3),
                  "median": round(median, 4), "iters": ITERS, "data": DATA,
                  "failed": failed, "timeout": timeouts}))
