#!/usr/bin/env python3
"""Time the reference's 98-query TPC-DS corpus in DuckDB over a dsdgen
parquet dir (tools/gen_tpcds.py output) — the same-scale engine proxy for
graft.tools.TpcdsTime (local tooling only — NOT part of the library).

Usage: python3 tools/bench_tpcds_duckdb.py <dataDir> [iters]
Prints one JSON line: {"queries": {q: best_sec}, "total": sec}.
"""
import glob
import json
import os
import re
import sys
import time

import duckdb

DATA = sys.argv[1]
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
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

results, failed = {}, []
for p in sorted(glob.glob(os.path.join(SQL, "q*.sql"))):
    name = os.path.basename(p)[:-4]
    text = shim(open(p).read().rstrip().rstrip(";"))
    try:
        con.execute(text).fetchall()  # warm (buffer cache, plans)
        times = []
        for _ in range(ITERS):
            t0 = time.time()
            con.execute(text).fetchall()
            times.append(time.time() - t0)
        results[name] = round(min(times), 4)
        print(f"[duckdb-tpcds] {name}: {results[name]}", file=sys.stderr)
    except Exception as e:
        failed.append(name)
        print(f"[duckdb-tpcds] {name} FAILED: {str(e)[:200]}", file=sys.stderr)

print(json.dumps({"queries": results, "total": round(sum(results.values()), 3),
                  "iters": ITERS, "data": DATA, "failed": failed}))
