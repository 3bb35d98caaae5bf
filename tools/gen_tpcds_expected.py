#!/usr/bin/env python3
"""Rebuild <dir>/expected/*.parquet + manifest.json for an ALREADY-exported
dsdgen table directory (tools/gen_tpcds.py output), without re-running
dsdgen. DuckDB queries the table parquet through views, with a memory
limit + spill directory so a big scale factor cannot OOM the box
(observed: in-memory dsdgen sf30 + a concurrent Spark JVM = OOM kill at
94 GB RSS).

Usage: python3 tools/gen_tpcds_expected.py <dir> [memory_limit]
"""
import glob
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_tpcds import duck_dialect  # noqa: E402

DIR = sys.argv[1]
MEM = sys.argv[2] if len(sys.argv) > 2 else "60GB"
SQL = "/root/reference/src/data_derivation/query_performance/sql"

os.makedirs(os.path.join(DIR, "expected"), exist_ok=True)
con = duckdb.connect()
con.execute(f"SET memory_limit='{MEM}'")
con.execute("SET temp_directory='/tmp/duckdb_spill'")
con.execute("SET default_null_order='nulls_first'")
# Views re-scan parquet on every reference — q64's twice-referenced
# 6-table CTE never finished at sf30 that way (>44 min, killed).
# LOAD_TABLES=1 materializes every table in the buffer pool first
# (the shape the in-memory dsdgen runs used), trading ~60 GB RAM for
# table-speed scans; the memory limit + spill dir keep it bounded.
load = os.environ.get("LOAD_TABLES", "") == "1"
for p in sorted(glob.glob(os.path.join(DIR, "*.parquet"))):
    t = os.path.basename(p)[:-len(".parquet")]
    kind = "table" if load else "view"
    con.execute(f"create {kind} {t} as select * from '{p}'")
    print(f"[expected] {kind} {t}", file=sys.stderr)

manifest = {}
for p in sorted(glob.glob(os.path.join(SQL, "q*.sql"))):
    name = os.path.basename(p)[:-4]
    with open(p) as f:
        text = f.read()
    dst = os.path.join(DIR, "expected", f"{name}.parquet")
    if os.path.exists(dst):  # restart-friendly
        # A file truncated by a killed COPY fails the count — fall
        # through to regeneration instead of aborting the whole rebuild.
        try:
            rows = con.execute(f"select count(*) from '{dst}'").fetchone()[0]
            manifest[name] = {"status": "ok", "rows": rows}
            print(f"[expected] {name}: {rows} rows (kept)", file=sys.stderr)
            continue
        except Exception as e:
            print(f"[expected] {name}: kept file unreadable "
                  f"({str(e).splitlines()[0][:120]}), regenerating",
                  file=sys.stderr)
            os.remove(dst)
    try:
        con.execute(
            f"copy ({duck_dialect(text).rstrip().rstrip(';')}) to '{dst}' (format parquet)")
        rows = con.execute(f"select count(*) from '{dst}'").fetchone()[0]
        manifest[name] = {"status": "ok", "rows": rows}
        print(f"[expected] {name}: {rows} rows", file=sys.stderr)
    except Exception as e:
        manifest[name] = {"status": "error", "error": str(e).split("\n")[0][:300]}
        print(f"[expected] {name} FAILED: {manifest[name]['error']}", file=sys.stderr)

ok = sum(1 for v in manifest.values() if v["status"] == "ok")
print(f"[expected] {ok}/{len(manifest)} queries ran in duckdb", file=sys.stderr)
with open(os.path.join(DIR, "manifest.json"), "w") as f:
    json.dump(manifest, f, indent=1, sort_keys=True)
