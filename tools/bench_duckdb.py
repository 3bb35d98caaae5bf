#!/usr/bin/env python3
"""Time the pure-SQL oracle queries in DuckDB over a fixture dir (local
tooling only — NOT part of the library). This is the same-scale engine
proxy the round verdicts use: identical SQL, identical parquet.

Usage:
    python3 tools/bench_duckdb.py <sf_dir> <oracle_sql.json> [q01,q02,...]
Prints one JSON line: {"queries": {name: best_sec}, "total": sec}.
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Queries whose oracle is a pure SELECT over the base tables (no writes,
# no table-state setup on the Spark side) — the only ones where oracle
# wall-clock is an engine-to-engine comparison rather than apples/oranges.
PURE = ["q01", "q02", "q03", "q04", "q05", "q06", "q07", "q08", "q09",
        "q10", "q11", "q12", "q13", "q14", "q15", "q16", "q17", "q18",
        "q19", "q24", "q25", "q26", "q27", "q29", "q30", "q31", "q32",
        "q33", "q36", "q37", "q38", "q39", "q40", "q43", "q45", "q46",
        "q47", "q50", "q51", "q52", "q53", "q55", "q59", "q60", "q61",
        "q119", "q120", "q121", "q122"]


def main() -> None:
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(oracle_path) as f:
        oracle = json.load(f)

    results = {}
    for name in sorted(oracle):
        # Exact query-id match ("q10" must not swallow q100-q109):
        # the id is everything before the first underscore.
        if name.split("_")[0] not in PURE:
            continue
        if only and not any(s in name for s in only):
            continue
        times = []
        for _ in range(3):
            t0 = time.time()
            con.execute(oracle[name]).fetchall()
            times.append(time.time() - t0)
        results[name] = round(min(times), 4)
        print(f"[duckdb] {name}: {results[name]}", file=sys.stderr)
    print(json.dumps({"queries": results,
                      "total": round(sum(results.values()), 3),
                      "sf": sf_dir}))


if __name__ == "__main__":
    main()
