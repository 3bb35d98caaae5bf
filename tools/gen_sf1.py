#!/usr/bin/env python3
"""Generate sf1 fixtures by 10x key-offset replication of the driver's
read-only sf0.1 tables (local tooling only — NOT part of the library).

The driver ships sf{0.001,0.01,0.1}; the bench-at-scale story needs one
decade more so plans, not JVM constants, dominate. Replication with
key offsets preserves every schema and FK exactly:

  - dims (region, nation) are copied unchanged — real scale factors
    don't grow them either;
  - each fact/bridge table is unioned 10x with its surrogate keys
    offset by copy*OFF(key), where OFF = max(key)+1 from sf0.1, so
    orders<->lineitem / part / supplier / customer joins stay 1:1
    with the original fan-out;
  - events offsets user_id too (sessions multiply in count, not in
    per-user density); documents/embeddings offset doc_id/vec_id and
    keep payloads (every doc gains 9 exact near-dup partners — a
    harder, not easier, dedup workload).

Deterministic (no RNG at all). Output: /tmp/graft-sf1/*.parquet.
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-sf1"
COPIES = int(os.environ.get("GRAFT_SF1_COPIES", "10"))

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

# key columns to offset, per table: {column: offset-source (table, col)}
OFFSET_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# every offset key shares its domain with the table that owns it
KEY_DOMAIN = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

off = {}
for key, (tbl, col) in KEY_DOMAIN.items():
    if (tbl, col) not in off:
        mx = con.sql(f"select max({col}) from '{SRC}/{tbl}.parquet'").fetchone()[0]
        off[(tbl, col)] = int(mx) + 1

for t in ["region", "nation"]:
    con.sql(f"copy (select * from '{SRC}/{t}.parquet') to '{DST}/{t}.parquet' (format parquet)")
    print(t, "copied")

for t, keys in OFFSET_KEYS.items():
    cols = [r[0] for r in con.sql(f"describe select * from '{SRC}/{t}.parquet'").fetchall()]
    sel = ", ".join(
        f"{c} + i * {off[KEY_DOMAIN[c]]} as {c}" if c in keys else c for c in cols
    )
    con.sql(
        f"copy (select {sel} from '{SRC}/{t}.parquet', "
        f"(select unnest(range({COPIES})) as i)) to '{DST}/{t}.parquet' (format parquet)"
    )
    n = con.sql(f"select count(*) from '{DST}/{t}.parquet'").fetchone()[0]
    print(t, n)
