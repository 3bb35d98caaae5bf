#!/usr/bin/env python3
"""Local self-check mirroring the driver's DuckDB oracle comparison.

NOT part of the library (driver-side tooling only). Usage:
    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    n_ok = n_bad = 0
    result_dirs = sorted(
        d for d in glob.glob(os.path.join(out_dir, "*")) if os.path.isdir(d))
    for d in result_dirs:
        name = os.path.basename(d)
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"[FAIL] {name}: no parquet output")
            n_bad += 1
            continue
        got = canon(con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf())
        if name not in oracle:
            print(f"[skip] {name}: no oracle (rows-only check: {len(got)} rows)")
            if len(got) == 0:
                n_bad += 1
                print(f"[FAIL] {name}: zero rows")
            else:
                n_ok += 1
            continue
        try:
            exp = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        ok_shape = got.shape == exp.shape and list(got.columns) == list(exp.columns)
        if not ok_shape:
            print(f"[FAIL] {name}: shape/cols {got.shape}{list(got.columns)} "
                  f"vs {exp.shape}{list(exp.columns)}")
            n_bad += 1
            continue
        # exact value compare, mirroring a hash comparison
        mismatch = []
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                eq = (a.astype(str) == b.astype(str))
            except Exception:
                eq = a.eq(b)
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch.append(f"{c}[row {i}]: {a[i]!r} != {b[i]!r}")
        if mismatch:
            print(f"[FAIL] {name}: {len(mismatch)} col mismatches; first: "
                  + "; ".join(mismatch[:3]))
            n_bad += 1
        else:
            print(f"[ OK ] {name}: {len(got)} rows, {len(got.columns)} cols")
            n_ok += 1
    for name in oracle:
        if not os.path.isdir(os.path.join(out_dir, name)):
            print(f"[FAIL] {name}: declared oracle but no result dir")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
