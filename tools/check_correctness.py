#!/usr/bin/env python3
"""Dev harness replicating the driver's DuckDB-oracle compare.

Usage: check_correctness.py [sfdir] [verify_out]
Runs each oracle SQL from verify_out/oracle_sql.json in DuckDB against
views over the sf parquet tables, loads the Spark result parquet, sorts
columns by name (like the driver), sorts rows, and compares values
exactly. Prints per-query PASS/FAIL with diffs.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    try:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pq.read_table(files[0]).to_pandas()
        want = con.execute(sql).fetch_df()
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} oracle={list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
            n_fail += 1; continue
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        mismatch = []
        for c in got.columns:
            a, b = gs[c], ws[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch.append(f"col {c} row {i}: spark={a[i]!r} oracle={b[i]!r} "
                                f"(types {a.dtype}/{b.dtype}, {int((~eq).sum())} diffs)")
        # dtype check (schema-ish)
        for c in got.columns:
            if str(gs[c].dtype) != str(ws[c].dtype):
                mismatch.append(f"DTYPE col {c}: spark={gs[c].dtype} oracle={ws[c].dtype}")
        if mismatch:
            print(f"FAIL {name}:"); [print("   ", m) for m in mismatch[:6]]; n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    except Exception as e:
        print(f"FAIL {name}: exception {e}"); n_fail += 1
print(f"\n{n_pass} pass / {n_fail} fail")
sys.exit(1 if n_fail else 0)
