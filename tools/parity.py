#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/parity.py [sf_dir] [verify_out_dir]

Runs each SQL from verify_out_dir/oracle_sql.json in DuckDB over the sf
tables, loads the Spark result parquet written by graft.Verify, sorts
columns by name (as the driver does), and compares exactly.
This is a BUILD TOOL only — the deliverable (Scala library) has no
dependency on it.
"""
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    # driver testdata is one file per table; tools/ScaleUp output is a
    # Spark parquet DIRECTORY per table — glob inside those
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
queries = sorted(
    os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p)
)
print(f"{len(queries)} query results, {len(oracle)} oracle SQLs ({sf})")

ok = fail = 0
for name in queries:
    if name not in oracle:
        n = len(pd.read_parquet(f"{out}/{name}"))
        print(f"SKIP {name}: no oracle (rows={n})")
        continue
    try:
        ddf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        fail += 1
        continue
    sdf = pd.read_parquet(f"{out}/{name}")
    ddf = ddf[sorted(ddf.columns)].reset_index(drop=True)
    sdf = sdf[sorted(sdf.columns)].reset_index(drop=True)
    if list(ddf.columns) != list(sdf.columns):
        print(f"FAIL {name}: cols spark={list(sdf.columns)} duck={list(ddf.columns)}")
        fail += 1
        continue
    if len(ddf) != len(sdf):
        print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
        fail += 1
        continue
    bad = None
    for c in ddf.columns:
        a, b = sdf[c], ddf[c]
        # normalize timestamp units
        if str(a.dtype).startswith("datetime64") or str(b.dtype).startswith("datetime64"):
            a = pd.to_datetime(a).astype("datetime64[ns]")
            b = pd.to_datetime(b).astype("datetime64[ns]")
        if str(a.dtype) != str(b.dtype):
            print(f"  WARN {name}.{c}: dtype spark={a.dtype} duck={b.dtype}")
        av, bv = a.values, b.values
        try:
            if a.dtype == object:
                eq = np.array([x == y or (pd.isna(x) and pd.isna(y)) for x, y in zip(av, bv)])
            else:
                eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
        except Exception as e:
            print(f"FAIL {name}.{c}: compare error {e}")
            bad = c
            break
        if not eq.all():
            i = int(np.argmin(eq))
            print(f"FAIL {name}.{c}: {int((~eq).sum())} diffs; first at row {i}: "
                  f"spark={av[i]!r} duck={bv[i]!r}")
            bad = c
            break
    if bad is None:
        ok += 1
        print(f"ok   {name} ({len(sdf)} rows)")
    else:
        fail += 1

print(f"\n{ok} ok, {fail} fail, {len(queries) - ok - fail} skipped")
sys.exit(1 if fail else 0)
