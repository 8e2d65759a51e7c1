#!/usr/bin/env python3
"""Same-copy vs cross-copy near-dup pair split on a ScaleUp fixture.

Evidence tool for SCALE.md (VERDICT r7 #4): runs the l03 exact 3-gram
Jaccard oracle SQL (dumped by graft.Verify into oracle_sql.json) against a
fixture's documents.parquet in DuckDB, then splits the resulting pairs by
ScaleUp's copy index (doc_id // 10_000_000). Organic growth is working when
same-copy pairs scale exactly ~k and cross-copy pairs are ~0.

Usage: pairsplit.py <sfDir> [<sfDir> ...]
Env: GRAFT_ORACLE_JSON overrides the oracle_sql.json path
(default /tmp/verify_out/oracle_sql.json, written by `runMain graft.Verify`).
"""
import json
import os
import sys

import duckdb

SHIFT = 10_000_000
ORACLE_PATH = os.environ.get("GRAFT_ORACLE_JSON", "/tmp/verify_out/oracle_sql.json")
try:
    ORACLE = json.load(open(ORACLE_PATH))
except FileNotFoundError:
    sys.exit(f"pairsplit: oracle dump not found at {ORACLE_PATH} — "
             "run `sbt 'runMain graft.Verify'` first, or point "
             "GRAFT_ORACLE_JSON at an existing oracle_sql.json")

for sf_dir in sys.argv[1:]:
    path = f"{sf_dir}/documents.parquet"
    if os.path.isdir(path):  # Spark writes a part-file directory
        path += "/*.parquet"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    pairs = con.execute(ORACLE["l03_ngram_jaccard"]).fetchall()
    same = sum(1 for da, db, _ in pairs if da // SHIFT == db // SHIFT)
    cross = len(pairs) - same
    ndocs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    print(f"{sf_dir}: {ndocs} docs, l03 pairs total={len(pairs)} "
          f"same-copy={same} cross-copy={cross}")
    con.close()
