#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run each oracle SQL
from outDir/oracle_sql.json in DuckDB over the same sf tables, compare with
the parquet the Verify main dumped. Mimics the driver: sort columns by name,
sort rows, compare values (exact + tolerance report)."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    res_path = f"{out_dir}/{name}"
    if not os.path.isdir(res_path):
        print(f"[MISS] {name}: no result parquet"); fail += 1; continue
    try:
        mine = pd.read_parquet(res_path)
        ref = con.sql(sql).df()
    except Exception as e:
        print(f"[ERR ] {name}: {e}"); fail += 1; continue
    mine = mine.reindex(sorted(mine.columns), axis=1)
    ref = ref.reindex(sorted(ref.columns), axis=1)
    if list(mine.columns) != list(ref.columns):
        print(f"[COLS] {name}: mine={list(mine.columns)} ref={list(ref.columns)}"); fail += 1; continue
    if len(mine) != len(ref):
        print(f"[ROWS] {name}: mine={len(mine)} ref={len(ref)}"); fail += 1; continue
    mine = mine.sort_values(by=list(mine.columns)).reset_index(drop=True)
    ref = ref.sort_values(by=list(ref.columns)).reset_index(drop=True)
    ok, maxdiff, badcol = True, 0.0, None
    for c in mine.columns:
        a, b = mine[c], ref[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            diff = (a.astype(float) - b.astype(float)).abs()
            d = float(diff.max()) if len(diff) else 0.0
            if d > 0:
                maxdiff = max(maxdiff, d); badcol = badcol or c
            if d > 1e-12:
                ok = False
        else:
            if not a.astype(str).equals(b.astype(str)):
                ok = False; badcol = c
    exact = mine.astype(str).equals(ref.astype(str))
    tag = "OK  " if ok and exact else ("OK~ " if ok else "FAIL")
    if not ok: fail += 1
    print(f"[{tag}] {name}: rows={len(mine)} exact={exact} maxdiff={maxdiff:g} col={badcol}")
print("RESULT:", "FAIL" if fail else "PASS", f"({len(oracle)} oracles)")
sys.exit(1 if fail else 0)
