#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle correctness gate:
runs each oracle SQL against the fixture parquet tables, loads the Spark
result parquet, sorts columns by name, and compares row/schema/values.

Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, glob, json
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
# A query that ERRORED in Verify writes no output directory at all —
# without this check a broken query silently vanishes from the report
# (round 9: a fixture regen broke 14 events queries and this script
# still printed ALL GREEN over the 131 that survived).
produced = {q for q in os.listdir(outdir) if os.path.isdir(f"{outdir}/{q}")}
for q in sorted(set(oracle) - produced):
    fail += 1
    print(f"{q:28s} MISSING: no Verify output (query errored?)")
errs_path = f"{outdir}/_verify_errors.json"
if os.path.exists(errs_path):
    for q in sorted(set(json.load(open(errs_path))) - (set(oracle) - produced)):
        fail += 1
        print(f"{q:28s} ERRORED in Verify (see its stderr)")
for q in sorted(os.listdir(outdir)):
    qdir = f"{outdir}/{q}"
    if not os.path.isdir(qdir):
        continue
    files = glob.glob(f"{qdir}/*.parquet")
    got = pq.ParquetDataset(files).read().to_pandas()
    if q not in oracle:
        print(f"{q:28s} rows-only: {len(got)} rows " + ("OK" if len(got) > 0 else "EMPTY!"))
        if len(got) == 0:
            fail += 1
        continue
    want = con.execute(oracle[q]).df()
    got = got[sorted(got.columns)].reset_index(drop=True)
    want = want[sorted(want.columns)].reset_index(drop=True)
    status = []
    if list(got.columns) != list(want.columns):
        status.append(f"COLS got={list(got.columns)} want={list(want.columns)}")
    elif len(got) != len(want):
        status.append(f"ROWS got={len(got)} want={len(want)}")
    else:
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                eq = (a.astype(object).where(pd.notna(a), None).tolist()
                      == b.astype(object).where(pd.notna(b), None).tolist())
            except Exception as e:
                eq = False
            if not eq:
                diffs = [(i, x, y) for i, (x, y) in enumerate(zip(a.tolist(), b.tolist())) if x != y][:3]
                status.append(f"VAL {c}: {diffs}")
        sa = {c: str(got[c].dtype) for c in got.columns}
        sb = {c: str(want[c].dtype) for c in want.columns}
        if sa != sb:
            status.append(f"DTYPE got={sa} want={sb}")
    if status:
        fail += 1
        print(f"{q:28s} FAIL: " + " | ".join(status)[:400])
    else:
        print(f"{q:28s} OK ({len(got)} rows)")
print(f"\n{'ALL GREEN' if fail == 0 else str(fail) + ' FAILURES'}")
sys.exit(1 if fail else 0)
