#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle and compare (sorted rows, columns sorted
by name). Usage: python3 tools/check.py <sfDir> <verifyOutDir>"""
import json, sys, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    got = pd.read_parquet(f"{outdir}/{name}")
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"columns: spark={list(got.columns)} duckdb={list(exp.columns)}")); continue
    if len(got) != len(exp):
        fails.append((name, f"rows: spark={len(got)} duckdb={len(exp)}")); continue
    g = got.sort_values(list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    ok = True
    for c in g.columns:
        gv, ev = g[c], e[c]
        if str(gv.dtype) != str(ev.dtype):
            fails.append((name, f"dtype {c}: spark={gv.dtype} duckdb={ev.dtype}")); ok = False; break
        if not gv.equals(ev):
            bad = (gv != ev) & ~(gv.isna() & ev.isna())
            i = bad[bad].index[0] if bad.any() else None
            fails.append((name, f"values {c}: first diff row {i}: spark={gv[i] if i is not None else '?'} duckdb={ev[i] if i is not None else '?'}")); ok = False; break
    if ok:
        passes.append(name)

print(f"PASS {len(passes)}: {' '.join(passes)}")
if fails:
    print(f"FAIL {len(fails)}:")
    for n, why in fails: print(f"  {n}: {why}")
sys.exit(1 if fails else 0)
