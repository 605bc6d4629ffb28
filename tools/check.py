#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify output
parquet per query, run the matching oracle SQL in DuckDB over the same
sfDir tables, compare row count / schema (column names) / value hash.
Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize numeric types
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = 0
for qdir in sorted(glob.glob(os.path.join(outdir, "*"))):
    if not os.path.isdir(qdir):
        continue
    name = os.path.basename(qdir)
    got = pd.concat([pd.read_parquet(f) for f in glob.glob(qdir + "/*.parquet")]) \
        if glob.glob(qdir + "/*.parquet") else pd.DataFrame()
    if name not in oracle:
        print(f"[rows-only] {name}: rows={len(got)}")
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"[FAIL-sql ] {name}: oracle SQL error: {e}")
        fails += 1
        continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        print(f"[FAIL-cols] {name}: got {list(g.columns)} vs oracle {list(e.columns)}")
        fails += 1
        continue
    if len(g) != len(e):
        print(f"[FAIL-rows] {name}: got {len(g)} vs oracle {len(e)}")
        fails += 1
        continue
    if not g.equals(e):
        neq = (g != e) & ~(g.isna() & e.isna())
        bad = neq.any(axis=1)
        print(f"[FAIL-vals] {name}: {bad.sum()} differing rows; first:")
        print(pd.concat([g[bad].head(3).add_suffix('_got'),
                         e[bad].head(3).add_suffix('_exp')], axis=1))
        fails += 1
        continue
    print(f"[OK       ] {name}: {len(g)} rows")
sys.exit(1 if fails else 0)
