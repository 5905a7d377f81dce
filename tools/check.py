#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfdir> <verify_out_dir>
Reads each <out>/<name> parquet dump + <out>/oracle_sql.json, registers
the sfdir parquet tables as DuckDB views, runs the oracle SQL, and
compares (columns sorted by name, values normalized) row by row.
"""
import sys, os, json, glob
import duckdb, pandas as pd, numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    def f(s):
        if np.issubdtype(s.dtype, np.floating):
            s = s.round(6)
        return s.map(lambda v: 'NULL' if pd.isna(v) else str(v).removesuffix(' 00:00:00'))
    return df.apply(f)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(outdir) if os.path.isdir(f"{outdir}/{d}"))
    n_pass = n_fail = n_weak = 0
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"  WEAK  {name}: rows={len(got)} (no oracle)")
            n_weak += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"  FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, e_ = norm(got), norm(exp)
        if list(g.columns) != list(e_.columns):
            print(f"  FAIL  {name}: columns {list(g.columns)} vs {list(e_.columns)}")
            n_fail += 1
        elif len(g) != len(e_):
            print(f"  FAIL  {name}: rows {len(g)} vs {len(e_)}")
            n_fail += 1
        elif not g.reset_index(drop=True).equals(e_.reset_index(drop=True)):
            diff = (g.reset_index(drop=True) != e_.reset_index(drop=True)).any(axis=1)
            i = diff.idxmax()
            print(f"  FAIL  {name}: first diff row {i}:\n    spark: {g.iloc[i].to_dict()}\n    duck : {e_.iloc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"  PASS  {name}: rows={len(g)}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_weak} weak")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
