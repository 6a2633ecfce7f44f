#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read each query's parquet
dump from Verify, run its DuckDB oracle over the same lake, normalize
(sort columns by name, sort rows), and diff. Usage:
    python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import sys, json, glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # stringify so dtype quirks (int32 vs int64, object vs string) don't
    # mask value equality; floats via repr for full precision
    def cell(v):
        if isinstance(v, float):
            return repr(v)
        return str(v)
    s = df.map(cell)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    return s

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output");  n_bad += 1;  continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"[ERR ] {name}: {str(e).splitlines()[0][:200]}");  n_bad += 1;  continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"[COLS] {name}: spark={list(g.columns)} oracle={list(e.columns)}")
            n_bad += 1
        elif len(g) != len(e):
            print(f"[ROWS] {name}: spark={len(g)} oracle={len(e)}")
            n_bad += 1
        elif not g.equals(e):
            diff = (g != e).any(axis=1)
            print(f"[DIFF] {name}: {int(diff.sum())}/{len(g)} rows differ")
            idx = diff[diff].index[:3]
            for i in idx:
                print("  spark :", g.loc[i].to_dict())
                print("  oracle:", e.loc[i].to_dict())
            n_bad += 1
        else:
            print(f"[ OK ] {name} ({len(g)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
