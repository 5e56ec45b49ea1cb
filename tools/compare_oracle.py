#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's DuckDB oracle compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

Reads oracle_sql.json, registers the parquet tables by name in DuckDB,
runs each oracle statement, and compares against the Spark parquet dump:
columns sorted by name, rows compared positionally, values exactly
(floats: bit equality, with a report of max abs diff when close).
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_files = (glob.glob(f"{out_dir}/{name}.parquet/*.parquet")
                       or glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not spark_files:
            print(f"MISSING  {name}: no spark output"); n_bad += 1; continue
        try:
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); n_bad += 1; continue
        got = norm(pd.concat([pd.read_parquet(f) for f in sorted(spark_files)]))
        problems = []
        if list(want.columns) != list(got.columns):
            problems.append(f"cols want={list(want.columns)} got={list(got.columns)}")
        elif len(want) != len(got):
            problems.append(f"rows want={len(want)} got={len(got)}")
        else:
            for c in want.columns:
                w, g = want[c], got[c]
                try:
                    if w.dtype.kind == 'f' or g.dtype.kind == 'f':
                        import numpy as np
                        wv, gv = w.astype(float).values, g.astype(float).values
                        neq = ~((wv == gv) | (pd.isna(wv) & pd.isna(gv)))
                        if neq.any():
                            d = abs(wv[neq] - gv[neq])
                            problems.append(f"col {c}: {neq.sum()} diffs, maxabs={d.max():.3e}")
                    else:
                        if not w.astype(str).equals(g.astype(str)):
                            neq = (w.astype(str) != g.astype(str))
                            i = neq.idxmax()
                            problems.append(f"col {c}: {neq.sum()} diffs, first row {i}: want={w[i]!r} got={g[i]!r}")
                except Exception as e:
                    problems.append(f"col {c}: compare error {e}")
        if problems:
            print(f"FAIL     {name}: " + "; ".join(problems[:4])); n_bad += 1
        else:
            print(f"OK       {name} ({len(want)} rows)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
